"""SPMD episode for the window-DMA (v6) backend.

Mirrors parallel/sparse_shard.py for sim/windows.py: the slot space is
sharded over the 1-D ``"p"`` mesh axis at COLUMN granularity
(topology/windows.py ``n_shards``: columns are ordered shard-major with
per-(shard, bucket) tile counts equalized by synthetic inert columns, so
every shard owns a contiguous slot range and an identical bucket-shape
signature).

Per force evaluation each shard builds its LOCAL rows of the lane-major
sources and ``all_gather``s them over ICI along the slot (lane) axis:

  k1src (8, n_loc)  -> (8, n_body)   positions | restT | mass | vol
  k2src (20, n_loc) -> (20, n_body)  S_6 | R^T_9 | restT | mass | vol

The window offsets are GLOBAL slot positions, so the kernels DMA from the
gathered source exactly as the single-chip path does; the inert tail region
is appended as zeros after the gather (tail windows multiply by exactly-zero
pair coefficients).  The all-gather's VJP (psum_scatter) routes window
cotangents home automatically.

This is new TPU-native capability, not reference parity — the reference is
single-GPU (SURVEY.md §2c).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import SimConfig
from ..core.types import Materials, ParticleState, Scene
from ..ops import mat3
from ..ops.elasticity import compute_ratio
from ..sim.blocked import _mid_section
from ..sim.windows import WinBlocked, WinBucket
from .sharding import AXIS


def stack_shard_buckets(wb: WinBlocked, n_shards: int):
    """Stack the shard-major bucket list into per-position leaves.

    Returns (stacked, meta): ``stacked`` a list (one per bucket position) of
    dicts of (n_shards, ...) arrays; ``meta`` the static (local_tile_start,
    windows) per position.  Offsets stay GLOBAL slot positions."""
    S = n_shards
    if S <= 1:
        raise ValueError("scene was not built with n_shards > 1")
    nb = len(wb.buckets) // S
    stacked, meta = [], []
    start = 0
    for k in range(nb):
        per = [wb.buckets[d * nb + k] for d in range(S)]
        b0 = per[0]
        assert all(b.windows == b0.windows and b.n_tiles == b0.n_tiles
                   for b in per), "shard bucket signature mismatch"
        stacked.append({"offsets": jnp.stack([b.offsets for b in per])})
        meta.append((start, b0.windows, b0.rows))
        start += b0.n_tiles
    return stacked, meta


def _local_buckets(stacked_local, meta):
    return [
        WinBucket(offsets=leaves["offsets"][0], tile_start=tile_start,
                  windows=windows, rows=rows)
        for leaves, (tile_start, windows, rows) in zip(stacked_local, meta)
    ]


def _elastic_local(pos_loc, ratio_loc, lmats, lbuckets, own_loc, static5_loc,
                   rs6_loc, rest_corr_loc, tail, cfg: SimConfig, interpret):
    """Shard-local window elastic forces with all-gathered lane-major sources."""
    from ..ops.pallas.window_kernels import forces_win, moments_win

    m_loc = pos_loc.shape[0]
    rows = lbuckets[0].rows
    dtype = pos_loc.dtype

    def gathered(src_loc):
        src = jax.lax.all_gather(src_loc, AXIS, axis=1, tiled=True)
        zero = jnp.zeros((src.shape[0], tail), src.dtype)
        return jnp.concatenate([src, zero], axis=1)  # inert tail region

    k1src = gathered(jnp.concatenate([pos_loc.T, static5_loc], axis=0))
    ay = jnp.concatenate([
        moments_win(k1src, own_loc, b.offsets, b.tile_start, b.windows,
                    cfg.h, interpret)
        for b in lbuckets
    ], axis=0).reshape(m_loc, 18)

    A_raw = mat3.transpose3(mat3.from_trailing(ay[:, :9].reshape(m_loc, 3, 3)))
    Y_raw = mat3.transpose3(mat3.from_trailing(ay[:, 9:18].reshape(m_loc, 3, 3)))
    A = mat3.pack([[A_raw[a, b] - pos_loc[:, a] * rs6_loc[:, b]
                    for b in range(3)] for a in range(3)])
    Y = mat3.pack([[Y_raw[a, b] - pos_loc[:, a] * rs6_loc[:, 3 + b]
                    for b in range(3)] for a in range(3)])
    lscene = Scene(rest_position=None, materials=lmats, topology=None,
                   out_num=0, blocked=None, rest_corr=rest_corr_loc,
                   slot_of_particle=None, obstacles=None)
    R, F, S, M, _G, vol_m = _mid_section(A, Y, ratio_loc, lmats, lscene,
                                         cfg, m_loc)

    fmT = jnp.stack(
        [F[0, 0], F[0, 1], F[0, 2], F[1, 0], F[1, 1], F[1, 2],
         F[2, 0], F[2, 1], F[2, 2],
         M[0, 0], M[0, 1], M[0, 2], M[1, 0], M[1, 1], M[1, 2],
         M[2, 0], M[2, 1], M[2, 2], vol_m], axis=0)
    fmT = jax.lax.optimization_barrier(fmT)
    sr15_loc = jnp.stack(
        [S[0, 0], S[0, 1], S[0, 2], S[1, 1], S[1, 2], S[2, 2],
         R[0, 0], R[1, 0], R[2, 0], R[0, 1], R[1, 1], R[2, 1],
         R[0, 2], R[1, 2], R[2, 2]], axis=0).astype(dtype)
    k2src = gathered(jnp.concatenate([sr15_loc, static5_loc], axis=0))

    def fmT_of(b):
        return jax.lax.slice_in_dim(fmT, b.tile_start * rows,
                                    (b.tile_start + b.n_tiles) * rows, axis=1)

    f = jnp.concatenate([
        forces_win(k2src, own_loc, fmT_of(b), b.offsets, b.tile_start,
                   b.windows, cfg.h, interpret)
        for b in lbuckets
    ], axis=0)
    return f.reshape(m_loc, 3)


def window_sharded_episode(x, scene: Scene, cfg: SimConfig, target_p,
                           target_v, mesh, n_steps=None, interpret=None):
    """Full sharded episode over the window backend.  Same contract as
    parallel/sparse_shard.py::sparse_sharded_episode (global slot-space
    x/targets; returns (loss, (pos, vel)) over body slots)."""
    from ..ops.collision import ground_penalty
    from ..ops.pallas.pair_kernels import _interpret_default

    interpret = _interpret_default() if interpret is None else interpret
    wb: WinBlocked = scene.blocked
    n_shards = mesh.devices.size
    if scene.obstacles is not None:
        raise NotImplementedError("sharded window episode: obstacles not supported")
    n_steps = cfg.frames if n_steps is None else n_steps
    m = wb.n_tiles * wb.rows
    tail = wb.n_slots - m
    stacked, meta = stack_shard_buckets(wb, n_shards)
    mats = jax.tree.map(lambda a: a[:m], scene.materials)
    rest_m = scene.rest_position[:m]
    static5_m = wb.static5[:, :m]
    x_m = x[:m]
    tp_m = target_p[:, :m]
    tv_m = target_v[:, :m]
    n_targets = target_p.shape[0]
    interval = max(n_steps // n_targets, 1)

    pspec = P(AXIS)
    pspec2 = P(AXIS, None)
    bucket_specs = [{"offsets": P(AXIS, None, None)} for _ in stacked]
    mats_spec = Materials(mass=pspec, volume=pspec, mu=pspec, lam=pspec,
                          free=pspec2, external=pspec2)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(pspec, P(None, AXIS, None), P(None, AXIS, None),
                  bucket_specs, mats_spec, pspec2, P(None, AXIS),
                  P(AXIS, None, None), pspec2, P(None, None, AXIS)),
        out_specs=(P(), (pspec2, pspec2)),
        check_vma=False,  # pallas_call out_shapes carry no vma annotation
    )
    def run(x_loc, tp_loc, tv_loc, stacked_loc, lmats, rest_loc, static5_loc,
            own_loc, rs6_loc, rc_loc):
        lbuckets = _local_buckets(stacked_loc, meta)
        ratio_loc = compute_ratio(x_loc, cfg)

        def elastic(pos):
            return _elastic_local(pos, ratio_loc, lmats, lbuckets, own_loc,
                                  static5_loc, rs6_loc, rc_loc, tail, cfg,
                                  interpret)

        def total_force(pos, vel, f_el):
            f = lmats.external + f_el - cfg.damping * vel
            if cfg.collision:
                f = f + ground_penalty(pos, cfg)
            return f

        dt = cfg.dt
        mass = lmats.mass[:, None]

        def step_fn(state):
            pos, vel, f_el = state
            if cfg.integrator == "trapezoidal":
                force1 = total_force(pos, vel, f_el)
                pos_n = pos + (dt * vel + 0.5 * dt * dt * force1 / mass) * lmats.free
                f_el_n = elastic(pos_n)
                force2 = total_force(pos_n, vel, f_el_n)
                vel_n = vel + dt * (force1 + force2) / (2.0 * mass) * lmats.free
                return ParticleState(pos_n, vel_n, f_el_n)
            f_el_now = elastic(pos)
            force = total_force(pos, vel, f_el_now)
            vel_n = vel + dt * force / mass * lmats.free
            pos_n = pos + dt * vel_n * lmats.free
            return ParticleState(pos_n, vel_n, f_el_now)

        if cfg.remat:
            step_fn = jax.checkpoint(step_fn)

        vel0 = jnp.broadcast_to(
            jnp.asarray(cfg.initial_velocity, rest_loc.dtype), rest_loc.shape)
        f0 = (elastic(rest_loc) if cfg.integrator == "trapezoidal"
              else jnp.zeros_like(rest_loc))
        state0 = ParticleState(rest_loc, vel0, f0)

        def body(carry, f):
            state, acc = carry
            state = step_fn(state)
            frame = f + 1
            t_idx = jnp.clip(frame // interval - 1, 0, n_targets - 1)
            dp = state.position - tp_loc[t_idx]
            dv = state.velocity - tv_loc[t_idx]
            w = cfg.dt if cfg.loss_mode == "sampled" else 1.0
            term = jnp.sum(dp * dp) + w * jnp.sum(dv * dv)
            if cfg.loss_mode == "final":
                hit = frame == n_steps
            else:
                hit = (frame % interval == 0) & (frame // interval <= n_targets)
            acc = acc + jnp.where(hit, term, 0.0)
            return (state, acc), None

        zero = jnp.zeros((), rest_loc.dtype)
        (state, acc), _ = jax.lax.scan(body, (state0, zero), jnp.arange(n_steps))
        loss = jax.lax.psum(acc, AXIS)
        return loss, (state.position, state.velocity)

    return run(x_m, tp_m, tv_m, stacked, mats, rest_m, static5_m,
               wb.own_rows, wb.rs6, scene.rest_corr)
