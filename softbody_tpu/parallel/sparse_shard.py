"""SPMD episode for the sparse/pallas flagship backend.

The gather backend shards per-particle rows (parallel/sharding.py, halo.py);
this module shards the SPARSE slot space (sim/sparse.py) over the same 1-D
``"p"`` mesh axis.  Requirements and design:

* The scene must be built with ``build_sparse_scene(..., n_shards=mesh size)``:
  topology/sparse.py then pads every cap's tile list to an n_shards multiple
  and orders tiles SHARD-MAJOR, so each shard owns a contiguous slice of tile
  space with an IDENTICAL bucket-shape signature — the one traced program
  shard_map requires.
* Candidate group ids stay GLOBAL.  Each step, every shard packs its local
  slots into the 128-float-row gather sources (ops/pallas/packed.py) and
  ``all_gather``s them over ICI; the pair kernels then gather remote neighbor
  groups out of the shared source exactly as the single-chip path does.  Two
  all-gathers per force evaluation (positions 8 f/slot, [S|R] 16 f/slot);
  their VJP (psum_scatter) routes slab cotangents home automatically.
* The trailing all-empty group (global row ``m/GROUP``) is appended as a zero
  row after the all-gather.  Its values are multiplied by exactly-zero pair
  coefficients (far-grid rest coordinates put it outside the kernel support),
  so zeros are bitwise-equivalent to the single-chip far-grid contents.
* Per-slot state (positions, velocities, forces, materials, rest data) lives
  sharded; the integrator, mid-section and loss terms are purely local.  The
  scalar loss is ``psum``-ed once per episode.

Everything runs inside ONE ``shard_map`` under ONE ``jit`` — XLA compiles the
collectives into the episode ``lax.scan`` with no host round-trips, the TPU
analog of multi-GPU halo exchange the reference never had (SURVEY.md §2c).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..core.types import Materials, ParticleState, Scene
from ..ops import mat3
from ..ops.elasticity import compute_ratio
from ..sim.blocked import _mid_section
from ..sim.sparse import DevBucket, SparseBlocked, _chunks_for
from .sharding import AXIS


def stack_shard_buckets(sb: SparseBlocked):
    """Stack the shard-major bucket list into per-position leaves.

    Returns (stacked, meta): ``stacked`` is a list (one entry per bucket
    position) of dicts of (n_shards, ...) arrays; ``meta`` the static
    (local_tile_start, rows, slab_len) per position.
    """
    S = sb.n_shards
    if S <= 1:
        raise ValueError("scene was not built with n_shards > 1")
    nb = len(sb.buckets) // S
    stacked, meta = [], []
    start = 0
    for k in range(nb):
        per = [sb.buckets[d * nb + k] for d in range(S)]
        b0 = per[0]
        assert all(b.slab_len == b0.slab_len and b.n_tiles == b0.n_tiles
                   for b in per), "shard bucket signature mismatch"
        leaves = {
            "gidx8": jnp.stack([b.gidx8 for b in per]),
            "restT_rows": jnp.stack([b.restT_rows for b in per]),
            "static_slab": jnp.stack([b.static_slab for b in per]),
        }
        if per[0].static2 is not None:
            leaves["static2"] = jnp.stack([b.static2 for b in per])
        stacked.append(leaves)
        meta.append((start, b0.rows, b0.slab_len))
        start += b0.n_tiles
    return stacked, meta


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["send_idx"],
    meta_fields=["halo_rows", "n_local_groups", "rounds", "n_shards"],
)
@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Static halo-exchange plan for the sparse SPMD path.

    Replaces the two full all-gathers per force eval with ring ``ppermute``
    rounds moving only BOUNDARY groups (the same static-rest-topology fact
    halo.py exploits for the gather backend, ported to packed-group space).
    Round k (k = 1..S-1): shard s sends shard (s+k) % S the packed rows of
    the groups that shard statically needs from s.  Per-round send lists are
    padded to the max over shards (SPMD needs one shape); padding rows land
    in the receiver's halo buffer but are never referenced by the remapped
    gather tables.

    send_idx: tuple of (S, L_k) int32 — LOCAL row indices each shard sends
    in round k (sharded P(AXIS, None) at runtime).
    halo_rows: total received rows sum_k L_k; the local source layout is
    [local gpl rows | halo_rows | 1 zero row], which the REMAPPED bucket
    gidx8 tables index."""

    send_idx: tuple
    halo_rows: int
    n_local_groups: int
    rounds: tuple          # ring offset k of each send_idx entry (empty
                           # rounds are dropped; halo-buffer blocks land in
                           # send_idx order)
    n_shards: int = 1


def build_halo_plan(sb: SparseBlocked):
    """Compute (plan, remapped_stacked, meta) from a shard-major layout.

    Returns the same (stacked, meta) structure as stack_shard_buckets but
    with every shard's gidx8 remapped into its [local | halo | zero] source
    space."""
    S = sb.n_shards
    if S <= 1:
        raise ValueError("scene was not built with n_shards > 1")
    m = sb.n_tiles * sb.rows
    gpl = m // (S * 8)             # groups per shard (shard-major, contiguous)
    empty_gid = m // 8             # the trailing all-empty group (global)
    nb = len(sb.buckets) // S

    # per-shard needed remote groups, bucketed by owner
    needed = []                    # needed[d][s] = sorted np.array of gids
    for d in range(S):
        gids = np.unique(np.concatenate(
            [np.asarray(b.gidx8).ravel() for b in sb.buckets[d * nb:(d + 1) * nb]]))
        gids = gids[gids != empty_gid]
        owner = gids // gpl
        needed.append([gids[owner == s] for s in range(S)])

    send_idx, rounds = [], []
    halo_off = 0
    # remap tables: global gid -> local source row, per shard
    remap = np.full((S, empty_gid + 1), 0, dtype=np.int64)
    for d in range(S):
        lo = d * gpl
        remap[d, lo:lo + gpl] = np.arange(gpl)
    for k in range(1, S):
        lists = [needed[(s + k) % S][s] for s in range(S)]  # s sends these
        L = max(len(x) for x in lists)
        if L == 0:
            continue
        idx = np.zeros((S, L), dtype=np.int32)
        for s, gl in enumerate(lists):
            idx[s, :len(gl)] = gl - s * gpl                 # local rows at s
            d = (s + k) % S
            remap[d, gl] = gpl + halo_off + np.arange(len(gl))
        send_idx.append(idx)
        rounds.append(k)
        halo_off += L
    zero_row = gpl + halo_off
    for d in range(S):
        remap[d, empty_gid] = zero_row
    plan = HaloPlan(send_idx=tuple(jnp.asarray(i) for i in send_idx),
                    halo_rows=halo_off, n_local_groups=gpl,
                    rounds=tuple(rounds), n_shards=S)

    stacked, meta = stack_shard_buckets(sb)
    for k in range(nb):
        g = np.stack([remap[d][np.asarray(sb.buckets[d * nb + k].gidx8)]
                      for d in range(S)])
        stacked[k]["gidx8"] = jnp.asarray(g, jnp.int32)
    return plan, stacked, meta


def _local_buckets(stacked_local, meta):
    """Rebuild DevBuckets from the shard-local (1, ...) leaves."""
    out = []
    for leaves, (tile_start, rows, slab_len) in zip(stacked_local, meta):
        out.append(DevBucket(
            gidx8=leaves["gidx8"][0],
            restT_rows=leaves["restT_rows"][0],
            static_slab=leaves["static_slab"][0],
            tile_start=tile_start,
            rows=rows,
            slab_len=slab_len,
            static2=(leaves["static2"][0]
                     if leaves.get("static2") is not None else None),
        ))
    return out


def _elastic_local(pos_loc, ratio_loc, lmats, lbuckets, rs6T_loc, rest_corr_loc,
                   cfg: SimConfig, interpret, halo=None):
    """Shard-local sparse elastic forces with exchanged packed sources.

    Same v4 lane-major kernel dataflow as the single-chip
    sim/sparse.elastic_forcs_sparse; only the packed gather sources differ.
    ``halo=None``: all-gather the full packed sources (bucket gidx8 stay
    GLOBAL).  ``halo=(plan, send_idx_loc)``: ring-ppermute only the boundary
    groups of the HaloPlan; gidx8 must be the remapped local tables
    (build_halo_plan)."""
    from ..ops.pallas.packed import (
        forces_warp_packed_v4, moments_packed_v4, pack_components,
    )

    m_loc = pos_loc.shape[0]
    rows = lbuckets[0].rows
    t_loc = m_loc // rows
    dtype = pos_loc.dtype
    n_sh = halo[0].n_shards if halo is not None else 1

    def gathered_source(comps, pad_width):
        packed_loc = pack_components(comps, pad_width, 8)
        zero = jnp.zeros((1, packed_loc.shape[1]), packed_loc.dtype)
        if halo is None:
            packed = jax.lax.all_gather(packed_loc, AXIS, axis=0, tiled=True)
            return jnp.concatenate([packed, zero], axis=0)  # trailing empty group
        plan, send_idx_loc = halo
        parts = [packed_loc]
        for k, idx_loc in zip(plan.rounds, send_idx_loc):
            blk = packed_loc[idx_loc[0]]          # (L_k, W) local boundary rows
            blk = jax.lax.ppermute(
                blk, AXIS,
                perm=[(s, (s + k) % n_sh) for s in range(n_sh)])
            parts.append(blk)
        return jnp.concatenate(parts + [zero], axis=0)

    pos_packed = gathered_source([pos_loc[:, 0], pos_loc[:, 1], pos_loc[:, 2]], 8)
    # lane-major LOCAL row positions for the in-kernel centering (round 4)
    posT_loc = jax.lax.optimization_barrier(jnp.stack(
        [pos_loc[:, 0], pos_loc[:, 1], pos_loc[:, 2]], axis=0))
    ay_parts = []
    for b in lbuckets:
        mb = b.n_tiles * rows
        r0 = b.tile_start * rows
        posT_b = jax.lax.slice_in_dim(posT_loc, r0, r0 + mb, axis=1)
        rs6_b = jax.lax.slice_in_dim(rs6T_loc, r0, r0 + mb, axis=1)
        ay_parts.append(moments_packed_v4(
            b.restT_rows, b.static_slab,
            pos_packed, posT_b, rs6_b, b.gidx8, cfg.h, interpret))
    ayT = jnp.concatenate(ay_parts, axis=1)               # (18, m_loc)

    # v4 kernels emit CENTERED [A | Y] — no -pos_i * rowsum correction here
    A = mat3.pack([[ayT[3 * b + a] for b in range(3)] for a in range(3)])
    Y = mat3.pack([[ayT[9 + 3 * b + a] for b in range(3)] for a in range(3)])
    lscene = Scene(rest_position=None, materials=lmats, topology=None,
                   out_num=0, blocked=None, rest_corr=rest_corr_loc,
                   slot_of_particle=None, obstacles=None)
    R, F, S, M, G, vol_m = _mid_section(A, Y, ratio_loc, lmats, lscene, cfg, m_loc)
    vol_rows = vol_m.reshape(t_loc, rows)

    f_parts = []
    if cfg.pair_def_grad == "j":
        G9_rows = mat3.to_trailing(G).reshape(t_loc, rows, 9)
        g_comps = [G[a, b] for a in range(3) for b in range(3)]
        g_packed = gathered_source(g_comps, 16)
        # forces_packed packs internally from (n_slots, 9); reuse its kernel
        # via the packed (field-major) gather directly
        from ..ops.pallas.packed import gather_packed_sm
        from ..ops.pallas import pair_kernels as pk

        for b in lbuckets:
            g_slab16 = gather_packed_sm(g_packed, b.gidx8, b.slab_len, 16)
            f_parts.append(pk._forces_fwd_impl(
                b.restT_rows, b.static_slab, b.rows_of(G9_rows),
                g_slab16, b.rows_of(vol_rows), cfg.h, interpret))
        return jnp.concatenate(f_parts, axis=0).reshape(m_loc, 3)

    f9T = jax.lax.optimization_barrier(jnp.stack(
        [F[0, 0], F[0, 1], F[0, 2], F[1, 0], F[1, 1], F[1, 2],
         F[2, 0], F[2, 1], F[2, 2]], axis=0))             # (9, m_loc)
    pdt = (jnp.dtype("bfloat16") if cfg.pair_dtype == "bfloat16"
           else jnp.dtype(dtype))
    sr_packed = gathered_source(
        [c.astype(pdt) for c in
         (S[0, 0], S[0, 1], S[0, 2], S[1, 1], S[1, 2], S[2, 2],
          R[0, 0], R[1, 0], R[2, 0], R[0, 1], R[1, 1], R[2, 1],
          R[0, 2], R[1, 2], R[2, 2])], 16)
    for b in lbuckets:
        mb = b.n_tiles * rows
        f9T_b = jax.lax.slice_in_dim(
            f9T, b.tile_start * rows, b.tile_start * rows + mb, axis=1)
        f_parts.append(forces_warp_packed_v4(
            b.restT_rows, b.static_slab, f9T_b, sr_packed, b.gidx8,
            cfg.h, interpret, chunks=_chunks_for(b.slab_len),
        ))
    termjT = jnp.concatenate(f_parts, axis=1)             # (3, m_loc)
    f_comp = [
        0.5 * vol_m * (termjT[a]
                       + sum(M[a, b_] * rs6T_loc[3 + b_] for b_ in range(3)))
        for a in range(3)
    ]
    return jnp.stack(f_comp, axis=1)


def sparse_sharded_episode(x, scene: Scene, cfg: SimConfig, target_p, target_v,
                           mesh, n_steps=None, interpret=None, halo=False):
    """Full sharded episode.  Returns (loss, (final_pos, final_vel)) with the
    state arrays in GLOBAL body-slot order (m, 3).  Differentiable wrt ``x``.

    ``x``/targets are given in global slot space ((n_slots,) / (T, n_slots, 3)
    like the single-chip path); the trailing empty group is sliced off here.

    ``halo=True``: exchange only boundary groups via ring ppermute rounds
    (build_halo_plan) instead of all-gathering the full packed sources —
    per-eval comm drops from O(m) to O(boundary), the scaling regime for
    chips >> 8 or small per-chip slabs.
    """
    from ..ops.pallas.pair_kernels import _interpret_default
    from ..ops.collision import ground_penalty

    interpret = _interpret_default() if interpret is None else interpret
    sb: SparseBlocked = scene.blocked
    n_steps = cfg.frames if n_steps is None else n_steps
    m = sb.n_tiles * sb.rows
    if halo:
        plan, stacked, meta = build_halo_plan(sb)
    else:
        plan, (stacked, meta) = None, stack_shard_buckets(sb)
    mats = jax.tree.map(lambda a: a[:m], scene.materials)
    rest_m = scene.rest_position[:m]
    rs6T = sb.rs6T
    rest_corr = scene.rest_corr  # (3, 3, m) lane-packed
    x_m = x[:m]
    tp_m = target_p[:, :m]
    tv_m = target_v[:, :m]
    n_targets = target_p.shape[0]
    interval = max(n_steps // n_targets, 1)
    obstacles = scene.obstacles
    contact = scene.contact
    m_loc = m // sb.n_shards
    if contact is not None and contact.exclude is not None:
        # shard the (slot-space) exclude table rows alongside the state
        contact_excl = contact.exclude[:m]
        contact = dataclasses.replace(contact, exclude=None)
    else:
        contact_excl = None

    pspec = P(AXIS)
    pspec2 = P(AXIS, None)
    bucket_specs = [
        {k: P(AXIS, *([None] * (v.ndim - 1))) for k, v in leaves.items()}
        for leaves in stacked
    ]
    mats_spec = Materials(mass=pspec, volume=pspec, mu=pspec, lam=pspec,
                          free=pspec2, external=pspec2)
    # obstacle params are tiny and identical everywhere: fully replicated
    obst_spec = jax.tree.map(lambda _: P(), obstacles)
    contact_spec = jax.tree.map(lambda _: P(), contact)
    send_idx = plan.send_idx if plan is not None else ()

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(pspec, P(None, AXIS, None), P(None, AXIS, None),
                  bucket_specs, mats_spec, pspec2, P(None, AXIS),
                  P(None, None, AXIS), obst_spec, contact_spec,
                  jax.tree.map(lambda _: pspec2, contact_excl),
                  tuple(pspec2 for _ in send_idx)),
        out_specs=(P(), (pspec2, pspec2)),
        check_vma=False,  # pallas_call out_shapes carry no vma annotation
    )
    def run(x_loc, tp_loc, tv_loc, stacked_loc, lmats, rest_loc, rs6T_loc,
            rc_loc, obst, cgrid, cexcl_loc, send_idx_loc):
        lbuckets = _local_buckets(stacked_loc, meta)
        ratio_loc = compute_ratio(x_loc, cfg)
        halo_arg = (plan, send_idx_loc) if plan is not None else None

        def elastic(pos):
            return _elastic_local(pos, ratio_loc, lmats, lbuckets, rs6T_loc,
                                  rc_loc, cfg, interpret, halo=halo_arg)

        def total_force(pos, vel, f_el):
            f = lmats.external + f_el - cfg.damping * vel
            if cfg.collision:
                f = f + ground_penalty(pos, cfg)
            if obst is not None:
                from ..ops.obstacles import penalty_force

                f = f + penalty_force(obst, pos)
            if cgrid is not None:
                from ..ops.contact import contact_forces_query

                # bin the all-gathered global positions, query only the
                # local rows; the remote side of each boundary pair is
                # enumerated symmetrically by its owner shard
                pos_all = jax.lax.all_gather(pos, AXIS, axis=0, tiled=True)
                gid0 = jax.lax.axis_index(AXIS) * m_loc
                f = f + contact_forces_query(pos_all, pos, gid0, cgrid,
                                             exclude_q=cexcl_loc)
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

    return run(x_m, tp_m, tv_m, stacked, mats, rest_m, rs6T, rest_corr,
               obstacles, contact, contact_excl, send_idx)


def sparse_sharded_value_and_grad(scene: Scene, cfg: SimConfig, mesh,
                                  n_steps=None, interpret=None, halo=False):
    """jit'd (loss, dloss/dx) over the sharded episode — the multi-chip
    training step for the flagship backend."""

    def f(x, tp, tv):
        loss, _ = sparse_sharded_episode(x, scene, cfg, tp, tv, mesh,
                                         n_steps=n_steps, interpret=interpret,
                                         halo=halo)
        return loss

    grad_fn = jax.value_and_grad(f)

    @jax.jit
    def run(x, tp, tv):
        loss, g_m = grad_fn(x, tp, tv)
        # grad of the (inert) trailing empty group is identically zero
        g = jnp.zeros(scene.blocked.n_slots, g_m.dtype).at[:g_m.shape[0]].set(g_m)
        return loss, g

    return run
