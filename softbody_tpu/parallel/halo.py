"""Explicit halo exchange over the particle mesh (shard_map + ppermute).

The baseline sharding path (parallel/sharding.py) lets XLA turn neighbor
gathers over sharded operands into all-gathers — correct, but it moves every
particle to every chip.  Static rest topology means each shard's remote
neighbor rows ("halo") are known at trace time (SURVEY.md §2c), so this module
builds the plan on the host and runs the exchange explicitly:

* particles are spatially sorted (Morton) before partitioning so halos come
  from nearby shards;
* for each hop distance k (1..hops), every shard sends exactly the rows its
  k-th ring neighbor needs via two ``ppermute`` rotations (left + right) — all
  traffic rides ICI;
* neighbor indices are remapped into the local+halo address space, so the
  per-shard physics is a dense local gather.

``plan.hops`` measures topology quality: 1 for well-sorted bodies; the builder
falls back toward all-gather-like behavior (hops ~ D/2) only if the sort is
poor.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import AXIS


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["send_idx", "local_idx"],
    meta_fields=["n_devices", "shard", "halo", "hops"],
)
@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Static halo-exchange plan.

    send_idx:  (D, 2*hops, H) local row indices each device contributes to the
               ring buffer headed for its (hop, direction) neighbor.
    local_idx: (D, shard, K) neighbor table remapped into the local+halo
               address space: [0, shard) local rows, then hop/direction halo
               blocks of H rows each.
    """

    send_idx: jnp.ndarray
    local_idx: jnp.ndarray
    n_devices: int
    shard: int
    halo: int          # H: padded rows per (hop, direction) block
    hops: int

    @property
    def ext(self) -> int:
        return self.shard + 2 * self.hops * self.halo


def build_halo_plan(idx: np.ndarray, n_devices: int) -> HaloPlan:
    """Build the plan from a global (N, K) neighbor table (N % D == 0)."""
    idx = np.asarray(idx)
    n, K = idx.shape
    assert n % n_devices == 0, "pad the scene first"
    shard = n // n_devices
    owner = idx // shard                                 # (N, K) owner device

    # required remote rows per (device, signed hop)
    needed = {}
    max_hop = 0
    for d in range(n_devices):
        rows = idx[d * shard:(d + 1) * shard]
        own = owner[d * shard:(d + 1) * shard]
        for e in np.unique(own):
            if e == d:
                continue
            hop = int(e - d)
            max_hop = max(max_hop, abs(hop))
            needed[(d, hop)] = np.unique(rows[own == e])
    hops = max(max_hop, 1)
    halo = max(
        (len(v) for v in needed.values()), default=1
    )
    halo = ((halo + 7) // 8) * 8

    send_idx = np.zeros((n_devices, 2 * hops, halo), dtype=np.int64)
    recv_rows = {}
    for d in range(n_devices):
        for b in range(2 * hops):
            # block b: hop k = b//2 + 1; even b receives from device d+k,
            # odd b from device d-k.  Hops do not wrap (owners are raw device
            # indices); out-of-range sources leave padding the receiver never
            # references and a zero send table on the (wrapped) sender.
            k = b // 2 + 1
            src = d + k if b % 2 == 0 else d - k
            if 0 <= src < n_devices:
                rows = needed.get((d, src - d), np.zeros(0, dtype=np.int64))
                pad = np.full(halo, src * shard, dtype=np.int64)  # benign dup row
                pad[: len(rows)] = rows
                recv_rows[(d, b)] = pad
                # the source device fills its send buffer with these rows
                send_idx[src, b] = pad - src * shard
            else:
                recv_rows[(d, b)] = np.zeros(0, dtype=np.int64)

    # remap global idx -> local+halo addresses per device (vectorized:
    # first-occurrence unique over the concatenated receive blocks plays the
    # role of dict.setdefault, then one searchsorted lookup per device)
    local_idx = np.zeros((n_devices, shard, K), dtype=np.int64)
    for d in range(n_devices):
        keys, vals = [np.zeros(0, np.int64)], [np.zeros(0, np.int64)]
        for b in range(2 * hops):
            g = recv_rows[(d, b)]
            keys.append(np.asarray(g, np.int64))
            vals.append(shard + b * halo + np.arange(len(g), dtype=np.int64))
        keys = np.concatenate(keys)
        vals = np.concatenate(vals)
        uk, first = np.unique(keys, return_index=True)
        uv = vals[first]
        rows = idx[d * shard:(d + 1) * shard]
        own = owner[d * shard:(d + 1) * shard]
        pos = np.clip(np.searchsorted(uk, rows), 0, max(len(uk) - 1, 0))
        mapped = uv[pos] if len(uk) else np.zeros_like(rows)
        local_idx[d] = np.where(own == d, rows - d * shard, mapped)

    return HaloPlan(
        send_idx=jnp.asarray(send_idx, jnp.int32),
        local_idx=jnp.asarray(local_idx, jnp.int32),
        n_devices=n_devices,
        shard=shard,
        halo=halo,
        hops=hops,
    )


def exchange(local, plan: HaloPlan, axis: str = AXIS):
    """Inside shard_map: (shard, F) per-device block -> (ext, F) local+halo.

    Per (hop, direction) block: every device fills a send buffer with the rows
    its ring neighbor needs, then one collective_permute rotates the buffers.
    """
    d = jax.lax.axis_index(axis)
    D = plan.n_devices
    parts = [local]
    for b in range(2 * plan.hops):
        k = b // 2 + 1
        rows = jnp.take(plan.send_idx[d, b], jnp.arange(plan.halo), axis=0)
        buf = jnp.take(local, rows, axis=0)              # (H, F)
        if b % 2 == 0:
            perm = [((i + k) % D, i) for i in range(D)]   # from d+k to d
        else:
            perm = [((i - k) % D, i) for i in range(D)]   # from d-k to d
        parts.append(jax.lax.ppermute(buf, axis, perm))
    return jnp.concatenate(parts, axis=0)


def halo_gather(arr_sharded, plan: HaloPlan, mesh: Mesh, fn):
    """Run ``fn(local_ext, local_idx_d)`` under shard_map with halo exchange.

    arr_sharded: (N, F) particle-sharded.  fn receives the (ext, F) local+halo
    block and this device's remapped (shard, K) neighbor table; must return a
    (shard, ...) per-device result.
    """
    from jax import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS, None), P()),
        out_specs=P(AXIS, None),
        check_vma=False,
    )
    def run(block, plan_):
        d = jax.lax.axis_index(AXIS)
        ext = exchange(block, plan_)
        return fn(ext, plan_.local_idx[d])

    return run(arr_sharded, plan)


def elastic_forces_halo(pos_sharded, ratio_sharded, scene, plan: HaloPlan,
                        mesh: Mesh, cfg):
    """Full elastic-force evaluation with explicit halo exchanges.

    The gather-backend physics (ops/elasticity.py) restructured for shard_map:
    two exchanges per evaluation — positions before the moment/deformation
    stage, and the per-particle force operands (G, or S|R in Warp mode) before
    the pair-force contraction.  All per-row tables ride in sharded along the
    particle axis; only the ring buffers move between chips.

    Returns the (N, 3) particle-sharded elastic forces; numerically identical
    to the dense single-device path (tested on the CPU mesh).
    """
    from jax import shard_map

    from ..ops import mat3
    from ..sim.blocked import stvk_stress_m3

    topo = scene.topology
    mats = scene.materials
    K = topo.idx.shape[1]
    D = plan.n_devices

    # per-row static tables, passed in particle-sharded
    tables = (topo.c, topo.vj, topo.nw, topo.xji, topo.rest_corr, topo.sum_v_nw)
    mat_args = (mats.mu, mats.lam, mats.volume)
    li = plan.local_idx.reshape(D * plan.shard, K)  # shard along axis 0

    specs_in = (
        P(AXIS, None),                  # pos
        P(AXIS),                        # ratio
        tuple(P(AXIS) if a.ndim == 1 else P(AXIS, *([None] * (a.ndim - 1)))
              for a in tables),
        tuple(P(AXIS) for _ in mat_args),
        P(AXIS, None),                  # local_idx rows
        P(),                            # plan (send tables replicated)
    )

    @partial(shard_map, mesh=mesh, in_specs=specs_in,
             out_specs=P(AXIS, None), check_vma=False)
    def run(pos, ratio, tabs, mat_a, lidx, plan_):
        c, vj, nw, xji, rest_corr, sum_v_nw = tabs
        mu, lam, volume = mat_a
        ext_pos = exchange(pos, plan_)
        pj = jnp.take(ext_pos, lidx, axis=0)              # (shard, K, 3)
        pji = pj - pos[:, None, :]
        A4 = jnp.einsum("ik,ika,ikb->iab", c, pji, xji)
        Y4 = jnp.einsum("ik,ika,ikb->iab", vj, pji, nw)
        A = mat3.from_trailing(A4)
        Y = mat3.from_trailing(Y4)
        if cfg.corotated:
            R = mat3.polar3(A)
            nab = mat3.matTmul3(R, Y) - mat3.from_trailing(rest_corr)
        else:
            R = mat3.eye3(A)
            nab = Y - mat3.from_trailing(rest_corr)
        F = mat3.eye3(A) + mat3.transpose3(nab)
        scale = cfg.stiffness_scale(ratio)
        S = stvk_stress_m3(F, mu, lam, scale)
        M = mat3.matmul3(R, mat3.matmul3(F, S))

        if cfg.pair_def_grad == "j":
            G = volume * M                                 # V_k M_k
            ext_G = exchange(mat3.to_trailing(G).reshape(-1, 9), plan_)
            Gj = jnp.take(ext_G, lidx, axis=0).reshape(-1, K, 3, 3)
            term_j = jnp.einsum("ikab,ikb->ia", Gj, nw)
        else:
            SR = jnp.concatenate(
                [mat3.to_trailing(S).reshape(-1, 9),
                 mat3.to_trailing(R).reshape(-1, 9),
                 volume[:, None]], axis=1)
            ext_SR = exchange(SR, plan_)
            picked = jnp.take(ext_SR, lidx, axis=0)        # (shard, K, 19)
            Sj = picked[..., :9].reshape(-1, K, 3, 3)
            Rj = picked[..., 9:18].reshape(-1, K, 3, 3)
            Vj_dyn = picked[..., 18]
            Ft = mat3.to_trailing(F)
            y = jnp.einsum("iab,ikbc,ikc->ika", Ft, Sj, nw)
            term_j = jnp.einsum("ik,ikab,ikb->ia", Vj_dyn, Rj, y)
        term_i = jnp.einsum("iab,ib->ia",
                            mat3.to_trailing(M), sum_v_nw)
        return 0.5 * volume[:, None] * (term_j + term_i)

    sh = lambda a: jax.device_put(
        a, NamedSharding(mesh, P(AXIS, *([None] * (a.ndim - 1)))))
    return run(
        pos_sharded, ratio_sharded,
        tuple(sh(a) for a in tables),
        tuple(sh(a) for a in mat_args),
        sh(li), plan,
    )


def halo_rollout(x_sharded, scene, plan: HaloPlan, mesh: Mesh, cfg,
                 target_p=None, target_v=None, n_steps=None):
    """Episode rollout whose elastic forces run through the halo exchange.

    The integrator, loss and accumulator are sim.rollout's OWN ``step`` /
    ``_episode_body`` (including the Neumaier compensated loss pair) — only
    the per-step force evaluation is swapped for :func:`elastic_forces_halo`
    via the ``elastic_fn`` hook, so step semantics cannot drift between the
    dense and SPMD paths.  State and x stay particle-sharded for the whole
    episode.  Returns (loss, final_state).
    """
    from functools import partial as _partial

    from ..ops.elasticity import compute_ratio
    from ..sim.rollout import (_acc_init, _episode_body, acc_scalar,
                               initial_state, step)

    n_steps = cfg.frames if n_steps is None else n_steps
    ratio = compute_ratio(x_sharded, cfg)

    def elastic(pos):
        return elastic_forces_halo(pos, ratio, scene, plan, mesh, cfg)

    state0 = initial_state(scene, ratio, cfg, elastic_fn=elastic)
    step_fn = _partial(step, scene=scene, cfg=cfg, elastic_fn=elastic)
    if cfg.remat:
        step_fn = jax.checkpoint(step_fn)

    if target_p is not None:
        interval = max(n_steps // target_p.shape[0], 1)
        body = _episode_body(step_fn, ratio, target_p, target_v, cfg,
                             n_steps, interval)
    else:
        def body(carry, f):
            state, acc = carry
            return (step_fn(state, ratio), acc), None

    (state, acc), _ = jax.lax.scan(
        body, (state0, _acc_init(scene.rest_position.dtype)),
        jnp.arange(n_steps))
    return acc_scalar(acc), state
