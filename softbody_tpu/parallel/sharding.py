"""Particle sharding over a 1-D device mesh.

The reference has NO distributed capability (SURVEY.md §2c: single ``device="cuda"``
everywhere).  This module is the TPU-native scaling layer it lacks: particles are
sharded over a ``jax.sharding.Mesh`` axis ``"p"`` (the data-parallel analog — each
chip owns a particle slab), and the episode stays inside one ``jit`` so XLA
inserts the collectives (gathers of neighbor state ride ICI).

Static rest topology means cross-shard neighbor indices are known at trace time;
the baseline strategy here lets XLA turn ``jnp.take`` over a sharded operand into
all-gathers.  A ``shard_map`` halo-exchange variant (precomputed per-shard halo
index tables, ``ppermute`` rings) is layered on top in ``halo.py``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..core.types import Materials, Scene, Topology

AXIS = "p"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D particle mesh over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def particle_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (particles) over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leaf(a, mesh: Mesh):
    return jax.device_put(a, particle_sharding(mesh, a.ndim))


def shard_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Place every per-particle leaf with particle sharding.

    Requires N to be a multiple of the mesh size — use :func:`pad_scene` first.
    Gather-backend scenes only; blocked/sparse scenes shard by column groups
    (see sim/sparse.py docs) and are rejected with a typed error rather than
    silently dropping fields.  Every ``Scene`` field is handled explicitly.
    """
    if scene.blocked is not None:
        raise NotImplementedError(
            "shard_scene handles gather-backend scenes; blocked/sparse scenes "
            "shard by column groups — build per-shard scenes with "
            "parallel.halo / build_sparse_scene instead"
        )
    n = scene.rest_position.shape[0]
    n_dev = mesh.devices.size
    if n % n_dev != 0:
        raise ValueError(f"n_particles={n} not divisible by mesh size {n_dev}; pad_scene first")

    def put(leaf):
        return shard_leaf(leaf, mesh)

    # rest_corr on gather scenes is (3, 3, m): particle axis LAST
    rest_corr = scene.rest_corr
    if rest_corr is not None:
        rest_corr = jax.device_put(
            rest_corr, NamedSharding(mesh, P(None, None, AXIS)))
    return Scene(
        rest_position=put(scene.rest_position),
        materials=jax.tree.map(put, scene.materials),
        topology=jax.tree.map(put, scene.topology),
        out_num=scene.out_num,
        blocked=None,
        rest_corr=rest_corr,
        slot_of_particle=(None if scene.slot_of_particle is None
                          else put(scene.slot_of_particle)),
        # obstacle SDFs / contact grids are small per-scene constants: replicate
        obstacles=(None if scene.obstacles is None else jax.tree.map(
            lambda a: jax.device_put(a, replicated(mesh)), scene.obstacles)),
        contact=(None if scene.contact is None else jax.tree.map(
            lambda a: jax.device_put(a, replicated(mesh)), scene.contact)),
    )


def pad_scene(scene: Scene, multiple: int, cfg: SimConfig):
    """Pad with inert particles so N is a multiple of ``multiple``.

    Pad particles are fully decoupled: no neighbors (mask 0), Dirichlet-frozen
    (free = 0), zero material coupling, parked far above the ground plane so the
    collision penalty never fires.  Returns (padded_scene, n_original).
    Loss parity with the unpadded scene needs matching padded targets —
    :func:`pad_targets`.
    """
    if scene.blocked is not None:
        raise NotImplementedError(
            "pad_scene handles gather-backend scenes; blocked/sparse slot "
            "spaces are already padded to tile multiples at build time"
        )
    n = scene.rest_position.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return scene, n
    dtype = scene.rest_position.dtype
    K = scene.topology.idx.shape[1]

    def cat(a, value, shape_tail=()):
        filler = jnp.full((pad,) + shape_tail, value, dtype=a.dtype)
        return jnp.concatenate([a, filler], axis=0)

    rest = cat(scene.rest_position, 0.0, (3,)).at[n:, 1].set(1e3)
    pad_idx = jnp.tile(jnp.arange(n, n + pad, dtype=jnp.int32)[:, None], (1, K))
    m = scene.materials
    mats = Materials(
        mass=cat(m.mass, 1.0),
        volume=cat(m.volume, 1.0),
        mu=cat(m.mu, 0.0),
        lam=cat(m.lam, 0.0),
        free=cat(m.free, 0.0, (3,)),
        external=cat(m.external, 0.0, (3,)),
    )
    t = scene.topology
    topo = Topology(
        idx=jnp.concatenate([t.idx, pad_idx], axis=0),
        mask=cat(t.mask, 0.0, (K,)),
        w=cat(t.w, 0.0, (K,)),
        nw=cat(t.nw, 0.0, (K, 3)),
        xji=cat(t.xji, 0.0, (K, 3)),
        c=cat(t.c, 0.0, (K,)),
        vj=cat(t.vj, 0.0, (K,)),
        sum_c_xji=cat(t.sum_c_xji, 0.0, (3,)),
        rest_corr=cat(t.rest_corr, 0.0, (3, 3)),
        sum_v_nw=cat(t.sum_v_nw, 0.0, (3,)),
    )
    return Scene(rest, mats, topo, scene.out_num,
                 obstacles=scene.obstacles, contact=scene.contact), n


def pad_targets(target_p, target_v, padded_scene: Scene, n_orig: int, cfg: SimConfig):
    """Pad target trajectories so padded particles contribute exactly zero loss:
    pad target position = pad rest position (frozen), pad target velocity =
    initial velocity (free=0 keeps velocity at its startup value)."""
    n_pad = padded_scene.rest_position.shape[0] - n_orig
    if n_pad == 0:
        return target_p, target_v
    rest_pad = padded_scene.rest_position[n_orig:]
    tp_pad = jnp.broadcast_to(rest_pad, (target_p.shape[0],) + rest_pad.shape)
    v0 = jnp.asarray(cfg.initial_velocity, dtype=target_v.dtype)
    tv_pad = jnp.broadcast_to(v0, (target_v.shape[0], n_pad, 3))
    return (
        jnp.concatenate([target_p, tp_pad], axis=1),
        jnp.concatenate([target_v, tv_pad], axis=1),
    )


def pad_x(x, padded_scene: Scene, n_orig: int):
    n_pad = padded_scene.rest_position.shape[0] - n_orig
    if n_pad == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((n_pad,), dtype=x.dtype)])
