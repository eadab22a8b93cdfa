"""Dynamic particle-particle contact via on-device re-binning.

The reference's neighbor structure is STATIC: its hash grid is built once over
rest positions and every kernel queries at rest coordinates
(/root/reference/sim.py:123-127,161,178,203,224), so elasticity topology never
changes.  That contract covers reference parity — but self-contact and
inter-body contact need CURRENT-position neighbors, which the reference simply
cannot express (SURVEY.md §7 step 7).

This module re-bins particles on the TPU every evaluation, entirely inside
``jit`` (and inside the episode ``lax.scan``):

  cell keys -> ``jnp.argsort`` (one device sort)
            -> per-cell windows via two ``searchsorted`` per 3x3x3 offset
            -> fixed-cap candidate gathers (static shapes)
            -> short-range quadratic penalty forces.

Everything is statically shaped; gradients flow through the gathered position
VALUES (the sort indices are piecewise-constant, as usual for neighbor lists).
Pairs are enumerated once per unordered pair per side (i gathers j and j
gathers i), so the force field is antisymmetric by construction.

Out-of-range particles (e.g. the far-grid padding slots of blocked/sparse
scenes) get a sentinel key that sorts past every real cell and is never
queried — they can neither receive nor exert contact forces.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["lo", "exclude"],
    meta_fields=["cell", "dims", "cap", "r_c", "stiffness"],
)
@dataclasses.dataclass(frozen=True)
class ContactGrid:
    """Static contact-grid spec (bounds fixed at trace time).

    cell >= r_c so the 27-cell stencil covers the interaction radius.
    ``cap`` bounds how many particles per cell are considered; cells holding
    more silently drop candidates — size the grid so occupancy stays under it
    (check with :func:`max_occupancy`).

    ``exclude``: optional (N, K) int32 table of pairs contact must SKIP —
    normally the static rest-elasticity neighbors, which the elastic model
    already couples (repelling them would fight the constitutive model at
    rest spacing).  Contact then acts only on NEW proximity, exactly the case
    static rest topology cannot see.
    """

    lo: jnp.ndarray          # (3,) grid origin
    cell: float
    dims: tuple              # (gx, gy, gz)
    cap: int
    r_c: float               # contact radius
    stiffness: float
    exclude: jnp.ndarray | None = None


def build_contact_grid(lo, hi, r_c, cap=16, stiffness=3e5,
                       cell_scale=1.0, exclude=None) -> ContactGrid:
    """Grid covering [lo, hi] with cell = r_c * cell_scale (>= r_c)."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    cell = float(r_c) * float(cell_scale)
    dims = tuple(int(d) for d in np.maximum(np.ceil((hi - lo) / cell), 1))
    return ContactGrid(lo=jnp.asarray(lo, jnp.float32), cell=cell, dims=dims,
                       cap=int(cap), r_c=float(r_c), stiffness=float(stiffness),
                       exclude=None if exclude is None
                       else jnp.asarray(exclude, jnp.int32))


def _keys(pos, grid: ContactGrid):
    """Linear cell key per particle; out-of-grid -> sentinel n_cells."""
    gx, gy, gz = grid.dims
    q = jnp.floor((pos - grid.lo.astype(pos.dtype)) / grid.cell).astype(jnp.int32)
    inb = jnp.all((q >= 0) & (q < jnp.asarray([gx, gy, gz])), axis=-1)
    q = jnp.clip(q, 0, jnp.asarray([gx - 1, gy - 1, gz - 1]))
    key = (q[:, 0] * gy + q[:, 1]) * gz + q[:, 2]
    n_cells = gx * gy * gz
    return jnp.where(inb, key, n_cells), q, inb


def _pair_force(dx, grid: ContactGrid):
    """Quadratic penalty f_i += k (r_c - r)^2 dx/r for r < r_c (dx = x_i - x_j)."""
    r2 = jnp.sum(dx * dx, axis=-1)
    r = jnp.sqrt(jnp.maximum(r2, 1e-30))
    depth = jnp.maximum(grid.r_c - r, 0.0)
    mag = grid.stiffness * depth * depth / r
    # r -> 0 (self/coincident) gives depth = r_c but is masked by callers
    return mag[..., None] * dx


def contact_forces(pos, grid: ContactGrid, exclude=None, with_overflow=False):
    """(N, 3) contact forces from current positions, re-binned on device.

    ``exclude``: optional (N, K) int32 neighbor table whose pairs are skipped
    (defaults to ``grid.exclude``; see :class:`ContactGrid`).

    ``with_overflow``: also return a scalar bool that is True when any queried
    cell holds more than ``cap`` particles — i.e. when candidates were DROPPED
    and the force field is incomplete.  The occupancy comes from the
    start/end windows the enumeration already computes, so the check is free;
    callers surface it (see sim/rollout.total_force's debug callback).  The
    cap itself cannot grow inside ``jit`` (static shapes) — on overflow
    rebuild the grid with a larger ``cap``/smaller ``cell_scale``.
    """
    if exclude is None:
        exclude = grid.exclude
    return contact_forces_query(pos, pos, 0, grid, exclude_q=exclude,
                                with_overflow=with_overflow)


def contact_forces_query(pos_all, pos_q, gid_offset, grid: ContactGrid,
                         exclude_q=None, with_overflow=False):
    """Contact forces on a QUERY subset against the full particle set.

    ``pos_all``: (N, 3) all positions (the bin structure); ``pos_q``: (nq, 3)
    query positions — row i is global particle ``gid_offset + i`` (used for
    self-exclusion; candidate ids are global).  This is the shard-local form:
    each shard bins the all-gathered positions once and queries only its own
    rows, so per-shard work is O(nq * cap) not O(N * cap)
    (parallel/sparse_shard.py).  ``exclude_q``: (nq, K) global-id table of
    pairs to skip."""
    n = pos_all.shape[0]
    nq = pos_q.shape[0]
    gx, gy, gz = grid.dims
    key, _, _ = _keys(pos_all, grid)
    _, q, inb = _keys(pos_q, grid)
    order = jnp.argsort(key)
    skey = key[order]

    f = jnp.zeros_like(pos_q)
    overflow = jnp.zeros((), bool)
    gid_q = gid_offset + jnp.arange(nq, dtype=jnp.int32)
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                qq = q + jnp.asarray([ox, oy, oz])
                valid = inb & jnp.all(
                    (qq >= 0) & (qq < jnp.asarray([gx, gy, gz])), axis=-1)
                nkey = (qq[:, 0] * gy + qq[:, 1]) * gz + qq[:, 2]
                nkey = jnp.where(valid, nkey, gx * gy * gz)
                start = jnp.searchsorted(skey, nkey, side="left")
                end = jnp.searchsorted(skey, nkey, side="right")
                if with_overflow:
                    overflow |= jnp.any(valid & (end - start > grid.cap))
                # (nq, cap) candidate slots in sorted order
                slots = start[:, None] + jnp.arange(grid.cap)[None, :]
                live = slots < end[:, None]
                cand = order[jnp.clip(slots, 0, n - 1)]          # (nq, cap)
                mask = live & (cand != gid_q[:, None]) & valid[:, None]
                if exclude_q is not None:
                    mask &= ~jnp.any(
                        cand[:, :, None] == exclude_q[:, None, :], axis=-1)
                dx = pos_q[:, None, :] - pos_all[cand]            # (nq, cap, 3)
                fp = _pair_force(dx, grid)
                f = f + jnp.sum(jnp.where(mask[..., None], fp, 0.0), axis=1)
    if with_overflow:
        return f, overflow
    return f


def contact_forces_allpairs(pos, grid: ContactGrid, exclude=None):
    """O(N^2) oracle with the identical pair force law (tests only)."""
    if exclude is None:
        exclude = grid.exclude
    n = pos.shape[0]
    _, _, inb = _keys(pos, grid)
    dx = pos[:, None, :] - pos[None, :, :]
    r2 = jnp.sum(dx * dx, axis=-1)
    mask = (r2 < grid.r_c * grid.r_c) & ~jnp.eye(n, dtype=bool)
    mask &= inb[:, None] & inb[None, :]
    if exclude is not None:
        idx_j = jnp.arange(n)
        mask &= ~jnp.any(idx_j[None, :, None] == exclude[:, None, :], axis=-1)
    fp = _pair_force(dx, grid)
    return jnp.sum(jnp.where(mask[..., None], fp, 0.0), axis=1)


def max_occupancy(pos, grid: ContactGrid):
    """Max particles in any cell — must stay <= cap for exact enumeration."""
    key, _, inb = _keys(pos, grid)
    gx, gy, gz = grid.dims
    counts = jnp.zeros(gx * gy * gz + 1, jnp.int32).at[key].add(1)
    return jnp.max(counts[:-1])
