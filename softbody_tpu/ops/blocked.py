"""Blocked (column-dense slot) physics path — XLA reference implementation.

Builds on topology/blocks.py: state lives in "slot space" (real particles
scattered into cell slots, empty slots inert), per-tile neighbor slabs are 9
contiguous slot runs fetched with one gather-of-slices, and all SPH pair
coefficients are recomputed from rest geometry — no index tables in the hot
loop.

This module is the *differentiable XLA reference* for the Pallas kernels in
ops/pallas/: identical math on materialized (n_tiles, rows, slab) tensors.
It is memory-hungry (materializes pair tensors) but correct and autodiff-able —
the golden oracle for kernel tests, and a usable fallback backend.

Empty slots: rest position on a far-away grid (pairwise > 2h apart, > 2h from
the body), mass 0, volume 0 — every pair term vanishes through w = grad_w = 0.
Self-pairs are excluded by rest-distance == 0 (rest positions deduplicated).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..topology.blocks import SlotLayout, build_slot_layout


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "tile_start", "slab_start", "rest_slab", "vol_slab", "mass_slab",
        "rest_rows", "restT_rows", "static_slab", "gidx8", "gidx4", "rs6",
    ],
    meta_fields=["rows", "slab_len", "run_len", "n_tiles", "n_slots"],
)
@dataclasses.dataclass(frozen=True)
class Blocked:
    """Device-side blocked topology (static slab data pregathered)."""

    tile_start: jnp.ndarray   # (n_tiles,) int32 first slot row of each tile
    slab_start: jnp.ndarray   # (n_tiles, 9) int32 slab run starts
    rest_slab: jnp.ndarray    # (n_tiles, slab, 3) rest positions of slab slots
    vol_slab: jnp.ndarray     # (n_tiles, slab) volumes of slab slots
    mass_slab: jnp.ndarray    # (n_tiles, slab) masses of slab slots
    rest_rows: jnp.ndarray    # (n_tiles, rows, 3) rest positions of tile rows
    restT_rows: jnp.ndarray   # (n_tiles, 3, rows) transposed (Pallas pair tensors)
    static_slab: jnp.ndarray | None  # (n_tiles, 5, slab) [restT_3 | mass | vol]
                              # fused Pallas static operand (built after volume)
    gidx8: jnp.ndarray        # (n_tiles, slab/8)  packed-row indices (pos/G, 16f/slot)
    gidx4: jnp.ndarray        # (n_tiles, slab/4)  packed-row indices (S|R, 32f/slot)
    rs6: jnp.ndarray | None   # (n_tiles*rows, 6) static moment row sums (build-time)
    rows: int                 # tz * C slot rows per tile
    slab_len: int             # 9 * run_len
    run_len: int
    n_tiles: int
    n_slots: int


def far_grid(n: int, start: float, spacing: float) -> np.ndarray:
    """n unique positions, pairwise >= spacing apart, far from the body."""
    k = int(np.ceil(n ** (1.0 / 3.0))) + 1
    ax = np.arange(k, dtype=np.float64) * spacing
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), axis=-1).reshape(-1, 3)
    return g[:n] + start


def gather_slab(arr, blocked: Blocked):
    """(n_slots, F) or (n_slots,) -> (n_tiles, slab_len, [F]) via 9 contiguous
    dynamic slices per tile (XLA gather-of-slices; differentiable)."""
    squeeze = arr.ndim == 1
    if squeeze:
        arr = arr[:, None]
    F = arr.shape[1]
    starts = blocked.slab_start.reshape(-1)  # (n_tiles * 9,)

    def one(s):
        return jax.lax.dynamic_slice(arr, (s, jnp.zeros((), s.dtype)), (blocked.run_len, F))

    runs = jax.vmap(one)(starts)                        # (T*9, run, F)
    out = runs.reshape(blocked.n_tiles, blocked.slab_len, F)
    return out[..., 0] if squeeze else out


def gather_slabT(arrT, blocked: Blocked):
    """(F, n_slots) -> (n_tiles, F, slab_len): transposed slab gather.

    Slices run along the minor (slot) axis and concatenate along lanes — no
    transposes; use when a slab is needed as lane vectors inside a kernel."""
    F = arrT.shape[0]

    def one_tile(starts9):
        return jnp.concatenate(
            [
                jax.lax.dynamic_slice(
                    arrT, (jnp.zeros((), starts9.dtype), starts9[k]), (F, blocked.run_len)
                )
                for k in range(9)
            ],
            axis=1,
        )

    return jax.vmap(one_tile)(blocked.slab_start)


def gather_rows(arr, blocked: Blocked):
    """(n_slots, F) -> (n_tiles, rows, [F]): the tiles' own row blocks."""
    squeeze = arr.ndim == 1
    if squeeze:
        arr = arr[:, None]
    F = arr.shape[1]

    def one(s):
        return jax.lax.dynamic_slice(arr, (s, jnp.zeros((), s.dtype)), (blocked.rows, F))

    out = jax.vmap(one)(blocked.tile_start)
    return out[..., 0] if squeeze else out


def scatter_rows(tiles, blocked: Blocked):
    """(n_tiles, rows, [F]) -> (n_slots, [F]): inverse of gather_rows
    (tiles partition the slot space except the trailing empty run)."""
    squeeze = tiles.ndim == 2
    if squeeze:
        tiles = tiles[..., None]
    F = tiles.shape[-1]
    flat = tiles.reshape(blocked.n_tiles * blocked.rows, F)
    out = jnp.zeros((blocked.n_slots, F), dtype=tiles.dtype)
    # tile rows are contiguous and ordered: slots [0, n_tiles*rows) are exactly
    # the tiles in order; the empty run sits at the end.
    out = out.at[: blocked.n_tiles * blocked.rows].set(flat)
    return out[..., 0] if squeeze else out


# ------------------------------------------------------------------ pair math
def pair_w_gfac(rest_rows, rest_slab, h, dtype):
    """Per-pair cubic-spline value w and gradient factor gfac with
    grad_W(x_ij) = gfac * x_ij  (x_ij = X_i - X_j).

    rest_rows: (..., rows, 3); rest_slab: (..., slab, 3) ->
    w, gfac: (..., rows, slab).  Self-pairs (r == 0) get w = gfac = 0.
    """
    dx = rest_rows[..., :, None, :] - rest_slab[..., None, :, :]   # (..., rows, slab, 3)
    r2 = jnp.sum(dx * dx, axis=-1)
    r = jnp.sqrt(r2)
    h = jnp.asarray(h, dtype)
    q = r / h
    c = 1.0 / (jnp.pi * h**3)
    w_near = c * (1.0 - 1.5 * q**2 + 0.75 * q**3)
    w_far = 0.25 * c * (2.0 - q) ** 3
    w = jnp.where(q < 1.0, w_near, jnp.where(q < 2.0, w_far, 0.0))
    # nabla_W = gfac * xij:
    #   q<1:  c*(-3/h^2 + 2.25*q/h^2)
    #   q<2:  -0.75*c*(2-q)^2/(q*h^2)
    g_near = c * (-3.0 + 2.25 * q) / (h * h)
    q_safe = jnp.where(q > 0, q, 1.0)
    g_far = -0.75 * c * (2.0 - q) ** 2 / (q_safe * h * h)
    gfac = jnp.where(q < 1.0, g_near, jnp.where(q < 2.0, g_far, 0.0))
    self_pair = r2 == 0.0
    w = jnp.where(self_pair, 0.0, w)
    gfac = jnp.where(self_pair, 0.0, gfac)
    return dx, w, gfac


def moments_xla(pos_rows, pos_slab, blocked: Blocked, cfg: SimConfig):
    """K1 reference: per-slot A_pq and Y moments.

    A[i] = sum_j (w m_j) (p_j - p_i) (x) (X_j - X_i)      (sim.py:170-183)
    Y[i] = sum_j (V_j)   (p_j - p_i) (x) grad_W(X_ij)     (corotated part of
                                                           sim.py:193-209)
    Returns (A, Y): (n_tiles, rows, 3, 3).
    """
    dtype = pos_rows.dtype
    dx, w, gfac = pair_w_gfac(blocked.rest_rows, blocked.rest_slab, cfg.h, dtype)
    cA = w * blocked.mass_slab[:, None, :]               # (t, rows, slab)
    gv = gfac * blocked.vol_slab[:, None, :]
    dp = pos_slab[:, None, :, :] - pos_rows[:, :, None, :]   # p_j - p_i
    xji = -dx
    A = jnp.einsum("trs,trsa,trsb->trab", cA, dp, xji)
    # Y = sum_j V_j dp (x) nw with nw = gfac * dx  ->  weights gv = gfac * V_j
    Y = jnp.einsum("trs,trsa,trsb->trab", gv, dp, dx)
    return A, Y


def forces_xla(G_rows, G_slab, vol_rows, blocked: Blocked, cfg: SimConfig,
               F_rows=None, S_slab=None, R_slab=None, vol_slab=None):
    """K2 reference: antisymmetrized pair forces (sim.py:218-235).

    Taichi mode (pair_def_grad="j"):
      force_i = 0.5 V_i [ sum_j G_j grad_W(X_ij) + (G_i / V_i) sum_j V_j grad_W(X_ij) ]
      with G_k = V_k R_k F_k S_k, all (t, ., 3, 3).
    Warp mode (pair_def_grad="i"):
      replaces the first term with sum_j V_j R_j (F_i S_j) grad_W(X_ij).
    """
    dtype = G_rows.dtype
    dx, w, gfac = pair_w_gfac(blocked.rest_rows, blocked.rest_slab, cfg.h, dtype)
    nw = gfac[..., None] * dx                              # (t, rows, slab, 3)
    gv = gfac * blocked.vol_slab[:, None, :]
    sum_v_nw = jnp.einsum("trs,trsb->trb", gv, dx)         # sum_j V_j grad_W
    if cfg.pair_def_grad == "j":
        term_j = jnp.einsum("tsab,trsb->tra", G_slab, nw)
    else:
        # V_j R_j (F_i S_j) nw
        FS = jnp.einsum("trab,tsbc->trsac", F_rows, S_slab)       # F_i S_j
        y = jnp.einsum("trsac,trsc->trsa", FS, nw)
        term_j = jnp.einsum("ts,tsab,trsb->tra", vol_slab, R_slab, y)
    vol_safe = jnp.where(vol_rows > 0, vol_rows, 1.0)
    M_rows = G_rows / vol_safe[..., None, None]
    term_i = jnp.einsum("trab,trb->tra", M_rows, sum_v_nw)
    return 0.5 * vol_rows[..., None] * (term_j + term_i)
