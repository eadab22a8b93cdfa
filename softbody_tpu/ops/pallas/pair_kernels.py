"""Fused Pallas TPU pair kernels for the blocked backend.

Two kernels per physics step (SURVEY.md §3.3's three gather-reduce CUDA kernels,
restructured):

* ``moments``: per-tile A_pq and Y moment matrices.  SPH coefficients (w, gfac)
  are recomputed from STATIC rest geometry in VMEM; dynamic positions enter only
  as the RHS of MXU matmuls in their natural (slab, 3) layout — no gathers, no
  transposes, no atomics inside the kernel.
* ``forces``: pair force contraction against the G = V R F S slab (Taichi
  separable mode) or R/S slabs + local F (Warp mode, sim.py:233).

Both are linear (moments/taichi-forces) or bilinear (warp-forces) in their
dynamic inputs, with custom VJPs implemented as Pallas kernels of the same
shape; the slab gather/scatter around them stays in XLA and differentiates
automatically.

Tile shapes: rows = tz*C slot rows, slab = 9*(tz+2)*C.  Pair tensors are
(rows, slab) f32 in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default():
    return jax.default_backend() != "tpu"


def _pair_coeffs(restT_rows, restT_slab, h):
    """Per-pair dx components, kernel value w and gradient factor gfac.

    restT_rows: (3, rows); restT_slab: (3, slab) ->
    dx: 3 x (rows, slab); w, gfac: (rows, slab).  Self-pairs (r == 0) -> 0.
    grad_W(x_ij) = gfac * dx with x_ij = X_i - X_j = dx.
    """
    dx = [restT_rows[b][:, None] - restT_slab[b][None, :] for b in range(3)]
    r2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
    r = jnp.sqrt(r2)
    dtype = r2.dtype
    h = jnp.asarray(h, dtype)
    q = r / h
    c = 1.0 / (jnp.pi * h**3)
    w_near = c * (1.0 - 1.5 * q * q + 0.75 * q * q * q)
    tq = 2.0 - q
    w_far = 0.25 * c * tq * tq * tq
    w = jnp.where(q < 1.0, w_near, jnp.where(q < 2.0, w_far, 0.0))
    g_near = c * (-3.0 + 2.25 * q) / (h * h)
    q_safe = jnp.where(q > 0, q, 1.0)
    g_far = -0.75 * c * tq * tq / (q_safe * h * h)
    gfac = jnp.where(q < 1.0, g_near, jnp.where(q < 2.0, g_far, 0.0))
    live = r2 > 0.0
    w = jnp.where(live, w, 0.0)
    gfac = jnp.where(live, gfac, 0.0)
    return dx, w, gfac


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=a.dtype
    )


def _dot_rows(a, b):
    """Contract the ROWS axis: (rows, slab) x (rows, F) -> (slab, F)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=a.dtype
    )


# ============================================================ moments (K1)
def _moments_kernel(restT_rows_ref, restT_slab_ref, mass_slab_ref, vol_slab_ref,
                    pos_rows_ref, pos_slab_ref, a_ref, y_ref, *, h, runs):
    """Loops over the 9 slab runs so only (rows, run_len) pair tensors are live
    in VMEM (a full (rows, slab) working set overflows VMEM at production
    capacities)."""
    rr = restT_rows_ref[0]          # (3, rows)
    pos_rows = pos_rows_ref[0]      # (rows, 3)
    slab = restT_slab_ref.shape[2]
    L = slab // runs
    a_cols = [None, None, None]
    y_cols = [None, None, None]
    for k in range(runs):
        rs = restT_slab_ref[0, :, k * L:(k + 1) * L]
        dx, w, gfac = _pair_coeffs(rr, rs, h)
        cA = w * mass_slab_ref[0, :, k * L:(k + 1) * L]
        gv = gfac * vol_slab_ref[0, :, k * L:(k + 1) * L]
        pos_slab = pos_slab_ref[0, k * L:(k + 1) * L, :]
        for b in range(3):
            Cb = cA * (-dx[b])          # c * X_ji[b]
            Db = gv * dx[b]             # (gfac V_j) * dx[b]; nw = gfac*dx
            dotC = _dot(Cb, pos_slab)   # (rows, 3): sum_s Cb * p_j
            dotD = _dot(Db, pos_slab)
            rsC = jnp.sum(Cb, axis=1, keepdims=True)   # (rows, 1)
            rsD = jnp.sum(Db, axis=1, keepdims=True)
            # A[r, a, b] = dotC[r, a] - p_i[r, a] * rsC[r]
            acc_a = dotC - pos_rows * rsC
            acc_y = dotD - pos_rows * rsD
            a_cols[b] = acc_a if a_cols[b] is None else a_cols[b] + acc_a
            y_cols[b] = acc_y if y_cols[b] is None else y_cols[b] + acc_y
    # assemble (rows, 9) with column order 3*a + b
    a_ref[0] = jnp.concatenate(
        [jnp.stack([a_cols[b][:, a] for b in range(3)], axis=1) for a in range(3)], axis=1
    )
    y_ref[0] = jnp.concatenate(
        [jnp.stack([y_cols[b][:, a] for b in range(3)], axis=1) for a in range(3)], axis=1
    )


def _moments_bwd_kernel(restT_rows_ref, restT_slab_ref, mass_slab_ref, vol_slab_ref,
                        da_ref, dy_ref, dpr_ref, dps_ref, *, h, runs):
    rr = restT_rows_ref[0]
    da = da_ref[0]                  # (rows, 9), cols 3a+b
    dy = dy_ref[0]
    dpr = jnp.zeros_like(dpr_ref[0])   # (rows, 3)
    da_bs = [jnp.stack([da[:, 3 * a + b] for a in range(3)], axis=1) for b in range(3)]
    dy_bs = [jnp.stack([dy[:, 3 * a + b] for a in range(3)], axis=1) for b in range(3)]
    slab = restT_slab_ref.shape[2]
    L = slab // runs
    for k in range(runs):
        rs = restT_slab_ref[0, :, k * L:(k + 1) * L]
        dx, w, gfac = _pair_coeffs(rr, rs, h)
        cA = w * mass_slab_ref[0, :, k * L:(k + 1) * L]
        gv = gfac * vol_slab_ref[0, :, k * L:(k + 1) * L]
        dps_k = None
        for b in range(3):
            Cb = cA * (-dx[b])
            Db = gv * dx[b]
            # d pos_slab += Cb^T @ da_b + Db^T @ dy_b
            contrib = _dot_rows(Cb, da_bs[b]) + _dot_rows(Db, dy_bs[b])
            dps_k = contrib if dps_k is None else dps_k + contrib
            # d pos_rows -= rowsum * da_b (the -p_i term)
            rsC = jnp.sum(Cb, axis=1, keepdims=True)
            rsD = jnp.sum(Db, axis=1, keepdims=True)
            dpr = dpr - rsC * da_bs[b] - rsD * dy_bs[b]
        dps_ref[0, k * L:(k + 1) * L, :] = dps_k
    dpr_ref[0] = dpr


def _tile_specs(shapes):
    """BlockSpec per input: block = one tile along axis 0."""
    return [
        pl.BlockSpec((1,) + s, lambda t: (t,) + (0,) * len(s), memory_space=pltpu.VMEM)
        for s in shapes
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def moments_pallas(restT_rows, restT_slab, mass_slab, vol_slab, pos_rows, pos_slab,
                   h, interpret=None):
    """A_pq, Y moments: (t, rows, 9) each, column order 3*a + b."""
    return _moments_fwd_impl(restT_rows, restT_slab, mass_slab, vol_slab,
                             pos_rows, pos_slab, h, interpret)


def _moments_fwd_impl(restT_rows, restT_slab, mass_slab, vol_slab, pos_rows, pos_slab,
                      h, interpret):
    t, _, rows = restT_rows.shape
    slab = restT_slab.shape[2]
    interpret = _interpret_default() if interpret is None else interpret
    kernel = functools.partial(_moments_kernel, h=h, runs=9)
    out = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=_tile_specs([
            (3, rows), (3, slab), (1, slab), (1, slab), (rows, 3), (slab, 3),
        ]),
        out_specs=_tile_specs([(rows, 9), (rows, 9)]),
        out_shape=[
            jax.ShapeDtypeStruct((t, rows, 9), pos_rows.dtype),
            jax.ShapeDtypeStruct((t, rows, 9), pos_rows.dtype),
        ],
        interpret=interpret,
    )(restT_rows, restT_slab, mass_slab[:, None, :], vol_slab[:, None, :],
      pos_rows, pos_slab)
    return tuple(out)


def _moments_vjp_fwd(restT_rows, restT_slab, mass_slab, vol_slab, pos_rows, pos_slab,
                     h, interpret):
    out = _moments_fwd_impl(restT_rows, restT_slab, mass_slab, vol_slab,
                            pos_rows, pos_slab, h, interpret)
    return out, (restT_rows, restT_slab, mass_slab, vol_slab)


def _moments_vjp_bwd(h, interpret, res, cts):
    restT_rows, restT_slab, mass_slab, vol_slab = res
    da, dy = cts
    t, _, rows = restT_rows.shape
    slab = restT_slab.shape[2]
    interpret = _interpret_default() if interpret is None else interpret
    kernel = functools.partial(_moments_bwd_kernel, h=h, runs=9)
    dpr, dps = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=_tile_specs([
            (3, rows), (3, slab), (1, slab), (1, slab), (rows, 9), (rows, 9),
        ]),
        out_specs=_tile_specs([(rows, 3), (slab, 3)]),
        out_shape=[
            jax.ShapeDtypeStruct((t, rows, 3), da.dtype),
            jax.ShapeDtypeStruct((t, slab, 3), da.dtype),
        ],
        interpret=interpret,
    )(restT_rows, restT_slab, mass_slab[:, None, :], vol_slab[:, None, :], da, dy)
    return (None, None, None, None, dpr, dps)


moments_pallas.defvjp(_moments_vjp_fwd, _moments_vjp_bwd)


# ============================================================ forces (K2, separable)
def _forces_kernel(restT_rows_ref, restT_slab_ref, vol_slab_ref, g_rows_ref,
                   g_slab_ref, vol_rows_ref, f_ref, *, h, runs):
    rr = restT_rows_ref[0]
    g_rows = g_rows_ref[0]          # (rows, 9) — G_i = V_i M_i
    vol_rows = vol_rows_ref[0]      # (rows, 1)
    slab = restT_slab_ref.shape[2]
    L = slab // runs

    term = jnp.zeros_like(g_rows[:, :3])
    svnw = [jnp.zeros_like(vol_rows) for _ in range(3)]
    for k in range(runs):
        rs = restT_slab_ref[0, :, k * L:(k + 1) * L]
        dx, w, gfac = _pair_coeffs(rr, rs, h)
        gv = gfac * vol_slab_ref[0, :, k * L:(k + 1) * L]
        g_slab = g_slab_ref[0, k * L:(k + 1) * L, :]
        for b in range(3):
            NWb = gfac * dx[b]          # nw_b pair tensor
            dotb = _dot(NWb, g_slab)    # (rows, 9): sum_s nw_b * G[*, col]
            term = term + jnp.stack([dotb[:, 3 * a + b] for a in range(3)], axis=1)
            svnw[b] = svnw[b] + jnp.sum(gv * dx[b], axis=1, keepdims=True)
    # term_i = M_i @ sum_v_nw = (G_i / V_i) @ svnw
    vol_safe = jnp.where(vol_rows > 0, vol_rows, 1.0)
    m_rows = g_rows / vol_safe
    term_i = jnp.concatenate(
        [sum(m_rows[:, 3 * a + b: 3 * a + b + 1] * svnw[b] for b in range(3))
         for a in range(3)], axis=1,
    )
    f_ref[0] = 0.5 * vol_rows * (term + term_i)


def _forces_bwd_kernel(restT_rows_ref, restT_slab_ref, vol_slab_ref, vol_rows_ref,
                       df_ref, dgr_ref, dgs_ref, *, h, runs):
    rr = restT_rows_ref[0]
    vol_rows = vol_rows_ref[0]
    df = df_ref[0] * (0.5 * vol_rows)          # (rows, 3) scaled cotangent
    vol_safe = jnp.where(vol_rows > 0, vol_rows, 1.0)
    df_over_v = df / vol_safe
    slab = restT_slab_ref.shape[2]
    L = slab // runs
    svnw = [jnp.zeros_like(vol_rows) for _ in range(3)]
    for k in range(runs):
        rs = restT_slab_ref[0, :, k * L:(k + 1) * L]
        dx, w, gfac = _pair_coeffs(rr, rs, h)
        gv = gfac * vol_slab_ref[0, :, k * L:(k + 1) * L]
        dgs_cols = [None] * 9
        for b in range(3):
            NWb = gfac * dx[b]
            # dG_slab[s, 3a+b] = sum_r NWb[r, s] * df[r, a]
            contrib = _dot_rows(NWb, df)           # (run, 3) indexed by a
            svnw[b] = svnw[b] + jnp.sum(gv * dx[b], axis=1, keepdims=True)
            for a in range(3):
                dgs_cols[3 * a + b] = contrib[:, a: a + 1]
        dgs_ref[0, k * L:(k + 1) * L, :] = jnp.concatenate(dgs_cols, axis=1)
    dgr_cols = [None] * 9
    for b in range(3):
        for a in range(3):
            # dG_rows[r, 3a+b] = (df[r, a] / V_i) * svnw_b[r]  (the term_i path)
            dgr_cols[3 * a + b] = df_over_v[:, a: a + 1] * svnw[b]
    dgr_ref[0] = jnp.concatenate(dgr_cols, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def forces_pallas(restT_rows, restT_slab, vol_slab, g_rows, g_slab, vol_rows,
                  h, interpret=None):
    """Separable (pair_def_grad="j") elastic forces: (t, rows, 3)."""
    return _forces_fwd_impl(restT_rows, restT_slab, vol_slab, g_rows, g_slab,
                            vol_rows, h, interpret)


def _forces_fwd_impl(restT_rows, restT_slab, vol_slab, g_rows, g_slab, vol_rows,
                     h, interpret):
    t, _, rows = restT_rows.shape
    slab = restT_slab.shape[2]
    interpret = _interpret_default() if interpret is None else interpret
    kernel = functools.partial(_forces_kernel, h=h, runs=9)
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=_tile_specs([
            (3, rows), (3, slab), (1, slab), (rows, 9), (slab, 9), (rows, 1),
        ]),
        out_specs=_tile_specs([(rows, 3)])[0],
        out_shape=jax.ShapeDtypeStruct((t, rows, 3), g_rows.dtype),
        interpret=interpret,
    )(restT_rows, restT_slab, vol_slab[:, None, :], g_rows, g_slab,
      vol_rows[:, :, None])


def _forces_vjp_fwd(restT_rows, restT_slab, vol_slab, g_rows, g_slab, vol_rows,
                    h, interpret):
    out = _forces_fwd_impl(restT_rows, restT_slab, vol_slab, g_rows, g_slab,
                           vol_rows, h, interpret)
    return out, (restT_rows, restT_slab, vol_slab, vol_rows)


def _forces_vjp_bwd(h, interpret, res, df):
    restT_rows, restT_slab, vol_slab, vol_rows = res
    t, _, rows = restT_rows.shape
    slab = restT_slab.shape[2]
    interpret = _interpret_default() if interpret is None else interpret
    kernel = functools.partial(_forces_bwd_kernel, h=h, runs=9)
    dgr, dgs = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=_tile_specs([
            (3, rows), (3, slab), (1, slab), (rows, 1), (rows, 3),
        ]),
        out_specs=_tile_specs([(rows, 9), (slab, 9)]),
        out_shape=[
            jax.ShapeDtypeStruct((t, rows, 9), df.dtype),
            jax.ShapeDtypeStruct((t, slab, 9), df.dtype),
        ],
        interpret=interpret,
    )(restT_rows, restT_slab, vol_slab[:, None, :], vol_rows[:, :, None], df)
    return (None, None, None, dgr, dgs, None)


forces_pallas.defvjp(_forces_vjp_fwd, _forces_vjp_bwd)


# ============================================================ forces (K2, Warp mode)
def _forces_warp_kernel(restT_rows_ref, restT_slab_ref, vol_slab_ref, f9_ref,
                        m9_ref, sT_ref, r_slab_ref, rT_ref, vol_rows_ref,
                        f_ref, *, h, runs):
    """Warp pairing (sim.py:227-234): R_j f_ij with f_ij = V_j F_i S_j (V_i nw).

    termj[r, a] = sum_s V_j R_j[a, c] u_c[r, s],  u_c = sum_d F_i[3c+d] z_d,
    z_d[r, s]   = sum_b nw_b[r, s] S_j[3d+b][s].
    """
    rr = restT_rows_ref[0]
    f9 = f9_ref[0]                  # (rows, 9) F_i
    m9 = m9_ref[0]                  # (rows, 9) M_i = R_i F_i S_i
    vol_rows = vol_rows_ref[0]      # (rows, 1)
    slab = restT_slab_ref.shape[2]
    L = slab // runs

    termj = jnp.zeros_like(f9[:, :3])
    svnw = [jnp.zeros_like(vol_rows) for _ in range(3)]
    for k in range(runs):
        rs = restT_slab_ref[0, :, k * L:(k + 1) * L]
        dx, w, gfac = _pair_coeffs(rr, rs, h)
        vol_lane = vol_slab_ref[0, :, k * L:(k + 1) * L]   # (1, run)
        gv = gfac * vol_lane
        sT = sT_ref[0, :, k * L:(k + 1) * L]               # (9, run)
        r_slab = r_slab_ref[0, k * L:(k + 1) * L, :]       # (run, 9)
        nw = [gfac * dx[b] for b in range(3)]
        z = [sum(nw[b] * sT[3 * d + b][None, :] for b in range(3)) for d in range(3)]
        for c in range(3):
            u_c = sum(f9[:, 3 * c + d: 3 * c + d + 1] * z[d] for d in range(3))
            dotc = _dot(u_c * vol_lane, r_slab)    # (rows, 9)
            termj = termj + jnp.stack([dotc[:, 3 * a + c] for a in range(3)], axis=1)
        for b in range(3):
            svnw[b] = svnw[b] + jnp.sum(gv * dx[b], axis=1, keepdims=True)
    term_i = jnp.concatenate(
        [sum(m9[:, 3 * a + b: 3 * a + b + 1] * svnw[b] for b in range(3))
         for a in range(3)], axis=1,
    )
    f_ref[0] = 0.5 * vol_rows * (termj + term_i)


def _forces_warp_bwd_kernel(restT_rows_ref, restT_slab_ref, vol_slab_ref, f9_ref,
                            sT_ref, rT_ref, vol_rows_ref, df_ref,
                            df9_ref, dm9_ref, dsT_ref, dr_ref, *, h, runs):
    rr = restT_rows_ref[0]
    f9 = f9_ref[0]
    vol_rows = vol_rows_ref[0]
    df = df_ref[0] * (0.5 * vol_rows)          # (rows, 3)
    slab = restT_slab_ref.shape[2]
    L = slab // runs

    svnw = [jnp.zeros_like(vol_rows) for _ in range(3)]
    df9_acc = [jnp.zeros_like(vol_rows) for _ in range(9)]
    for k in range(runs):
        rs = restT_slab_ref[0, :, k * L:(k + 1) * L]
        dx, w, gfac = _pair_coeffs(rr, rs, h)
        vol_lane = vol_slab_ref[0, :, k * L:(k + 1) * L]
        gv = gfac * vol_lane
        sT = sT_ref[0, :, k * L:(k + 1) * L]
        rT = rT_ref[0, :, k * L:(k + 1) * L]
        nw = [gfac * dx[b] for b in range(3)]
        z = [sum(nw[b] * sT[3 * d + b][None, :] for b in range(3)) for d in range(3)]
        for b in range(3):
            svnw[b] = svnw[b] + jnp.sum(gv * dx[b], axis=1, keepdims=True)

        # dR_slab[s, 3a+c] = sum_r u'_c[r, s] df[r, a]
        dr_cols = [None] * 9
        wprime = []
        for c in range(3):
            u_c = sum(f9[:, 3 * c + d: 3 * c + d + 1] * z[d] for d in range(3))
            contrib = _dot_rows(u_c * vol_lane, df)     # (run, 3) indexed by a
            for a in range(3):
                dr_cols[3 * a + c] = contrib[:, a: a + 1]
            # w'_c[r, s] = V_j sum_a df[r, a] R_j[3a+c][s]
            wprime.append(
                vol_lane * sum(df[:, a: a + 1] * rT[3 * a + c][None, :] for a in range(3))
            )
        dr_ref[0, k * L:(k + 1) * L, :] = jnp.concatenate(dr_cols, axis=1)

        # dF[r, 3c+d] = sum_s z_d w'_c ;  dS_T[3d+b][s] = sum_r nw_b y_d
        y = []
        for d in range(3):
            for c in range(3):
                df9_acc[3 * c + d] = df9_acc[3 * c + d] + jnp.sum(
                    z[d] * wprime[c], axis=1, keepdims=True
                )
            y.append(sum(f9[:, 3 * c + d: 3 * c + d + 1] * wprime[c] for c in range(3)))
        ds_rows = [None] * 9
        for d in range(3):
            for b in range(3):
                ds_rows[3 * d + b] = jnp.sum(nw[b] * y[d], axis=0, keepdims=True)  # (1, run)
        dsT_ref[0, :, k * L:(k + 1) * L] = jnp.concatenate(ds_rows, axis=0)

    # dM[r, 3a+b] = df[r, a] * svnw_b[r]
    dm_cols = [None] * 9
    for a in range(3):
        for b in range(3):
            dm_cols[3 * a + b] = df[:, a: a + 1] * svnw[b]
    dm9_ref[0] = jnp.concatenate(dm_cols, axis=1)
    df9_ref[0] = jnp.concatenate(df9_acc, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def forces_warp_pallas(restT_rows, restT_slab, vol_slab, f9_rows, m9_rows,
                       s_slabT, r_slab, r_slabT, vol_rows, h, interpret=None):
    """Warp-mode (pair_def_grad="i") elastic forces: (t, rows, 3).

    ``r_slabT`` is unused in the forward pass but saved for the backward
    kernel (R_j is needed as lane vectors there); its cotangent is zero —
    XLA sums it with ``r_slab``'s full cotangent at the shared gather source.
    """
    return _forces_warp_fwd_impl(restT_rows, restT_slab, vol_slab, f9_rows,
                                 m9_rows, s_slabT, r_slab, r_slabT, vol_rows,
                                 h, interpret)


def _forces_warp_fwd_impl(restT_rows, restT_slab, vol_slab, f9_rows, m9_rows,
                          s_slabT, r_slab, r_slabT, vol_rows, h, interpret):
    t, _, rows = restT_rows.shape
    slab = restT_slab.shape[2]
    interpret = _interpret_default() if interpret is None else interpret
    kernel = functools.partial(_forces_warp_kernel, h=h, runs=9)
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=_tile_specs([
            (3, rows), (3, slab), (1, slab), (rows, 9), (rows, 9),
            (9, slab), (slab, 9), (9, slab), (rows, 1),
        ]),
        out_specs=_tile_specs([(rows, 3)])[0],
        out_shape=jax.ShapeDtypeStruct((t, rows, 3), f9_rows.dtype),
        interpret=interpret,
    )(restT_rows, restT_slab, vol_slab[:, None, :], f9_rows, m9_rows,
      s_slabT, r_slab, r_slabT, vol_rows[:, :, None])


def _forces_warp_vjp_fwd(restT_rows, restT_slab, vol_slab, f9_rows, m9_rows,
                         s_slabT, r_slab, r_slabT, vol_rows, h, interpret):
    out = _forces_warp_fwd_impl(restT_rows, restT_slab, vol_slab, f9_rows,
                                m9_rows, s_slabT, r_slab, r_slabT, vol_rows,
                                h, interpret)
    return out, (restT_rows, restT_slab, vol_slab, f9_rows, s_slabT, r_slabT, vol_rows)


def _forces_warp_vjp_bwd(h, interpret, res, df):
    restT_rows, restT_slab, vol_slab, f9_rows, s_slabT, r_slabT, vol_rows = res
    t, _, rows = restT_rows.shape
    slab = restT_slab.shape[2]
    interpret = _interpret_default() if interpret is None else interpret
    kernel = functools.partial(_forces_warp_bwd_kernel, h=h, runs=9)
    df9, dm9, dsT, dr = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=_tile_specs([
            (3, rows), (3, slab), (1, slab), (rows, 9),
            (9, slab), (9, slab), (rows, 1), (rows, 3),
        ]),
        out_specs=_tile_specs([(rows, 9), (rows, 9), (9, slab), (slab, 9)]),
        out_shape=[
            jax.ShapeDtypeStruct((t, rows, 9), df.dtype),
            jax.ShapeDtypeStruct((t, rows, 9), df.dtype),
            jax.ShapeDtypeStruct((t, 9, slab), df.dtype),
            jax.ShapeDtypeStruct((t, slab, 9), df.dtype),
        ],
        interpret=interpret,
    )(restT_rows, restT_slab, vol_slab[:, None, :], f9_rows, s_slabT, r_slabT,
      vol_rows[:, :, None], df)
    zero_rT = jnp.zeros_like(r_slabT)
    return (None, None, None, df9, dm9, dsT, dr, zero_rT, None)


forces_warp_pallas.defvjp(_forces_warp_vjp_fwd, _forces_warp_vjp_bwd)
