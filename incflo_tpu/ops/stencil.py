"""Shift/slope stencil primitives on dense arrays.

These replace the reference's raw Array4 index arithmetic
(amrex_calc_*slope in AMReX_Slopes_K.H, used by src/convection/
incflo_mol_predict.cpp:22 and incflo_godunov_plm.H).  All functions
take arrays that already carry enough ghost layers and return arrays on
a smaller index range -- callers track ranges explicitly.
"""

from __future__ import annotations

import jax.numpy as jnp


def shift(a: jnp.ndarray, off: int, axis: int) -> jnp.ndarray:
    """a shifted so out[i] = a[i+off] along axis, trimming `|off|` cells
    from the opposite end.  The result is shorter by |off| along axis."""
    n = a.shape[axis]
    sl = [slice(None)] * a.ndim
    if off >= 0:
        sl[axis] = slice(off, n)
    else:
        sl[axis] = slice(0, n + off)
    return a[tuple(sl)]


def window(a: jnp.ndarray, axis: int, lo_trim: int, hi_trim: int) -> jnp.ndarray:
    """Trim lo_trim cells from the low end and hi_trim from the high end."""
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(lo_trim, a.shape[axis] - hi_trim)
    return a[tuple(sl)]


def inner(a: jnp.ndarray, ng, ndim=None) -> jnp.ndarray:
    """Strip `ng` ghost layers from every spatial axis (first `ndim` axes)."""
    nd = ndim if ndim is not None else a.ndim
    sl = [slice(None)] * a.ndim
    ngs = [ng] * nd if isinstance(ng, int) else list(ng)
    for ax in range(nd):
        if ngs[ax]:
            sl[ax] = slice(ngs[ax], a.shape[ax] - ngs[ax])
    return a[tuple(sl)]


def mc_slope(qm, q, qp):
    """Monotonized-central limited slope (order-2 amrex_calc_xslope):
    given q(i-1), q(i), q(i+1) aligned arrays, return the limited slope."""
    dl = 2.0 * (q - qm)
    dr = 2.0 * (qp - q)
    dc = 0.5 * (qp - qm)
    s = jnp.minimum(jnp.minimum(jnp.abs(dl), jnp.abs(dc)), jnp.abs(dr))
    s = jnp.where(dl * dr > 0.0, s, 0.0)
    return jnp.where(dc > 0.0, s, -s)


def mc_slope_extdir(qm, q, qp, on_lo_bdry, on_hi_bdry):
    """MC slope with the one-sided boundary form used next to ext_dir /
    hoextrap faces, where q(i-1) (resp. q(i+1)) sits ON the face:
      lo: dc = (q(i+1) + 3 q(i) - 4 q(i-1)) / 3
      hi: dc = (4 q(i+1) - 3 q(i) - q(i-1)) / 3
    and the one-sided differences are limited by 2x each side
    (cf. AMReX_Slopes_K.H amrex_calc_xslope_extdir).
    `on_lo_bdry`/`on_hi_bdry` are boolean masks aligned with q."""
    dl = 2.0 * (q - qm)
    dr = 2.0 * (qp - q)
    dc = 0.5 * (qp - qm)
    dc = jnp.where(on_lo_bdry, (qp + 3.0 * q - 4.0 * qm) / 3.0, dc)
    dc = jnp.where(on_hi_bdry, (4.0 * qp - 3.0 * q - qm) / 3.0, dc)
    s = jnp.minimum(jnp.minimum(jnp.abs(dl), jnp.abs(dc)), jnp.abs(dr))
    s = jnp.where(dl * dr > 0.0, s, 0.0)
    return jnp.where(dc > 0.0, s, -s)


def face_avg(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """0.5*(a[i-1]+a[i]) on the n-1 interior faces of axis
    (amrex::average_cellcenter_to_face analog; callers pad first for
    domain faces)."""
    return 0.5 * (window(a, axis, 1, 0) + window(a, axis, 0, 1))


def diff_along(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """a[i+1]-a[i] along axis (n-1 results for n entries)."""
    return window(a, axis, 1, 0) - window(a, axis, 0, 1)


def comp_stack(parts, axis: int = -1) -> jnp.ndarray:
    """jnp.stack(parts, axis=-1) that also lowers inside the fused
    whole-step Pallas kernel (ops/pallas_step2d).

    Mosaic rejects tpu.concatenate along a small trailing component
    axis when the inputs carry mismatched vector-layout offsets
    ("result/input offset mismatch on non-concat dimension" -- dot/
    window outputs routinely disagree); under pallas_guard.in_kernel()
    the components are reassembled with one-hot broadcast-sums (pure
    elementwise ops, C <= 4) instead of a concat."""
    assert axis == -1
    from incflo_tpu.ops import pallas_guard
    if not pallas_guard.in_kernel():
        return jnp.stack(parts, axis=-1)
    import jax
    import numpy as np
    parts = [jnp.asarray(p) for p in parts]
    ncomp = len(parts)
    eye = np.eye(ncomp, dtype=np.result_type(parts[0].dtype))
    out = None
    for c, p in enumerate(parts):
        # broadcast_in_dim, NOT [..., None]: expand_dims lowers to a
        # tpu.reshape that Mosaic rejects for offset-carrying (window-
        # sliced) operands, while broadcasts accept any input layout
        b = jax.lax.broadcast_in_dim(p, p.shape + (ncomp,),
                                     tuple(range(p.ndim)))
        term = b * jnp.asarray(eye[c])
        out = term if out is None else out + term
    return out
