"""Centroid-aware MOL face prediction and upwind fluxes at cut cells.

Reference: src/convection/incflo_mol_predict_eb.cpp:22-591 (face-normal
velocity extrapolated from the cell FLUID centroid to the face FLUID
centroid with least-squares slopes over connected neighbors, clamped to
the adjacent cell-center range) and incflo_mol_fluxes_eb.cpp:28-612
(advected state interpolated to the face centroid, upwinded by umac).

TPU-native redesign: the reference evaluates a per-cell least-squares
fit with a 3x3 normal-equation solve inside the GPU kernel
(AMReX_EB_slopes_K.H).  Here the normal matrix is pure static geometry,
so its pseudo-inverse is PRECOMPUTED host-side (eb.lsq_minv_g1, packed
symmetric) and the runtime slope costs 3^d-1 masked shifted reads plus
npack multiply-adds -- dense vectorized work with no per-cell solves.

Dispatch: the reference routes whole boxes through the EB kernels when
any cell in the box is cut, which makes results depend on the box
decomposition.  Here the centroid-aware states REPLACE the regular
MC-limited states only on faces within 2 cells of a non-regular cell
(eb.near_g1) -- a sharper, decomposition-independent criterion; far
from the EB both schemes are 2nd order.  Domain-boundary faces always
keep the regular path's value (ext_dir/outflow forms); supported decks
never intersect the EB with a non-periodic domain face.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from incflo_tpu.eb.ops import EBArrays
from incflo_tpu.grid import Grid
from incflo_tpu.ops import mol
from incflo_tpu.ops.mol import SMALL_VEL
from incflo_tpu.ops.stencil import window


def _ext(a: jnp.ndarray, ng_a: int, off, nd: int) -> jnp.ndarray:
    """a(i+off) for i on the box grown by 1 (a carries ng_a ghosts)."""
    out = a
    for ax in range(nd):
        lo = ng_a - 1 + off[ax]
        hi = ng_a - 1 - off[ax]
        out = window(out, ax, lo, hi)
    return out


def lsq_slopes(q_g: jnp.ndarray, grid: Grid, ng: int, eb: EBArrays
               ) -> jnp.ndarray:
    """Least-squares slope vector of a grown scalar on the grown-by-1 box
    (reference amrex_calc_slopes_eb): minimise
    sum_connected (q(i+off) - q(i) - s . delta)^2,
    delta = off + ccent(i+off) - ccent(i).  Exact for linear fields on
    any connectivity/centroid pattern."""
    nd = grid.ndim
    zero = (0,) * nd
    q0 = _ext(q_g, ng, zero, nd)
    c0 = _ext(eb.ccent_g2, 2, zero, nd)
    b = [jnp.zeros_like(q0) for _ in range(nd)]
    for m, off in zip(eb.conn_g1, eb.offsets):
        qn = _ext(q_g, ng, off, nd)
        cn = _ext(eb.ccent_g2, 2, off, nd)
        dq = m * (qn - q0)
        for a in range(nd):
            delta = off[a] + cn[..., a] - c0[..., a]
            b[a] = b[a] + delta * dq
    mi = eb.lsq_minv_g1
    if nd == 2:
        sx = mi[..., 0] * b[0] + mi[..., 1] * b[1]
        sy = mi[..., 1] * b[0] + mi[..., 2] * b[1]
        return jnp.stack([sx, sy], axis=-1)
    sx = mi[..., 0] * b[0] + mi[..., 1] * b[1] + mi[..., 2] * b[2]
    sy = mi[..., 1] * b[0] + mi[..., 3] * b[1] + mi[..., 4] * b[2]
    sz = mi[..., 2] * b[0] + mi[..., 4] * b[1] + mi[..., 5] * b[2]
    return jnp.stack([sx, sy, sz], axis=-1)


def _cell_window(axis: int, which: str, nd: int):
    """Trim a grown-by-1 array to the cells adjacent to faces 0..n along
    `axis` ('pls': cells 0..n, 'mns': cells -1..n-1), interior on other
    axes."""
    lo = 1 if which == "pls" else 0
    hi = 0 if which == "pls" else 1

    def t(a):
        out = a
        for ax in range(nd):
            out = window(out, ax, lo if ax == axis else 1,
                         hi if ax == axis else 1)
        return out
    return t


def face_states(qc_g: jnp.ndarray, slopes: jnp.ndarray, axis: int,
                grid: Grid, ng: int, eb: EBArrays):
    """(q_pls, q_mns, qcc_pls, qcc_mns) for all faces 0..n along `axis`:
    the adjacent cell values extrapolated from the cell fluid centroid to
    the face fluid centroid."""
    nd = grid.ndim
    zero = (0,) * nd
    q0 = _ext(qc_g, ng, zero, nd)
    c0 = _ext(eb.ccent_g2, 2, zero, nd)
    fc = eb.face_cent[axis]

    def extrap(which, fpos_axis):
        t = _cell_window(axis, which, nd)
        q, c, s = t(q0), t(c0), t(slopes)
        val = q
        for a in range(nd):
            fpos = fpos_axis if a == axis else fc[..., a]
            val = val + s[..., a] * (fpos - c[..., a])
        return val, q

    qpls, qcc_pls = extrap("pls", -0.5)
    qmns, qcc_mns = extrap("mns", +0.5)
    return qpls, qmns, qcc_pls, qcc_mns


def _near_face(eb: EBArrays, axis: int, nd: int) -> jnp.ndarray:
    tp = _cell_window(axis, "pls", nd)
    tm = _cell_window(axis, "mns", nd)
    return jnp.logical_or(tp(eb.near_g1) > 0.5, tm(eb.near_g1) > 0.5)


def _keep_domain_faces(u: jnp.ndarray, u_reg: jnp.ndarray, axis: int,
                       grid: Grid) -> jnp.ndarray:
    """Domain-boundary faces always take the regular path's value (which
    carries the ext_dir / outflow forms)."""
    if grid.periodic[axis]:
        return u
    sl0 = [slice(None)] * u.ndim
    sln = [slice(None)] * u.ndim
    sl0[axis] = slice(0, 1)
    sln[axis] = slice(u.shape[axis] - 1, None)
    u = u.at[tuple(sl0)].set(u_reg[tuple(sl0)])
    return u.at[tuple(sln)].set(u_reg[tuple(sln)])


def predict_vels_on_faces_eb(vel_g: jnp.ndarray, grid: Grid, ng: int,
                             bcrecs: np.ndarray, eb: EBArrays
                             ) -> List[jnp.ndarray]:
    """EB variant of mol.predict_vels_on_faces (reference
    incflo_mol_predict_eb.cpp): centroid-extrapolated upwind face-normal
    velocities near the EB, regular MC-limited states elsewhere."""
    nd = grid.ndim
    reg = mol.predict_vels_on_faces(vel_g, grid, ng, bcrecs)
    out = []
    for d in range(nd):
        slp = lsq_slopes(vel_g[..., d], grid, ng, eb)
        qpls, qmns, qp_cc, qm_cc = face_states(vel_g[..., d], slp, d,
                                               grid, ng, eb)
        cc_max = jnp.maximum(qp_cc, qm_cc)
        cc_min = jnp.minimum(qp_cc, qm_cc)
        upls = jnp.clip(qpls, cc_min, cc_max)
        umns = jnp.clip(qmns, cc_min, cc_max)
        avg = 0.5 * (upls + umns)
        sel = jnp.where(avg >= SMALL_VEL, umns,
                        jnp.where(avg <= -SMALL_VEL, upls, 0.0))
        u_val = jnp.where(jnp.logical_or(umns >= 0.0, upls <= 0.0), sel, 0.0)
        u_val = jnp.where(eb.afrac[d] > 0.0, u_val, 0.0)
        u = jnp.where(_near_face(eb, d, nd), u_val, reg[d])
        out.append(_keep_domain_faces(u, reg[d], d, grid))
    return out


def compute_convective_fluxes_eb(q_g: jnp.ndarray,
                                 umac: Sequence[jnp.ndarray], grid: Grid,
                                 ng: int, bcrecs: np.ndarray, eb: EBArrays
                                 ) -> List[jnp.ndarray]:
    """EB variant of mol.compute_convective_fluxes (reference
    incflo_mol_fluxes_eb.cpp): advected state interpolated to the face
    fluid centroid, upwinded by umac; 0.5*(mns+pls) at stagnation."""
    nd = grid.ndim
    ncomp = q_g.shape[-1]
    reg = mol.compute_convective_fluxes(q_g, umac, grid, ng, bcrecs)
    slopes = [lsq_slopes(q_g[..., c], grid, ng, eb) for c in range(ncomp)]
    fluxes = []
    for d in range(nd):
        near = _near_face(eb, d, nd)
        um = umac[d]
        comp_fluxes = []
        for c in range(ncomp):
            qpls, qmns, _, _ = face_states(q_g[..., c], slopes[c], d,
                                           grid, ng, eb)
            qs = jnp.where(um > SMALL_VEL, qmns,
                           jnp.where(um < -SMALL_VEL, qpls,
                                     0.5 * (qmns + qpls)))
            f_eb = jnp.where(eb.afrac[d] > 0.0, qs * um, 0.0)
            f = jnp.where(near, f_eb, reg[d][..., c])
            comp_fluxes.append(_keep_domain_faces(f, reg[d][..., c], d,
                                                  grid))
        fluxes.append(jnp.stack(comp_fluxes, axis=-1))
    return fluxes
