"""Method-of-lines advection: face prediction and upwind fluxes.

Vectorised re-expression of reference src/convection/incflo_mol_predict.cpp
(predict_vels_on_faces) and incflo_mol_fluxes.cpp (compute_convective_fluxes)
with AMReX's order-2 MC-limited slopes (AMReX_Slopes_K.H), including the
one-sided slope variant next to ext_dir/hoextrap boundaries (where the
boundary value lives ON the face).

Conventions:
  * all inputs are GROWN arrays carrying >= 2 ghost layers per axis
    (bcs.grow output); `ng` says how many.
  * face arrays along their normal axis always have n+1 entries
    (periodic axes store the wrap face twice, entries 0 and n equal).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from incflo_tpu import bcs
from incflo_tpu.bcs import BCType
from incflo_tpu.grid import Grid

SMALL_VEL = 1.0e-10   # reference MOL.H small_vel


def _axis_iota(shape, axis, n_interior, ng):
    """Global cell index (-ng .. n+ng-1) along `axis`, broadcastable."""
    import jax
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis) - ng
    return idx


def _slopes_1d(q_g, axis, grid: Grid, ng, bclo, bchi, lo_cells, hi_cells):
    """MC-limited slopes along `axis` for cells -lo_cells .. n+hi_cells-1.
    q_g is grown by ng; result is trimmed to [ng-lo_cells, n+ng+hi_cells)
    along `axis` and to the interior window [ng-lo_cells, ...] on OTHER
    axes? -- no: other axes keep their full grown extent."""
    from incflo_tpu.ops.stencil import mc_slope, window

    n = grid.n_cell[axis]
    lo = ng - lo_cells
    hi_trim = ng - hi_cells
    qm = window(q_g, axis, lo - 1, hi_trim + 1)
    q = window(q_g, axis, lo, hi_trim)
    qp = window(q_g, axis, lo + 1, hi_trim - 1)

    extdir_lo = bclo in (BCType.ext_dir, BCType.hoextrap)
    extdir_hi = bchi in (BCType.ext_dir, BCType.hoextrap)
    if not (extdir_lo or extdir_hi) or grid.periodic[axis]:
        return mc_slope(qm, q, qp)

    # one-sided dc at the first/last interior cell next to an extdir face
    import jax
    gidx = jax.lax.broadcasted_iota(jnp.int32, q.shape, axis) - lo_cells
    on_lo = jnp.logical_and(extdir_lo, gidx == 0)
    on_hi = jnp.logical_and(extdir_hi, gidx == n - 1)
    from incflo_tpu.ops.stencil import mc_slope_extdir
    return mc_slope_extdir(qm, q, qp, on_lo, on_hi)


def predict_vels_on_faces(vel_g: jnp.ndarray, grid: Grid, ng: int,
                          bcrecs: np.ndarray) -> List[jnp.ndarray]:
    """Upwind-select face-normal velocities from cell-centered velocity.

    vel_g: grown velocity (*cells+2ng, D).  Returns [u_x, u_y(, u_z)]
    face-normal arrays (n+1 entries along own axis, n on others).
    Mirrors reference incflo_mol_predict.cpp:91-351."""
    ndim = grid.ndim
    from incflo_tpu.ops.stencil import window

    out = []
    for d in range(ndim):
        q_g = vel_g[..., d]
        # trim other axes to interior
        for ax in range(ndim):
            if ax != d:
                q_g = window(q_g, ax, ng, ng)
        bclo = BCType(int(bcrecs[d, d, 0]))
        bchi = BCType(int(bcrecs[d, d, 1]))
        # slopes for cells -1..n (need cells -2..n+1)
        slp = _slopes_1d(q_g, d, grid, ng, bclo, bchi, 1, 1)
        q = window(q_g, d, ng - 1, ng - 1)          # cells -1..n
        n = grid.n_cell[d]
        # faces i=0..n: pls from cell i, mns from cell i-1
        q_pls = window(q, d, 1, 0)
        q_mns = window(q, d, 0, 1)
        s_pls = window(slp, d, 1, 0)
        s_mns = window(slp, d, 0, 1)
        upls = q_pls - 0.5 * s_pls
        umns = q_mns + 0.5 * s_mns
        avg = 0.5 * (upls + umns)
        sel = jnp.where(avg >= SMALL_VEL, umns,
                        jnp.where(avg <= -SMALL_VEL, upls, 0.0))
        u_val = jnp.where(jnp.logical_or(umns >= 0.0, upls <= 0.0), sel, 0.0)
        # ext_dir boundary faces take the ghost (boundary) value
        if not grid.periodic[d]:
            if bclo == BCType.ext_dir:
                u_val = _set_slab_face(u_val, d, 0, _face_slab(q_mns, d, 0))
            if bchi == BCType.ext_dir:
                u_val = _set_slab_face(u_val, d, -1, _face_slab(q_pls, d, -1))
        out.append(u_val)
    return out


def _face_slab(a, axis, idx):
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(0, 1) if idx == 0 else slice(a.shape[axis] - 1, None)
    return a[tuple(sl)]


def _set_slab_face(a, axis, idx, val):
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(0, 1) if idx == 0 else slice(a.shape[axis] - 1, None)
    return a.at[tuple(sl)].set(val)


def compute_convective_fluxes(q_g: jnp.ndarray, umac: Sequence[jnp.ndarray],
                              grid: Grid, ng: int, bcrecs: np.ndarray
                              ) -> List[jnp.ndarray]:
    """Upwind fluxes f_d = q_face * umac_d for a (..., ncomp) grown state.
    Mirrors reference incflo_mol_fluxes.cpp:23-227."""
    ndim = grid.ndim
    ncomp = q_g.shape[-1]
    from incflo_tpu.ops.stencil import window

    fluxes = []
    for d in range(ndim):
        comp_fluxes = []
        for c in range(ncomp):
            qc = q_g[..., c]
            for ax in range(ndim):
                if ax != d:
                    qc = window(qc, ax, ng, ng)
            bclo = BCType(int(bcrecs[c, d, 0]))
            bchi = BCType(int(bcrecs[c, d, 1]))
            slp = _slopes_1d(qc, d, grid, ng, bclo, bchi, 1, 1)
            q = window(qc, d, ng - 1, ng - 1)
            q_pls = window(q, d, 1, 0)
            q_mns = window(q, d, 0, 1)
            s_pls = window(slp, d, 1, 0)
            s_mns = window(slp, d, 0, 1)
            qpls = q_pls - 0.5 * s_pls
            qmns = q_mns + 0.5 * s_mns
            um = umac[d]
            qs = jnp.where(um > SMALL_VEL, qmns,
                           jnp.where(um < -SMALL_VEL, qpls,
                                     0.5 * (qmns + qpls)))
            # ext_dir domain faces: upstream state is the boundary value
            if not grid.periodic[d]:
                if bclo == BCType.ext_dir:
                    qs = _set_slab_face(qs, d, 0, _face_slab(q_mns, d, 0))
                if bchi == BCType.ext_dir:
                    qs = _set_slab_face(qs, d, -1, _face_slab(q_pls, d, -1))
            comp_fluxes.append(qs * um)
        fluxes.append(jnp.stack(comp_fluxes, axis=-1))
    return fluxes


def convective_rate(fluxes: Sequence[jnp.ndarray], grid: Grid) -> jnp.ndarray:
    """dq/dt = sum_d (f_d(i) - f_d(i+1))/dx_d  (= -div(umac q); reference
    mol::compute_convective_rate, incflo_compute_advection_term.cpp:360-381)."""
    from incflo_tpu.ops.stencil import window
    out = None
    for d in range(grid.ndim):
        f = fluxes[d]
        dxi = 1.0 / grid.dx[d]
        t = (window(f, d, 0, 1) - window(f, d, 1, 0)) * dxi
        out = t if out is None else out + t
    return out
