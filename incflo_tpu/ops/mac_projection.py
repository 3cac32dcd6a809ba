"""MAC projection: make the face advection velocities divergence-free.

Replaces amrex::MacProjector (reference
src/convection/incflo_compute_MAC_projected_velocities.cpp:10-133):
solve   div(beta grad phi) = div(u_mac),  beta = 1/rho on faces,
then    u_mac -= beta grad phi.

The correction uses the SAME discrete fluxes as the operator
(multigrid.cell_fluxes), so div(u_mac) after projection equals the
solver residual (exact projection on the MAC grid).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from incflo_tpu import bcs
from incflo_tpu.bcs import BCKind
from incflo_tpu.grid import Grid
from incflo_tpu.ops import multigrid as mg
from incflo_tpu.ops.stencil import window


def projection_solver_bc(bc_kind: np.ndarray, grid: Grid):
    """BC map for MAC/nodal projections (reference
    incflo_apply_nodal_projection.cpp:6-36): pressure_* -> Dirichlet,
    walls/mass inflow -> Neumann, periodic -> periodic."""
    ndim = grid.ndim
    lo, hi = [], []
    for ax in range(ndim):
        for side, out in ((0, lo), (1, hi)):
            if grid.periodic[ax]:
                out.append(mg.SolverBC.PERIODIC)
                continue
            k = BCKind(int(bc_kind[ax, side]))
            if k in (BCKind.pressure_inflow, BCKind.pressure_outflow):
                out.append(mg.SolverBC.DIRICHLET)
            else:
                out.append(mg.SolverBC.NEUMANN)
    return lo, hi


def inv_rho_on_faces(rho_g1: jnp.ndarray, grid: Grid) -> List[jnp.ndarray]:
    """beta = 1/avg(rho) on all faces (n+1 per axis).  rho_g1 = density
    grown by 1.  Matches reference average_cellcenter_to_face + invert
    (incflo_compute_advection_term.cpp:65-83): average THEN invert."""
    ndim = grid.ndim
    out = []
    for d in range(ndim):
        r = rho_g1
        for ax in range(ndim):
            if ax != d:
                r = window(r, ax, 1, 1)
        avg = 0.5 * (window(r, d, 0, 1) + window(r, d, 1, 0))
        out.append(1.0 / avg)
    return out


def mac_divergence(umac: Sequence[jnp.ndarray], grid: Grid) -> jnp.ndarray:
    out = None
    for d in range(grid.ndim):
        dxi = 1.0 / grid.dx[d]
        t = (window(umac[d], d, 1, 0) - window(umac[d], d, 0, 1)) * dxi
        out = t if out is None else out + t
    return out


def project_mac_velocities(umac: List[jnp.ndarray], beta: List[jnp.ndarray],
                           grid: Grid, bc_kind: np.ndarray,
                           phi0=None, rtol=1e-11, atol=1e-14, maxiter=200,
                           eb=None, bc_override=None, phi_bvals=None,
                           prebuilt_solver=None):
    """Returns (umac_projected, phi, resnorm, iters).

    With EB (cut cells): solve div(ap beta grad phi) = div(ap u) and
    correct u -= beta grad phi on open faces (MLEBABecLap MacProjector
    analog); faces with zero area fraction carry zero velocity.

    bc_override / phi_bvals: coarse-fine patch faces (amr_patch slab
    mode) take Dirichlet phi with interpolated coarse values."""
    bc_lo, bc_hi = projection_solver_bc(bc_kind, grid)
    if bc_override:
        for (ax, side), bc in bc_override.items():
            (bc_lo if side == 0 else bc_hi)[ax] = bc
    # faces with tiny area fraction carry negligible flux but their
    # VALUES feed the small-cell velocity fix -- keep them at the
    # physical no-slip limit instead of flux/ap-amplified noise
    ap_small = 1e-4
    if eb is not None:
        umac = [jnp.where(eb.afrac[d] > ap_small, umac[d], 0.0)
                for d in range(grid.ndim)]
        beta_eff = [beta[d] * eb.afrac[d] for d in range(grid.ndim)]
    else:
        beta_eff = beta
    solver = prebuilt_solver if prebuilt_solver is not None else \
        mg.CellSolver(grid.dx, bc_lo, bc_hi, alpha=0.0, beta=1.0,
                      acoef=None, bcoef=beta_eff)
    # L = -div(beta_eff grad phi); solve L phi = -div(ap u)
    if eb is not None:
        rhs = -mac_divergence([eb.afrac[d] * umac[d]
                               for d in range(grid.ndim)], grid)
    else:
        rhs = -mac_divergence(umac, grid)
    if phi_bvals:
        phi, res, it = solver.solve_inhom(rhs, phi_bvals, x0=phi0,
                                          rtol=rtol, atol=atol,
                                          maxiter=maxiter)
        fluxes = mg.cell_fluxes_inhom(phi, solver.levels[0], phi_bvals)
    else:
        phi, res, it = solver.solve(rhs, x0=phi0, rtol=rtol, atol=atol,
                                    maxiter=maxiter)
        fluxes = mg.cell_fluxes(phi, solver.levels[0])   # beta_eff grad phi
    if eb is not None:
        new_umac = []
        for d in range(grid.ndim):
            ap = eb.afrac[d]
            corr = jnp.where(ap > ap_small, fluxes[d] / jnp.maximum(ap, ap_small),
                             0.0)
            new_umac.append(umac[d] - corr)
    else:
        new_umac = [umac[d] - fluxes[d] for d in range(grid.ndim)]
    return new_umac, phi, res, it
