"""Rheology: strain-rate magnitude and non-Newtonian viscosity models.

Reference: src/rheology/incflo_rheology.cpp:8-140 (NonNewtonianViscosity
functor with Papanastasiou regularisation) and src/derive/incflo_derive_K.H
(incflo_strainrate: ||2S|| via central differences).
"""

from __future__ import annotations

import jax.numpy as jnp

from incflo_tpu.config import FluidModel, IncfloConfig
from incflo_tpu.grid import Grid
from incflo_tpu.ops.mathutil import expterm
from incflo_tpu.ops.stencil import window


def strainrate(vel_g: jnp.ndarray, grid: Grid, ng: int, out_ng: int = 0
               ) -> jnp.ndarray:
    """sqrt(2 ux^2 + 2 vy^2 [+ 2 wz^2] + (uy+vx)^2 [+ (vz+wy)^2 + (wx+uz)^2])
    by central differences, on the interior grown by out_ng (needs
    ng >= out_ng+1 ghosts on vel_g)."""
    ndim = grid.ndim
    trim = ng - out_ng

    def d(comp, axis):
        v = vel_g[..., comp]
        g = 0.5 * (window(v, axis, 2, 0) - window(v, axis, 0, 2)) / grid.dx[axis]
        # g now lives on cells [-(ng-1), n+ng-1); trim to out_ng
        for ax in range(ndim):
            t = (trim - 1) if ax == axis else trim
            g = window(g, ax, t, t)
        return g

    if ndim == 2:
        ux, vx = d(0, 0), d(1, 0)
        uy, vy = d(0, 1), d(1, 1)
        return jnp.sqrt(2 * ux * ux + 2 * vy * vy + (uy + vx) ** 2)
    ux, vx, wx = d(0, 0), d(1, 0), d(2, 0)
    uy, vy, wy = d(0, 1), d(1, 1), d(2, 1)
    uz, vz, wz = d(0, 2), d(1, 2), d(2, 2)
    return jnp.sqrt(2 * ux * ux + 2 * vy * vy + 2 * wz * wz
                    + (uy + vx) ** 2 + (vz + wy) ** 2 + (wx + uz) ** 2)


def viscosity_of_strainrate(sr: jnp.ndarray, cfg: IncfloConfig) -> jnp.ndarray:
    """The NonNewtonianViscosity functor."""
    m = cfg.fluid_model
    if m == FluidModel.Newtonian:
        return jnp.full_like(sr, cfg.mu)
    if m == FluidModel.powerlaw:
        return cfg.mu * jnp.power(sr, cfg.n_0 - 1.0)
    if m == FluidModel.Bingham:
        return cfg.mu + cfg.tau_0 * expterm(sr / cfg.papa_reg) / cfg.papa_reg
    if m == FluidModel.HerschelBulkley:
        return ((cfg.mu * jnp.power(sr, cfg.n_0) + cfg.tau_0)
                * expterm(sr / cfg.papa_reg) / cfg.papa_reg)
    if m == FluidModel.deSouzaMendesDutra:
        return ((cfg.mu * jnp.power(sr, cfg.n_0) + cfg.tau_0)
                * expterm(sr * (cfg.eta_0 / cfg.tau_0)) * (cfg.eta_0 / cfg.tau_0))
    raise ValueError(m)


def compute_viscosity(vel_g: jnp.ndarray, grid: Grid, ng: int,
                      cfg: IncfloConfig, out_ng: int = 1, eb=None
                      ) -> jnp.ndarray:
    """eta on the interior grown by out_ng ghosts (reference
    compute_viscosity_at_level uses growntilebox(1)).

    With EB, interior cut cells use the quadratic one-sided strain-rate
    stencils toward connected cells (reference incflo_strainrate_eb):
    differencing straight across covered cells (velocity = 0 there)
    overestimates the strain rate in every wall-adjacent cell, which
    directly corrupts the non-Newtonian viscosity (VERDICT r1 #4)."""
    if cfg.fluid_model == FluidModel.Newtonian:
        shape = tuple(n + 2 * out_ng for n in grid.cell_shape)
        return jnp.full(shape, cfg.mu, vel_g.dtype)
    sr = strainrate(vel_g, grid, ng, out_ng)
    if eb is not None:
        from incflo_tpu.eb import ops as ebops
        sr_eb = ebops.eb_strainrate(vel_g, grid, ng, eb)
        ctr = tuple(slice(out_ng, out_ng + n) for n in grid.cell_shape)
        cut = eb.cut > 0.5
        sr = sr.at[ctr].set(jnp.where(cut, sr_eb, sr[ctr]))
    return viscosity_of_strainrate(sr, cfg)
