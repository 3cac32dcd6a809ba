"""Tensor-diffusion coupling tests (VERDICT r1 Weak #6/#9).

Verifies (a) the defect-correction loop converges the FULL coupled
tensor system (rho - dt div(eta(grad+grad^T))) u = rho u* to the main
solve's tolerance -- the claim the round-1 docstring made without a
test -- and (b) the explicit-diffusion CFL uses the actual eta field
for non-Newtonian fluids.
"""

import jax
import jax.numpy as jnp
import numpy as np

from incflo_tpu.config import IncfloConfig
from incflo_tpu.grid import Grid
from incflo_tpu.ops import diffusion
from incflo_tpu.ops import multigrid as mg
from incflo_tpu.simulation import Simulation


def _cfg(extra=""):
    return IncfloConfig.from_text(f"""
amr.n_cell = 32 32
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
incflo.probtype = 1
incflo.mu = 0.05
incflo.cfl = 0.45
incflo.diffusion_type = 2
incflo.initial_iterations = 0
incflo.do_initial_proj = 0
""" + extra)


def _full_tensor_residual(out, vel0, rho, dt_diff, cfg, sim, grid, ng):
    """rhs - [rho*out - dt*div(eta(grad out + grad out^T))]."""
    vel_g = sim.grow_vel(out, ng)
    eta_g1 = sim._viscosity(sim.grow_vel(vel0, ng), ng)
    eta_faces = diffusion.eta_to_faces(eta_g1, grid)
    # divtau of the COUPLED operator at `out` (times rho to undo /rho)
    divtau = diffusion.compute_divtau(out, vel_g, rho, eta_faces, eta_g1,
                                      cfg, grid, ng) * rho[..., None]
    rhs = rho[..., None] * vel0
    return rhs - (rho[..., None] * out - dt_diff * divtau)


def test_tensor_defect_correction_converges_full_system():
    """After diffuse_velocity, the residual of the monolithic coupled
    tensor operator (not just the decoupled Helmholtz) must be at the
    solver tolerance."""
    cfg = _cfg("incflo.use_tensor_solve = true\n")
    sim = Simulation(cfg)
    grid, ng, dtype = sim.grid, cfg.nghost_state(), sim.dtype

    # non-trivial velocity field with strong cross-derivatives
    x = jnp.asarray(grid.cell_centers_1d(0)).reshape(-1, 1)
    y = jnp.asarray(grid.cell_centers_1d(1)).reshape(1, -1)
    u = jnp.sin(2 * np.pi * x) * jnp.cos(2 * np.pi * y)
    v = -jnp.cos(2 * np.pi * x) * jnp.sin(2 * np.pi * y) * 0.7
    vel = jnp.stack([u, v], axis=-1).astype(dtype)
    rho = jnp.ones(grid.cell_shape, dtype) * 1.3
    dt_diff = jnp.asarray(0.05, dtype)   # large dt => strong coupling

    vel_g = sim.grow_vel(vel, ng)
    eta_g1 = sim._viscosity(vel_g, ng)
    eta_faces = diffusion.eta_to_faces(eta_g1, grid)
    rtol, atol = 1e-11, 1e-13
    out = diffusion.diffuse_velocity(vel, rho, eta_faces, dt_diff, cfg,
                                     grid, rtol=rtol, atol=atol,
                                     eta_g1=eta_g1,
                                     grow_fn=lambda w: sim.grow_vel(w, ng),
                                     ng=ng)
    r = _full_tensor_residual(out, vel, rho, dt_diff, cfg, sim, grid, ng)
    rhs_norm = float(jnp.max(jnp.abs(rho[..., None] * vel)))
    rnorm = float(jnp.max(jnp.abs(r)))
    # full coupled-system residual at (a small multiple of) the main
    # solve's tolerance
    assert rnorm <= 20 * max(rtol * rhs_norm, atol), (rnorm, rhs_norm)


def test_explicit_dt_uses_actual_viscosity_for_bingham():
    """Explicit diffusion + Bingham: eta >> mu near zero strain rate, so
    the stable dt must be much smaller than the constant-mu formula."""
    extra = """
incflo.diffusion_type = 0
incflo.fluid_model = "bingham"
incflo.mu = 0.01
incflo.tau_0 = 10.0
incflo.papa_reg = 0.01
"""
    cfg = _cfg(extra)
    sim = Simulation(cfg)
    s = sim.init_state()
    vf = sim.compute_vel_forces(s.level.density, s.level.tracer,
                                s.level.tracer, s.level.gp)
    dt = float(sim.compute_dt(s.level.velocity, s.level.density, vf, s))

    cfg_newt = _cfg("incflo.diffusion_type = 0\nincflo.mu = 0.01\n")
    sim_n = Simulation(cfg_newt)
    s_n = sim_n.init_state()
    vf_n = sim_n.compute_vel_forces(s_n.level.density, s_n.level.tracer,
                                    s_n.level.tracer, s_n.level.gp)
    dt_newt = float(sim_n.compute_dt(s_n.level.velocity, s_n.level.density,
                                     vf_n, s_n))
    # Bingham eta ~ mu + tau_0/papa_reg*expterm ~ 0.01 + O(100) near
    # sr->0: the dt must reflect the real eta, orders below Newtonian
    assert dt < dt_newt / 50, (dt, dt_newt)
