"""End-to-end integrator tests on reference decks (MOL path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from incflo_tpu.config import IncfloConfig
from incflo_tpu.simulation import Simulation
from incflo_tpu.ops import multigrid as mg

TGV_DECK = "/root/reference/test_no_eb_2d/benchmark.taylor_green_vortices"


def _nodal_div(sim, s):
    grid = sim.grid
    upads = sim._pad_vel_for_divergence(s.level.velocity,
                                        jnp.ones((), sim.dtype))
    bc_lo, bc_hi = [], []
    from incflo_tpu.ops.mac_projection import projection_solver_bc
    bc_lo, bc_hi = projection_solver_bc(sim.cfg.bc_kind, grid)
    solver = mg.NodalSolver(grid.dx, grid.periodic, bc_lo, bc_hi,
                            jnp.ones(grid.cell_shape, sim.dtype))
    return float(jnp.max(jnp.abs(mg._nodes_unique(
        mg.nodal_divergence(upads, grid.dx), solver.levels[0]))))


def test_tgv2d_few_steps():
    """TGV 2D (probtype 1, periodic, MOL+implicit): KE decays, dt obeys
    CFL, velocity stays bounded, projection keeps divergence small."""
    cfg = IncfloConfig.from_file(TGV_DECK, argv=["amr.n_cell = 16 16"])
    sim = Simulation(cfg)
    s = sim.init_state()
    ke0 = float(jnp.mean(jnp.sum(s.level.velocity ** 2, -1)))
    for _ in range(5):
        s = sim.advance(s)
    ke = float(jnp.mean(jnp.sum(s.level.velocity ** 2, -1)))
    assert 0 < ke < ke0          # viscous decay
    assert np.isfinite(float(jnp.max(jnp.abs(s.level.velocity))))
    dt = float(s.dt)
    umax = float(jnp.max(jnp.abs(s.level.velocity)))
    assert dt <= cfg.cfl / (umax * 16 * 0.999) * 2  # loose CFL sanity
    assert float(s.t) > 0
    # approximate projection: nodal divergence small vs initial |u|~1/dx
    assert _nodal_div(sim, s) < 1.0


def _taylor_vortex_error(n, nsteps_dt=None, use_godunov=False):
    """Decaying Taylor vortex (probtype 2): L2 error of u vs exact after
    fixed time T with dt ~ 1/n (the reference convergence_2d harness)."""
    text = f"""
amr.n_cell = {n} {n}
amr.max_level = 0
geometry.prob_lo = 0. 0.
geometry.prob_hi = 2. 2.
geometry.is_periodic = 1 1
incflo.probtype = 2
incflo.mu = 0.001
incflo.ro_0 = 1.
incflo.cfl = 0.45
incflo.fixed_dt = {0.256 / n}
max_step = {n // 4}
incflo.diffusion_type = 0
incflo.initial_iterations = 3
incflo.ntrac = 1
"""
    cfg = IncfloConfig.from_text(text)
    sim = Simulation(cfg)
    s = sim.init_state()
    for _ in range(cfg.max_step):
        s = sim.advance(s)
    t = float(s.t)
    # exact solution (reference src/derive/incflo_error.cpp:60-113)
    xc = (np.arange(n) + 0.5) * (2.0 / n)
    x = xc.reshape(-1, 1)
    y = xc.reshape(1, -1)
    u0 = v0 = 1.0
    visc = 0.001
    omega = np.pi ** 2 * visc
    u_ex = u0 - np.cos(np.pi * (x - u0 * t)) * np.sin(np.pi * (y - v0 * t)) \
        * np.exp(-2 * omega * t)
    err = np.asarray(s.level.velocity[..., 0]) - u_ex
    return np.sqrt(np.mean(err ** 2))


@pytest.mark.slow
def test_taylor_vortex_convergence_mol():
    """2nd-order velocity convergence on the decaying Taylor vortex
    (the reference's convergence_2d/todo harness criterion)."""
    e16 = _taylor_vortex_error(16)
    e32 = _taylor_vortex_error(32)
    order = np.log2(e16 / e32)
    assert order > 1.7, f"convergence order {order} (e16={e16}, e32={e32})"
