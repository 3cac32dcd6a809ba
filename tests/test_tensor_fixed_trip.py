"""Fixed-trip kernel CG validation to the solver contract (VERDICT r4 #5).

The fused whole-step kernel (ops/pallas_step2d) replaces the adaptive
while-loop tensor CG with INCFLO_TENSOR_K masked unrolled steps
(ops/diffusion._tensor_pcg under pallas_guard.in_kernel()).  These tests
assert, in float64 at the reference tolerances (rtol 1e-11 / atol 1e-14,
reference /root/reference/src/incflo.H mg_rtol/mg_atol analog), that:

 1. the fixed-trip form's best residual meets the SAME tolerance the
    adaptive jnp path enforces, across a mu x stiffness grid spanning
    dt*mu/dx^2 from diffusion-light to far-super-CFL;
 2. the fixed-trip and adaptive solutions agree;
 3. when the trip budget CANNOT converge (forced via INCFLO_TENSOR_K=1
    on a stiff deck), the setup-time probe (_cg_probe_ok) detects it and
    maybe_fused declares the deck INELIGIBLE instead of letting a
    non-converged best iterate into the run.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incflo_tpu.config import IncfloConfig
from incflo_tpu.ops import diffusion, pallas_guard
from incflo_tpu.ops import multigrid as mg
from incflo_tpu.simulation import Simulation

DECK_F64 = """
amr.n_cell = 32 32
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
incflo.probtype = 1
incflo.mu = {mu}
incflo.cfl = 0.45
incflo.initial_iterations = 0
incflo.do_initial_proj = false
incflo.dtype = float64
tensor_diffusion.mg_rtol = 1e-11
tensor_diffusion.mg_atol = 1e-14
"""


def _solve_both(mu, stiffness):
    """Run the tensor velocity solve with the adaptive loop and the
    fixed-trip kernel form on the same inputs; return
    (out_adaptive, out_fixed, res_fixed, tol)."""
    cfg = IncfloConfig.from_text(DECK_F64.format(mu=mu))
    sim = Simulation(cfg)
    s = sim.init_state()
    grid = sim.grid
    ng = cfg.nghost_state()
    vel = s.level.velocity
    rho = s.level.density
    dx2 = float(grid.dx[0]) ** 2
    dt_diff = jnp.asarray(stiffness * dx2 / mu, vel.dtype)
    vel_g = sim.grow_vel(vel, ng)
    eta_g1 = sim._viscosity(vel_g, ng)
    eta_faces = diffusion.eta_to_faces(eta_g1, grid, eb=None)

    def run(in_kernel):
        pallas_guard.set_in_kernel(in_kernel)
        try:
            return jax.jit(lambda v, r: diffusion.diffuse_velocity(
                v, r, eta_faces, dt_diff, cfg, grid, eta_g1=eta_g1,
                grow_fn=lambda x: sim.grow_vel(x, ng), ng=ng,
                grow_hom_fn=lambda x: sim.grow_vel_hom(x, ng),
                return_tensor_res=True))(vel, rho)
        finally:
            pallas_guard.set_in_kernel(False)

    out_a, res_a, tol = run(False)
    out_f, res_f, _ = run(True)
    return out_a, out_f, float(res_f), float(tol), float(res_a)


# stiffness = dt_diff * mu / dx^2: 0.1 (CFL-limited explicit scale),
# 2 (typical Crank-Nicolson at cfl~1), 20 (strongly implicit)
@pytest.mark.parametrize("mu", [1e-3, 1e-2, 1.0])
@pytest.mark.parametrize("stiffness", [0.1, 2.0, 20.0])
def test_fixed_trip_meets_adaptive_tolerance(mu, stiffness):
    out_a, out_f, res_f, tol, res_a = _solve_both(mu, stiffness)
    # the adaptive loop itself met the contract on this case
    assert res_a <= tol, f"adaptive CG missed tol: {res_a} > {tol}"
    # the fixed-trip form meets the SAME tolerance (the contract)
    assert res_f <= tol, \
        f"fixed-trip CG missed the jnp path's tolerance: {res_f} > {tol}"
    # and the two solutions agree (both residuals < tol => difference
    # bounded by the solver conditioning; fields are O(1))
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_a),
                               rtol=0.0, atol=1e-8)


def test_insufficient_trips_gates_fusion(monkeypatch):
    """With the trip budget forced to 1 on a stiff deck, the fixed-trip
    CG cannot meet the tolerance -- the setup-time probe must catch it
    and maybe_fused must refuse to fuse (deck falls back to the
    adaptive jnp path)."""
    from incflo_tpu.ops import pallas_step2d

    monkeypatch.setenv("INCFLO_TENSOR_K", "1")
    # stiff: dt*mu/dx^2 = 0.5 * 10 * 1 / (1/32)^2 ~ 5120
    deck = """
amr.n_cell = 32 32
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
incflo.probtype = 1
incflo.mu = 1.0
incflo.fixed_dt = 10.0
incflo.initial_iterations = 0
incflo.do_initial_proj = false
incflo.dtype = float32
"""
    cfg = IncfloConfig.from_text(deck)
    sim = Simulation(cfg)
    s = sim.init_state()

    # the raw fixed-trip solve really does miss the tolerance here
    assert not pallas_step2d._cg_probe_ok(sim, s)

    monkeypatch.setattr(pallas_step2d, "INTERPRET", True)
    assert pallas_step2d.maybe_fused(sim, s) is None

    # the dispatcher consequently stays on the jnp path
    impl, is_fused = sim._step_impl(s)
    assert not is_fused


def test_probe_passes_on_benchmark_deck(monkeypatch):
    """The tgv2d benchmark class itself converges within the default
    trip budget: the probe admits it."""
    from incflo_tpu.ops import pallas_step2d

    deck = DECK_F64.format(mu=0.01).replace("float64", "float32")
    cfg = IncfloConfig.from_text(deck)
    sim = Simulation(cfg)
    s = sim.init_state()
    assert pallas_step2d._cg_probe_ok(sim, s)
