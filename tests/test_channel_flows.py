"""Wall-bounded flows: couette and plane Poiseuille (reference decks
test_2d/benchmark.couette, test/benchmark.poiseuille_plane_newtonian).
These exercise no-slip/slip BCs, the diffusion solver's inhomogeneous
Dirichlet values, and the background pressure gradient (delp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from incflo_tpu.config import IncfloConfig
from incflo_tpu.simulation import Simulation


def test_couette_steady_profile():
    """Moving top wall (u=1), no-slip bottom: steady u(y) = linear.
    Start FROM the exact profile; it must stay put."""
    n = 16
    text = f"""
amr.n_cell = {n} {n}
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 0
incflo.probtype = 4
incflo.ic_u = 1.0
incflo.mu = 0.1
incflo.cfl = 0.45
incflo.diffusion_type = 2
incflo.initial_iterations = 0
max_step = 10
ylo.type = "nsw"
ylo.velocity = -0.5 0.
yhi.type = "nsw"
yhi.velocity = 0.5 0.
"""
    cfg = IncfloConfig.from_text(text)
    sim = Simulation(cfg)
    s = sim.init_state()
    u0 = np.asarray(s.level.velocity[..., 0])
    y = (np.arange(n) + 0.5) / n
    np.testing.assert_allclose(u0[0], y - 0.5, atol=1e-12)   # IC is exact
    for _ in range(10):
        s = sim.advance(s)
    u = np.asarray(s.level.velocity[..., 0])
    v = np.asarray(s.level.velocity[..., 1])
    # steady solution preserved to solver tolerance
    np.testing.assert_allclose(u[0], y - 0.5, atol=1e-6)
    assert np.max(np.abs(v)) < 1e-8


def test_couette_relaxes_to_linear():
    """Start from rest with a moving top wall; u must diffuse toward the
    linear profile."""
    n = 16
    text = f"""
amr.n_cell = {n} {n}
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 0
incflo.probtype = 0
incflo.mu = 1.0
incflo.ro_0 = 1.
incflo.cfl = 0.45
incflo.fixed_dt = 0.02
incflo.diffusion_type = 2
incflo.initial_iterations = 0
max_step = 200
ylo.type = "nsw"
yhi.type = "nsw"
yhi.velocity = 1.0 0.
"""
    cfg = IncfloConfig.from_text(text)
    sim = Simulation(cfg)
    s = sim.init_state()
    for _ in range(200):
        s = sim.advance(s)
    u = np.asarray(s.level.velocity[..., 0])
    y = (np.arange(n) + 0.5) / n
    np.testing.assert_allclose(u[0], y, atol=2e-3)


def test_poiseuille_delp_steady():
    """Plane Poiseuille driven by incflo.delp: start from the exact
    parabola 6*u_mean*y*(1-y); it must remain steady.

    With u_mean=1, mu: the required pressure gradient is dp/dx = -12 mu
    => delp = 12*mu over a unit box."""
    n = 16
    mu = 0.1
    text = f"""
amr.n_cell = {n} {n}
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 0
incflo.probtype = 31
incflo.ic_u = 1.0
incflo.mu = {mu}
incflo.delp = {12.0 * mu} 0.
incflo.cfl = 0.45
incflo.diffusion_type = 2
incflo.initial_iterations = 0
max_step = 20
ylo.type = "nsw"
yhi.type = "nsw"
"""
    cfg = IncfloConfig.from_text(text)
    sim = Simulation(cfg)
    s = sim.init_state()
    for _ in range(20):
        s = sim.advance(s)
    u = np.asarray(s.level.velocity[..., 0])
    y = (np.arange(n) + 0.5) / n
    exact = 6.0 * y * (1 - y)
    np.testing.assert_allclose(u[0], exact, atol=5e-3)
