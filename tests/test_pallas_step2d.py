"""Fused whole-step kernel (ops/pallas_step2d) parity vs the jnp path.

The kernel body IS Simulation._advance_impl, so agreement is near
bitwise; the only numerical divergence allowed is the tensor CG's
fixed-trip kernel form, which converges to the same tolerance.
Runs in Pallas interpret mode on the CPU test backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incflo_tpu.config import IncfloConfig
from incflo_tpu.simulation import Simulation
from incflo_tpu.ops import pallas_step2d

DECK = """
amr.n_cell = 32 32
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
incflo.probtype = 1
incflo.mu = 0.01
incflo.cfl = 0.45
incflo.initial_iterations = 0
incflo.do_initial_proj = false
incflo.dtype = float32
"""


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_step2d, "INTERPRET", True)


def test_supported_and_parity():
    cfg = IncfloConfig.from_text(DECK)
    sim = Simulation(cfg)
    s = sim.init_state()
    assert pallas_step2d.supported(sim)

    ref = jax.jit(sim._advance_impl)(s, sim._ctx())
    fused = pallas_step2d.maybe_fused(sim, s)
    assert fused is not None
    out = jax.jit(fused.__call__)(s, sim._ctx())

    ref_l = jax.tree_util.tree_leaves(ref)
    out_l = jax.tree_util.tree_leaves(out)
    assert len(ref_l) == len(out_l)
    for a, b in zip(ref_l, out_l):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-4, atol=1e-5)


def test_advance_dispatches_fused():
    cfg = IncfloConfig.from_text(DECK)
    sim = Simulation(cfg)
    s = sim.init_state()
    impl, is_fused = sim._step_impl(s)
    assert is_fused
    s1 = sim.advance(s)
    assert np.isfinite(np.asarray(s1.level.velocity)).all()
    # two batched steps through the scanned path as well
    s2 = sim.advance_n(s, 2)
    assert np.isfinite(np.asarray(s2.level.velocity)).all()
    assert int(s2.step) == int(s.step) + 2


def test_not_supported_cases():
    # non-periodic: ineligible
    cfg = IncfloConfig.from_text(DECK.replace(
        "geometry.is_periodic = 1 1", "geometry.is_periodic = 1 0")
        + 'ylo.type = "nsw"\nyhi.type = "nsw"\n')
    sim = Simulation(cfg)
    # fast-diag symbols may still exist for wall BCs, but only the
    # all-periodic + constant-density contract is fused this round
    assert not all(sim.grid.periodic)
    if pallas_step2d.supported(sim):
        pytest.fail("non-periodic deck must not fuse")
