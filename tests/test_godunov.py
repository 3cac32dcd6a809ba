"""Godunov advection tests: exact-translation accuracy and end-to-end
Godunov decks."""

import jax.numpy as jnp
import numpy as np
import pytest

from incflo_tpu import bcs
from incflo_tpu.config import IncfloConfig
from incflo_tpu.grid import Grid
from incflo_tpu.ops.godunov import GodunovScheme
from incflo_tpu.simulation import Simulation


def _advect_error_2d(n, use_ppm, nsteps=8):
    """Advect a smooth periodic profile with a constant velocity; compare
    to the exact translation.  CTU should be ~2nd order (PLM) or better
    (PPM) with tiny error constants."""
    g = Grid((n, n), (0.0, 0.0), (1.0, 1.0), (True, True))
    rec = bcs.make_bcrecs(1, 2)
    sch = GodunovScheme(g, use_ppm, False)
    u0, v0 = 1.0, 0.5
    dt = 0.4 / n   # cfl 0.4 wrt u0
    xc = (np.arange(n) + 0.5) / n
    x = xc.reshape(-1, 1)
    y = xc.reshape(1, -1)

    def exact(t):
        return np.sin(2 * np.pi * (x - u0 * t)) * np.cos(2 * np.pi * (y - v0 * t))

    q = jnp.asarray(exact(0.0))
    umac = [jnp.full((n + 1, n), u0), jnp.full((n, n + 1), v0)]
    ng = 3
    for _ in range(nsteps):
        qg = bcs.grow(q[..., None], ng, g, rec)
        dqdt = sch.advect(qg, umac, None, dt, ng, rec, [1], False)
        q = q + dt * dqdt[..., 0]
    err = np.asarray(q) - exact(nsteps * dt)
    return np.sqrt(np.mean(err ** 2))


@pytest.mark.parametrize("use_ppm", [False, True])
def test_advect_translation_convergence(use_ppm):
    e1 = _advect_error_2d(32, use_ppm, nsteps=8)
    e2 = _advect_error_2d(64, use_ppm, nsteps=16)
    order = np.log2(e1 / e2)
    assert order > 1.8, f"ppm={use_ppm}: order {order} (e={e1}, {e2})"


def test_predict_uniform_field():
    """Prediction of a uniform velocity field must return that velocity
    on every face (CTU is exact for constants)."""
    g = Grid((16, 8), (0.0, 0.0), (1.0, 1.0), (True, True))
    rec = bcs.make_bcrecs(2, 2)
    sch = GodunovScheme(g, True, False)
    vel = jnp.stack([jnp.full((16, 8), 0.3), jnp.full((16, 8), -0.7)], -1)
    vg = bcs.grow(vel, 3, g, rec)
    umac = sch.predict(vg, None, 0.01, 3, rec)
    np.testing.assert_allclose(np.asarray(umac[0]), 0.3, atol=1e-14)
    np.testing.assert_allclose(np.asarray(umac[1]), -0.7, atol=1e-14)


def test_predict_3d_uniform():
    g = Grid((8, 8, 8), (0.0,) * 3, (1.0,) * 3, (True,) * 3)
    rec = bcs.make_bcrecs(3, 3)
    sch = GodunovScheme(g, False, False)
    vel = jnp.stack([jnp.full((8, 8, 8), v) for v in (0.2, -0.4, 0.9)], -1)
    vg = bcs.grow(vel, 3, g, rec)
    umac = sch.predict(vg, None, 0.05, 3, rec)
    for w, v in zip(umac, (0.2, -0.4, 0.9)):
        np.testing.assert_allclose(np.asarray(w), v, atol=1e-14)


def _advect_error_3d(n, nsteps):
    g = Grid((n, n, n), (0.0,) * 3, (1.0,) * 3, (True,) * 3)
    rec = bcs.make_bcrecs(1, 3)
    sch = GodunovScheme(g, True, False)
    vels = (1.0, 0.5, -0.25)
    dt = 0.3 / n
    xc = (np.arange(n) + 0.5) / n
    x = xc.reshape(-1, 1, 1)
    y = xc.reshape(1, -1, 1)
    z = xc.reshape(1, 1, -1)

    def exact(t):
        return (np.sin(2 * np.pi * (x - vels[0] * t))
                * np.cos(2 * np.pi * (y - vels[1] * t))
                * np.cos(2 * np.pi * (z - vels[2] * t)))

    q = jnp.asarray(exact(0.0))
    umac = [jnp.full((n + 1, n, n), vels[0]),
            jnp.full((n, n + 1, n), vels[1]),
            jnp.full((n, n, n + 1), vels[2])]
    for _ in range(nsteps):
        qg = bcs.grow(q[..., None], 3, g, rec)
        dqdt = sch.advect(qg, umac, None, dt, 3, rec, [1], False)
        q = q + dt * dqdt[..., 0]
    err = np.asarray(q) - exact(nsteps * dt)
    return np.sqrt(np.mean(err ** 2))


def test_advect_3d_translation_convergence():
    e16 = _advect_error_3d(16, 6)
    e32 = _advect_error_3d(32, 12)
    order = np.log2(e16 / e32)
    assert order > 1.8, f"order {order} (e={e16}, {e32})"


def test_godunov_tgv_deck_runs():
    """3D double shear layer deck (Godunov + PPM + CN) advances stably."""
    cfg = IncfloConfig.from_file(
        "/root/reference/test_no_eb/benchmark.double_shear_layer_x",
        argv=["amr.n_cell = 16 16 4", "max_step = 3"])
    sim = Simulation(cfg)
    s = sim.init_state()
    for _ in range(3):
        s = sim.advance(s)
    u = np.asarray(s.level.velocity)
    assert np.isfinite(u).all()
    assert np.abs(u).max() < 1.5
