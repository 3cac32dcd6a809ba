"""Ghost-fill (bcs.grow) and IC library tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from incflo_tpu import bcs, probs
from incflo_tpu.config import IncfloConfig
from incflo_tpu.grid import Grid

F64 = jnp.float64


def _grid2d(per=(True, True), n=(8, 8)):
    return Grid(n, (0.0, 0.0), (1.0, 1.0), per)


def test_grow_periodic():
    g = _grid2d()
    f = jnp.arange(64, dtype=F64).reshape(8, 8)[..., None]
    out = bcs.grow(f, 2, g, bcs.make_bcrecs(1, 2))
    assert out.shape == (12, 12, 1)
    np.testing.assert_array_equal(out[2:-2, 2:-2, 0], f[..., 0])
    np.testing.assert_array_equal(out[:2, 2:-2, 0], f[-2:, :, 0])
    np.testing.assert_array_equal(out[-2:, 2:-2, 0], f[:2, :, 0])
    # corner double-wrap
    assert out[0, 0, 0] == f[-2, -2, 0]


def test_grow_foextrap_hoextrap():
    g = _grid2d(per=(False, True))
    x = jnp.arange(8, dtype=F64)
    f = jnp.broadcast_to(x[:, None], (8, 8))[..., None]
    rec = bcs.make_bcrecs(1, 2)
    rec[0, 0, 0] = bcs.BCType.foextrap
    rec[0, 0, 1] = bcs.BCType.hoextrap
    out = bcs.grow(f, 2, g, rec)
    # foextrap lo: copy q0 = 0
    np.testing.assert_allclose(np.asarray(out[:2, 2:-2, 0]), 0.0)
    # hoextrap hi first ghost (adjacent to interior): 1/8(15*7 - 10*6 + 3*5) = 7.5
    np.testing.assert_allclose(np.asarray(out[-2, 2:-2, 0]), 7.5)
    # hoextrap far ghost copies q0 = 7
    np.testing.assert_allclose(np.asarray(out[-1, 2:-2, 0]), 7.0)


def test_grow_extdir_constant_and_profile():
    # mass inflow at xlo with probtype 31 parabolic profile
    g = Grid((8, 8), (0.0, 0.0), (1.0, 1.0), (False, True))
    rec = bcs.make_bcrecs(2, 2)
    rec[:, 0, 0] = bcs.BCType.ext_dir
    rec[:, 0, 1] = bcs.BCType.foextrap
    vals = np.zeros((2, 2, 2))
    vals[0, 0, 0] = 2.0  # u at xlo
    ev = bcs.ExtDirValues(g, vals, probtype=31)
    f = jnp.ones((8, 8, 2), F64)
    out = bcs.grow(f, 1, g, rec, ev)
    y = (np.arange(8) + 0.5) / 8
    expect = 2.0 * 6.0 * y * (1 - y)
    np.testing.assert_allclose(np.asarray(out[0, 1:-1, 0]), expect, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(out[0, 1:-1, 1]), 0.0)


def test_grow_matches_order_in_corners():
    # ext_dir in y should overwrite corners of x ghosts
    g = Grid((4, 4), (0.0, 0.0), (1.0, 1.0), (False, False))
    rec = bcs.make_bcrecs(1, 2)
    rec[0, 0, :] = bcs.BCType.foextrap
    rec[0, 1, :] = bcs.BCType.ext_dir
    vals = np.full((2, 2, 1), 9.0)
    ev = bcs.ExtDirValues(g, vals, probtype=0)
    f = jnp.zeros((4, 4, 1), F64)
    out = bcs.grow(f, 1, g, rec, ev)
    assert out[0, 0, 0] == 9.0  # corner got y's ext_dir value


TGV_2D = """
stop_time = 1.0
incflo.cfl = 0.45
incflo.mu = 0.01
amr.n_cell = 16 16
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
incflo.probtype = 1
"""


def test_init_taylor_green():
    cfg = IncfloConfig.from_text(TGV_2D)
    st = probs.init_fluid(cfg, cfg.grid, F64)
    assert st.velocity.shape == (16, 16, 2)
    x = (np.arange(16) + 0.5) / 16
    u_expect = np.sin(2 * np.pi * x)[:, None] * np.cos(2 * np.pi * x)[None, :]
    np.testing.assert_allclose(np.asarray(st.velocity[..., 0]), u_expect, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st.density), 1.0)


def test_init_rayleigh_taylor():
    cfg = IncfloConfig.from_file(
        "/root/reference/test_no_eb/benchmark.rayleigh_taylor")
    st = probs.init_fluid(cfg, cfg.grid, F64)
    assert st.velocity.shape == (32, 32, 64, 3)
    rho = np.asarray(st.density)
    assert rho.min() == pytest.approx(0.5, abs=1e-6)
    assert rho.max() == pytest.approx(2.0, abs=1e-6)
    # heavy on top
    assert rho[:, :, -1].mean() > rho[:, :, 0].mean()


def test_init_double_shear_layer():
    cfg = IncfloConfig.from_file(
        "/root/reference/test_no_eb/benchmark.double_shear_layer_x")
    st = probs.init_fluid(cfg, cfg.grid, F64)
    u = np.asarray(st.velocity[..., 0])
    assert u.max() <= 1.0 and u.min() >= -1.0
    assert abs(u[:, 16, 0].mean() - 1.0) < 1e-3  # center of layer: tanh(30*.25)
