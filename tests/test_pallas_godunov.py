"""Pallas Godunov kernels (interpret mode) vs the jnp reference path.

The fused kernels must reproduce ops/godunov.py bit-for-bit up to f32
reassociation on fully periodic domains -- same PPM/PLM traces, corner
coupling, Riemann/upwind selection, and divergence.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from incflo_tpu import bcs
from incflo_tpu.bcs import BCType
from incflo_tpu.grid import Grid
from incflo_tpu.ops import godunov
from incflo_tpu.ops import pallas_godunov as pg


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pg, "INTERPRET", True)


NX, NY, NZ = (16, 8, 16)      # m = ny*nz = 128


def _grid():
    return Grid(n_cell=(NX, NY, NZ), prob_lo=(0.0,) * 3,
                prob_hi=(1.0, 0.5, 1.0), periodic=(True,) * 3)


def _periodic_bcrec(ncomp):
    b = np.zeros((ncomp, 3, 2), np.int32)
    b[...] = int(BCType.int_dir)
    return b


def _smooth_fields(grid, ncomp, seed=0):
    rng = np.random.default_rng(seed)
    xs = [np.linspace(0, 2 * np.pi, n, endpoint=False)
          for n in grid.n_cell]
    X, Y, Z = np.meshgrid(*xs, indexing="ij")
    out = []
    for c in range(ncomp):
        a, b_, c_ = rng.normal(size=3)
        f = (a * np.sin(X + c) + b_ * np.cos(2 * Y - c)
             + c_ * np.sin(Z + 0.3 * c) + 0.1 * rng.normal())
        out.append(f)
    return jnp.asarray(np.stack(out, axis=-1), jnp.float32)


def _grow(a, ng, grid, ncomp):
    return bcs.grow(a, ng, grid, _periodic_bcrec(ncomp))


@pytest.mark.parametrize("use_ppm", [True, False])
@pytest.mark.parametrize("with_forces", [True, False])
def test_predict_matches_jnp(use_ppm, with_forces):
    grid = _grid()
    scheme = godunov.GodunovScheme(grid, use_ppm, False)
    vel = _smooth_fields(grid, 3, seed=1)
    forces = 0.3 * _smooth_fields(grid, 3, seed=2) if with_forces else None
    ng = 4
    dt = 0.01
    vel_g = _grow(vel, ng, grid, 3)
    f_g = _grow(forces, 1, grid, 3) if with_forces else None
    ref = scheme._predict(vel_g, f_g, dt, ng, _periodic_bcrec(3))
    got = pg.predict(grid, vel, forces, dt, use_ppm)
    for d in range(3):
        np.testing.assert_allclose(np.asarray(got[d]), np.asarray(ref[d]),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"umac[{d}]")


@pytest.mark.parametrize("use_ppm", [True, False])
@pytest.mark.parametrize("iconserv", [(0, 0, 0), (1, 1, 1)])
def test_advect_matches_jnp(use_ppm, iconserv):
    grid = _grid()
    scheme = godunov.GodunovScheme(grid, use_ppm, False)
    q = _smooth_fields(grid, 3, seed=3)
    forces = 0.2 * _smooth_fields(grid, 3, seed=4)
    vel = _smooth_fields(grid, 3, seed=5)
    ng = 4
    dt = 0.01
    vel_g = _grow(vel, ng, grid, 3)
    umac = scheme._predict(vel_g, None, dt, ng, _periodic_bcrec(3))
    q_g = _grow(q, ng, grid, 3)
    f_g = _grow(forces, 1, grid, 3)
    bcr = _periodic_bcrec(3)

    # jnp reference path (bypass the dispatch)
    import unittest.mock as mock
    with mock.patch.object(pg, "enabled", return_value=False):
        ref = scheme.advect(q_g, umac, f_g, dt, ng, bcr, list(iconserv),
                            True)
    got = pg.advect(grid, q, umac, forces, dt, iconserv, use_ppm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_advect_no_forces_single_comp():
    grid = _grid()
    scheme = godunov.GodunovScheme(grid, True, False)
    rho = 1.0 + 0.1 * _smooth_fields(grid, 1, seed=6)
    vel = _smooth_fields(grid, 3, seed=7)
    ng = 4
    dt = 0.008
    vel_g = _grow(vel, ng, grid, 3)
    umac = scheme._predict(vel_g, None, dt, ng, _periodic_bcrec(3))
    rho_g = _grow(rho, ng, grid, 1)
    import unittest.mock as mock
    with mock.patch.object(pg, "enabled", return_value=False):
        ref = scheme.advect(rho_g, umac, None, dt, ng,
                            _periodic_bcrec(1), [1], False)
    got = pg.advect(grid, rho, umac, None, dt, (1,), True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_dispatch_takes_pallas_path_when_supported(monkeypatch):
    """GodunovScheme.predict routes to the kernel on periodic f32 grids."""
    grid = _grid()
    scheme = godunov.GodunovScheme(grid, True, False)
    assert pg.supported(grid, jnp.float32)
    called = {}
    orig = pg.predict

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pg, "predict", spy)
    monkeypatch.setattr(pg, "enabled", lambda: True)
    vel = _smooth_fields(grid, 3, seed=8)
    vel_g = _grow(vel, 4, grid, 3)
    scheme.predict(vel_g, None, 0.01, 4, _periodic_bcrec(3))
    assert called.get("yes")


def test_unsupported_configs_fall_back(monkeypatch):
    grid2 = Grid(n_cell=(16, 16), prob_lo=(0.0,) * 2, prob_hi=(1.0,) * 2,
                 periodic=(True,) * 2)
    assert not pg.supported(grid2, jnp.float32)          # 2D
    grid_np = Grid(n_cell=(NX, NY, NZ), prob_lo=(0.0,) * 3,
                   prob_hi=(1.0,) * 3,
                   periodic=(True, True, False))
    assert not pg.supported(grid_np, jnp.float32)        # non-periodic
    monkeypatch.setattr(pg, "INTERPRET", False)          # real-TPU rules
    assert not pg.supported(_grid(), jnp.float64)        # f64 (no Mosaic)
