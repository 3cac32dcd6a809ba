"""Pallas fused RB-GS smoother: equivalence vs the jnp smoother
(interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from incflo_tpu.ops import multigrid as mg
from incflo_tpu.ops import pallas_smoother as psm


@pytest.fixture(autouse=True)
def _interpret():
    old = psm.INTERPRET
    psm.INTERPRET = True
    yield
    psm.INTERPRET = old


def _setup(bcs, seed=0):
    rng = np.random.RandomState(seed)
    nx, ny, nz = 16, 16, 8
    dx = (1 / nx, 1 / ny, 1 / nz)
    acoef = jnp.asarray(1.0 + rng.rand(nx, ny, nz))
    b = [jnp.asarray(0.5 + rng.rand(nx + 1, ny, nz)),
         jnp.asarray(0.5 + rng.rand(nx, ny + 1, nz)),
         jnp.asarray(0.5 + rng.rand(nx, ny, nz + 1))]
    b[0] = b[0].at[-1].set(b[0][0])
    rhs = jnp.asarray(rng.randn(nx, ny, nz))
    x0 = jnp.asarray(rng.randn(nx, ny, nz))
    lev = mg.CellLevel(dx, tuple(int(v) for v in bcs),
                       tuple(int(v) for v in bcs), 1.0, 0.01, acoef, tuple(b))
    return lev, acoef, b, rhs, x0


def _jnp_sweep(x0, rhs, lev, inv):
    red, black = mg._checkerboards(x0.shape, x0.dtype, 3)
    xr = x0 + red * (rhs - mg.cell_apply(x0, lev)) * inv
    return xr + black * (rhs - mg.cell_apply(xr, lev)) * inv


@pytest.mark.parametrize("bcs", [
    (mg.SolverBC.PERIODIC,) * 3,
    (mg.SolverBC.PERIODIC, mg.SolverBC.DIRICHLET, mg.SolverBC.NEUMANN),
    (mg.SolverBC.PERIODIC, mg.SolverBC.NEUMANN, mg.SolverBC.PERIODIC),
])
def test_sweep_matches_jnp(bcs):
    lev, acoef, b, rhs, x0 = _setup(bcs)
    inv = 1.0 / mg.cell_diag(lev)
    ref = _jnp_sweep(x0, rhs, lev, inv)
    out = psm.rb_sweep_3d(x0, rhs, inv, acoef, b, lev)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_sweep_nonperiodic_x_interior():
    """Non-periodic x: bit-exact away from the x boundary ring (the black
    pass there sees the pre-sweep ghost -- a documented smoother variant)."""
    bcs = (mg.SolverBC.DIRICHLET, mg.SolverBC.NEUMANN, mg.SolverBC.PERIODIC)
    lev, acoef, b, rhs, x0 = _setup(bcs)
    inv = 1.0 / mg.cell_diag(lev)
    ref = _jnp_sweep(x0, rhs, lev, inv)
    out = psm.rb_sweep_3d(x0, rhs, inv, acoef, b, lev)
    np.testing.assert_allclose(np.asarray(out[2:-2]), np.asarray(ref[2:-2]),
                               atol=1e-13)
