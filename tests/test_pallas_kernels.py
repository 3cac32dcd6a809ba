"""Interpret-mode equivalence tests for the fused Pallas MG kernels
(ops/pallas_nodal.py, ops/pallas_cell.py) against the jnp reference
smoothers.  Interpret mode runs the kernel logic on CPU, so these guard
the kernel math; the TPU lowering is exercised by bench runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incflo_tpu.ops import multigrid as mg


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from incflo_tpu.ops import pallas_cell, pallas_guard, pallas_nodal
    monkeypatch.setattr(pallas_nodal, "INTERPRET", True)
    monkeypatch.setattr(pallas_cell, "INTERPRET", True)
    # the sharding guard is process-global and sticky: a sharded-sim test
    # running earlier in the same process would leave it set and silently
    # disable the kernels under test here
    monkeypatch.setattr(pallas_guard, "_sharded", False)
    # periodic constant-coefficient solves would take the spectral
    # direct path and never reach the smoother kernels under test
    monkeypatch.setenv("INCFLO_SPECTRAL", "0")
    yield


def test_nodal_fused_smooth_matches_jnp():
    from incflo_tpu.ops import pallas_nodal as pn
    shape = (16, 8, 16)
    rng = np.random.RandomState(0)
    sigma = jnp.asarray(0.5 + rng.rand(*shape), jnp.float32)
    ns = mg.NodalSolver((1 / 16., 1 / 8., 1 / 16.), (True,) * 3,
                        (0,) * 3, (0,) * 3, sigma)
    lev = ns.levels[0]
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    b = jnp.asarray(rng.randn(*shape), jnp.float32)

    red, black = mg._checkerboards(x.shape, x.dtype)
    inv = ns.dinvs[0]
    xr = x
    for _ in range(2):
        xr = xr + red * (b - mg.nodal_apply(xr, lev)) * inv
        xr = xr + black * (b - mg.nodal_apply(xr, lev)) * inv
    r_ref = b - mg.nodal_apply(xr, lev)

    out, res = pn.smooth(x, b, ns._sigma_interior(0), inv, lev, 2, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xr), atol=2e-6)
    np.testing.assert_allclose(np.asarray(res), np.asarray(r_ref),
                               atol=5e-4)


def test_cell_fused_smooth_matches_jnp():
    from incflo_tpu.ops import pallas_cell as pc
    shape = (16, 8, 16)
    rng = np.random.RandomState(1)
    dx = (1 / 16., 1 / 8., 1 / 16.)
    acoef = jnp.asarray(1.0 + rng.rand(*shape), jnp.float32)
    bcoef = []
    for ax in range(3):
        fshape = tuple(s + (1 if a == ax else 0)
                       for a, s in enumerate(shape))
        f = 0.5 + rng.rand(*fshape)
        # periodic: face n == face 0
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[ax] = slice(0, 1)
        sl_hi[ax] = slice(fshape[ax] - 1, None)
        f[tuple(sl_hi)] = f[tuple(sl_lo)]
        bcoef.append(jnp.asarray(f, jnp.float32))
    cs = mg.CellSolver(dx, (0,) * 3, (0,) * 3, alpha=1.0, beta=0.01,
                       acoef=acoef, bcoef=tuple(bcoef))
    lev, diag = cs.levels[0], cs.diags[0]
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    b = jnp.asarray(rng.randn(*shape), jnp.float32)

    dmax = jnp.max(jnp.abs(diag))
    ok = jnp.abs(diag) > 1e-8 * dmax
    inv = jnp.where(ok, 1.0 / jnp.where(ok, diag, 1.0), 0.0)
    red, black = mg._checkerboards(x.shape, x.dtype, 3)
    xr = x
    for _ in range(2):
        xr = xr + red * (b - mg.cell_apply(xr, lev)) * inv
        xr = xr + black * (b - mg.cell_apply(xr, lev)) * inv
    r_ref = b - mg.cell_apply(xr, lev)

    assert pc.supported(lev, x.shape, x.dtype)
    out, res = pc.smooth(x, b, diag, pc.face_hi_coefs(lev), lev, 2, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xr), atol=2e-6)
    np.testing.assert_allclose(np.asarray(res), np.asarray(r_ref),
                               atol=5e-4)


def test_cell_solver_with_fused_path_converges():
    """End-to-end CellSolver.solve with the fused kernel active in the
    V-cycle (interpret mode forces the pallas path on CPU)."""
    from incflo_tpu.ops import pallas_cell as pc
    assert pc.enabled()
    shape = (16, 16, 16)
    rng = np.random.RandomState(2)
    dx = (1 / 16.,) * 3
    bcoef = []
    for ax in range(3):
        fshape = tuple(s + (1 if a == ax else 0)
                       for a, s in enumerate(shape))
        bcoef.append(jnp.ones(fshape, jnp.float32))
    cs = mg.CellSolver(dx, (0,) * 3, (0,) * 3, alpha=0.0, beta=1.0,
                       acoef=None, bcoef=tuple(bcoef))
    b = jnp.asarray(rng.randn(*shape), jnp.float32)
    b = b - jnp.mean(b)
    x, res, it = cs.solve(b, rtol=1e-5, atol=1e-7, maxiter=50)
    bnorm = float(jnp.max(jnp.abs(b)))
    assert float(res) <= 1.1e-5 * bnorm + 1e-7, (float(res), int(it))


def test_nodal_tiled_smooth_matches_jnp():
    """x-slab-tiled multi-sweep kernel (fine-level coverage): interior
    must be bit-identical to the global sequential-color sweeps."""
    from incflo_tpu.ops import pallas_nodal as pn
    shape = (32, 8, 16)
    rng = np.random.RandomState(1)
    sigma = jnp.asarray(0.5 + rng.rand(*shape), jnp.float32)
    ns = mg.NodalSolver((1 / 32., 1 / 8., 1 / 16.), (True,) * 3,
                        (0,) * 3, (0,) * 3, sigma)
    lev = ns.levels[0]
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    b = jnp.asarray(rng.randn(*shape), jnp.float32)

    red, black = mg._checkerboards(x.shape, x.dtype)
    inv = ns.dinvs[0]
    xr = x
    for _ in range(2):
        xr = xr + red * (b - mg.nodal_apply(xr, lev)) * inv
        xr = xr + black * (b - mg.nodal_apply(xr, lev)) * inv
    r_ref = b - mg.nodal_apply(xr, lev)

    out, res = pn._run_tiled(x, b, ns._sigma_interior(0), inv, 2, True,
                             tuple(float(d) for d in lev.dx), shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xr), atol=2e-6)
    np.testing.assert_allclose(np.asarray(res), np.asarray(r_ref),
                               atol=5e-4)


def test_nodal_tiled_chain_matches_four_sweeps():
    """smooth() chains 2+2 tiled sweeps when nsweeps=4."""
    from incflo_tpu.ops import pallas_nodal as pn
    shape = (32, 8, 16)
    rng = np.random.RandomState(2)
    sigma = jnp.asarray(0.5 + rng.rand(*shape), jnp.float32)
    ns = mg.NodalSolver((1 / 32., 1 / 8., 1 / 16.), (True,) * 3,
                        (0,) * 3, (0,) * 3, sigma)
    lev = ns.levels[0]
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    b = jnp.asarray(rng.randn(*shape), jnp.float32)
    red, black = mg._checkerboards(x.shape, x.dtype)
    inv = ns.dinvs[0]
    xr = x
    for _ in range(4):
        xr = xr + red * (b - mg.nodal_apply(xr, lev)) * inv
        xr = xr + black * (b - mg.nodal_apply(xr, lev)) * inv
    dx = tuple(float(d) for d in lev.dx)
    x1, _ = pn._run_tiled(x, b, ns._sigma_interior(0), inv, 2, False,
                          dx, shape)
    x2, _ = pn._run_tiled(x1, b, ns._sigma_interior(0), inv, 2, False,
                          dx, shape)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(xr), atol=5e-6)


def test_cell_tiled_smooth_matches_jnp():
    """Tiled multi-sweep cell smoother: identical to global sweeps."""
    from incflo_tpu.ops import pallas_cell as pc
    shape = (32, 8, 16)
    rng = np.random.RandomState(3)
    bco = []
    for ax in range(3):
        fshape = tuple(s + (1 if a == ax else 0)
                       for a, s in enumerate(shape))
        f = 0.5 + rng.rand(*fshape)
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[ax] = slice(0, 1)
        sl_hi[ax] = slice(fshape[ax] - 1, None)
        f[tuple(sl_hi)] = f[tuple(sl_lo)]   # periodic: face n == face 0
        bco.append(jnp.asarray(f, jnp.float32))
    cs = mg.CellSolver((1 / 32., 1 / 8., 1 / 16.), [0, 0, 0], [0, 0, 0],
                       alpha=1.0, beta=0.3,
                       acoef=jnp.ones(shape, jnp.float32),
                       bcoef=tuple(bco))
    lev, diag = cs.levels[0], cs.diags[0]
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    b = jnp.asarray(rng.randn(*shape), jnp.float32)

    red, black = mg._checkerboards(x.shape, x.dtype)
    dmax = jnp.max(jnp.abs(diag))
    ok = jnp.abs(diag) > 1e-8 * dmax
    inv = jnp.where(ok, 1.0 / jnp.where(ok, diag, 1.0), 0.0)
    xr = x
    for _ in range(2):
        xr = xr + red * (b - mg.cell_apply(xr, lev)) * inv
        xr = xr + black * (b - mg.cell_apply(xr, lev)) * inv
    r_ref = b - mg.cell_apply(xr, lev)

    fhi = pc.face_hi_coefs(lev)
    out, res = pc.smooth_tiled(x, b, diag, fhi, lev, 2, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xr), atol=2e-6)
    np.testing.assert_allclose(np.asarray(res), np.asarray(r_ref),
                               atol=5e-4)
