"""Multigrid solver tests: manufactured solutions to MLMG-grade
tolerances (rtol 1e-11 / atol 1e-14, reference incflo.H:342-343)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incflo_tpu.ops import multigrid as mg

PI = np.pi


@pytest.fixture(autouse=True)
def _force_mg_path(monkeypatch):
    """These tests validate the geometric-MG iteration; periodic
    constant-coefficient cases would otherwise take the spectral
    direct-solve fast path (covered by test_spectral.py)."""
    monkeypatch.setenv("INCFLO_SPECTRAL", "0")


def _coords(n, ndim, centered=True):
    dx = 1.0 / n
    c = (np.arange(n) + (0.5 if centered else 0.0)) * dx
    out = []
    for ax in range(ndim):
        shape = [1] * ndim
        shape[ax] = -1
        out.append(jnp.asarray(c.reshape(shape)))
    return out, (dx,) * ndim


def test_cell_poisson_periodic_2d():
    n = 64
    (x, y), dx = _coords(n, 2)
    phi_exact = jnp.sin(2 * PI * x) * jnp.cos(4 * PI * y)
    rhs = -(4 + 16) * PI**2 * phi_exact   # laplacian
    b = [jnp.ones((n + 1, n)), jnp.ones((n, n + 1))]
    s = mg.CellSolver(dx, [mg.SolverBC.PERIODIC] * 2, [mg.SolverBC.PERIODIC] * 2,
                      alpha=0.0, beta=-1.0, acoef=None, bcoef=b)
    sol, res, it = s.solve(rhs, rtol=1e-12, atol=0.0)
    assert float(res) < 1e-12 * float(jnp.max(jnp.abs(rhs)))
    err = sol - jnp.mean(sol) - (phi_exact - jnp.mean(phi_exact))
    # discretization error ~ (2nd order)
    assert float(jnp.max(jnp.abs(err))) < 5e-3
    assert int(it) < 30


def test_cell_poisson_discrete_exactness():
    """The solver must reduce the DISCRETE residual to ~0: apply(sol)==rhs."""
    n = 32
    rng = np.random.RandomState(0)
    rhs = jnp.asarray(rng.randn(n, n))
    rhs = rhs - jnp.mean(rhs)
    dx = (1.0 / n, 1.0 / n)
    b = [jnp.ones((n + 1, n)), jnp.ones((n, n + 1))]
    s = mg.CellSolver(dx, [mg.SolverBC.PERIODIC] * 2, [mg.SolverBC.PERIODIC] * 2,
                      0.0, -1.0, None, b)
    sol, res, it = s.solve(rhs, rtol=1e-12, atol=1e-13)
    r = rhs - mg.cell_apply(sol, s.levels[0])
    assert float(jnp.max(jnp.abs(r))) < 1e-11


def test_cell_helmholtz_dirichlet_neumann_3d():
    """(a - div(b grad)) with mixed BCs, variable coefficients: check the
    solve hits the discrete tolerance."""
    n = 16
    rng = np.random.RandomState(1)
    dx = (1.0 / n,) * 3
    acoef = jnp.asarray(1.0 + 0.5 * rng.rand(n, n, n))
    b = [jnp.asarray(0.5 + rng.rand(n + 1, n, n)),
         jnp.asarray(0.5 + rng.rand(n, n + 1, n)),
         jnp.asarray(0.5 + rng.rand(n, n, n + 1))]
    rhs = jnp.asarray(rng.randn(n, n, n))
    bc_lo = [mg.SolverBC.DIRICHLET, mg.SolverBC.NEUMANN, mg.SolverBC.PERIODIC]
    bc_hi = [mg.SolverBC.NEUMANN, mg.SolverBC.DIRICHLET, mg.SolverBC.PERIODIC]
    s = mg.CellSolver(dx, bc_lo, bc_hi, alpha=1.0, beta=0.01, acoef=acoef, bcoef=b)
    sol, res, it = s.solve(rhs, rtol=1e-12, atol=1e-14)
    r = rhs - mg.cell_apply(sol, s.levels[0])
    assert float(jnp.max(jnp.abs(r))) < 1e-11
    assert int(it) < 40


def test_cell_dirichlet_accuracy_1d_profile():
    """Dirichlet maxorder-3 ghost: solve -d2phi/dy2 = 2 with phi(0)=phi(1)=0
    -> phi = y(1-y): a quadratic the discretization must reproduce to
    roundoff."""
    n = 16
    dx = (1.0 / n, 1.0 / n)
    rhs = jnp.full((n, n), 2.0)
    b = [jnp.ones((n + 1, n)), jnp.ones((n, n + 1))]
    bc_lo = [mg.SolverBC.PERIODIC, mg.SolverBC.DIRICHLET]
    bc_hi = [mg.SolverBC.PERIODIC, mg.SolverBC.DIRICHLET]
    s = mg.CellSolver(dx, bc_lo, bc_hi, 0.0, 1.0, None, b)  # L = -lap
    sol, res, it = s.solve(rhs, rtol=1e-13, atol=1e-15)
    y = (np.arange(n) + 0.5) / n
    exact = y * (1 - y)
    np.testing.assert_allclose(np.asarray(sol[0]), exact, atol=1e-10)


def test_nodal_poisson_periodic_2d():
    n = 64
    dx = (1.0 / n, 1.0 / n)
    xn = (np.arange(n)) / n
    x = jnp.asarray(xn.reshape(-1, 1))
    y = jnp.asarray(xn.reshape(1, -1))
    phi = jnp.sin(2 * PI * x) * jnp.sin(2 * PI * y)
    sigma = jnp.ones((n, n))
    s = mg.NodalSolver(dx, (True, True), [mg.SolverBC.NEUMANN] * 2,
                       [mg.SolverBC.NEUMANN] * 2, sigma)
    rhs = mg.nodal_apply(phi, s.levels[0])
    sol, res, it = s.solve(rhs, rtol=1e-12, atol=0.0)
    err = sol - jnp.mean(sol) - (phi - jnp.mean(phi))
    assert float(jnp.max(jnp.abs(err))) < 1e-9   # discrete inverse of apply
    assert int(it) < 40


def _project_periodic_2d(n):
    """Project the gradient of chi=sin(2pix)sin(2piy) (a genuinely mixed
    Fourier mode, where FEM L != D(sigma G) and the approximate-projection
    O(h^2) defect is visible); return (div_before, div_after)."""
    dx = (1.0 / n, 1.0 / n)
    xc = (np.arange(n) + 0.5) / n
    x = jnp.asarray(xc.reshape(-1, 1))
    y = jnp.asarray(xc.reshape(1, -1))
    u = 2 * PI * jnp.cos(2 * PI * x) * jnp.sin(2 * PI * y)
    v = 2 * PI * jnp.sin(2 * PI * x) * jnp.cos(2 * PI * y)
    sigma = jnp.ones((n, n))
    s = mg.NodalSolver(dx, (True, True), [mg.SolverBC.NEUMANN] * 2,
                       [mg.SolverBC.NEUMANN] * 2, sigma)

    def div_of(u, v):
        upad = [mg._wrap_pad(mg._wrap_pad(u, 0), 1),
                mg._wrap_pad(mg._wrap_pad(v, 0), 1)]
        return mg._nodes_unique(mg.nodal_divergence(upad, dx), s.levels[0])

    rhs = div_of(u, v)
    phi, res, it = s.solve(rhs, rtol=1e-11, atol=1e-14)
    # solver itself must hit the MLMG tolerance contract
    assert float(res) <= max(1e-11 * float(jnp.max(jnp.abs(rhs))), 1e-14)
    g = s.grad_at_cells(phi)
    u2, v2 = u - sigma * g[..., 0], v - sigma * g[..., 1]
    return (float(jnp.max(jnp.abs(rhs))),
            float(jnp.max(jnp.abs(div_of(u2, v2)))))


def test_nodal_projection_smooth_2d_second_order():
    """Approximate projection: post-projection divergence is O(h^2)
    (the reference's NodalProjector has the same property)."""
    d0_32, d1_32 = _project_periodic_2d(32)
    d0_64, d1_64 = _project_periodic_2d(64)
    assert d1_32 < 2e-2 * d0_32          # big reduction at n=32
    ratio = d1_32 / d1_64
    assert ratio > 3.0                   # ~4x per refinement = 2nd order


def test_nodal_projection_walls_3d():
    """3D with slip walls in z (Neumann) like rayleigh_taylor: velocity
    ghosts zero at walls; solve converges and divergence drops."""
    nx, ny, nz = 16, 16, 32
    dx = (1.0 / nx, 1.0 / ny, 1.0 / nz)
    xc = lambda n: (np.arange(n) + 0.5) / n
    x = jnp.asarray(xc(nx).reshape(-1, 1, 1))
    z = jnp.asarray(xc(nz).reshape(1, 1, -1))
    u = jnp.broadcast_to(jnp.sin(2 * PI * x) * jnp.sin(PI * z), (nx, ny, nz))
    v = jnp.zeros((nx, ny, nz))
    w = jnp.broadcast_to(jnp.cos(2 * PI * x) * z * (1 - z), (nx, ny, nz))
    sigma = jnp.ones((nx, ny, nz))
    per = (True, True, False)
    s = mg.NodalSolver(dx, per, [mg.SolverBC.NEUMANN] * 3,
                       [mg.SolverBC.NEUMANN] * 3, sigma)

    def pad_all(f):
        f = mg._wrap_pad(f, 0)
        f = mg._wrap_pad(f, 1)
        return mg._zero_pad(f, 2)

    def div_of(u, v, w):
        return mg._nodes_unique(
            mg.nodal_divergence([pad_all(u), pad_all(v), pad_all(w)], dx),
            s.levels[0])

    rhs = div_of(u, v, w)
    div0 = float(jnp.max(jnp.abs(rhs)))
    phi, res, it = s.solve(rhs, rtol=1e-11, atol=1e-14)
    assert float(res) <= max(1e-11 * div0, 1e-14)
    g = s.grad_at_cells(phi)
    u2, v2, w2 = u - g[..., 0], v - g[..., 1], w - g[..., 2]
    div1 = float(jnp.max(jnp.abs(div_of(u2, v2, w2))))
    assert div1 < 5e-2 * div0


def test_nodal_dirichlet_pressure_outflow():
    """Pressure outflow at xhi -> Dirichlet phi=0 on that node plane."""
    n = 16
    dx = (1.0 / n, 1.0 / n)
    rng = np.random.RandomState(4)
    u = jnp.asarray(rng.randn(n, n))
    v = jnp.asarray(rng.randn(n, n))
    sigma = jnp.ones((n, n))
    per = (False, False)
    bc_lo = [mg.SolverBC.NEUMANN, mg.SolverBC.NEUMANN]
    bc_hi = [mg.SolverBC.DIRICHLET, mg.SolverBC.NEUMANN]
    s = mg.NodalSolver(dx, per, bc_lo, bc_hi, sigma)

    def pad_all(w):
        w = mg._zero_pad(w, 0)
        w = mg._zero_pad(w, 1)
        return w

    rhs = mg.nodal_divergence([pad_all(u), pad_all(v)], dx)
    phi, res, it = s.solve(rhs, rtol=1e-11, atol=1e-14)
    # Dirichlet plane stays zero
    assert float(jnp.max(jnp.abs(phi[-1, :]))) == 0.0
    r = mg._zero_dirichlet(rhs, s.levels[0]) - mg.nodal_apply(phi, s.levels[0])
    assert float(jnp.max(jnp.abs(r))) < 1e-11 * float(jnp.max(jnp.abs(rhs)))


def test_nodal_apply_factorized_matches_boxsum_form():
    """The rank-1-factorized Q1 FEM apply (memory-optimal; what ships)
    must agree with the direct 27-point box-sum assembly (kept as the
    reference implementation) for every BC combination."""
    rng = np.random.RandomState(7)

    def boxsum_apply(phi, lev):
        ndim = len(lev.dx)
        boxsums = mg._nodal_boxsums(lev)
        p = phi
        for ax in range(ndim):
            p = mg._wrap_pad(p, ax) if lev.periodic[ax] \
                else mg._zero_pad(p, ax)
        out = None
        n_nodes = phi.shape
        for delta, S in boxsums.items():
            w = mg._nodal_weight(lev, delta)
            v = p
            for ax, dlt in enumerate(delta):
                v = mg._slice_axis(v, ax, slice(1 + dlt, 1 + dlt + n_nodes[ax]))
            term = (w * S) * v
            out = term if out is None else out + term
        return mg._apply_dirichlet_mask(out, lev, identity_from=phi)

    cases = [
        ((True, True, True), None, None),
        ((False, True, False),
         (mg.SolverBC.NEUMANN,) * 3, (mg.SolverBC.DIRICHLET,) * 3),
        ((False, False),
         (mg.SolverBC.DIRICHLET, mg.SolverBC.NEUMANN),
         (mg.SolverBC.NEUMANN,) * 2),
    ]
    for per, bclo, bchi in cases:
        ndim = len(per)
        n = (8, 12, 10)[:ndim]
        dx = tuple(1.0 / v for v in n)
        bl = bclo or (mg.SolverBC.PERIODIC,) * ndim
        bh = bchi or (mg.SolverBC.PERIODIC,) * ndim
        sigma = jnp.asarray(0.5 + rng.rand(*n))
        lev = mg.NodalLevel(dx, per, tuple(int(b) for b in bl),
                            tuple(int(b) for b in bh), sigma).with_stencil()
        nodes = tuple(v if per[a] else v + 1 for a, v in enumerate(n))
        phi = jnp.asarray(rng.randn(*nodes))
        a_new = mg.nodal_apply(phi, lev)
        a_old = boxsum_apply(phi, lev)
        scale = float(jnp.max(jnp.abs(a_old)))
        assert float(jnp.max(jnp.abs(a_new - a_old))) < 1e-13 * scale


def test_cell_solver_with_beta_matches_fresh_build():
    """CellSolver.with_beta (the constant-coefficient prebuild path)
    must reproduce a freshly built solver exactly: same diags, same
    apply, same solve result."""
    import numpy as np
    rng = np.random.RandomState(7)
    shape = (8, 8, 8)
    dx = (1 / 8.,) * 3
    acoef = jnp.asarray(1.0 + rng.rand(*shape))
    bcoef = []
    for ax in range(3):
        fshape = tuple(s + (1 if a == ax else 0)
                       for a, s in enumerate(shape))
        bcoef.append(jnp.asarray(0.5 + rng.rand(*fshape)))
    bc = ((0, 1, 2), (0, 2, 1))
    dt = 0.037
    fresh = mg.CellSolver(dx, bc[0], bc[1], alpha=1.0, beta=dt,
                          acoef=acoef, bcoef=tuple(bcoef))
    proto = mg.CellSolver(dx, bc[0], bc[1], alpha=1.0, beta=1.0,
                          acoef=acoef, bcoef=tuple(bcoef))
    rescaled = proto.with_beta(dt)
    for d1, d2 in zip(fresh.diags, rescaled.diags):
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   rtol=1e-13)
    x = jnp.asarray(rng.randn(*shape))
    np.testing.assert_allclose(
        np.asarray(mg.cell_apply(x, fresh.levels[0])),
        np.asarray(mg.cell_apply(x, rescaled.levels[0])), rtol=1e-13)
    b = jnp.asarray(rng.randn(*shape))
    xa, ra, ia = fresh.solve(b, rtol=1e-10, atol=1e-13)
    xb, rb, ib = rescaled.solve(b, rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                               rtol=1e-9, atol=1e-11)
