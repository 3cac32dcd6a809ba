"""Matrix-free geometric multigrid (the TPU-native replacement for
AMReX MLMG + MLABecLaplacian + MLNodeLaplacian; cf. reference
src/diffusion/*, src/projection/incflo_apply_nodal_projection.cpp and
SURVEY.md section 2.13).

Two operator families:

  CellLinOp  : L(phi) = alpha*a*phi - beta*div(b grad phi), phi at cell
               centers, b at faces.  Serves the MAC projection
               (alpha=0, b=1/rho) and the diffusion Helmholtz solves
               (alpha=1, a=rho, beta=dt, b=eta).
  NodalLinOp : L(phi) = D(sigma G(phi)), phi at nodes, sigma=dt/rho at
               cells; G is the cell-average gradient of nodal data and
               D its (negative-adjoint) nodal divergence -- the
               Almgren-Bell-Szymczak approximate-projection operator
               that AMReX's MLNodeLaplacian implements.

Everything is jnp; V-cycles are Python-unrolled over the (static) level
hierarchy; the outer iteration is a lax.while_loop on the residual
max-norm against max(rtol*|rhs|_inf, atol), matching MLMG's convergence
contract (reference incflo.H:342-343 rtol=1e-11, atol=1e-14).

Smoother: red-black Gauss-Seidel with analytic diagonals.
Restriction: 2^D cell averaging / nodal full-weighting.
Prolongation: (bi/tri)linear.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class SolverBC(enum.IntEnum):
    PERIODIC = 0
    NEUMANN = 1     # homogeneous Neumann (zero flux)
    DIRICHLET = 2   # value on the domain face


# =====================================================================
# small helpers
# =====================================================================

def _wrap_pad(x, axis, lo=1, hi=1):
    parts = []
    n = x.shape[axis]
    sl = [slice(None)] * x.ndim
    if lo:
        sl[axis] = slice(n - lo, n)
        parts.append(x[tuple(sl)])
    parts.append(x)
    if hi:
        sl[axis] = slice(0, hi)
        parts.append(x[tuple(sl)])
    return jnp.concatenate(parts, axis=axis)


def _zero_pad(x, axis, lo=1, hi=1):
    widths = [(0, 0)] * x.ndim
    widths[axis] = (lo, hi)
    return jnp.pad(x, widths)


def _edge_pad(x, axis, lo=1, hi=1):
    widths = [(0, 0)] * x.ndim
    widths[axis] = (lo, hi)
    return jnp.pad(x, widths, mode="edge")


def _slice_axis(x, axis, sl):
    s = [slice(None)] * x.ndim
    s[axis] = sl
    return x[tuple(s)]


def _checkerboards(shape, dtype, ndim=None):
    """Red/black masks over the first `ndim` (spatial) axes; trailing
    batch/component axes are uncolored."""
    nd = len(shape) if ndim is None else ndim
    par = 0
    for ax in range(nd):
        idx = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
        par = par + idx
    red = ((par % 2) == 0).astype(dtype)
    return red, 1.0 - red


def _maxnorm(x):
    return jnp.max(jnp.abs(x))


# =====================================================================
# Cell-centered operator: alpha*a*phi - beta*div(b grad phi)
# =====================================================================

@dataclasses.dataclass(frozen=True)
class CellLevel:
    """Static+array context for one MG level of a cell-centered solve.

    Registered as a jax pytree (arrays + alpha/beta are leaves) so
    prebuilt solver hierarchies can be passed INTO jitted steps as
    arguments.  Closure-capturing them instead inlines every level's
    coefficient arrays as literal constants in the lowered module --
    ~46 MB of MLIR at 128^3-class and a 2.5 GB unserializable
    TpuExecutableProto at 256-class (measured; the axon remote-compile
    hard-fails there)."""
    dx: Tuple[float, ...]
    bc_lo: Tuple[int, ...]        # SolverBC per axis
    bc_hi: Tuple[int, ...]
    alpha: float
    beta: float
    acoef: Optional[jnp.ndarray]          # (cells) or None (== 0)
    bcoef: Tuple[jnp.ndarray, ...]        # per axis, faces (n+1 along axis)
    ebc: Optional[jnp.ndarray] = None     # EB Dirichlet-wall coefficient:
                                          # L += beta * ebc * phi


jax.tree_util.register_dataclass(
    CellLevel,
    data_fields=["alpha", "beta", "acoef", "bcoef", "ebc"],
    meta_fields=["dx", "bc_lo", "bc_hi"])


def _cell_pad_hom(x, lev: CellLevel):
    """Pad phi by one ghost per axis with homogeneous solver BCs.

    DIRICHLET uses the maxorder-3 ghost  g = -2*phi0 + phi1/3  so the
    boundary-face gradient is 2nd-order (AMReX MLLinOp default)."""
    for ax in range(len(lev.dx)):
        if lev.bc_lo[ax] == SolverBC.PERIODIC:
            x = _wrap_pad(x, ax)
            continue
        n = x.shape[ax]
        q0l = _slice_axis(x, ax, slice(0, 1))
        q1l = _slice_axis(x, ax, slice(1, 2)) if n > 1 else q0l
        q0h = _slice_axis(x, ax, slice(n - 1, n))
        q1h = _slice_axis(x, ax, slice(n - 2, n - 1)) if n > 1 else q0h
        lo = q0l if lev.bc_lo[ax] == SolverBC.NEUMANN else (-2.0 * q0l + q1l / 3.0)
        hi = q0h if lev.bc_hi[ax] == SolverBC.NEUMANN else (-2.0 * q0h + q1h / 3.0)
        x = jnp.concatenate([lo, x, hi], axis=ax)
    return x


def _cell_pad_inhom(x, lev: CellLevel, bvals):
    """Like _cell_pad_hom but with inhomogeneous Dirichlet face values:
    ghost = (8/3) b - 2 phi0 + phi1/3 (maxorder 3).  `bvals` maps
    (axis, side) -> face-value array broadcastable over the ghost slab
    (only consulted for DIRICHLET sides)."""
    for ax in range(len(lev.dx)):
        if lev.bc_lo[ax] == SolverBC.PERIODIC:
            x = _wrap_pad(x, ax)
            continue
        n = x.shape[ax]
        q0l = _slice_axis(x, ax, slice(0, 1))
        q1l = _slice_axis(x, ax, slice(1, 2)) if n > 1 else q0l
        q0h = _slice_axis(x, ax, slice(n - 1, n))
        q1h = _slice_axis(x, ax, slice(n - 2, n - 1)) if n > 1 else q0h
        if lev.bc_lo[ax] == SolverBC.NEUMANN:
            lo = q0l
        else:
            bv = bvals.get((ax, 0), 0.0)
            lo = (8.0 / 3.0) * (bv + 0.0 * q0l) - 2.0 * q0l + q1l / 3.0
        if lev.bc_hi[ax] == SolverBC.NEUMANN:
            hi = q0h
        else:
            bv = bvals.get((ax, 1), 0.0)
            hi = (8.0 / 3.0) * (bv + 0.0 * q0h) - 2.0 * q0h + q1h / 3.0
        x = jnp.concatenate([lo, x, hi], axis=ax)
    return x


def cell_fluxes_inhom(x, lev: CellLevel, bvals):
    """b*grad(x) on all faces with inhomogeneous Dirichlet values."""
    ndim = len(lev.dx)
    xp = _cell_pad_inhom(x, lev, bvals)
    fluxes = []
    for ax in range(ndim):
        dxi = 1.0 / lev.dx[ax]
        v = xp
        for other in range(ndim):
            if other != ax:
                v = _slice_axis(v, other, slice(1, v.shape[other] - 1))
        grad = (_slice_axis(v, ax, slice(1, None))
                - _slice_axis(v, ax, slice(0, -1))) * dxi
        flux = lev.bcoef[ax] * grad
        if lev.bc_lo[ax] == SolverBC.NEUMANN:
            flux = _set_face(flux, ax, 0, 0.0)
        if lev.bc_hi[ax] == SolverBC.NEUMANN:
            flux = _set_face(flux, ax, -1, 0.0)
        fluxes.append(flux)
    return fluxes


def cell_apply_inhom(x, lev: CellLevel, bvals):
    """L(x) with inhomogeneous Dirichlet boundary values."""
    out = lev.alpha * (lev.acoef * x if lev.acoef is not None else 0.0 * x)
    if lev.ebc is not None:
        out = out + lev.beta * lev.ebc * x
    for ax, flux in enumerate(cell_fluxes_inhom(x, lev, bvals)):
        dxi = 1.0 / lev.dx[ax]
        div = (_slice_axis(flux, ax, slice(1, None))
               - _slice_axis(flux, ax, slice(0, -1))) * dxi
        out = out - lev.beta * div
    return out


def cell_fluxes(x, lev: CellLevel):
    """b * grad(x) on the n+1 faces of every axis (homogeneous BCs);
    the discrete fluxes the operator divergences.  Also the MAC-projection
    velocity correction (MacProjector's getFluxes analog)."""
    ndim = len(lev.dx)
    xp = _cell_pad_hom(x, lev)
    fluxes = []
    for ax in range(ndim):
        dxi = 1.0 / lev.dx[ax]
        # bring xp to "padded along ax only" view for this axis
        v = xp
        for other in range(ndim):
            if other != ax:
                v = _slice_axis(v, other, slice(1, v.shape[other] - 1))
        grad = (_slice_axis(v, ax, slice(1, None))
                - _slice_axis(v, ax, slice(0, -1))) * dxi      # n+1 faces
        flux = lev.bcoef[ax] * grad
        # zero flux through Neumann domain faces
        if lev.bc_lo[ax] == SolverBC.NEUMANN:
            flux = _set_face(flux, ax, 0, 0.0)
        if lev.bc_hi[ax] == SolverBC.NEUMANN:
            flux = _set_face(flux, ax, -1, 0.0)
        fluxes.append(flux)
    return fluxes


def cell_apply(x, lev: CellLevel):
    """L(x) with homogeneous BCs."""
    ndim = len(lev.dx)
    out = lev.alpha * (lev.acoef * x if lev.acoef is not None else 0.0 * x)
    if lev.ebc is not None:
        out = out + lev.beta * lev.ebc * x
    for ax, flux in enumerate(cell_fluxes(x, lev)):
        dxi = 1.0 / lev.dx[ax]
        div = (_slice_axis(flux, ax, slice(1, None))
               - _slice_axis(flux, ax, slice(0, -1))) * dxi
        out = out - lev.beta * div
    return out


def _set_face(flux, axis, idx, val):
    sl = [slice(None)] * flux.ndim
    sl[axis] = idx
    return flux.at[tuple(sl)].set(val)


def cell_diag(lev: CellLevel):
    """Analytic diagonal of cell_apply."""
    ndim = len(lev.dx)
    shape = lev.bcoef[0].shape
    cells = tuple(n - (1 if ax == 0 else 0) for ax, n in enumerate(shape))
    d = lev.alpha * (lev.acoef if lev.acoef is not None else 0.0)
    d = jnp.zeros(cells, lev.bcoef[0].dtype) + d
    if lev.ebc is not None:
        d = d + lev.beta * lev.ebc
    for ax in range(ndim):
        dx2i = 1.0 / (lev.dx[ax] ** 2)
        b = lev.bcoef[ax]
        blo = _slice_axis(b, ax, slice(0, -1))
        bhi = _slice_axis(b, ax, slice(1, None))
        clo = jnp.ones_like(blo)
        chi = jnp.ones_like(bhi)
        # boundary coefficient of phi0 in the boundary-face flux:
        # Neumann -> 0 ; Dirichlet maxorder-3 ghost -> 3
        if lev.bc_lo[ax] != SolverBC.PERIODIC:
            c = 0.0 if lev.bc_lo[ax] == SolverBC.NEUMANN else 3.0
            clo = _set_face(clo, ax, 0, c)
        if lev.bc_hi[ax] != SolverBC.PERIODIC:
            c = 0.0 if lev.bc_hi[ax] == SolverBC.NEUMANN else 3.0
            chi = _set_face(chi, ax, -1, c)
        d = d + lev.beta * (blo * clo + bhi * chi) * dx2i
    return d


def _coarsen_cells(a, ndim):
    """Average 2^ndim children -> coarse cells."""
    for ax in range(ndim):
        n = a.shape[ax]
        a = 0.5 * (_slice_axis(a, ax, slice(0, n, 2))
                   + _slice_axis(a, ax, slice(1, n, 2)))
    return a


def _coarsen_face(b, axis, ndim):
    """Coarsen a face coefficient: take fine faces at even normal index,
    average over the 2^(ndim-1) transverse fine faces."""
    b = _slice_axis(b, axis, slice(0, b.shape[axis], 2))
    for ax in range(ndim):
        if ax == axis:
            continue
        n = b.shape[ax]
        b = 0.5 * (_slice_axis(b, ax, slice(0, n, 2))
                   + _slice_axis(b, ax, slice(1, n, 2)))
    return b


def _interleave(even, odd, axis):
    st = jnp.stack([even, odd], axis=axis + 1)
    shape = list(even.shape)
    shape[axis] *= 2
    return st.reshape(shape)


def _prolong_cells(c, lev: CellLevel):
    """(Bi/tri)linear cell-centered prolongation of a correction:
    fine[2i] = 0.75*c[i] + 0.25*c[i-1], fine[2i+1] = 0.75*c[i] + 0.25*c[i+1]
    with ghost = wrap (periodic), edge (Neumann), zero (Dirichlet)."""
    ndim = len(lev.dx)
    for ax in range(ndim):
        if lev.bc_lo[ax] == SolverBC.PERIODIC:
            cp = _wrap_pad(c, ax)
        else:
            lo_pad = _edge_pad if lev.bc_lo[ax] == SolverBC.NEUMANN else _zero_pad
            hi_pad = _edge_pad if lev.bc_hi[ax] == SolverBC.NEUMANN else _zero_pad
            cp = lo_pad(c, ax, lo=1, hi=0)
            cp = hi_pad(cp, ax, lo=0, hi=1)
        mid = _slice_axis(cp, ax, slice(1, cp.shape[ax] - 1))
        left = _slice_axis(cp, ax, slice(0, cp.shape[ax] - 2))
        right = _slice_axis(cp, ax, slice(2, cp.shape[ax]))
        even = 0.75 * mid + 0.25 * left
        odd = 0.75 * mid + 0.25 * right
        c = _interleave(even, odd, ax)
    return c


class CellSolver:
    """Geometric MG for the cell-centered operator on one grid."""

    def __init__(self, dx, bc_lo, bc_hi, alpha, beta, acoef, bcoef,
                 max_levels=30, nu1=1, nu2=1, nu_bottom=8, ebc=None):
        # V(1,1) + 8 bottom sweeps: CG acceleration tolerates the weaker
        # preconditioner and the cheaper cycle wins on wall clock
        ndim = len(dx)
        self.ndim = ndim
        self.nu1, self.nu2, self.nu_bottom = nu1, nu2, nu_bottom
        levels: List[CellLevel] = []
        lev = CellLevel(tuple(dx), tuple(int(b) for b in bc_lo),
                        tuple(int(b) for b in bc_hi), alpha, beta,
                        acoef, tuple(bcoef), ebc)
        cells = tuple(acoef.shape[:ndim]) if acoef is not None else tuple(
            bcoef[0].shape[ax] - (1 if ax == 0 else 0) for ax in range(ndim))
        while True:
            levels.append(lev)
            if len(levels) >= max_levels:
                break
            if any(n % 2 != 0 or n < 4 for n in cells):
                break
            cells = tuple(n // 2 for n in cells)
            lev = CellLevel(
                tuple(d * 2 for d in lev.dx), lev.bc_lo, lev.bc_hi,
                lev.alpha, lev.beta,
                _coarsen_cells(lev.acoef, ndim) if lev.acoef is not None else None,
                tuple(_coarsen_face(lev.bcoef[ax], ax, ndim)
                      for ax in range(ndim)),
                # ebc ~ area/volume: physical EB area is preserved under
                # coarsening => coefficient scales by 1/2 per level
                0.5 * _coarsen_cells(lev.ebc, ndim)
                if lev.ebc is not None else None)
        self.levels = levels
        self.diags = [cell_diag(l) for l in levels]
        self.singular = (alpha == 0.0) and (ebc is None) and all(
            b != SolverBC.DIRICHLET for b in list(bc_lo) + list(bc_hi))
        from incflo_tpu.ops import spectral
        self.symbol = spectral.cell_symbol(levels[0])

    def with_beta(self, beta):
        """Cheap re-parameterization: same coefficient hierarchy, new
        beta scalar.  diag = alpha*a [+ beta*ebc] + beta*faceparts, so
        only the scalar combination is recomputed -- no re-coarsening.
        Lets constant-coefficient solvers be built ONCE at setup and
        re-scaled by the (traced) dt every step (~1 ms/step/solver of
        coarsening+diag chains at 128^3-class grids)."""
        import copy
        out = copy.copy(self)
        out.levels = [dataclasses.replace(l, beta=beta)
                      for l in self.levels]
        out.diags = []
        for l_old, l_new, d_old in zip(self.levels, out.levels,
                                       self.diags):
            base = l_old.alpha * (l_old.acoef if l_old.acoef is not None
                                  else 0.0)
            faceparts = (d_old - base) / l_old.beta
            out.diags.append(base + beta * faceparts)
        return out

    # -- smoother ------------------------------------------------------
    def _smooth_res(self, x, b, li, n, want_residual):
        """n RB sweeps (+ optional fused residual).  Periodic 3D f32
        levels run the whole smooth in ONE Pallas dispatch
        (ops/pallas_cell.py); jnp scan fallback elsewhere."""
        lev, diag = self.levels[li], self.diags[li]
        from incflo_tpu.ops import pallas_cell as pc
        if pc.enabled():
            batched = x.ndim == self.ndim + 1
            shape = x.shape[:-1] if batched else x.shape
            fn = None
            if pc.supported(lev, shape, x.dtype):
                fn = pc.smooth
            elif pc.tiled_supported(lev, shape, x.dtype, int(n)):
                # fine levels over the whole-VMEM budget: x-slab tiled
                fn = pc.smooth_tiled
            if fn is not None:
                fhi = pc.face_hi_coefs(lev)
                if batched:
                    outs = [fn(x[..., c], b[..., c], diag[..., c],
                               tuple(f[..., c] for f in fhi),
                               lev, n, want_residual)
                            for c in range(x.shape[-1])]
                    xs = jnp.stack([o[0] for o in outs], axis=-1)
                    rs = (jnp.stack([o[1] for o in outs], axis=-1)
                          if want_residual else None)
                    return xs, rs
                return fn(x, b, diag, fhi, lev, n, want_residual)

        # relative guard: near-degenerate rows (tiny EB cut cells) get no
        # GS update instead of a 1/eps-amplified one
        dmax = jnp.max(jnp.abs(diag))
        ok = jnp.abs(diag) > 1e-8 * dmax
        inv = jnp.where(ok, 1.0 / jnp.where(ok, diag, 1.0), 0.0)

        from incflo_tpu.ops import pallas_smoother as psm
        if psm.ENABLED and x.ndim == self.ndim and psm.supported(x, lev):
            pad_fn = lambda v: _cell_pad_hom(v, lev)

            def sweep_p(x, _):
                out = psm.rb_sweep_3d(x, b, inv, lev.acoef, lev.bcoef, lev,
                                      pad_fn)
                return out, None

            x, _ = jax.lax.scan(sweep_p, x, None, length=n)
            return x, (b - cell_apply(x, lev)) if want_residual else None

        red, black = _checkerboards(x.shape, x.dtype, self.ndim)

        def sweep(x, _):
            x = x + red * (b - cell_apply(x, lev)) * inv
            x = x + black * (b - cell_apply(x, lev)) * inv
            return x, None

        x, _ = jax.lax.scan(sweep, x, None, length=n)
        return x, (b - cell_apply(x, lev)) if want_residual else None

    def _smooth(self, x, b, li, n):
        return self._smooth_res(x, b, li, n, False)[0]

    def _vcycle(self, x, b, li=0, want_residual=False):
        lev = self.levels[li]
        if li == len(self.levels) - 1:
            return self._smooth_res(x, b, li, self.nu_bottom, want_residual)
        x, r = self._smooth_res(x, b, li, self.nu1, True)
        rc = _coarsen_cells(r, self.ndim)
        ec, _ = self._vcycle(jnp.zeros_like(rc), rc, li + 1)
        x = x + _prolong_cells(ec, self.levels[li + 1])
        return self._smooth_res(x, b, li, self.nu2, want_residual)

    def solve(self, rhs, x0=None, rtol=1e-11, atol=1e-14, maxiter=200,
              presmooth=0):
        """V-cycle-preconditioned conjugate gradients (the robustness
        MLMG gets from its BiCGStab bottom solve: plain MG stagnates on
        strong coefficient contrast, e.g. Bingham viscosity + EB).
        Returns (x, resnorm, iters).  Terminates on tolerance, maxiter,
        or stagnation (the attainable floor of the working precision).

        presmooth > 0 runs that many fine-level RB sweeps before the PCG
        and lazily skips the whole PCG (including its V-cycle setup) when
        the residual is already under tolerance -- the fast path for the
        diagonally-dominant Helmholtz solves (alpha*rho dominates
        dt*div(eta grad) at CFL-limited dt), where a warm start + a few
        sweeps converge and a V-cycle per iteration is pure launch
        latency."""
        lev = self.levels[0]
        if x0 is None:
            x0 = jnp.zeros_like(rhs)
        if self.singular:
            rhs = rhs - jnp.mean(rhs)

        # fully-periodic constant-coefficient operators: exact FFT
        # direct solve of the SAME discrete operator (ops/spectral.py)
        from incflo_tpu.ops import spectral
        if (spectral.usable(self.symbol)
                and tuple(rhs.shape[:self.ndim]) == self.symbol.cells
                and (rhs.ndim > self.ndim or not self.symbol.batched)):
            x = spectral.solve(self.symbol, rhs, lev.alpha, lev.beta,
                               self.singular)
            res = _maxnorm(rhs - cell_apply(x, lev)) \
                if spectral.check_residual() else jnp.zeros((), rhs.dtype)
            return x, res, jnp.array(1)

        bnorm = _maxnorm(rhs)
        tol = jnp.maximum(rtol * bnorm, atol)

        def dot(a, b):
            return jnp.sum(a * b)

        r0 = rhs - cell_apply(x0, lev)
        res0 = _maxnorm(r0)

        if presmooth > 0:
            def do_smooth(xr):
                x, _, _ = xr
                x = self._smooth(x, rhs, 0, presmooth)
                r = rhs - cell_apply(x, lev)
                return x, r, _maxnorm(r)

            x0, r0, res0 = jax.lax.cond(res0 > tol, do_smooth,
                                        lambda xr: xr, (x0, r0, res0))

        def run_pcg(xr):
            x0, r0, res0 = xr
            z0, _ = self._vcycle(jnp.zeros_like(r0), r0)
            # CG's max-norm residual is non-monotone: track the best
            # iterate and stop only after several non-improving iters
            state0 = (x0, r0, z0, dot(r0, z0), res0,
                      x0, res0, jnp.array(0), jnp.array(0))

            def cond(c):
                x, r, p, rz, res, xb, rb, bad, it = c
                return jnp.logical_and(
                    jnp.logical_and(rb > tol, it < maxiter), bad < 5)

            def body(c):
                x, r, p, rz, res, xb, rb, bad, it = c
                Ap = cell_apply(p, lev)
                denom = dot(p, Ap)
                alpha = rz / jnp.where(denom == 0, 1.0, denom)
                x = x + alpha * p
                r = r - alpha * Ap
                z, _ = self._vcycle(jnp.zeros_like(r), r)
                rz_new = dot(r, z)
                beta = rz_new / jnp.where(rz == 0, 1.0, rz)
                p = z + beta * p
                new_res = _maxnorm(r)
                improved = new_res < 0.999 * rb
                xb = jnp.where(improved, x, xb)
                rb = jnp.minimum(rb, new_res)
                bad = jnp.where(improved, 0, bad + 1)
                return x, r, p, rz_new, new_res, xb, rb, bad, it + 1

            _, _, _, _, _, x, res, _, it = jax.lax.while_loop(cond, body,
                                                              state0)
            return x, res, it

        def skip(xr):
            x0, _, res0 = xr
            return x0, res0, jnp.array(0)

        x, res, it = jax.lax.cond(res0 > tol, run_pcg, skip, (x0, r0, res0))
        if self.singular:
            x = x - jnp.mean(x)
        return x, res, it

    def solve_inhom(self, rhs, bvals, x0=None, rtol=1e-11, atol=1e-14,
                    maxiter=200, presmooth=0):
        """Solve with inhomogeneous Dirichlet face values `bvals`
        ((axis, side) -> value).  The affine boundary contribution is
        folded into the RHS; the MG iteration stays homogeneous."""
        lev = self.levels[0]
        zero = jnp.zeros_like(rhs)
        offset = cell_apply_inhom(zero, lev, bvals)
        return self.solve(rhs - offset, x0=x0, rtol=rtol, atol=atol,
                          maxiter=maxiter, presmooth=presmooth)


def _cellsolver_flatten(s):
    return ((s.levels, s.diags, s.symbol),
            (s.ndim, s.nu1, s.nu2, s.nu_bottom, s.singular))


def _cellsolver_unflatten(aux, children):
    obj = object.__new__(CellSolver)
    obj.levels, obj.diags, obj.symbol = children
    obj.ndim, obj.nu1, obj.nu2, obj.nu_bottom, obj.singular = aux
    return obj


# prebuilt solvers ride the jitted step as ARGUMENT pytrees (see
# CellLevel docstring); unflatten bypasses __init__ (which would try to
# re-coarsen tracer coefficient arrays)
jax.tree_util.register_pytree_node(
    CellSolver, _cellsolver_flatten, _cellsolver_unflatten)


# =====================================================================
# Nodal operator: L(phi) = D(sigma * G(phi))
# =====================================================================

@dataclasses.dataclass(frozen=True)
class NodalLevel:
    dx: Tuple[float, ...]
    periodic: Tuple[bool, ...]
    bc_lo: Tuple[int, ...]
    bc_hi: Tuple[int, ...]
    sigma: Optional[jnp.ndarray]            # (cells); dropped by with_stencil
    sigma_pad: Optional[jnp.ndarray] = None  # padded by 1 per axis
    cells: Optional[Tuple[int, ...]] = None

    # pytree registration below (after the class body): sigma/sigma_pad
    # are leaves so prebuilt nodal hierarchies ride jit ARGUMENTS rather
    # than being inlined as literal constants (see CellLevel docstring)

    def with_stencil(self):
        s = self.sigma
        for ax in range(len(self.dx)):
            s = _wrap_pad(s, ax) if self.periodic[ax] else _zero_pad(s, ax)
        # keep ONLY the padded sigma (holding both costs ~1 GB/level at
        # 512^3); downstream code needs just the cell shape
        return dataclasses.replace(self, sigma=None, sigma_pad=s,
                                   cells=tuple(self.sigma.shape))

    def barriered(self, phi):
        """Tie sigma_pad to loop-carried state so XLA cannot hoist the
        27 stencil box-sums out of smoother scan / V-cycle while_loop
        bodies: hoisting materialises 27 node-sized arrays (14.5 GB at
        512^3 -- the single-chip RESOURCE_EXHAUSTED cause); behind the
        barrier they fuse into the consuming apply."""
        phi, sp = jax.lax.optimization_barrier((phi, self.sigma_pad))
        return phi, dataclasses.replace(self, sigma_pad=sp)


jax.tree_util.register_dataclass(
    NodalLevel,
    data_fields=["sigma", "sigma_pad"],
    meta_fields=["dx", "periodic", "bc_lo", "bc_hi", "cells"])


def _nodal_weight(lev: "NodalLevel", delta) -> float:
    """Q1 finite-element stencil weight (what AMReX MLNodeLaplacian
    assembles).  For tensor-product Q1 elements the per-element stiffness
    factorises as  K_e = sum_d K1d_d (x) prod_{d'!=d} M1d_{d'}  with
    K1d = (1/h)[[1,-1],[-1,1]], M1d = (h/6)[[2,1],[1,2]].  Summed over
    the elements containing a node pair (n, n+Delta), each stencil
    coefficient is a CONSTANT weight times a box-sum of sigma:

        c_Delta(n) = w_Delta * S_Delta(n),
        w_Delta = -(1/V) * sum_d K_d(Delta_d) prod_{d'!=d} M_{d'}(Delta_{d'}),
        K(0)=1/h, K(+-1)=-1/h,  M(0)=h/3, M(+-1)=h/6,

    scaled by -1/cell-volume so L ~ div(sigma grad) (negative
    semi-definite) and consistent with the cell-average nodal divergence
    used as RHS.  This operator has NO checkerboard null mode, unlike the
    naive D(sigma G) composition."""
    ndim = len(lev.dx)
    vol = 1.0
    for d in lev.dx:
        vol *= d
    w = 0.0
    for d in range(ndim):
        term = (1.0 / lev.dx[d]) if delta[d] == 0 else (-1.0 / lev.dx[d])
        for dp in range(ndim):
            if dp == d:
                continue
            term *= (lev.dx[dp] / 3.0) if delta[dp] == 0 else (lev.dx[dp] / 6.0)
        w += term
    return -w / vol


def _nodal_boxsums(lev: "NodalLevel") -> dict:
    """S_Delta box-sums of sigma, computed ON THE FLY from the padded
    sigma with memoized per-axis partial reductions (27 arrays at 512^3
    would be ~14 GB if materialised; XLA fuses these windows into the
    consuming apply, so only sigma itself lives in HBM)."""
    import itertools
    ndim = len(lev.dx)
    parts = {(): lev.sigma_pad}
    for ax in range(ndim):
        new = {}
        n_nodes = lev.cells[ax] + 1
        for key, arr in parts.items():
            lo = _slice_axis(arr, ax, slice(0, n_nodes))
            hi = _slice_axis(arr, ax, slice(1, n_nodes + 1))
            for dlt, val in ((0, lo + hi), (1, hi), (-1, lo)):
                new[key + (dlt,)] = val
        parts = new
    # drop duplicated high node on periodic axes
    out = {}
    for delta, S in parts.items():
        for ax in range(ndim):
            if lev.periodic[ax]:
                S = _slice_axis(S, ax, slice(0, S.shape[ax] - 1))
        out[delta] = S
    return out


def _node_to_cellgrad(phi, lev: NodalLevel, axis):
    """G_axis: gradient at cell centers from nodal phi
    (average of the 2^(D-1) node-pair differences / dx)."""
    ndim = len(lev.dx)
    # extend phi to n_cells+1 nodes per axis
    p = phi
    for ax in range(ndim):
        if lev.periodic[ax]:
            p = _wrap_pad(p, ax, lo=0, hi=1)
    g = (_slice_axis(p, axis, slice(1, None))
         - _slice_axis(p, axis, slice(0, -1))) / lev.dx[axis]
    for ax in range(ndim):
        if ax == axis:
            continue
        g = 0.5 * (_slice_axis(g, ax, slice(0, -1))
                   + _slice_axis(g, ax, slice(1, None)))
    return g   # (cells)


def nodal_divergence(u_pad: Sequence[jnp.ndarray], dx) -> jnp.ndarray:
    """D: divergence at ALL nodes (n_cells+1 per axis) of a cell-centered
    vector already padded by ONE ghost per axis (ghosts encode the BC:
    wrap for periodic, zero for walls, inflow values at mass inflow --
    exactly the reference's vel.setBndry(0)+set_inflow_velocity before
    NodalProjector, incflo_apply_nodal_projection.cpp:139-146)."""
    ndim = len(dx)
    out = 0.0
    for axis in range(ndim):
        t = (_slice_axis(u_pad[axis], axis, slice(1, None))
             - _slice_axis(u_pad[axis], axis, slice(0, -1))) / dx[axis]
        for ax in range(ndim):
            if ax == axis:
                continue
            t = 0.5 * (_slice_axis(t, ax, slice(0, -1))
                       + _slice_axis(t, ax, slice(1, None)))
        out = out + t
    return out  # (n+1 per axis) node values


def _nodes_unique(x_allnodes, lev: NodalLevel):
    """Drop the duplicated high node on periodic axes."""
    for ax in range(len(lev.dx)):
        if lev.periodic[ax]:
            x_allnodes = _slice_axis(x_allnodes, ax,
                                     slice(0, x_allnodes.shape[ax] - 1))
    return x_allnodes


def nodal_apply(phi, lev: NodalLevel):
    """L(phi) via the FACTORIZED Q1 FEM element stencil (+ identity on
    Dirichlet rows).

    The element stiffness factorizes into rank-1 tensor products:
    K1d = (1/h) d d^T and M1d = (h/4) s s^T + (h/12) d d^T with
    s=(1,1), d=(1,-1), so

        L(phi) = -(1/V) sum_p C_p A_p^T ( sigma . (A_p phi) )

    over the 2^D-1 sign patterns p in {s,d}^D \\ {s..s}, where A_p
    contracts nodes->cells with the per-axis 2-point stencils and
    C_p = sum_{d: p_d=d} (1/h_d) prod_{a!=d} (h_a/4 if p_a=s else
    h_a/12).  Algebraically identical to the 27-point box-sum form,
    but needs only ~5 live node-sized buffers: the box-sum form
    materialises the S_Delta partial sums (18 GB at 512^3 -- the
    single-chip RESOURCE_EXHAUSTED cause)."""
    import itertools
    ndim = len(lev.dx)
    assert lev.sigma_pad is not None, "use NodalLevel.with_stencil()"
    phi, lev = lev.barriered(phi)
    # interior sigma (cells) as a window of the padded array
    sig = lev.sigma_pad
    for ax in range(ndim):
        sig = _slice_axis(sig, ax, slice(1, 1 + lev.cells[ax]))
    # phi on all n_cells+1 node positions per axis (wrap the periodic dup)
    p = phi
    for ax in range(ndim):
        if lev.periodic[ax]:
            p = _wrap_pad(p, ax, lo=0, hi=1)
    vol = 1.0
    for d in lev.dx:
        vol *= d

    def coef(pattern):
        C = 0.0
        for d in range(ndim):
            if pattern[d] != "d":
                continue
            term = 1.0 / lev.dx[d]
            for a in range(ndim):
                if a == d:
                    continue
                term *= (lev.dx[a] / 4.0) if pattern[a] == "s" \
                    else (lev.dx[a] / 12.0)
            C += term
        return -C / vol

    # hierarchical shift sharing (same trees as ops/pallas_nodal.py):
    # the contraction computes all 2^D sign patterns with ONE pair of
    # slices per tree node, and the scatter merges sign pairs via
    #   S^T(ts) + D^T(td) = (ts + td) + prev(ts - td),
    # replacing 21 pad/concat ops (XLA fusion breakers) with 7
    parts = {(): p}
    for ax in range(ndim):
        new = {}
        for key, y in parts.items():
            m = y.shape[ax]
            lo = _slice_axis(y, ax, slice(0, m - 1))
            hi = _slice_axis(y, ax, slice(1, m))
            new[key + ("s",)] = lo + hi
            new[key + ("d",)] = lo - hi
        parts = new
    t = {pat: (coef(pat) * sig * y) if "d" in pat else None
         for pat, y in parts.items()}
    for ax in range(ndim - 1, -1, -1):
        m = lev.cells[ax]
        new = {}
        for key in {k[:-1] for k in t}:
            ts = t.get(key + ("s",))
            td = t.get(key + ("d",))
            if ts is None and td is None:
                new[key] = None
                continue
            a = (0.0 if ts is None else ts) + (0.0 if td is None else td)
            b = (0.0 if ts is None else ts) - (0.0 if td is None else td)
            if lev.periodic[ax]:
                bp = _wrap_pad(b, ax, lo=1, hi=0)
                new[key] = a + _slice_axis(bp, ax, slice(0, m))
            else:
                ap = _zero_pad(a, ax)
                bp = _zero_pad(b, ax)
                new[key] = (_slice_axis(ap, ax, slice(1, m + 2))
                            + _slice_axis(bp, ax, slice(0, m + 1)))
        t = new
    out = _apply_dirichlet_mask(t[()], lev, identity_from=phi)
    return out


def _apply_dirichlet_mask(nodal, lev: NodalLevel, identity_from=None):
    """Rows of Dirichlet boundary nodes become identity (phi itself)."""
    for ax in range(len(lev.dx)):
        if lev.periodic[ax]:
            continue
        if lev.bc_lo[ax] == SolverBC.DIRICHLET:
            src = (_slice_axis(identity_from, ax, slice(0, 1))
                   if identity_from is not None else 0.0)
            nodal = _set_slab(nodal, ax, 0, src)
        if lev.bc_hi[ax] == SolverBC.DIRICHLET:
            src = (_slice_axis(identity_from, ax, slice(-1, None))
                   if identity_from is not None else 0.0)
            nodal = _set_slab(nodal, ax, -1, src)
    return nodal


def _zero_dirichlet(nodal, lev: NodalLevel):
    return _apply_dirichlet_mask(nodal, lev, identity_from=None)


def _set_slab(x, axis, idx, val):
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, 1) if idx == 0 else slice(x.shape[axis] - 1, None)
    if not isinstance(val, (int, float)):
        return x.at[tuple(sl)].set(val)
    return x.at[tuple(sl)].set(val)


def nodal_diag(lev: NodalLevel):
    """diag(L): the Delta=0 stencil coefficient; 1 on Dirichlet rows.
    Computes ONLY the Delta=0 box-sum -- building all 27 via
    _nodal_boxsums materialises 3+9+27 node-sized temporaries when
    called eagerly (21 GB at 512^3)."""
    ndim = len(lev.dx)
    zero = (0,) * ndim
    s0 = lev.sigma_pad
    for ax in range(ndim):
        n_nodes = lev.cells[ax] + 1
        s0 = (_slice_axis(s0, ax, slice(0, n_nodes))
              + _slice_axis(s0, ax, slice(1, n_nodes + 1)))
    for ax in range(ndim):
        if lev.periodic[ax]:
            s0 = _slice_axis(s0, ax, slice(0, s0.shape[ax] - 1))
    d = _nodal_weight(lev, zero) * s0
    # Dirichlet rows: identity
    for ax in range(ndim):
        if lev.periodic[ax]:
            continue
        if lev.bc_lo[ax] == SolverBC.DIRICHLET:
            d = _set_slab(d, ax, 0, jnp.ones_like(_slice_axis(d, ax, slice(0, 1))))
        if lev.bc_hi[ax] == SolverBC.DIRICHLET:
            d = _set_slab(d, ax, -1, jnp.ones_like(_slice_axis(d, ax, slice(-1, None))))
    return d


def eb_nodal_apply(phi, lev: NodalLevel, fine_lev: NodalLevel):
    """EXACT octant-weighted cut-cell nodal FEM apply:  P^T L_fine P.

    The coarse Q1 basis is exactly representable on the 2x-refined
    lattice via linear nodal prolongation P, so the cut-cell weak form
    integral (what AMReX MLNodeLaplacian assembles inside cut cells,
    reference incflo_apply_nodal_projection.cpp:134-153) equals the
    regular fine-lattice operator with per-octant sigma
    (sigma_cell * octant fluid fraction) sandwiched between P^T and P.
    Both operators are scaled by -1/cell-volume (_nodal_weight), which
    absorbs the 2^D of P^T = 2^D * full-weighting restriction:
    L_c = (V_f/V_c) P^T L_f P = R(L_f(P phi))."""
    pf = _prolong_nodal(phi, fine_lev)
    yf = nodal_apply(pf, fine_lev)
    # fine Dirichlet rows carry identity(phi); those equations belong to
    # the coarse boundary rows -- zero them before the transpose
    yf = _zero_dirichlet(yf, fine_lev)
    y = _restrict_nodal(yf, fine_lev)
    return _apply_dirichlet_mask(y, lev, identity_from=phi)


def eb_fine_level(sigma, vfrac_oct, lev: NodalLevel) -> NodalLevel:
    """2x-refined NodalLevel whose sigma is the octant-weighted cell
    sigma (the integration data of the exact cut-cell operator)."""
    nd = len(lev.dx)
    s = sigma
    for ax in range(nd):
        s = jnp.repeat(s, 2, axis=ax)
    return NodalLevel(tuple(d / 2 for d in lev.dx), lev.periodic,
                      lev.bc_lo, lev.bc_hi, s * vfrac_oct).with_stencil()


def eb_nodal_divergence(upads_fine, fine_lev: NodalLevel):
    """Consistent RHS for eb_nodal_apply: R(D_fine(u_fine)) (the same
    volume scaling absorbs the P^T prefactor, see eb_nodal_apply)."""
    df = nodal_divergence(upads_fine, fine_lev.dx)
    df = _nodes_unique(df, fine_lev)
    return _restrict_nodal(df, fine_lev)


def _restrict_nodal(r, lev_f: NodalLevel):
    """Full-weighting (1/4,1/2,1/4)^D onto coincident coarse nodes."""
    ndim = len(lev_f.dx)
    for ax in range(ndim):
        if lev_f.periodic[ax]:
            rp = _wrap_pad(r, ax)
        else:
            rp = _zero_pad(r, ax)
        mid = _slice_axis(rp, ax, slice(1, rp.shape[ax] - 1))
        left = _slice_axis(rp, ax, slice(0, rp.shape[ax] - 2))
        right = _slice_axis(rp, ax, slice(2, rp.shape[ax]))
        fw = 0.25 * left + 0.5 * mid + 0.25 * right
        r = _slice_axis(fw, ax, slice(0, fw.shape[ax], 2))
    return r


def _prolong_nodal(c, lev_f: NodalLevel):
    """Linear nodal prolongation: even fine nodes copy, odd average."""
    ndim = len(lev_f.dx)
    for ax in range(ndim):
        if lev_f.periodic[ax]:
            cp = _wrap_pad(c, ax, lo=0, hi=1)
            even = _slice_axis(cp, ax, slice(0, -1))
            odd = 0.5 * (_slice_axis(cp, ax, slice(0, -1))
                         + _slice_axis(cp, ax, slice(1, None)))
            c = _interleave(even, odd, ax)
        else:
            even = c
            odd = 0.5 * (_slice_axis(c, ax, slice(0, -1))
                         + _slice_axis(c, ax, slice(1, None)))
            # interleave then append the last even node
            body = _interleave(_slice_axis(even, ax, slice(0, -1)), odd, ax)
            c = jnp.concatenate([body, _slice_axis(even, ax, slice(-1, None))],
                                axis=ax)
    return c


class NodalSolver:
    """Geometric MG for the nodal sigma-Poisson (the north-star solver)."""

    def __init__(self, dx, periodic, bc_lo, bc_hi, sigma,
                 max_levels=30, nu1=2, nu2=2, nu_bottom=24):
        ndim = len(dx)
        self.ndim = ndim
        self.nu1, self.nu2, self.nu_bottom = nu1, nu2, nu_bottom
        levels: List[NodalLevel] = []
        lev = NodalLevel(tuple(dx), tuple(periodic),
                         tuple(int(b) for b in bc_lo),
                         tuple(int(b) for b in bc_hi), sigma)
        cells = sigma.shape
        while True:
            levels.append(lev.with_stencil())
            if len(levels) >= max_levels:
                break
            if any(n % 2 != 0 or n < 4 for n in cells):
                break
            cells = tuple(n // 2 for n in cells)
            lev = NodalLevel(tuple(d * 2 for d in lev.dx), lev.periodic,
                             lev.bc_lo, lev.bc_hi,
                             _coarsen_cells(lev.sigma, ndim))
        self.levels = levels
        self.diags = [nodal_diag(l) for l in levels]
        # relative guard: nodes surrounded by (near-)zero sigma*vfrac get
        # no update instead of a 1/eps-amplified one (tiny EB cut cells)
        self.dinvs = []
        for diag in self.diags:
            dmax = jnp.max(jnp.abs(diag))
            ok = jnp.abs(diag) > 1e-8 * dmax
            self.dinvs.append(
                jnp.where(ok, 1.0 / jnp.where(ok, diag, 1.0), 0.0))
        self.singular = all(
            b != SolverBC.DIRICHLET for b in list(bc_lo) + list(bc_hi))
        from incflo_tpu.ops import spectral
        self.symbol = spectral.nodal_symbol(levels[0])

    def _sigma_interior(self, li):
        lev = self.levels[li]
        s = lev.sigma_pad
        for ax in range(self.ndim):
            s = _slice_axis(s, ax, slice(1, 1 + lev.cells[ax]))
        return s

    def _smooth_res(self, x, b, li, n, want_residual):
        """n RB sweeps (+ optional residual).  Uses the fused Pallas
        kernel (ONE device dispatch; ops/pallas_nodal.py) where
        supported; jnp scan fallback elsewhere."""
        lev, inv = self.levels[li], self.dinvs[li]
        from incflo_tpu.ops import pallas_nodal
        if pallas_nodal.enabled() and (
                pallas_nodal.supported(lev, x.shape, x.dtype)
                or pallas_nodal.tiled_supported(lev, x.shape, x.dtype,
                                                min(int(n), 2))):
            out = pallas_nodal.smooth(x, b, self._sigma_interior(li), inv,
                                      lev, n, want_residual)
            if out is not None:
                return out if want_residual else (out[0], None)
        red, black = _checkerboards(x.shape, x.dtype)

        def sweep(x, _):
            x = x + red * (b - nodal_apply(x, lev)) * inv
            x = x + black * (b - nodal_apply(x, lev)) * inv
            return x, None

        x, _ = jax.lax.scan(sweep, x, None, length=n)
        return x, (b - nodal_apply(x, lev)) if want_residual else None

    def _smooth(self, x, b, li, n):
        return self._smooth_res(x, b, li, n, False)[0]

    def _vcycle(self, x, b, li=0, want_residual=False):
        lev = self.levels[li]
        if li == len(self.levels) - 1:
            return self._smooth_res(x, b, li, self.nu_bottom, want_residual)
        x, r = self._smooth_res(x, b, li, self.nu1, True)
        r = _zero_dirichlet(r, lev)
        rc = _restrict_nodal(r, lev)
        rc = _zero_dirichlet(rc, self.levels[li + 1])
        ec, _ = self._vcycle(jnp.zeros_like(rc), rc, li + 1)
        x = x + _prolong_nodal(ec, lev)
        return self._smooth_res(x, b, li, self.nu2, want_residual)

    def solve(self, rhs, x0=None, rtol=1e-11, atol=1e-14, maxiter=100,
              dirichlet_vals=None):
        """dirichlet_vals ((axis, side) -> slab array) makes Dirichlet
        rows INHOMOGENEOUS: identity rows converge to the given values
        (the coarse-fine boundary closure of amr_patch slab mode)."""
        lev = self.levels[0]
        if x0 is None:
            x0 = jnp.zeros_like(rhs)
        if self.singular:
            rhs = rhs - jnp.mean(rhs)
        rhs = _zero_dirichlet(rhs, lev)
        if dirichlet_vals:
            for (ax, side), val in dirichlet_vals.items():
                if lev.periodic[ax]:
                    continue
                bc = lev.bc_lo[ax] if side == 0 else lev.bc_hi[ax]
                if bc == SolverBC.DIRICHLET:
                    rhs = _set_slab(rhs, ax, 0 if side == 0 else -1, val)
        from incflo_tpu.ops import spectral
        if (spectral.usable(self.symbol) and dirichlet_vals is None
                and tuple(rhs.shape) == self.symbol.cells):
            x = spectral.solve(self.symbol, rhs, 0.0, 1.0, self.singular)
            res = _maxnorm(rhs - nodal_apply(x, lev)) \
                if spectral.check_residual() else jnp.zeros((), rhs.dtype)
            return x, res, jnp.array(1)

        bnorm = _maxnorm(rhs)
        tol = jnp.maximum(rtol * bnorm, atol)

        def cond(c):
            x, res, prev, it = c
            # exit only on TRUE stagnation (roundoff floor / divergence);
            # stiff variable-coefficient problems legitimately converge at
            # 0.95-0.99 per cycle and must not be cut off early
            progressing = res < 0.999 * prev
            return jnp.logical_and(jnp.logical_and(res > tol, it < maxiter),
                                   progressing)

        def body(c):
            x, res, _, it = c
            x, r = self._vcycle(x, rhs, want_residual=True)
            new_res = _maxnorm(r)
            return x, new_res, res, it + 1

        res0 = _maxnorm(rhs - nodal_apply(x0, lev))
        big = jnp.asarray(jnp.inf, res0.dtype)
        x, res, _, it = jax.lax.while_loop(
            cond, body, (x0, res0, big, jnp.array(0)))
        if self.singular:
            x = x - jnp.mean(x)
        return x, res, it

    # gradient of phi at cell centers (for gp update / velocity correction)
    def grad_at_cells(self, phi):
        from incflo_tpu.ops.stencil import comp_stack
        lev = self.levels[0]
        return comp_stack(
            [_node_to_cellgrad(phi, lev, ax) for ax in range(self.ndim)],
            axis=-1)


# =====================================================================
# EB nodal fast path: the exact octant-integrated cut-cell operator
# precomputed as per-level 3^D-point stencils on COARSE nodes
# (VERDICT r3 Next #3).  The finest stencil is probe-extracted from
# eb_nodal_apply (= P^T L_fine P, the exact cut-cell weak form AMReX
# MLNodeLaplacian assembles, incflo_apply_nodal_projection.cpp:134-153);
# coarser levels are its Galerkin RAP, which stays 3^D-point under
# linear prolongation + full-weighting.  One V-cycle then costs the same
# per-node work as the regular vfrac solver instead of iterating on the
# 2^D-x-DOF octant lattice.
# =====================================================================

def _stencil_offsets(ndim):
    import itertools
    return list(itertools.product((-1, 0, 1), repeat=ndim))


def _probe_period(n, periodic):
    """Per-axis comb period: >= 3 so the neighbors {i-1,i,i+1} land in
    distinct residue classes; periodic axes need the period to divide
    the node count (wrap-consistent coloring)."""
    if not periodic:
        return 4
    for p in (4, 3):
        if n % p == 0:
            return p
    return n       # full per-axis basis (small coarse levels)


def extract_node_stencil(apply_fn, node_shape, periodic, dtype):
    """Extract the 3^D-point stencil of a LINEAR radius-1 nodal operator
    by probing with per-axis lattice combs: neighbors of a node span 3
    consecutive residues per axis, so residue classes mod a period >= 3
    identify each neighbor uniquely.  Output: (3^D, *nodes) numpy array,
    row k = coefficient of offset _stencil_offsets(ndim)[k]."""
    import itertools
    import numpy as np
    ndim = len(node_shape)
    P = [_probe_period(node_shape[ax], periodic[ax])
         for ax in range(ndim)]
    offs = _stencil_offsets(ndim)
    idx = np.indices(node_shape)
    coefs = np.zeros((len(offs),) + tuple(node_shape), np.float64)
    apply_j = jax.jit(apply_fn)
    for cls in itertools.product(*[range(p) for p in P]):
        v = np.ones(node_shape, bool)
        for ax in range(ndim):
            v &= (idx[ax] % P[ax]) == cls[ax]
        if not v.any():
            continue
        y = np.asarray(apply_j(jnp.asarray(v.astype(dtype))))
        for k, off in enumerate(offs):
            # a periodic axis of extent 2 aliases offsets -1 and +1 onto
            # the same node: fold the summed coupling into the +1 leg
            # only (the apply would double-count it otherwise)
            if any(off[ax] == -1 and periodic[ax] and node_shape[ax] == 2
                   for ax in range(ndim)):
                continue
            m = np.ones(node_shape, bool)
            for ax in range(ndim):
                j = idx[ax] + off[ax]
                m &= (j % P[ax]) == cls[ax]
                if not periodic[ax]:
                    m &= (j >= 0) & (j < node_shape[ax])
            coefs[k][m] = y[m]
    return coefs


@dataclasses.dataclass(frozen=True)
class StencilNodalLevel:
    dx: Tuple[float, ...]
    periodic: Tuple[bool, ...]
    bc_lo: Tuple[int, ...]
    bc_hi: Tuple[int, ...]
    cells: Tuple[int, ...]
    coefs: jnp.ndarray        # (3^D, *node_shape)

    def meta_lev(self) -> NodalLevel:
        """Sigma-free NodalLevel for the transfer/BC helpers."""
        return NodalLevel(self.dx, self.periodic, self.bc_lo, self.bc_hi,
                          None, None, self.cells)


jax.tree_util.register_dataclass(
    StencilNodalLevel, data_fields=["coefs"],
    meta_fields=["dx", "periodic", "bc_lo", "bc_hi", "cells"])


def stencil_nodal_apply(phi, st: StencilNodalLevel):
    """y[i] = sum_o coefs_o[i] * phi[i+o]; wrap on periodic axes, zero
    neighbor outside the domain (boundary rows' coefficients already
    encode the BC, including Dirichlet identity rows)."""
    ndim = len(st.dx)
    phi, coefs = jax.lax.optimization_barrier((phi, st.coefs))
    p = phi
    for ax in range(ndim):
        p = _wrap_pad(p, ax) if st.periodic[ax] else _zero_pad(p, ax)
    out = 0.0
    for k, off in enumerate(_stencil_offsets(ndim)):
        sl = tuple(slice(1 + off[ax], 1 + off[ax] + phi.shape[ax])
                   for ax in range(ndim))
        out = out + coefs[k] * p[sl]
    return out


class EBNodalSolver:
    """Geometric MG on the precomputed cut-cell nodal stencils.

    Built ONCE per static geometry (constant-density decks: sigma_hat =
    1/rho0, the in-step system scales by dt).  solve() mirrors
    NodalSolver.solve (same tolerance/stagnation contract)."""

    def __init__(self, dx, periodic, bc_lo, bc_hi, sigma, vfrac_oct,
                 max_levels=30, nu1=2, nu2=2, nu_bottom=40):
        ndim = len(dx)
        self.ndim = ndim
        self.nu1, self.nu2, self.nu_bottom = nu1, nu2, nu_bottom
        periodic = tuple(bool(p) for p in periodic)
        bc_lo = tuple(int(b) for b in bc_lo)
        bc_hi = tuple(int(b) for b in bc_hi)
        dtype = sigma.dtype
        cells = tuple(sigma.shape)
        meta0 = NodalLevel(tuple(dx), periodic, bc_lo, bc_hi, None, None,
                           cells)
        flev = eb_fine_level(sigma, vfrac_oct, meta0)
        node_shape = tuple(c if periodic[ax] else c + 1
                           for ax, c in enumerate(cells))
        c0 = extract_node_stencil(
            lambda v: eb_nodal_apply(v, meta0, flev), node_shape,
            periodic, dtype)
        levels = [StencilNodalLevel(tuple(dx), periodic, bc_lo, bc_hi,
                                    cells, jnp.asarray(c0, dtype))]
        while (len(levels) < max_levels
               and all(n % 2 == 0 and n >= 4 for n in cells)):
            cells = tuple(n // 2 for n in cells)
            prev = levels[-1]
            meta_c = NodalLevel(tuple(d * 2 for d in prev.dx), periodic,
                                bc_lo, bc_hi, None, None, cells)
            meta_f = prev.meta_lev()

            def rap(v, prev=prev, meta_c=meta_c, meta_f=meta_f):
                y = stencil_nodal_apply(_prolong_nodal(v, meta_f), prev)
                y = _zero_dirichlet(y, meta_f)
                return _apply_dirichlet_mask(_restrict_nodal(y, meta_f),
                                             meta_c, identity_from=v)

            nsh = tuple(c if periodic[ax] else c + 1
                        for ax, c in enumerate(cells))
            cc = extract_node_stencil(rap, nsh, periodic, dtype)
            levels.append(StencilNodalLevel(meta_c.dx, periodic, bc_lo,
                                            bc_hi, cells,
                                            jnp.asarray(cc, dtype)))
        self.levels = levels
        center = _stencil_offsets(ndim).index((0,) * ndim)
        self.dinvs = []
        for st in levels:
            diag = st.coefs[center]
            dmax = jnp.max(jnp.abs(diag))
            ok = jnp.abs(diag) > 1e-8 * dmax
            self.dinvs.append(
                jnp.where(ok, 1.0 / jnp.where(ok, diag, 1.0), 0.0))
        self.singular = all(
            b != SolverBC.DIRICHLET for b in list(bc_lo) + list(bc_hi))

    def _smooth_res(self, x, b, li, n, want_residual):
        st, inv = self.levels[li], self.dinvs[li]
        red, black = _checkerboards(x.shape, x.dtype)

        def sweep(x, _):
            x = x + red * (b - stencil_nodal_apply(x, st)) * inv
            x = x + black * (b - stencil_nodal_apply(x, st)) * inv
            return x, None

        x, _ = jax.lax.scan(sweep, x, None, length=n)
        return x, (b - stencil_nodal_apply(x, st)) if want_residual \
            else None

    def _vcycle(self, x, b, li=0, want_residual=False):
        st = self.levels[li]
        meta = st.meta_lev()
        if li == len(self.levels) - 1:
            return self._smooth_res(x, b, li, self.nu_bottom,
                                    want_residual)
        x, r = self._smooth_res(x, b, li, self.nu1, True)
        r = _zero_dirichlet(r, meta)
        rc = _restrict_nodal(r, meta)
        rc = _zero_dirichlet(rc, self.levels[li + 1].meta_lev())
        ec, _ = self._vcycle(jnp.zeros_like(rc), rc, li + 1)
        x = x + _prolong_nodal(ec, meta)
        return self._smooth_res(x, b, li, self.nu2, want_residual)

    def solve(self, rhs, x0=None, rtol=1e-11, atol=1e-14, maxiter=100):
        st = self.levels[0]
        meta = st.meta_lev()
        if x0 is None:
            x0 = jnp.zeros_like(rhs)
        if self.singular:
            rhs = rhs - jnp.mean(rhs)
        rhs = _zero_dirichlet(rhs, meta)

        bnorm = _maxnorm(rhs)
        tol = jnp.maximum(rtol * bnorm, atol)

        def cond(c):
            x, res, prev, it = c
            progressing = res < 0.999 * prev
            return jnp.logical_and(
                jnp.logical_and(res > tol, it < maxiter), progressing)

        def body(c):
            x, res, _, it = c
            x, r = self._vcycle(x, rhs, want_residual=True)
            return x, _maxnorm(r), res, it + 1

        res0 = _maxnorm(rhs - stencil_nodal_apply(x0, st))
        big = jnp.asarray(jnp.inf, res0.dtype)
        x, res, _, it = jax.lax.while_loop(
            cond, body, (x0, res0, big, jnp.array(0)))
        if self.singular:
            x = x - jnp.mean(x)
        return x, res, it


def _ebnodalsolver_flatten(s):
    return ((s.levels, s.dinvs),
            (s.ndim, s.nu1, s.nu2, s.nu_bottom, s.singular))


def _ebnodalsolver_unflatten(aux, children):
    obj = EBNodalSolver.__new__(EBNodalSolver)
    obj.ndim, obj.nu1, obj.nu2, obj.nu_bottom, obj.singular = aux
    obj.levels, obj.dinvs = children
    return obj


jax.tree_util.register_pytree_node(
    EBNodalSolver, _ebnodalsolver_flatten, _ebnodalsolver_unflatten)


def _nodalsolver_flatten(s):
    return ((s.levels, s.diags, s.dinvs, s.symbol),
            (s.ndim, s.nu1, s.nu2, s.nu_bottom, s.singular))


def _nodalsolver_unflatten(aux, children):
    obj = object.__new__(NodalSolver)
    obj.levels, obj.diags, obj.dinvs, obj.symbol = children
    obj.ndim, obj.nu1, obj.nu2, obj.nu_bottom, obj.singular = aux
    return obj


jax.tree_util.register_pytree_node(
    NodalSolver, _nodalsolver_flatten, _nodalsolver_unflatten)
