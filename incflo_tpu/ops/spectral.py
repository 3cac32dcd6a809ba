"""Exact direct solves for constant-coefficient operators (the
TPU-native fast path that replaces the MG V-cycle iteration on the
benchmark decks: measured ~7 of ~12 ms/step at 128-class f32 across
the MAC + Helmholtz + nodal families).

Two diagonalizations, both built at solver-construction time from the
SAME discrete operators the MG path iterates on (multigrid.cell_apply
/ nodal_apply), so answers match the MG path to roundoff
(tests/test_spectral.py):

1. Fast diagonalization (MXU matmuls; the jax-cfd approach).  The
   constant-coefficient CELL operator is a Kronecker sum of 1D
   operators for ANY BC mix: per-axis 1D matrices are probed
   numerically from the real operator, eigendecomposed (numpy, at
   setup), and the solve becomes one dot_general per axis per
   direction around an elementwise eigenvalue division.  This covers
   the MAC projection and the diffusion Helmholtz on constant-density
   constant-viscosity decks INCLUDING wall-bounded ones
   (couette/Poiseuille channels).  The fully-periodic NODAL FEM
   operator (not a Kronecker sum, but translation-invariant and
   even-symmetric per axis) is diagonalized by the orthonormal real
   tensor-Fourier basis with eigenvalues from its DFT symbol.
2. rfftn/irfftn with the DFT symbol of the operator's delta response:
   the fallback for fully-periodic grids with axes above
   INCFLO_FASTDIAG_MAX (matmul transforms are O(N) per element per
   axis; the FFT wins at 512-class).

This replaces the iterative path the reference takes through AMReX
MLMG (src/projection/incflo_apply_nodal_projection.cpp:134-153,
src/convection/incflo_compute_MAC_projected_velocities.cpp:121-132)
for this operator class; variable-coefficient / EB / non-periodic
nodal solves fall through to the geometric MG unchanged.

Eligibility is decided once per solver construction from concrete
coefficient arrays (prebuilt solvers are constructed eagerly at
setup); solvers built under a jax trace see Tracer coefficients and
stay on the MG path.  Sharded multi-chip runs disable the path via
pallas_guard (an rfftn over a GSPMD-sharded operand would force
all-to-alls / gathers XLA may lay out poorly).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def enabled() -> bool:
    return os.environ.get("INCFLO_SPECTRAL", "1") != "0"


def usable(sym: Optional["Symbol"]) -> bool:
    """Whether `sym` may be dispatched right now.  The fast-diag matmul
    form partitions cleanly under GSPMD (a dense per-axis contraction is
    a sharded matmul: partial products + reduce-scatter over ICI, the
    scaling-book recipe), so it stays ON for sharded multi-chip runs
    (VERDICT r3 Next #1b).  The rfftn form would force layout-hostile
    all-to-alls and stays single-device only."""
    if sym is None or not enabled():
        return False
    from incflo_tpu.ops import pallas_guard
    if pallas_guard.sharded():
        return (sym.fwd is not None
                and os.environ.get("INCFLO_SPECTRAL_SHARDED", "1") == "1")
    return True


def check_residual() -> bool:
    """A direct solve needs no residual to terminate; computing one each
    step costs a full operator apply (the nodal apply alone is ~0.5 ms
    at 128-class).  Off by default; INCFLO_SPECTRAL_RES=1 turns on true
    residual reporting for debugging/validation (tests compute their
    own residuals explicitly)."""
    return os.environ.get("INCFLO_SPECTRAL_RES", "0") == "1"


def _const_val(arr, comp_axes: int = 0) -> Optional[np.ndarray]:
    """Spatially-constant value of `arr` over its leading spatial axes,
    per trailing component (shape () for comp_axes=0, else the trailing
    comp_axes shape); None if non-constant or not concrete (solver
    built inside a trace)."""
    if arr is None:
        return None
    if isinstance(arr, jax.core.Tracer):
        return None
    a = np.asarray(arr)
    comp_shape = a.shape[a.ndim - comp_axes:] if comp_axes else ()
    flat = a.reshape(-1, *comp_shape) if comp_axes else a.reshape(-1, 1)
    lo, hi = flat.min(axis=0), flat.max(axis=0)
    if not np.all(lo == hi):
        return None
    return lo.reshape(comp_shape)


@dataclasses.dataclass(frozen=True)
class Symbol:
    """Diagonalization of a constant-coefficient operator.

    sym_face : eigenvalues of the (alpha=0, beta=1) operator -- the
               "face part" that scales with beta at solve time.  On the
               rfftn frequency grid when fwd is None, on the per-axis
               eigenmode grid otherwise.
    a0       : constant acoef value (per component) scaled by alpha at
               solve time; None == 0.
    fwd/inv  : per-axis (N, N) transform matrices: x_hat contracts axis
               d with fwd[d] rows, x = contract with inv[d] rows.  When
               present the solve runs as one dot_general per axis per
               direction on the MXU (fast diagonalization, the jax-cfd
               approach) instead of rfftn/irfftn.  Periodic axes use
               the orthonormal real Fourier basis (fwd = Q^T, inv = Q);
               wall/outflow axes use the eigendecomposition of the 1D
               operator matrix (fwd = V^-1, inv = V), valid because the
               cell operator with constant coefficients is a Kronecker
               SUM of 1D operators.
    cells    : spatial shape the symbol was built for.
    batched  : symbol carries a trailing component axis.
    """
    sym_face: jnp.ndarray
    a0: Optional[jnp.ndarray]
    fwd: Optional[Tuple[jnp.ndarray, ...]]
    inv: Optional[Tuple[jnp.ndarray, ...]]
    cells: Tuple[int, ...]
    batched: bool


jax.tree_util.register_dataclass(
    Symbol, data_fields=["sym_face", "a0", "fwd", "inv"],
    meta_fields=["cells", "batched"])


# matmul diagonalization is O(N) flops per element per axis; past this
# axis size the O(log N) FFT wins despite its transpose costs
_FASTDIAG_MAX_AXIS = int(os.environ.get("INCFLO_FASTDIAG_MAX", "256"))


def _real_fourier_basis(n: int, dtype) -> np.ndarray:
    """Orthonormal real Fourier basis of Z_n (columns): constant, then
    (cos, sin) pairs, then the alternating mode for even n.  Any stencil
    that is translation-invariant AND even-symmetric per axis is
    diagonalized by the tensor product of these bases."""
    j = np.arange(n)
    cols = [np.full(n, 1.0 / np.sqrt(n))]
    freqs = [0]
    for k in range(1, (n + 1) // 2):
        w = 2.0 * np.pi * k / n
        cols.append(np.sqrt(2.0 / n) * np.cos(w * j))
        cols.append(np.sqrt(2.0 / n) * np.sin(w * j))
        freqs += [k, k]
    if n % 2 == 0:
        cols.append(((-1.0) ** j) / np.sqrt(n))
        freqs.append(n // 2)
    return np.stack(cols, axis=1).astype(dtype), np.asarray(freqs)


def _fd_apply_np(fwds, invs, lam, v):
    """Numpy reference of the fast-diag operator: inv diag(lam) fwd v."""
    h = v
    for d, f in enumerate(fwds):
        h = np.moveaxis(np.tensordot(h, f, axes=([d], [1])), -1, d)
    h = h * lam
    for d, b in enumerate(invs):
        h = np.moveaxis(np.tensordot(h, b, axes=([d], [1])), -1, d)
    return h


def _fastdiag_from_delta(resp, cells, dtype):
    """(fwd, inv, lam) for the real-basis fast diagonalization of a
    fully-periodic operator: the full DFT symbol gathered onto the
    real-mode grid.  The construction is valid only for stencils
    even-symmetric per axis (cos/sin pairs share an eigenvalue);
    verified by reconstructing the operator's delta response --
    translation-invariant operators are determined by it -- and
    returning None on mismatch."""
    if any(n > _FASTDIAG_MAX_AXIS for n in cells):
        return None
    ndim = len(cells)
    r = np.asarray(resp)
    sym = np.fft.fftn(r, axes=tuple(range(ndim))).real
    qs_np, fmaps = zip(*(_real_fourier_basis(n, dtype) for n in cells))
    lam = sym[np.ix_(*fmaps)].astype(dtype)     # trailing comp axis rides
    delta = np.zeros(r.shape, dtype)
    delta[(0,) * ndim] = 1.0
    fwds = tuple(q.T for q in qs_np)
    err = np.abs(_fd_apply_np(fwds, qs_np, lam, delta) - r).max()
    if err > 1e-4 * max(np.abs(r).max(), 1e-30):
        return None
    return (tuple(jnp.asarray(f) for f in fwds),
            tuple(jnp.asarray(q) for q in qs_np), jnp.asarray(lam))


def _delta(cells, dtype, comp=()):
    """Delta at the spatial origin (all components for batched ops)."""
    d = jnp.zeros(tuple(cells) + tuple(comp), dtype)
    return d.at[(0,) * len(cells)].set(1.0)


def _rfft_sym(resp, ndim):
    """Real symbol of a symmetric stencil from its delta response."""
    axes = tuple(range(ndim))
    return jnp.real(jnp.fft.rfftn(resp, axes=axes))


def _extract_1d_matrix(dx, bc_lo, bc_hi, axis, n, ndim, dtype):
    """Dense 1D operator matrix A[i,j] = (L e_j)_i along `axis` for the
    unit-coefficient (alpha=0, beta=1, b=1) cell operator, including
    its BC-modified boundary rows.  Probed numerically on a skinny grid
    (n cells along `axis`, 4 along the others) so the matrix is the
    SAME discrete operator multigrid.cell_apply implements; the
    response is read on an interior line of the other axes, where an
    axis-constant field contributes nothing."""
    from incflo_tpu.ops import multigrid as mg
    cells_s = [4] * ndim
    cells_s[axis] = n
    bco = []
    for d in range(ndim):
        shape = tuple(c + (1 if d2 == d else 0)
                      for d2, c in enumerate(cells_s))
        # trailing size-1 axis so the coefficient broadcasts over the
        # n probe vectors batched in x's trailing axis
        bco.append(jnp.ones(shape + (1,), dtype))
    lev_s = mg.CellLevel(tuple(dx), tuple(bc_lo), tuple(bc_hi),
                         0.0, 1.0, None, tuple(bco))
    eye = jnp.eye(n, dtype=dtype)                      # (pos, probe)
    rs = [1] * ndim + [n]
    rs[axis] = n
    x = jnp.ones(tuple(cells_s) + (n,), dtype) * eye.reshape(rs)
    resp = mg.cell_apply(x, lev_s)
    line = tuple(slice(None) if d == axis else 1 for d in range(ndim))
    return np.asarray(resp[line]).astype(np.float64)   # (pos, probe)


def _kron_fastdiag(lev, cells, dtype, bvals, comp):
    """Fast diagonalization of the constant-coefficient cell operator:
    L_face = -div(b grad) is a Kronecker SUM of 1D operators, so
    per-axis eigendecompositions diagonalize it for ANY BC mix
    (periodic/Neumann/Dirichlet).  Per-component face coefficients only
    scale the per-axis eigenvalues (same eigenvectors).  Verified
    against the real operator on a random field; None on failure."""
    from incflo_tpu.ops import multigrid as mg
    if any(n > _FASTDIAG_MAX_AXIS for n in cells):
        return None
    ndim = len(lev.dx)
    fwds, invs, ws = [], [], []
    for d in range(ndim):
        A = _extract_1d_matrix(lev.dx, lev.bc_lo, lev.bc_hi, d,
                               cells[d], ndim, dtype)
        if np.abs(A - A.T).max() <= 1e-10 * max(np.abs(A).max(), 1e-30):
            w, V = np.linalg.eigh(A)
            F = V.T
        else:                      # maxorder-3 Dirichlet rows
            w, V = np.linalg.eig(A)
            if np.abs(w.imag).max() > 1e-10 * max(np.abs(w).max(), 1e-30):
                return None
            order = np.argsort(w.real)
            w, V = w.real[order], V.real[:, order]
            if np.linalg.cond(V) > 1e7:
                return None
            F = np.linalg.inv(V)
        fwds.append(F)
        invs.append(V)
        ws.append(w)
    # lam[k1..kD(,c)] = sum_d b_d(,c) * w_d[k_d]
    lam = np.zeros(cells + comp, np.float64)
    for d in range(ndim):
        shape = [1] * (ndim + len(comp))
        shape[d] = cells[d]
        wd = ws[d].reshape(shape)
        bd = np.asarray(bvals[d], np.float64).reshape((1,) * ndim + comp)
        lam = lam + bd * wd
    # verify on a random field against the true discrete operator
    rng = np.random.default_rng(0)
    v = rng.standard_normal(cells + comp)
    lev1 = dataclasses.replace(lev, alpha=0.0, beta=1.0)
    av_true = np.asarray(mg.cell_apply(jnp.asarray(v, dtype), lev1),
                         np.float64)
    av_fd = _fd_apply_np(fwds, invs, lam, v)
    tol = 2e-4 if dtype == jnp.float32 else 1e-9
    if np.abs(av_fd - av_true).max() > tol * max(np.abs(av_true).max(),
                                                 1e-30):
        return None
    return (tuple(jnp.asarray(f.astype(dtype)) for f in fwds),
            tuple(jnp.asarray(v_.astype(dtype)) for v_ in invs),
            jnp.asarray(lam.astype(dtype)))


def cell_symbol(lev) -> Optional[Symbol]:
    """Symbol for multigrid.CellLevel, or None if ineligible."""
    from incflo_tpu.ops import multigrid as mg
    ndim = len(lev.dx)
    if lev.ebc is not None:
        return None
    if isinstance(lev.alpha, jax.core.Tracer) or isinstance(
            lev.beta, jax.core.Tracer):
        return None
    comp_axes = lev.bcoef[0].ndim - ndim
    bvals = [_const_val(b, comp_axes) for b in lev.bcoef]
    if any(v is None for v in bvals):
        return None
    a0 = None
    if lev.acoef is not None:
        a0 = _const_val(lev.acoef, lev.acoef.ndim - ndim)
        if a0 is None:
            return None
    batched = lev.bcoef[0].ndim > ndim
    cells = tuple(lev.bcoef[0].shape[ax] - (1 if ax == 0 else 0)
                  for ax in range(ndim))
    dtype = lev.bcoef[0].dtype
    comp = tuple(lev.bcoef[0].shape[ndim:]) if batched else ()
    a0j = None if a0 is None else jnp.asarray(a0, dtype)
    fd = _kron_fastdiag(lev, cells, dtype, bvals, comp)
    if fd is not None:
        fwd, inv, lam = fd
        return Symbol(sym_face=lam, a0=a0j, fwd=fwd, inv=inv, cells=cells,
                      batched=batched)
    all_periodic = all(b == mg.SolverBC.PERIODIC
                       for b in list(lev.bc_lo) + list(lev.bc_hi))
    if not all_periodic:
        return None          # the rfftn path needs translation invariance
    lev1 = dataclasses.replace(lev, alpha=0.0, beta=1.0)
    resp = mg.cell_apply(_delta(cells, dtype, comp), lev1)
    return Symbol(sym_face=_rfft_sym(resp, ndim), a0=a0j, fwd=None,
                  inv=None, cells=cells, batched=batched)


def nodal_symbol(lev) -> Optional[Symbol]:
    """Symbol for multigrid.NodalLevel (all-periodic => the nodal phi
    array is N entries per axis, no duplicated wrap plane)."""
    from incflo_tpu.ops import multigrid as mg
    ndim = len(lev.dx)
    if not enabled():
        return None
    if not all(lev.periodic):
        return None
    sp = lev.sigma_pad if lev.sigma is None else lev.sigma
    if _const_val(sp) is None:
        return None
    cells = lev.cells if lev.cells is not None else tuple(lev.sigma.shape)
    dtype = sp.dtype
    # jit the delta probe: the EAGER nodal_apply materializes every
    # shift-tree intermediate (~8 node-sized buffers -- an OOM at 512^3
    # on a 16 GB chip); fused it needs ~3
    resp = jax.jit(lambda d: mg.nodal_apply(d, lev))(_delta(cells, dtype))
    fd = _fastdiag_from_delta(resp, cells, dtype)
    if fd is not None:
        fwd, inv, lam = fd
        return Symbol(sym_face=lam, a0=None, fwd=fwd, inv=inv,
                      cells=cells, batched=False)
    return Symbol(sym_face=_rfft_sym(resp, ndim), a0=None, fwd=None,
                  inv=None, cells=cells, batched=False)


def _contract(h, m, axis):
    """h'_k = sum_j m[k, j] h_j along `axis`; one dot_general on the
    MXU (HIGHEST keeps f32 accuracy through the transform pair).

    In-kernel (the fused whole-step Pallas program) a 3D operand's
    tensordot lowers to a tpu.reshape that merges the trailing
    component axis into the lane dimension
    (vector<NxNxCxf32> -> vector<NxNCxf32>), which Mosaic rejects;
    contract each trailing component as its own 2D dot instead
    (C <= 3 velocity/tracer components)."""
    from incflo_tpu.ops import pallas_guard
    if pallas_guard.in_kernel() and h.ndim == 3 and axis < 2:
        # also avoid stack/concatenate along the component axis (Mosaic
        # rejects the tpu.concatenate on offset-mismatched dot outputs):
        # reassemble with one-hot broadcast-sums, pure elementwise ops
        from incflo_tpu.ops.stencil import comp_stack
        cols = []
        for c in range(h.shape[-1]):
            if axis == 0:   # (n, A) x (A, B) -> (n, B), n-axis in place
                cols.append(jnp.tensordot(m, h[..., c], axes=([1], [0]),
                                          precision=jax.lax.Precision.HIGHEST))
            else:           # (A, B) x (n, B)^T -> (A, n)
                cols.append(jnp.tensordot(h[..., c], m, axes=([1], [1]),
                                          precision=jax.lax.Precision.HIGHEST))
        return comp_stack(cols, axis=-1)
    out = jnp.tensordot(h, m, axes=([axis], [1]),
                        precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, -1, axis)


def solve(sym: Symbol, rhs, alpha, beta, singular: bool):
    """x = L^{-1} rhs; exact up to roundoff.  Fast-diagonalization
    matmuls when a real eigenbasis is present, rfftn/irfftn otherwise.

    alpha/beta may be traced scalars (CellSolver.with_beta re-scales
    beta=dt per step); the eigenvalue combination is elementwise.
    For singular (pure-Poisson) operators the zero mode of rhs is
    projected out and x returns with zero mean (the zero mode is the
    constant vector in both representations)."""
    ndim = len(sym.cells)
    axes = tuple(range(ndim))
    batched_rhs = rhs.ndim > ndim
    s = sym.sym_face
    if sym.a0 is not None:
        s = alpha * sym.a0 + beta * s
    else:
        s = beta * s
    if sym.batched and not batched_rhs:
        raise ValueError("batched symbol needs batched rhs")
    if batched_rhs and not sym.batched:
        s = s[..., None]
    zero = (0,) * ndim

    def _origin_mask(shape, dtype):
        # 1.0 at the spatial origin, 0 elsewhere -- mask form instead of
        # .at[origin].set scatters so the solve lowers inside Pallas
        # kernels (ops/pallas_step2d wraps the whole step in one kernel)
        m = None
        for d in range(ndim):
            md = jax.lax.broadcasted_iota(jnp.int32, shape[:ndim], d) == 0
            m = md if m is None else jnp.logical_and(m, md)
        m = m.astype(dtype)
        return m.reshape(shape[:ndim] + (1,) * (len(shape) - ndim))

    if sym.fwd is not None:
        h = rhs
        for d, f in enumerate(sym.fwd):
            h = _contract(h, f, d)
        if singular:
            m = _origin_mask(s.shape, s.dtype)
            s = s * (1.0 - m) + m
            h = h * (1.0 - _origin_mask(h.shape, h.dtype))
        h = h / s
        for d, b in enumerate(sym.inv):
            h = _contract(h, b, d)
        return h.astype(rhs.dtype)
    rh = jnp.fft.rfftn(rhs, axes=axes)
    if singular:
        s = s.at[zero].set(1.0)
        rh = rh.at[zero].set(0.0)
    x = jnp.fft.irfftn(rh / s, s=sym.cells, axes=axes).astype(rhs.dtype)
    if singular:
        x = x - jnp.mean(x, axis=axes, keepdims=True)
    return x
