"""Exact FFT direct solves for fully-periodic constant-coefficient
operators (the TPU-native fast path for the periodic benchmark decks).

When every axis is periodic and the operator's coefficients are
spatially constant (constant density => MAC beta = 1/rho0 and nodal
sigma = 1/rho0; constant Newtonian viscosity => Helmholtz a = rho0,
b = mu), the discrete operator is translation-invariant on the Z_N
lattice, so the DFT diagonalizes it EXACTLY.  One rfftn / irfftn pair
replaces the entire MG V-cycle iteration (measured ~7 of ~12 ms/step
at 128-class f32 across the MAC + Helmholtz + nodal families).

The symbol is computed NUMERICALLY at solver-build time by applying
the existing discrete operator (multigrid.cell_apply / nodal_apply) to
a delta function and FFT-ing the response.  The spectral solve
therefore inverts the *same* discrete operator the MG path iterates
on, bit-for-bit in exact arithmetic: the MAC projection keeps its
exact discrete-divergence property and answers match the MG path to
roundoff (tests/test_spectral.py).

This replaces the iterative path the reference takes through AMReX
MLMG (src/projection/incflo_apply_nodal_projection.cpp:134-153,
src/convection/incflo_compute_MAC_projected_velocities.cpp:121-132)
for this operator class; non-periodic / variable-coefficient / EB
solves fall through to the geometric MG unchanged.

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
    if os.environ.get("INCFLO_SPECTRAL", "1") == "0":
        return False
    from incflo_tpu.ops import pallas_guard
    return not pallas_guard.sharded()


def check_residual() -> bool:
    """A direct solve needs no residual to terminate; computing one each
    step costs a full operator apply (the nodal apply alone is ~0.5 ms
    at 128-class).  Off by default; INCFLO_SPECTRAL_RES=1 turns on true
    residual reporting for debugging/validation (tests compute their
    own residuals explicitly)."""
    return os.environ.get("INCFLO_SPECTRAL_RES", "0") == "1"


def _const_val(arr) -> Optional[np.ndarray]:
    """Spatially-constant value of `arr` over its leading spatial axes,
    per trailing component (shape () or (C,)); None if non-constant or
    not concrete (solver built inside a trace)."""
    if arr is None:
        return None
    if isinstance(arr, jax.core.Tracer):
        return None
    a = np.asarray(arr)
    flat = a.reshape(-1, a.shape[-1]) if a.ndim else a.reshape(-1, 1)
    lo, hi = flat.min(axis=0), flat.max(axis=0)
    if not np.all(lo == hi):
        return None
    return lo


@dataclasses.dataclass(frozen=True)
class Symbol:
    """Diagonalization of a translation-invariant operator.

    sym_face : eigenvalues of the (alpha=0, beta=1) operator -- the
               "face part" that scales with beta at solve time.  On the
               rfftn frequency grid when basis is None, on the real
               tensor-Fourier mode grid otherwise.
    a0       : constant acoef value (per component) scaled by alpha at
               solve time; None == 0.
    basis    : per-axis orthonormal real eigenbasis matrices Q_d
               (columns = modes).  When present the solve runs as MXU
               matmuls (fast diagonalization, the jax-cfd approach:
               x = Q diag(1/lam) Q^T rhs, one dot per axis per
               direction) instead of rfftn/irfftn -- measured 0.63 ms
               per FFT round trip at 128x128x32 f32 on v5e vs ~0.8
               Gflop of matmul (microseconds on the MXU).
    cells    : spatial shape the symbol was built for.
    batched  : symbol carries a trailing component axis.
    """
    sym_face: jnp.ndarray
    a0: Optional[jnp.ndarray]
    basis: Optional[Tuple[jnp.ndarray, ...]]
    cells: Tuple[int, ...]
    batched: bool


jax.tree_util.register_dataclass(
    Symbol, data_fields=["sym_face", "a0", "basis"],
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


def _fd_apply_np(qs, lam, v):
    """Numpy reference of the fast-diag operator: Q diag(lam) Q^T v."""
    h = v
    for d, q in enumerate(qs):
        h = np.moveaxis(np.tensordot(h, q, axes=([d], [0])), -1, d)
    h = h * lam if h.ndim == lam.ndim else h * lam[..., None]
    for d, q in enumerate(qs):
        h = np.moveaxis(np.tensordot(h, q, axes=([d], [1])), -1, d)
    return h


def _fastdiag_from_delta(resp, cells, dtype):
    """(basis, lam) for the real-basis fast diagonalization: the full
    DFT symbol gathered onto the real-mode grid.  The construction is
    valid only for stencils even-symmetric per axis (cos/sin pairs
    share an eigenvalue); verified by reconstructing the operator's
    delta response -- translation-invariant operators are determined by
    it -- and returning None on mismatch."""
    if any(n > _FASTDIAG_MAX_AXIS for n in cells):
        return None
    ndim = len(cells)
    r = np.asarray(resp)
    sym = np.fft.fftn(r, axes=tuple(range(ndim))).real
    qs_np, fmaps = zip(*(_real_fourier_basis(n, dtype) for n in cells))
    lam = sym[np.ix_(*fmaps)].astype(dtype)     # trailing comp axis rides
    delta = np.zeros(r.shape, dtype)
    delta[(0,) * ndim] = 1.0
    lam_nd = lam if r.ndim == ndim else lam
    err = np.abs(_fd_apply_np(qs_np, lam_nd, delta) - r).max()
    if err > 1e-4 * max(np.abs(r).max(), 1e-30):
        return None
    return tuple(jnp.asarray(q) for q in qs_np), jnp.asarray(lam)


def _delta(cells, dtype, comp=()):
    """Delta at the spatial origin (all components for batched ops)."""
    d = jnp.zeros(tuple(cells) + tuple(comp), dtype)
    return d.at[(0,) * len(cells)].set(1.0)


def _rfft_sym(resp, ndim):
    """Real symbol of a symmetric stencil from its delta response."""
    axes = tuple(range(ndim))
    return jnp.real(jnp.fft.rfftn(resp, axes=axes))


def cell_symbol(lev) -> Optional[Symbol]:
    """Symbol for multigrid.CellLevel, or None if ineligible."""
    from incflo_tpu.ops import multigrid as mg
    ndim = len(lev.dx)
    if any(b != mg.SolverBC.PERIODIC for b in list(lev.bc_lo) + list(lev.bc_hi)):
        return None
    if lev.ebc is not None:
        return None
    if isinstance(lev.alpha, jax.core.Tracer) or isinstance(
            lev.beta, jax.core.Tracer):
        return None
    bvals = [_const_val(b) for b in lev.bcoef]
    if any(v is None for v in bvals):
        return None
    a0 = None
    if lev.acoef is not None:
        a0 = _const_val(lev.acoef)
        if a0 is None:
            return None
        if lev.acoef.ndim > ndim:          # batched trailing component axis
            a0 = a0.reshape(lev.acoef.shape[ndim:])
        else:
            a0 = a0.reshape(())
    batched = lev.bcoef[0].ndim > ndim
    cells = tuple(lev.bcoef[0].shape[ax] - (1 if ax == 0 else 0)
                  for ax in range(ndim))
    dtype = lev.bcoef[0].dtype
    comp = tuple(lev.bcoef[0].shape[ndim:]) if batched else ()
    lev1 = dataclasses.replace(lev, alpha=0.0, beta=1.0)
    resp = mg.cell_apply(_delta(cells, dtype, comp), lev1)
    a0j = None if a0 is None else jnp.asarray(a0, dtype)
    fd = _fastdiag_from_delta(resp, cells, dtype)
    if fd is not None:
        basis, lam = fd
        return Symbol(sym_face=lam, a0=a0j, basis=basis, cells=cells,
                      batched=batched)
    return Symbol(sym_face=_rfft_sym(resp, ndim), a0=a0j, basis=None,
                  cells=cells, batched=batched)


def nodal_symbol(lev) -> Optional[Symbol]:
    """Symbol for multigrid.NodalLevel (all-periodic => the nodal phi
    array is N entries per axis, no duplicated wrap plane)."""
    from incflo_tpu.ops import multigrid as mg
    ndim = len(lev.dx)
    if not all(lev.periodic):
        return None
    sp = lev.sigma_pad if lev.sigma is None else lev.sigma
    if _const_val(sp) is None:
        return None
    cells = lev.cells if lev.cells is not None else tuple(lev.sigma.shape)
    dtype = sp.dtype
    resp = mg.nodal_apply(_delta(cells, dtype), lev)
    fd = _fastdiag_from_delta(resp, cells, dtype)
    if fd is not None:
        basis, lam = fd
        return Symbol(sym_face=lam, a0=None, basis=basis, cells=cells,
                      batched=False)
    return Symbol(sym_face=_rfft_sym(resp, ndim), a0=None, basis=None,
                  cells=cells, batched=False)


def _contract(h, q, axis, transpose):
    """Contract h's `axis` with the (N, N) matrix q: rows when
    transpose (Q^T h, the forward transform), columns otherwise (Q h).
    Lowered as a single dot_general on the MXU."""
    qi = 0 if transpose else 1
    out = jnp.tensordot(h, q, axes=([axis], [qi]),
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
    if sym.basis is not None:
        h = rhs
        for d, q in enumerate(sym.basis):
            h = _contract(h, q, d, transpose=True)
        if singular:
            s = s.at[zero].set(1.0)
            h = h.at[zero].set(0.0)
        h = h / s
        for d, q in enumerate(sym.basis):
            h = _contract(h, q, d, transpose=False)
        return h.astype(rhs.dtype)
    rh = jnp.fft.rfftn(rhs, axes=axes)
    if singular:
        s = s.at[zero].set(1.0)
        rh = rh.at[zero].set(0.0)
    x = jnp.fft.irfftn(rh / s, s=sym.cells, axes=axes).astype(rhs.dtype)
    if singular:
        x = x - jnp.mean(x, axis=axes, keepdims=True)
    return x
