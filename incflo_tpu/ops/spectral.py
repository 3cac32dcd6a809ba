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
    """DFT symbol of a translation-invariant operator.

    sym_face : rfftn of the (alpha=0, beta=1) operator response to a
               delta -- the "face part" that scales with beta.
    a0       : constant acoef value (per component) scaled by alpha at
               solve time; None == 0.
    cells    : spatial shape the symbol was built for.
    batched  : symbol carries a trailing component axis.
    """
    sym_face: jnp.ndarray
    a0: Optional[jnp.ndarray]
    cells: Tuple[int, ...]
    batched: bool


jax.tree_util.register_dataclass(
    Symbol, data_fields=["sym_face", "a0"], meta_fields=["cells", "batched"])


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
    sym_face = _rfft_sym(resp, ndim)
    a0j = None if a0 is None else jnp.asarray(a0, dtype)
    return Symbol(sym_face=sym_face, a0=a0j, cells=cells, batched=batched)


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
    return Symbol(sym_face=_rfft_sym(resp, ndim), a0=None, cells=cells,
                  batched=False)


def solve(sym: Symbol, rhs, alpha, beta, singular: bool):
    """x = L^{-1} rhs via the DFT; exact up to roundoff.

    alpha/beta may be traced scalars (CellSolver.with_beta re-scales
    beta=dt per step); the symbol combination is elementwise.
    For singular (pure-Poisson) operators the zero mode of rhs is
    projected out and x returns with zero mean."""
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
    rh = jnp.fft.rfftn(rhs, axes=axes)
    if singular:
        zero = (0,) * ndim
        s = s.at[zero].set(1.0)
        rh = rh.at[zero].set(0.0)
    x = jnp.fft.irfftn(rh / s, s=sym.cells, axes=axes).astype(rhs.dtype)
    if singular:
        x = x - jnp.mean(x, axis=axes, keepdims=True)
    return x
