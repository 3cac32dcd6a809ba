"""Pallas TPU kernel: fused red-black smoother for the Q1 FEM nodal
sigma-Poisson operator (the nodal projection's hot loop).

The jnp nodal_apply (ops/multigrid.py) lowers to ~40 separate XLA
kernels (pad/concat/roll chains break fusion), costing ~1.1 ms per
apply at 128x128x32 f32 on a v5e -- pure launch latency against a
~0.13 ms traffic bound.  This kernel runs the WHOLE fine-level smooth
(nsweeps red-black sweeps, each 2 operator applies) plus the optional
residual in ONE device dispatch with every array VMEM-resident, so HBM
is touched exactly once per input/output.

Operator form in-kernel (same factorized rank-1 element decomposition
as nodal_apply, multigrid.py:637-707):

    L(phi) = -(1/V) sum_p C_p A_p^T ( sigma . (A_p phi) )

over the 2^3-1 sign patterns p in {s,d}^3 \\ {sss}; A_p contracts
nodes->cells with per-axis (lo+hi)/(lo-hi) 2-point stencils, A_p^T
scatters back.  On an all-periodic grid every shift is an exact roll
on VMEM data (merged (y,z) lane axis; y-shift = roll by nz which wraps
correctly, z-shift = roll by 1 with a wrap fix on the z boundary).

Scope: 3D, float32, ALL axes periodic, power-of-two shapes with
ny*nz % 128 == 0 and the whole working set (~7 arrays) within the
16 MB VMEM -- levels up to ~96^3-equivalent, i.e. every COARSE level
of the flagship 128x128x32 hierarchy but not its finest (which runs
the XLA-fused jnp scan; the tiled variant below covers it but measures
slower -- see PERF.md round 3).  Anything else falls back to jnp.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:   # pragma: no cover
    HAVE_PALLAS = False

INTERPRET = False   # tests set True to run on CPU

VMEM_BUDGET = 13 * 1024 * 1024


def _roll(a, shift, axis):
    if INTERPRET or not HAVE_PALLAS:
        return jnp.roll(a, shift, axis=axis)
    return pltpu.roll(a, shift % a.shape[axis], axis=axis)


def _patterns(dx):
    """(C_p, pattern) for the 7 rank-1 terms (multigrid._nodal_weight
    convention, scaled by -1/V)."""
    import itertools
    vol = dx[0] * dx[1] * dx[2]
    out = []
    for pattern in itertools.product("sd", repeat=3):
        if "d" not in pattern:
            continue
        C = 0.0
        for d in range(3):
            if pattern[d] != "d":
                continue
            term = 1.0 / dx[d]
            for a in range(3):
                if a == d:
                    continue
                term *= (dx[a] / 4.0) if pattern[a] == "s" else (dx[a] / 12.0)
            C += term
        out.append((-C / vol, pattern))
    return out


def _shift_merged(a, axis, sgn, ny, nz):
    """a(idx + sgn*e_axis) with periodic wrap; a is (nx, ny*nz)."""
    if axis == 0:
        return _roll(a, -sgn, 0)
    if axis == 1:
        return _roll(a, -sgn * nz, 1)
    # z: roll by 1 on the merged axis, fixing the wrap at the z edge
    r = _roll(a, -sgn, 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    kk = idx % nz
    if sgn > 0:
        fix = _roll(a, nz - 1, 1)
        return jnp.where(kk == nz - 1, fix, r)
    fix = _roll(a, -(nz - 1), 1)
    return jnp.where(kk == 0, fix, r)


def _apply_periodic(phi, sigma, coeffs, ny, nz):
    """L(phi) on all-periodic merged-layout VMEM arrays.

    Hierarchical shift sharing: the contraction tree computes all 2^3
    per-axis sign patterns with ONE shift per tree node (7 shifts), and
    the scatter tree merges sign pairs via
        S^T(t_s) + D^T(t_d) = (t_s + t_d) + shift(t_s - t_d)
    (another 7 shifts) -- 14 shifts per apply vs 42 for the naive
    per-pattern form."""
    Cmap = {p: C for C, p in coeffs}
    parts = {(): phi}
    for ax in range(3):
        new = {}
        for key, v in parts.items():
            sh = _shift_merged(v, ax, +1, ny, nz)
            new[key + ("s",)] = v + sh
            new[key + ("d",)] = v - sh
        parts = new
    t = {p: (Cmap[p] * sigma * v) if p in Cmap else None
         for p, v in parts.items()}
    for ax in (2, 1, 0):
        new = {}
        for key in {k[:-1] for k in t}:
            ts = t.get(key + ("s",))
            td = t.get(key + ("d",))
            if ts is None and td is None:
                new[key] = None
                continue
            s0 = 0.0 if ts is None else ts
            d0 = 0.0 if td is None else td
            new[key] = (s0 + d0) + _shift_merged(s0 - d0, ax, -1, ny, nz)
        t = new
    return t[()]


def _smooth_kernel(nsweeps, want_residual, ny, nz, coeffs,
                   x_ref, b_ref, sig_ref, dinv_ref, out_ref, res_ref):
    x = x_ref[...]
    b = b_ref[...]
    sig = sig_ref[...]
    dinv = dinv_ref[...]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    gi = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    par = (gi + idx // nz + idx % nz) % 2
    red = (par == 0).astype(x.dtype)
    black = 1.0 - red
    for _ in range(nsweeps):
        x = x + red * (b - _apply_periodic(x, sig, coeffs, ny, nz)) * dinv
        x = x + black * (b - _apply_periodic(x, sig, coeffs, ny, nz)) * dinv
    out_ref[...] = x
    if want_residual:
        res_ref[...] = b - _apply_periodic(x, sig, coeffs, ny, nz)


def enabled() -> bool:
    """On by default on TPU (INCFLO_PALLAS_NODAL=0 disables); interpret
    mode allows CPU testing."""
    import os
    if os.environ.get("INCFLO_PALLAS_NODAL", "1") != "1":
        return False
    from incflo_tpu.ops import pallas_guard
    if pallas_guard.sharded():
        return False   # whole-array kernel would gather a sharded operand
    if INTERPRET:
        return True
    return jax.default_backend() in ("tpu", "axon")


def supported(lev, shape, dtype) -> bool:
    """All-periodic 3D f32 whole-VMEM case (see module docstring)."""
    if not HAVE_PALLAS or len(shape) != 3:
        return False
    if dtype != jnp.float32 and not INTERPRET:
        return False
    if not all(lev.periodic):
        return False
    nx, ny, nz = shape
    if (ny * nz) % 128 != 0 or nx % 8 != 0:
        return False
    # live-array budget measured on hardware: Mosaic's scoped-vmem stack
    # for this kernel hit 17.04 MB at 64^3 (262k elems) -- ~16.3 live
    # node arrays, not the naive 7 (the per-sweep temporaries of the
    # scanned red/black updates stay live across the fused residual).
    # 18 with the 16 MB part limit keeps a safety margin: 64x64x32-class
    # levels stay on the kernel, 64^3 falls back to the jnp scan.
    return 18 * nx * ny * nz * 4 <= 16 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("nsweeps", "want_residual",
                                             "dx", "shape"))
def _run(x, b, sigma, dinv, nsweeps, want_residual, dx, shape):
    nx, ny, nz = shape
    m = ny * nz
    coeffs = _patterns(dx)
    kern = functools.partial(_smooth_kernel, nsweeps, want_residual,
                             ny, nz, coeffs)
    out_shapes = (jax.ShapeDtypeStruct((nx, m), x.dtype),
                  jax.ShapeDtypeStruct((nx, m) if want_residual else (8, 128),
                                       x.dtype))
    flat = lambda a: a.reshape(nx, m)
    out, res = pl.pallas_call(
        kern,
        interpret=INTERPRET,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=out_shapes,
    )(flat(x), flat(b), flat(sigma), flat(dinv))
    out = out.reshape(shape)
    return (out, res.reshape(shape)) if want_residual else (out, None)


# ---------------------------------------------------------------------
# x-slab-TILED multi-sweep kernel: covers levels whose 7-array working
# set exceeds VMEM (the 128x128x32 flagship fine level).  Each tile
# recomputes a shrinking halo ring per color update so the tile interior
# is bit-identical to the global sequential-color sweep; halo 8 supports
# nsweeps <= 3 (+ fused residual).  All-periodic f32 only.
# ---------------------------------------------------------------------

TILE_HALO = 8


def _tiled_kernel(TB, ny, nz, coeffs, nsweeps, want_residual,
                  x_ref, b_ref, sig_ref, dinv_ref, out_ref, res_ref,
                  xs, bs, sigs, ds, sems):
    cx = pl.program_id(0) * TB
    S = TB + 2 * TILE_HALO
    copies = [
        pltpu.make_async_copy(x_ref.at[pl.ds(cx, S)], xs, sems.at[0]),
        pltpu.make_async_copy(b_ref.at[pl.ds(cx, S)], bs, sems.at[1]),
        pltpu.make_async_copy(sig_ref.at[pl.ds(cx, S)], sigs, sems.at[2]),
        pltpu.make_async_copy(dinv_ref.at[pl.ds(cx, S)], ds, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    x = xs[...]
    b = bs[...]
    sig = sigs[...]
    dinv = ds[...]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    gi = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + cx - TILE_HALO
    par = (gi + idx // nz + idx % nz) % 2
    red = (par == 0).astype(x.dtype)
    black = 1.0 - red
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)

    total = 2 * nsweeps
    extra = 1 if want_residual else 0
    for u in range(total):
        e = (total - 1 - u) + extra
        color = red if u % 2 == 0 else black
        upd = x + color * (b - _apply_periodic(x, sig, coeffs, ny, nz)) \
            * dinv
        ring = jnp.logical_and(rows >= TILE_HALO - e,
                               rows < S - TILE_HALO + e)
        x = jnp.where(ring, upd, x)
    out_ref[...] = x[TILE_HALO:TILE_HALO + TB]
    if want_residual:
        res_ref[...] = (b - _apply_periodic(x, sig, coeffs, ny, nz))[
            TILE_HALO:TILE_HALO + TB]
    else:
        res_ref[...] = jnp.zeros((TB, ny * nz), x.dtype)


def _tile_for(nx, m, itemsize=4, n_arrays=22):
    for tb in (128, 64, 32, 16, 8):
        if nx % tb:
            continue
        if n_arrays * (tb + 2 * TILE_HALO) * m * itemsize \
                <= VMEM_BUDGET:
            return tb
    return None


def tiled_supported(lev, shape, dtype, nsweeps) -> bool:
    # Opt-in (INCFLO_PALLAS_TILED=1): at VMEM-feasible tile sizes
    # (TB=16, halo 8 -> 3x redundant rows) the tiled multi-sweep kernel
    # measures 0.78 ms vs 0.64 ms for the XLA-fused jnp smoother at
    # 128x128x32 f32 -- the ring-shrink recomputation overhead exceeds
    # the launch savings, and each Mosaic instantiation costs minutes
    # through the axon tunnel.  Kept for larger-VMEM parts.
    import os
    if os.environ.get("INCFLO_PALLAS_TILED", "0") != "1":
        return False
    if not HAVE_PALLAS or len(shape) != 3:
        return False
    if dtype != jnp.float32 and not INTERPRET:
        return False
    if not all(lev.periodic):
        return False
    if 2 * nsweeps + 1 > TILE_HALO:
        return False
    nx, ny, nz = shape
    if (ny * nz) % 128 != 0 or nx % 8 != 0:
        return False
    return _tile_for(nx, ny * nz) is not None


@functools.partial(jax.jit, static_argnames=("nsweeps", "want_residual",
                                             "dx", "shape"))
def _run_tiled(x, b, sigma, dinv, nsweeps, want_residual, dx, shape):
    nx, ny, nz = shape
    m = ny * nz
    TB = _tile_for(nx, m)
    coeffs = _patterns(dx)
    kern = functools.partial(_tiled_kernel, TB, ny, nz, coeffs,
                             nsweeps, want_residual)

    def padx(a, w=TILE_HALO):
        f = a.reshape(nx, m)
        return jnp.concatenate([f[-w:], f, f[:w]], axis=0)

    out, res = pl.pallas_call(
        kern,
        interpret=INTERPRET,
        grid=(nx // TB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4,
        out_specs=(pl.BlockSpec((TB, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TB, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nx, m), x.dtype),
                   jax.ShapeDtypeStruct((nx, m), x.dtype)),
        scratch_shapes=[pltpu.VMEM((TB + 2 * TILE_HALO, m), x.dtype)] * 4
        + [pltpu.SemaphoreType.DMA((4,))],
    )(padx(x), padx(b), padx(sigma), padx(dinv))
    out = out.reshape(shape)
    return (out, res.reshape(shape)) if want_residual else (out, None)


def smooth(x, b, sigma, dinv, lev, nsweeps, want_residual=False):
    """nsweeps fused RB sweeps (+ optional residual) in one dispatch
    (whole-VMEM when the level fits, x-slab tiled otherwise), or None
    if unsupported."""
    dx = tuple(float(d) for d in lev.dx)
    shape = tuple(x.shape)
    if supported(lev, x.shape, x.dtype):
        return _run(x, b, sigma, dinv, int(nsweeps), bool(want_residual),
                    dx, shape)
    n = int(nsweeps)
    if tiled_supported(lev, x.shape, x.dtype, min(n, 2)):
        # chain tiled calls of <=2 sweeps (halo budget); residual fused
        # into the last call
        while n > 0:
            take = min(n, 2)
            last = (n - take) == 0
            x, r = _run_tiled(x, b, sigma, dinv, take,
                              bool(want_residual) and last, dx, shape)
            n -= take
        return x, r
    return None
