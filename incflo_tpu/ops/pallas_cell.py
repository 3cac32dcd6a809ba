"""Pallas TPU kernel: fused red-black smoother for the cell-centered
Helmholtz/Poisson operator  L(x) = alpha*a*x - beta*div(b grad x).

Same design as ops/pallas_nodal.py: the whole level lives in VMEM and
one device dispatch runs nsweeps red-black sweeps plus the optional
residual, replacing ~10 XLA kernels per half-sweep (pad/concat/roll
chains) whose launch latency dominates the MAC-projection and diffusion
multigrid at production sizes.

Operator form in-kernel (diag-extracted):

    L(x) = diag*x - beta * sum_ax (bhi*xE + blo*xW) / dx_ax^2

with blo(i) = bhi(i-1) on periodic axes, so ONE cell-shaped hi-face
coefficient array per axis suffices (6 inputs total: x, b, diag,
F0, F1, F2).  diag is the analytic cell_diag; its guarded reciprocal
(multigrid.CellSolver.dinvs convention) is computed in-kernel from the
global max, which is exact because the full array is resident.

Scope: 3D, float32, ALL axes periodic, ny*nz % 128 == 0, working set
within VMEM.  Non-periodic axes and 2D fall back to the jnp path (or
the tiled single-sweep kernel in ops/pallas_smoother.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:   # pragma: no cover
    HAVE_PALLAS = False

INTERPRET = False

VMEM_BUDGET = 12 * 1024 * 1024


def _roll(a, shift, axis):
    if INTERPRET or not HAVE_PALLAS:
        return jnp.roll(a, shift, axis=axis)
    return pltpu.roll(a, shift % a.shape[axis], axis=axis)


def _shift_merged(a, axis, sgn, ny, nz):
    """a(idx + sgn*e_axis), periodic, merged (y,z) lane layout."""
    if axis == 0:
        return _roll(a, -sgn, 0)
    if axis == 1:
        return _roll(a, -sgn * nz, 1)
    r = _roll(a, -sgn, 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    kk = idx % nz
    if sgn > 0:
        return jnp.where(kk == nz - 1, _roll(a, nz - 1, 1), r)
    return jnp.where(kk == 0, _roll(a, -(nz - 1), 1), r)


def _smooth_kernel(nsweeps, want_residual, ny, nz,
                   x_ref, b_ref, diag_ref, f0_ref, f1_ref, f2_ref,
                   out_ref, res_ref):
    """Face coefficients arrive PRE-SCALED by beta/dx_ax^2 (beta can be
    a traced dt, so it cannot be a static kernel parameter)."""
    x = x_ref[...]
    b = b_ref[...]
    diag = diag_ref[...]
    F = (f0_ref[...], f1_ref[...], f2_ref[...])
    dmax = jnp.max(jnp.abs(diag))
    ok = jnp.abs(diag) > 1e-8 * dmax
    dinv = jnp.where(ok, 1.0 / jnp.where(ok, diag, 1.0), 0.0)
    # per-axis lo-face coefficient = hi-face of the -1 neighbor
    Flo = tuple(_shift_merged(F[ax], ax, -1, ny, nz) for ax in range(3))

    def L(x):
        out = diag * x
        for ax in range(3):
            xE = _shift_merged(x, ax, +1, ny, nz)
            xW = _shift_merged(x, ax, -1, ny, nz)
            out = out - (F[ax] * xE + Flo[ax] * xW)
        return out

    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    gi = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    par = (gi + idx // nz + idx % nz) % 2
    red = (par == 0).astype(x.dtype)
    black = 1.0 - red
    for _ in range(nsweeps):
        x = x + red * (b - L(x)) * dinv
        x = x + black * (b - L(x)) * dinv
    out_ref[...] = x
    if want_residual:
        res_ref[...] = b - L(x)


def supported(lev, shape, dtype) -> bool:
    if not HAVE_PALLAS or len(shape) != 3:
        return False
    if dtype != jnp.float32 and not INTERPRET:
        return False
    if any(int(b) != 0 for b in tuple(lev.bc_lo) + tuple(lev.bc_hi)):
        return False        # periodic-only (SolverBC.PERIODIC == 0)
    if lev.ebc is not None:
        return False        # ebc folds into diag but marks EB decks whose
                            # guard/contrast behavior is validated on jnp
    nx, ny, nz = shape
    if (ny * nz) % 128 != 0 or nx % 8 != 0:
        return False
    # conservative live-array budget: the sibling nodal kernel's
    # measured Mosaic scoped-vmem stack was ~2.3x the naive live-count
    # estimate (17.04 MB at 64^3, see pallas_nodal.supported); apply the
    # same safety factor here so large coarse levels (512-class
    # hierarchies) fall back to the jnp scan instead of failing compile
    return 18 * nx * ny * nz * 4 <= 14 * 1024 * 1024


def enabled() -> bool:
    import os
    if os.environ.get("INCFLO_PALLAS_CELL", "1") != "1":
        return False
    from incflo_tpu.ops import pallas_guard
    if pallas_guard.sharded():
        return False   # whole-array kernel would gather a sharded operand
    if INTERPRET:
        return True
    return jax.default_backend() in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("nsweeps", "want_residual",
                                             "shape"))
def _run(x, b, diag, fhi, nsweeps, want_residual, shape):
    nx, ny, nz = shape
    m = ny * nz
    kern = functools.partial(_smooth_kernel, nsweeps, want_residual,
                             ny, nz)
    out_shapes = (jax.ShapeDtypeStruct((nx, m), x.dtype),
                  jax.ShapeDtypeStruct((nx, m) if want_residual else (8, 128),
                                       x.dtype))
    flat = lambda a: a.reshape(nx, m)
    out, res = pl.pallas_call(
        kern,
        interpret=INTERPRET,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=out_shapes,
    )(flat(x), flat(b), flat(diag), flat(fhi[0]), flat(fhi[1]), flat(fhi[2]))
    out = out.reshape(shape)
    return (out, res.reshape(shape)) if want_residual else (out, None)


def face_hi_coefs(lev):
    """Cell-shaped hi-face coefficient per axis from the (n+1)-face
    bcoef arrays (periodic axes only: face n == face 0)."""
    out = []
    for ax in range(3):
        bcur = lev.bcoef[ax]
        n = bcur.shape[ax] - 1
        sl = [slice(None)] * bcur.ndim
        sl[ax] = slice(1, n + 1)
        out.append(bcur[tuple(sl)])
    return tuple(out)


def smooth(x, b, diag, fhi, lev, nsweeps, want_residual=False):
    """Fused nsweeps RB sweeps (+ optional residual) for a periodic
    3D f32 cell level.  diag/fhi are the (possibly per-component) 3D
    coefficient arrays; callers check supported() first."""
    fhi_scaled = tuple(
        (lev.beta / (lev.dx[ax] * lev.dx[ax])) * fhi[ax].astype(x.dtype)
        for ax in range(3))
    return _run(x, b, diag, fhi_scaled, int(nsweeps),
                bool(want_residual), tuple(x.shape))


# ---------------------------------------------------------------------
# x-slab-TILED multi-sweep kernel (fine levels whose 9-array working set
# exceeds VMEM -- the 128x128x32 flagship).  Shrinking halo-ring
# recomputation per color update; halo 8 supports nsweeps <= 3 (+ fused
# residual); longer smooths chain <=2-sweep calls.  All-periodic f32.
# ---------------------------------------------------------------------

TILE_HALO = 8


def _tiled_kernel(TB, ny, nz, nsweeps, want_residual,
                  x_ref, b_ref, diag_ref, dinv_ref, f0_ref, f1_ref,
                  f2_ref, out_ref, res_ref,
                  xs, bs, dgs, ds, f0s, f1s, f2s, sems):
    cx = pl.program_id(0) * TB
    S = TB + 2 * TILE_HALO
    refs = (x_ref, b_ref, diag_ref, dinv_ref, f0_ref, f1_ref, f2_ref)
    slabs = (xs, bs, dgs, ds, f0s, f1s, f2s)
    copies = [pltpu.make_async_copy(r.at[pl.ds(cx, S)], s, sems.at[i])
              for i, (r, s) in enumerate(zip(refs, slabs))]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    x = xs[...]
    b = bs[...]
    diag = dgs[...]
    dinv = ds[...]
    F = (f0s[...], f1s[...], f2s[...])
    Flo = tuple(_shift_merged(F[ax], ax, -1, ny, nz) for ax in range(3))
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    gi = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + cx - TILE_HALO
    par = (gi + idx // nz + idx % nz) % 2
    red = (par == 0).astype(x.dtype)
    black = 1.0 - red
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)

    def L(xv):
        out = diag * xv
        for ax in range(3):
            xE = _shift_merged(xv, ax, +1, ny, nz)
            xW = _shift_merged(xv, ax, -1, ny, nz)
            out = out - (F[ax] * xE + Flo[ax] * xW)
        return out

    total = 2 * nsweeps
    extra = 1 if want_residual else 0
    for u in range(total):
        e = (total - 1 - u) + extra
        color = red if u % 2 == 0 else black
        upd = x + color * (b - L(x)) * dinv
        ring = jnp.logical_and(rows >= TILE_HALO - e,
                               rows < S - TILE_HALO + e)
        x = jnp.where(ring, upd, x)
    out_ref[...] = x[TILE_HALO:TILE_HALO + TB]
    if want_residual:
        res_ref[...] = (b - L(x))[TILE_HALO:TILE_HALO + TB]
    else:
        res_ref[...] = jnp.zeros((TB, ny * nz), x.dtype)


def _tile_for(nx, m, itemsize=4, n_arrays=18):
    for tb in (128, 64, 32, 16, 8):
        if nx % tb:
            continue
        if n_arrays * (tb + 2 * TILE_HALO) * m * itemsize <= VMEM_BUDGET:
            return tb
    return None


def tiled_supported(lev, shape, dtype, nsweeps=2) -> bool:
    # Opt-in: see ops/pallas_nodal.tiled_supported -- ring-shrink
    # redundancy at VMEM-feasible tiles loses to the XLA-fused jnp
    # smoother at flagship sizes.
    import os
    if os.environ.get("INCFLO_PALLAS_TILED", "0") != "1":
        return False
    if not HAVE_PALLAS or len(shape) != 3 or lev.ebc is not None:
        return False
    if dtype != jnp.float32 and not INTERPRET:
        return False
    if any(int(bc) != 0 for bc in tuple(lev.bc_lo) + tuple(lev.bc_hi)):
        return False
    if 2 * min(nsweeps, 2) + 1 > TILE_HALO:
        return False
    nx, ny, nz = shape
    if (ny * nz) % 128 != 0 or nx % 8 != 0:
        return False
    return _tile_for(nx, ny * nz) is not None


@functools.partial(jax.jit, static_argnames=("nsweeps", "want_residual",
                                             "shape"))
def _run_tiled(x, b, diag, dinv, fhi, nsweeps, want_residual, shape):
    nx, ny, nz = shape
    m = ny * nz
    TB = _tile_for(nx, m)
    kern = functools.partial(_tiled_kernel, TB, ny, nz, nsweeps,
                             want_residual)

    def padx(a, w=TILE_HALO):
        f = a.reshape(nx, m)
        return jnp.concatenate([f[-w:], f, f[:w]], axis=0)

    out, res = pl.pallas_call(
        kern,
        interpret=INTERPRET,
        grid=(nx // TB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 7,
        out_specs=(pl.BlockSpec((TB, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TB, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nx, m), x.dtype),
                   jax.ShapeDtypeStruct((nx, m), x.dtype)),
        scratch_shapes=[pltpu.VMEM((TB + 2 * TILE_HALO, m), x.dtype)] * 7
        + [pltpu.SemaphoreType.DMA((7,))],
    )(padx(x), padx(b), padx(diag), padx(dinv), padx(fhi[0]),
      padx(fhi[1]), padx(fhi[2]))
    out = out.reshape(shape)
    return (out, res.reshape(shape)) if want_residual else (out, None)


def smooth_tiled(x, b, diag, fhi, lev, nsweeps, want_residual=False):
    """Tiled variant of smooth() for levels that exceed whole-VMEM.
    3D single-component arrays only (callers loop the batch axis)."""
    fhi_scaled = tuple(
        (lev.beta / (lev.dx[ax] * lev.dx[ax])) * fhi[ax].astype(x.dtype)
        for ax in range(3))
    dmax = jnp.max(jnp.abs(diag))
    ok = jnp.abs(diag) > 1e-8 * dmax
    dinv = jnp.where(ok, 1.0 / jnp.where(ok, diag, 1.0), 0.0)
    n = int(nsweeps)
    shape = tuple(x.shape)
    r = None
    while n > 0:
        take = min(n, 2)
        last = (n - take) == 0
        x, r = _run_tiled(x, b, diag, dinv, fhi_scaled, take,
                          bool(want_residual) and last, shape)
        n -= take
    return x, r
