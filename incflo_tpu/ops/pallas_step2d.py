"""Fused whole-step advance: the COMPLETE `Simulation._advance_impl`
program compiled as ONE Pallas (Mosaic) kernel.

Why: small 2D decks are kernel-LAUNCH-bound, not compute-bound.  The
tgv2d benchmark (128^2 f32, the reference benchmark.taylor_green_vortices
class) runs ~1.4 ms/step as ~hundreds of XLA kernels that each touch a
64 KB array for ~microseconds; the whole working set is ~2 MB, far under
the 16 MB VMEM.  Compiling the entire step as one Mosaic program keeps
every field VMEM-resident for the whole step and pays ONE launch.

How: the kernel body literally calls `sim._advance_impl(s, ctx)` -- the
SAME function the jnp path jits -- so the numerics are identical by
construction.  Eligibility (supported()) guarantees the resulting trace
contains only Mosaic-lowerable primitives:
  * every solve is a fast-diagonalization DIRECT solve (per-axis matmul
    transforms, ops/spectral.py) -- no V-cycles, no lax.while_loop;
  * the tensor cross-coupling CG runs its fixed-trip unrolled form
    (ops/diffusion._tensor_pcg under pallas_guard.in_kernel());
  * zero-mode handling is mask-form, not scatter (ops/spectral.solve).

Unused context leaves (the MG hierarchies that the direct solves never
read) are pruned from the kernel's inputs by a jaxpr reachability walk,
so the kernel carries only the ~2 MB it actually touches.

Scope: ndim == 2, float32, fully periodic, no EB, constant density,
all three prebuilt solvers symbol-direct, unsharded, cells under the
VMEM budget.  Anything else falls back to the jnp path.

Reference analog: none -- a TPU dispatch-floor optimization; the
reference's MPI+OpenMP driver has no equivalent concept.  Parity with
the jnp path is tested in tests/test_pallas_step2d.py.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:   # pragma: no cover
    HAVE_PALLAS = False

from incflo_tpu.ops import pallas_guard

INTERPRET = False

# whole-step working set must fit VMEM: ~40 live cell fields peak at
# f32.  128^2 (the benchmark class) uses ~2.6 MB; 256^2 ~10.5 MB still
# fits; beyond that the step is no longer launch-bound anyway.
MAX_CELLS = int(os.environ.get("INCFLO_PALLAS_STEP_MAXCELLS",
                               str(256 * 256)))


def enabled() -> bool:
    # OPT-IN on hardware (INCFLO_PALLAS_STEP=1): the whole-step Mosaic
    # compile still fails on current chips (tpu.reshape of offset-
    # carrying unit-dim inserts, after the round-5 tensordot/concat
    # fixes); the compile-failure fallback in Simulation.advance keeps
    # qualifying decks on the jnp path, but the failed attempt costs
    # ~10 s, so the default stays off until the kernel compiles on a
    # real chip.  Interpret mode (parity tests) stays on by default.
    flag = os.environ.get("INCFLO_PALLAS_STEP", "")
    if flag == "0":
        return False
    if pallas_guard.sharded():
        return False
    if INTERPRET:
        return True
    return flag == "1" and jax.default_backend() in ("tpu", "axon")


def _sym_direct(solver) -> bool:
    sym = getattr(solver, "symbol", None)
    return sym is not None and sym.fwd is not None


def supported(sim) -> bool:
    """Whole-step fusion eligibility for this Simulation."""
    if not HAVE_PALLAS or not enabled():
        return False
    cfg = sim.cfg
    grid = sim.grid
    if grid.ndim != 2 or sim.dtype != jnp.float32:
        return False
    if sim.eb is not None or not cfg.constant_density:
        return False
    if not all(grid.periodic):
        return False
    if int(np.prod(grid.n_cell)) > MAX_CELLS:
        return False
    # every solve must be a fast-diag DIRECT solve (while-free trace)
    from incflo_tpu.ops import spectral
    if not spectral.enabled() or spectral.check_residual():
        return False
    if sim._mac_solver is None or not _sym_direct(sim._mac_solver):
        return False
    if sim._diff_proto is not None and not _sym_direct(sim._diff_proto):
        return False
    nh = sim._nodal_hat
    if nh is None or not _sym_direct(nh):
        return False
    return True


def _used_mask(jaxpr):
    """Which invars of the already-traced jaxpr are actually read.
    Pruning the dead ones keeps the prebuilt MG hierarchies (bypassed
    by the direct solves) out of the kernel's VMEM windows."""
    used = set()

    def walk(jx):
        for eq in jx.eqns:
            for v in eq.invars:
                if not isinstance(v, jax.extend.core.Literal):
                    used.add(v)
            for sub in eq.params.values():
                _walk_param(sub)
        for v in jx.outvars:
            if not isinstance(v, jax.extend.core.Literal):
                used.add(v)

    def _walk_param(p):
        from jax.extend.core import ClosedJaxpr, Jaxpr
        if isinstance(p, ClosedJaxpr):
            walk(p.jaxpr)
        elif isinstance(p, Jaxpr):
            walk(p)
        elif isinstance(p, (list, tuple)):
            for x in p:
                _walk_param(x)

    walk(jaxpr)
    return [v in used for v in jaxpr.invars]


def _lift_shape(shape):
    """Mosaic wants >=2D operands; lift scalar/vector SHAPES to (1, n)."""
    if len(shape) == 0:
        return (1, 1)
    if len(shape) == 1:
        return (1,) + tuple(shape)
    return tuple(shape)


def _lift(x):
    return x.reshape(_lift_shape(x.shape))


def _unit_reshape(x, new_sizes):
    """Mosaic-lowerable replacement for reshapes that only insert or
    drop UNIT dims (jnp's expand_dims/squeeze/[..., None]): Mosaic's
    tpu.reshape rejects them for offset-carrying (window-sliced)
    operands, but reductions over size-1 axes and broadcast_in_dim
    accept any layout.  None when the reshape moves real data."""
    old = tuple(x.shape)
    new = tuple(new_sizes)
    if tuple(d for d in old if d != 1) != tuple(d for d in new if d != 1):
        return None
    if old == new:
        return x
    unit_axes = tuple(i for i, d in enumerate(old) if d == 1)
    if unit_axes:
        # exact: every reduced axis is size 1 (any() for bools keeps
        # the dtype; sum would promote to int)
        x = jnp.any(x, axis=unit_axes) if x.dtype == jnp.bool_ \
            else jnp.sum(x, axis=unit_axes)
    bdims, k = [], 0
    for i, d in enumerate(new):
        if d != 1 and k < x.ndim:
            bdims.append(i)
            k += 1
    return jax.lax.broadcast_in_dim(x, new, tuple(bdims))


def _eval_patched(jaxpr, consts, *args):
    """eval_jaxpr with unit-dim reshapes rewritten via _unit_reshape.
    The fused step's jaxpr is flat (the direct-solve trace has no
    scan/while/cond/pjit sub-jaxprs), so a first-order walk covers every
    equation."""
    from jax.extend.core import Literal
    env = {}

    def read(v):
        return v.val if isinstance(v, Literal) else env[v]

    for v, c in zip(jaxpr.constvars, consts):
        env[v] = c
    for v, a in zip(jaxpr.invars, args):
        env[v] = a
    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        out = None
        if eqn.primitive.name == "reshape" \
                and eqn.params.get("dimensions") is None:
            out = _unit_reshape(invals[0], eqn.params["new_sizes"])
        if out is None:
            out = eqn.primitive.bind(*invals, **eqn.params)
        if eqn.primitive.multiple_results:
            for v, o in zip(eqn.outvars, out):
                env[v] = o
        else:
            env[eqn.outvars[0]] = out
    return [read(v) for v in jaxpr.outvars]


class FusedStep:
    """One Simulation's fused whole-step callable (built lazily on the
    first advance, cached on the Simulation)."""

    def __init__(self, sim, example_state):
        self.sim = sim
        ctx = sim._ctx()
        flat_in, self.in_def = jtu.tree_flatten((example_state, ctx))

        # python-scalar leaves (CellLevel alpha/beta) normalize to the
        # sim dtype (NOT result_type: under x64 test envs a python float
        # would promote to f64 and poison the f32 kernel math)
        def _aval(l):
            if isinstance(l, float):
                return jax.ShapeDtypeStruct((), sim.dtype)
            if isinstance(l, int):
                return jax.ShapeDtypeStruct((), jnp.int32)
            return jax.ShapeDtypeStruct(jnp.shape(l), jnp.result_type(l))

        self.in_avals = [_aval(l) for l in flat_in]

        def flat_fn(*leaves):
            s, c = jtu.tree_unflatten(self.in_def, leaves)
            return sim._advance_impl(s, c)

        # Trace ONCE to a jaxpr, in kernel mode so the solver code picks
        # its Mosaic-lowerable fixed-trip forms.  The jaxpr's consts
        # (trace-time numpy closures like grid dx vectors) become
        # explicit kernel inputs -- pallas_call rejects captured
        # constants -- and the kernel body evals the jaxpr rather than
        # re-tracing the Python.
        # trace on the HOST CPU backend: trace-time eager constants
        # (grid vectors, one-hot rows, ...) otherwise materialize on the
        # TPU and have to be pulled back for the jaxpr consts -- tunnel
        # roundtrips that are slow and intermittently hang
        cpu = jax.devices("cpu")[0]
        pallas_guard.set_in_kernel(True)
        try:
            with jax.default_device(cpu):
                closed, out_shape = jax.make_jaxpr(
                    flat_fn, return_shape=True)(*self.in_avals)
        finally:
            pallas_guard.set_in_kernel(False)
        self.jaxpr = closed.jaxpr
        # numpy, NOT device arrays: they are re-traced as closure
        # constants of the outer jit, and embedding a device-resident
        # constant makes MLIR lowering pull it back to the host -- a
        # needless tunnel roundtrip (observed to hang intermittently)
        self.consts = [np.asarray(c) for c in closed.consts]
        self.mask = _used_mask(closed.jaxpr)
        assert len(flat_in) == len(self.mask)

        flat_out, self.out_def = jtu.tree_flatten(out_shape)
        self.out_shapes = [jax.ShapeDtypeStruct(_lift_shape(l.shape),
                                                l.dtype)
                           for l in flat_out]
        self.out_orig = [(l.shape, l.dtype) for l in flat_out]

    def _kernel(self, *refs):
        n_in = sum(self.mask)
        n_c = len(self.consts)
        in_refs = refs[:n_in]
        const_refs = refs[n_in:n_in + n_c]
        out_refs = refs[n_in + n_c:]
        it = iter(in_refs)
        leaves = []
        for aval, u in zip(self.in_avals, self.mask):
            if u:
                v = next(it)[...]
                leaves.append(v.reshape(aval.shape))
            else:
                # dead leaf: a zeros placeholder that DCEs right back out
                leaves.append(jnp.zeros(aval.shape, aval.dtype))
        consts = [r[...].reshape(c.shape)
                  for r, c in zip(const_refs, self.consts)]
        out = _eval_patched(self.jaxpr, consts, *leaves)
        for r, v in zip(out_refs, out):
            r[...] = v.reshape(r.shape)

    def __call__(self, s, ctx):
        flat, _ = jtu.tree_flatten((s, ctx))
        args = [_lift(jnp.asarray(x, a.dtype))
                for x, a, u in zip(flat, self.in_avals, self.mask) if u]
        args += [_lift(c) for c in self.consts]
        outs = pl.pallas_call(
            self._kernel,
            out_shape=self.out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in args],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                       for _ in self.out_shapes],
            interpret=INTERPRET,
        )(*args)
        leaves = [o.reshape(shape).astype(dt)
                  for o, (shape, dt) in zip(outs, self.out_orig)]
        return jtu.tree_unflatten(self.out_def, leaves)


def maybe_fused(sim, example_state):
    """The fused step callable for `sim`, or None if ineligible.
    Cached on the Simulation instance (one trace per state signature)."""
    if not supported(sim):
        return None
    cached = getattr(sim, "_fused_step", None)
    if cached is not None:
        return cached
    fused = FusedStep(sim, example_state)
    sim._fused_step = fused
    return fused
