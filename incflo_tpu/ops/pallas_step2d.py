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


class Tup(list):
    """Struct-of-arrays value: an array whose TRAILING axis is a
    component axis, held as a python list of per-component arrays of
    one lower rank.

    Why: Mosaic's vector layouts tile the last two dims.  A 2D deck's
    (nx, ny, ncomp) state puts the tiny component axis in the LANE
    dimension, and every trailing-dim broadcast / unit-insert lowers to
    a tpu.reshape that repacks lanes into sublanes -- unsupported
    (`vector<128x128xf32> -> vector<128x128x1xf32>`, the round-4/5
    compile blocker).  Evaluating the step's jaxpr with the component
    axis EXPLODED into separate 2D arrays keeps every in-kernel vector
    rank <= 2 in the deck's natural (sublane, lane) layout -- Mosaic's
    native domain -- and is also the faster layout (full 128-lane
    tiles instead of ncomp lanes per tile)."""


# elementwise primitives: map over components (scalar operands ride
# along unchanged)
_ELEMENTWISE = frozenset("""
add sub mul div rem neg abs sign max min pow integer_pow exp log sqrt
rsqrt cbrt tanh sin cos logistic erf exponent floor ceil round
is_finite and or xor not eq ne lt le gt ge select_n
convert_element_type copy stop_gradient nextafter atan2 expm1 log1p
square clamp
""".split())

# call-like primitives: recurse into the inner jaxpr with the same
# interpreter so Tup values flow through
_CALL_PRIMS = frozenset(
    ["pjit", "jit", "closed_call", "core_call", "remat", "checkpoint",
     "custom_jvp_call", "custom_vjp_call"])


def _soa_call(eqn, invals):
    params = eqn.params
    closed = params.get("jaxpr") or params.get("call_jaxpr")
    if closed is None:
        return None
    if hasattr(closed, "jaxpr"):        # ClosedJaxpr
        return _eval_soa(closed.jaxpr, closed.consts, *invals)
    return _eval_soa(closed, [], *invals)


def _soa_broadcast(x, shape, bdims):
    """broadcast_in_dim to a rank-3 (spatial, spatial, comp) shape,
    returning a Tup of 2D broadcasts."""
    lax = jax.lax
    caxis = len(shape) - 1
    c = shape[-1]
    sp = tuple(shape[:-1])
    if isinstance(x, Tup):
        # trailing input axis maps to the comp axis (it is the last
        # input dim and bdims is monotonic)
        sub = tuple(bdims[:-1])
        comps = list(x) if len(x) == c else [x[0]] * c
        return Tup([lax.broadcast_in_dim(xi, sp, sub) for xi in comps])
    bl = list(bdims)
    if caxis not in bl:
        # comp axis is NEW: replicate the spatial broadcast
        b = lax.broadcast_in_dim(x, sp, tuple(bl))
        return Tup([b] * c)
    # a plain input dim maps to the comp axis: slice it per component
    j = bl.index(caxis)
    size_j = x.shape[j]
    sub = tuple(b for k, b in enumerate(bl) if k != j)
    comps = []
    for i in range(c):
        lo = [0] * x.ndim
        hi = list(x.shape)
        k = i if size_j == c else 0
        lo[j], hi[j] = k, k + 1
        xi = lax.squeeze(lax.slice(x, lo, hi), (j,))
        comps.append(lax.broadcast_in_dim(xi, sp, sub))
    return Tup(comps)


def _eval_soa(jaxpr, consts, *args):
    """eval_jaxpr in struct-of-arrays form: every value with a trailing
    component axis is a Tup of per-component arrays, so the traced
    kernel program contains NO rank-3 vectors (see Tup).  Values enter
    as Tup at the jaxpr boundary (FusedStep splits rank-3 leaves) or
    are created by broadcast_in_dim; provenance carries them through.
    Plain values with no Tup operands bind unchanged (with unit-dim
    reshapes rewritten via _unit_reshape)."""
    from jax.extend.core import Literal
    lax = jax.lax
    env = {}

    def read(v):
        return v.val if isinstance(v, Literal) else env[v]

    def split_in(v):
        # rank-3 boundary values arrive as plain arrays only from
        # recursive _soa_call invals that were already Tup -- keep them
        return v

    for v, cc in zip(jaxpr.constvars, consts):
        env[v] = cc
    for v, a in zip(jaxpr.invars, args):
        env[v] = split_in(a)

    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        any_tup = any(isinstance(x, Tup) for x in invals)
        out = None

        if name in _CALL_PRIMS:
            res = _soa_call(eqn, invals)
            if res is not None:
                for v, o in zip(eqn.outvars, res):
                    env[v] = o
                continue

        if not any_tup:
            outsh = [tuple(v.aval.shape) for v in eqn.outvars
                     if hasattr(v, "aval")]
            if name == "broadcast_in_dim" and len(outsh) == 1 \
                    and len(outsh[0]) >= 3:
                out = _soa_broadcast(invals[0], eqn.params["shape"],
                                     eqn.params["broadcast_dimensions"])
            elif name == "reshape" \
                    and eqn.params.get("dimensions") is None:
                out = _unit_reshape(invals[0], eqn.params["new_sizes"])
                if out is None:
                    out = eqn.primitive.bind(*invals, **eqn.params)
            else:
                out = eqn.primitive.bind(*invals, **eqn.params)
            if eqn.primitive.multiple_results:
                for v, o in zip(eqn.outvars, out):
                    env[v] = o
            else:
                env[eqn.outvars[0]] = out
            continue

        # --- at least one Tup operand ---
        if name in _ELEMENTWISE:
            # jaxpr elementwise ops may broadcast degenerate dims
            # implicitly: a len-1 Tup ((.., 1) comp axis) broadcasts
            # against a len-n one
            n = max(len(x) for x in invals if isinstance(x, Tup))

            def comp(x, i):
                if isinstance(x, Tup):
                    return x[i] if len(x) > 1 else x[0]
                return x    # scalar / spatial operand rides along
            out = Tup([eqn.primitive.bind(
                *[comp(x, i) for x in invals], **eqn.params)
                for i in range(n)])
        elif name == "broadcast_in_dim":
            out = _soa_broadcast(invals[0], eqn.params["shape"],
                                 eqn.params["broadcast_dimensions"])
        elif name == "slice":
            x = invals[0]
            lo = list(eqn.params["start_indices"])
            hi = list(eqn.params["limit_indices"])
            st = eqn.params["strides"]
            st = list(st) if st is not None else [1] * len(lo)
            comps = x[lo[-1]:hi[-1]:st[-1]]
            out = Tup([lax.slice(xi, lo[:-1], hi[:-1], st[:-1])
                       for xi in comps])
        elif name == "squeeze":
            x = invals[0]
            dims = tuple(eqn.params["dimensions"])
            caxis = len(x[0].shape)     # = input rank - 1
            if caxis in dims:
                assert len(x) == 1
                rest = tuple(d for d in dims if d != caxis)
                out = lax.squeeze(x[0], rest) if rest else x[0]
            else:
                out = Tup([lax.squeeze(xi, dims) for xi in x])
        elif name == "concatenate":
            dim = eqn.params["dimension"]
            caxis = len(invals[0][0].shape)
            if dim == caxis:
                out = Tup([xi for x in invals for xi in x])
            else:
                out = Tup([lax.concatenate([x[i] for x in invals], dim)
                           for i in range(len(invals[0]))])
        elif name in ("reduce_sum", "reduce_max", "reduce_min",
                      "reduce_and", "reduce_or", "reduce_prod"):
            x = invals[0]
            axes = tuple(eqn.params["axes"])
            caxis = len(x[0].shape)
            sp_axes = tuple(a for a in axes if a != caxis)
            parts = [eqn.primitive.bind(xi, axes=sp_axes,
                                        **{k: v for k, v in
                                           eqn.params.items()
                                           if k != "axes"})
                     if sp_axes else xi for xi in x]
            if caxis in axes:
                combine = {"reduce_sum": lax.add, "reduce_max": lax.max,
                           "reduce_min": lax.min,
                           "reduce_and": jnp.logical_and,
                           "reduce_or": jnp.logical_or,
                           "reduce_prod": lax.mul}[name]
                acc = parts[0]
                for p in parts[1:]:
                    acc = combine(acc, p)
                out = acc
            else:
                out = Tup(parts)
        elif name == "reshape" and eqn.params.get("dimensions") is None:
            x = invals[0]
            old = tuple(x[0].shape) + (len(x),)
            new = tuple(eqn.params["new_sizes"])
            if len(new) >= 1 and new[-1] == len(x):
                # comp axis kept trailing: per-component spatial reshape
                outc = []
                for xi in x:
                    r = _unit_reshape(xi, new[:-1])
                    if r is None:
                        r = lax.reshape(xi, new[:-1])
                    outc.append(r)
                out = Tup(outc)
            elif len(x) == 1 and tuple(d for d in new if d != 1) \
                    == tuple(d for d in x[0].shape if d != 1):
                # drop the trailing unit comp axis (plus unit tweaks)
                r = _unit_reshape(x[0], new)
                out = r if r is not None else lax.reshape(x[0], new)
            else:
                raise NotImplementedError(
                    f"soa reshape {old} -> {new}")
        elif name == "transpose":
            x = invals[0]
            perm = tuple(eqn.params["permutation"])
            caxis = len(x[0].shape)
            if perm[-1] == caxis:
                sub = perm[:-1]
                out = Tup([lax.transpose(xi, sub) for xi in x])
            else:
                raise NotImplementedError(f"soa transpose {perm}")
        elif name == "pad":
            x, pv = invals
            cfgp = list(eqn.params["padding_config"])
            clo, chi, cint = cfgp[-1]
            assert clo == 0 and chi == 0 and cint == 0, \
                "pad along component axis unsupported"
            out = Tup([lax.pad(xi, pv, cfgp[:-1]) for xi in x])
        else:
            raise NotImplementedError(
                f"soa: unhandled primitive '{name}' with Tup operand "
                f"(shapes {[tuple(v.aval.shape) for v in eqn.invars]})")
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
        # rank>=3 outputs leave the kernel as per-component 2D buffers
        # (struct-of-arrays; see Tup) and are re-stacked outside
        self.out_shapes = []
        for l in flat_out:
            if len(l.shape) >= 3:
                self.out_shapes += [
                    jax.ShapeDtypeStruct(_lift_shape(l.shape[:-1]),
                                         l.dtype)] * l.shape[-1]
            else:
                self.out_shapes.append(
                    jax.ShapeDtypeStruct(_lift_shape(l.shape), l.dtype))
        self.out_orig = [(l.shape, l.dtype) for l in flat_out]

    def _kernel(self, *refs):
        # struct-of-arrays boundary: rank>=3 leaves/consts/outputs were
        # split per component outside the kernel (one 2D ref each), and
        # are rebuilt as Tup values here -- the evaluated program never
        # holds a rank-3 vector (see Tup)
        it = iter(refs)

        def take(aval_shape, dtype, split):
            if split:
                n = aval_shape[-1]
                sp = aval_shape[:-1]
                return Tup([next(it)[...].reshape(sp) for _ in range(n)])
            return next(it)[...].reshape(aval_shape)

        leaves = []
        for aval, u in zip(self.in_avals, self.mask):
            if not u:
                if len(aval.shape) >= 3:
                    z = jnp.zeros(aval.shape[:-1], aval.dtype)
                    leaves.append(Tup([z] * aval.shape[-1]))
                else:
                    leaves.append(jnp.zeros(aval.shape, aval.dtype))
                continue
            leaves.append(take(aval.shape, aval.dtype,
                               len(aval.shape) >= 3))
        consts = [take(c.shape, c.dtype, c.ndim >= 3)
                  for c in self.consts]
        out_refs = list(it)
        out = _eval_soa(self.jaxpr, consts, *leaves)
        k = 0
        for v, (shape, dt) in zip(out, self.out_orig):
            if isinstance(v, Tup):
                for comp in v:
                    r = out_refs[k]; k += 1
                    r[...] = comp.reshape(r.shape)
            else:
                r = out_refs[k]; k += 1
                r[...] = v.reshape(r.shape)

    @staticmethod
    def _split_comps(x):
        """Per-component 2D views of a trailing-component-axis array."""
        return [jax.lax.index_in_dim(x, i, axis=x.ndim - 1, keepdims=False)
                for i in range(x.shape[-1])]

    def __call__(self, s, ctx):
        flat, _ = jtu.tree_flatten((s, ctx))
        args = []
        for x, a, u in zip(flat, self.in_avals, self.mask):
            if not u:
                continue
            x = jnp.asarray(x, a.dtype)
            if x.ndim >= 3:
                args += [_lift(c) for c in self._split_comps(x)]
            else:
                args.append(_lift(x))
        for c in self.consts:
            c = jnp.asarray(c)
            if c.ndim >= 3:
                args += [_lift(x) for x in self._split_comps(c)]
            else:
                args.append(_lift(c))
        outs = pl.pallas_call(
            self._kernel,
            out_shape=self.out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in args],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                       for _ in self.out_shapes],
            interpret=INTERPRET,
        )(*args)
        leaves = []
        k = 0
        for shape, dt in self.out_orig:
            if len(shape) >= 3:
                n = shape[-1]
                comps = [outs[k + i].reshape(shape[:-1]) for i in range(n)]
                k += n
                leaves.append(jnp.stack(comps, axis=-1).astype(dt))
            else:
                leaves.append(outs[k].reshape(shape).astype(dt))
                k += 1
        return jtu.tree_unflatten(self.out_def, leaves)


def _cg_probe_ok(sim, s) -> bool:
    """Setup-time convergence guard for the fixed-trip kernel CG
    (VERDICT r4 #5): run the kernel-mode (fixed-trip, masked-unrolled)
    tensor solve ONCE on the example state at the deck's current dt and
    require its best residual to meet the SAME tolerance the adaptive
    jnp path enforces (max(rtol*||rhs||_inf, atol)).  A deck whose
    cross-coupling is too strong for INCFLO_TENSOR_K trips is simply
    ineligible for fusion -- it falls back to the adaptive jnp path --
    instead of a silently non-converged best iterate entering the run."""
    from incflo_tpu.config import DiffusionType
    from incflo_tpu.ops import diffusion

    cfg = sim.cfg
    if cfg.diff_type not in (DiffusionType.Crank_Nicolson,
                             DiffusionType.Implicit):
        return True
    if not cfg.use_tensor_solve:
        return True
    grid = sim.grid
    ng = cfg.nghost_state()
    vel, rho = s.level.velocity, s.level.density
    vf = sim.compute_vel_forces(rho, s.level.tracer, s.level.tracer,
                                s.level.gp)
    dt = sim.compute_dt(vel, rho, vf, s)
    dt_diff = dt if cfg.diff_type == DiffusionType.Implicit else 0.5 * dt
    vel_g = sim.grow_vel(vel, ng)
    eta_g1 = sim._viscosity(vel_g, ng)
    eta_faces = diffusion.eta_to_faces(eta_g1, grid, eb=None)

    pallas_guard.set_in_kernel(True)
    try:
        _, res, tol = jax.jit(lambda v, r: diffusion.diffuse_velocity(
            v, r, eta_faces, dt_diff, cfg, grid, eta_g1=eta_g1,
            grow_fn=lambda x: sim.grow_vel(x, ng), ng=ng,
            grow_hom_fn=lambda x: sim.grow_vel_hom(x, ng),
            prebuilt_solver=sim._diff_proto,
            return_tensor_res=True))(vel, rho)
    finally:
        pallas_guard.set_in_kernel(False)
    return bool(float(res) <= float(tol))


def maybe_fused(sim, example_state):
    """The fused step callable for `sim`, or None if ineligible.
    Cached on the Simulation instance (one trace per state signature)."""
    if not supported(sim):
        return None
    cached = getattr(sim, "_fused_step", None)
    if cached is not None:
        return cached
    ok = getattr(sim, "_fused_probe_ok", None)
    if ok is None:
        try:
            ok = _cg_probe_ok(sim, example_state)
        except Exception:
            # a failing probe must never take dispatch down; treat the
            # deck as ineligible and stay on the jnp path
            ok = False
        sim._fused_probe_ok = ok
    if not ok:
        return None
    fused = FusedStep(sim, example_state)
    sim._fused_step = fused
    return fused
