"""Scan the fused-step jaxpr for unit-dim reshape producers and their
consumers (diagnosing the Mosaic tpu.reshape blocker)."""
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("INCFLO_PALLAS_STEP", "1")

import jax
import jax.extend.core
from jax.extend.core import Literal
from jax import tree_util as jtu
import jax.numpy as jnp
import numpy as np

from incflo_tpu.config import IncfloConfig
from incflo_tpu.simulation import Simulation
from incflo_tpu.ops import pallas_guard

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32
DECK = f"""
amr.n_cell = {N} {N}
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
incflo.probtype = 1
incflo.mu = 0.01
incflo.cfl = 0.45
incflo.initial_iterations = 0
incflo.do_initial_proj = false
incflo.dtype = float32
"""

cfg = IncfloConfig.from_text(DECK)
sim = Simulation(cfg)
s = sim.init_state()
ctx = sim._ctx()
flat_in, in_def = jtu.tree_flatten((s, ctx))
avals = [jax.ShapeDtypeStruct(jnp.shape(l), jnp.result_type(l))
         if not isinstance(l, (float, int))
         else jax.ShapeDtypeStruct((), jnp.float32 if isinstance(l, float)
                                   else jnp.int32)
         for l in flat_in]


def flat_fn(*leaves):
    st, c = jtu.tree_unflatten(in_def, leaves)
    return sim._advance_impl(st, c)


pallas_guard.set_in_kernel(True)
try:
    closed = jax.make_jaxpr(flat_fn)(*avals)
finally:
    pallas_guard.set_in_kernel(False)

jaxpr = closed.jaxpr
# consumers map
cons = {}
for eqn in jaxpr.eqns:
    for v in eqn.invars:
        if not isinstance(v, Literal):
            cons.setdefault(v, []).append(eqn)

pat = Counter()
n_unit = 0
for eqn in jaxpr.eqns:
    if eqn.primitive.name != "reshape":
        continue
    old = tuple(eqn.invars[0].aval.shape)
    new = tuple(eqn.params["new_sizes"])
    if tuple(d for d in old if d != 1) != tuple(d for d in new if d != 1):
        pat[("DATA-MOVING", old, new)] += 1
        continue
    n_unit += 1
    out = eqn.outvars[0]
    for c in cons.get(out, []):
        key = (old, new, c.primitive.name,
               tuple(getattr(c.params.get("shape"), "__iter__", lambda: [])())
               if c.primitive.name == "broadcast_in_dim" else ())
        pat[key] += 1
    if not cons.get(out, []):
        pat[(old, new, "OUTPUT", ())] += 1

print(f"unit reshapes: {n_unit}")
for k, v in sorted(pat.items(), key=lambda kv: -kv[1]):
    print(f"{v:5d}  {k}")

# -- rank-3 op census (for the struct-of-arrays kernel rewrite) --
from collections import defaultdict
r3 = Counter()
shapes3 = defaultdict(set)
for eqn in jaxpr.eqns:
    avs = [v.aval for v in list(eqn.invars) + list(eqn.outvars)
           if hasattr(v, "aval")]
    if any(len(getattr(a, "shape", ())) >= 3 for a in avs):
        r3[eqn.primitive.name] += 1
        for a in avs:
            if len(getattr(a, "shape", ())) >= 3:
                shapes3[eqn.primitive.name].add(tuple(a.shape))
print("\nrank-3-touching primitives:")
for k, v in sorted(r3.items(), key=lambda kv: -kv[1]):
    ss = sorted(shapes3[k])[:6]
    print(f"{v:5d}  {k:22s} {ss}")
nin3 = [tuple(v.aval.shape) for v in jaxpr.invars if len(v.aval.shape) >= 3]
nout3 = [tuple(v.aval.shape) for v in jaxpr.outvars
         if hasattr(v, 'aval') and len(v.aval.shape) >= 3]
print("rank-3 invars:", Counter(nin3))
print("rank-3 outvars:", Counter(nout3))
print("total eqns:", len(jaxpr.eqns))
