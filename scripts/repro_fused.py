"""Repro: compile the fused whole-step kernel on the real TPU and
print the Mosaic error (if any).  Usage: python scripts/repro_fused.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("INCFLO_PALLAS_STEP", "1")

import jax

cache = os.environ.get("INCFLO_JAX_CACHE",
                       os.path.expanduser("~/.cache/incflo_tpu_xla"))
jax.config.update("jax_compilation_cache_dir", cache)

import numpy as np

from incflo_tpu.config import IncfloConfig
from incflo_tpu.simulation import Simulation

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
DECK = f"""
amr.n_cell = {N} {N}
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
incflo.probtype = 1
incflo.mu = 0.01
incflo.cfl = 0.45
incflo.initial_iterations = 0
incflo.dtype = float32
mac_proj.mg_rtol = 1e-5
mac_proj.mg_atol = 1e-7
nodal_proj.mg_rtol = 1e-5
nodal_proj.mg_atol = 1e-7
scalar_diffusion.mg_rtol = 1e-5
scalar_diffusion.mg_atol = 1e-7
tensor_diffusion.mg_rtol = 1e-5
tensor_diffusion.mg_atol = 1e-7
stop_time = -1
max_step = 1000000
"""

cfg = IncfloConfig.from_text(DECK)
sim = Simulation(cfg)
s = sim.init_state()

from incflo_tpu.ops import pallas_step2d
print("supported:", pallas_step2d.supported(sim), flush=True)
fused = pallas_step2d.maybe_fused(sim, s)
if fused is None:
    print("NOT ELIGIBLE")
    sys.exit(1)
print("traced; compiling...", flush=True)
t0 = time.time()
try:
    out = jax.jit(fused.__call__)(s, sim._ctx())
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    print(f"COMPILED+RAN OK in {time.time()-t0:.1f}s", flush=True)
    # parity vs jnp path
    ref = jax.jit(sim._advance_impl)(s, sim._ctx())
    import jax.numpy as jnp
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(ref)):
        if hasattr(a, "shape") and a.size:
            d = float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float64)
                                      - jnp.asarray(b, jnp.float64))))
            print("  max|diff| =", d)
except Exception as e:
    print(f"FAILED after {time.time()-t0:.1f}s:", flush=True)
    msg = str(e)
    with open("/tmp/fused_err.txt", "w") as f:
        f.write(msg)
    import re
    m = re.search(r"(Mosaic[^\n]*|error:[^\n]*)", msg)
    for line in msg.splitlines():
        if ("error" in line.lower() or "Mosaic" in line
                or "unsupported" in line.lower()):
            print(line[:500])
    sys.exit(2)
