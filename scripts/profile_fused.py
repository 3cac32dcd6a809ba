"""Time the fused whole-step kernel vs the jnp path on the real TPU.

Reports per-step wall time for:
  * jit(_advance_impl)            -- the jnp path (launch-bound)
  * jit(fused.__call__)           -- one Mosaic kernel + glue
at the given INCFLO_TENSOR_K (the unrolled CG trip count).

Usage: INCFLO_TENSOR_K=4 python scripts/profile_fused.py [n]
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

from incflo_tpu.config import IncfloConfig
from incflo_tpu.simulation import Simulation
from incflo_tpu.ops import pallas_step2d

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
"""

REPS = int(os.environ.get("PROF_REPS", "50"))


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    cfg = IncfloConfig.from_text(DECK)
    sim = Simulation(cfg)
    s = sim.init_state()
    ctx = sim._ctx()
    k = os.environ.get("INCFLO_TENSOR_K", "(default 12)")

    t_jnp = timeit(jax.jit(sim._advance_impl), s, ctx)
    print(f"jnp   _advance_impl : {t_jnp:7.3f} ms/step", flush=True)

    fused = pallas_step2d.maybe_fused(sim, s)
    if fused is None:
        print("fused: NOT ELIGIBLE")
        return
    t_f = timeit(jax.jit(fused.__call__), s, ctx)
    print(f"fused (K={k}): {t_f:7.3f} ms/step  "
          f"({t_jnp / t_f:.2f}x vs jnp)", flush=True)


if __name__ == "__main__":
    main()
