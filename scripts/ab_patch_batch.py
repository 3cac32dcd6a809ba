"""A/B: K same-shape patch advances -- Python loop (one jit, sequential
XLA program) vs one vmapped/batched advance (VERDICT r4 #7).

The patch-AMR hierarchy advances same-level patches with a Python loop
inside one jit (amr_patch.SlabAMRSimulation._advance_impl).  If >= 4
same-shape patches existed, a vmapped advance would replace K copies of
every kernel with one K-batched kernel -- fewer launches, bigger MXU
tiles.  This script measures whether that actually wins wall-clock on
the real chip, on a synthetic workload of K identical-shape periodic
slabs (same shape + BC signature, the vmap precondition), advanced with
a common forced dt exactly like the hierarchy does.

Usage: python scripts/ab_patch_batch.py [K ...]   (default 4 8)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.environ.get("INCFLO_JAX_CACHE",
                        os.path.expanduser("~/.cache/incflo_tpu_xla"))
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from incflo_tpu.config import IncfloConfig
from incflo_tpu.simulation import Simulation

# a realistic level-1 slab patch: 64x64x16 f32, fully periodic Godunov
DECK = """
amr.n_cell = 64 64 16
geometry.prob_lo = 0. 0. 0.
geometry.prob_hi = 1. 1. 0.25
geometry.is_periodic = 1 1 1
incflo.probtype = 21
incflo.mu = 0.0002
incflo.cfl = 0.9
incflo.init_shrink = 1.0
incflo.use_godunov = true
incflo.diffusion_type = 1
incflo.initial_iterations = 0
incflo.do_initial_proj = false
incflo.dtype = float32
"""

REPS = int(os.environ.get("AB_REPS", "20"))


def perturbed_states(sim, k):
    s = sim.init_state()
    rng = np.random.default_rng(0)
    outs = []
    for i in range(k):
        bump = jnp.asarray(
            0.01 * rng.standard_normal(s.level.velocity.shape),
            s.level.velocity.dtype)
        outs.append(s._replace(level=s.level._replace(
            velocity=s.level.velocity + bump)))
    return outs


def time_fn(fn, *args):
    out = fn(*args)                      # compile + warm
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    ks = [int(a) for a in sys.argv[1:]] or [4, 8]
    cfg = IncfloConfig.from_text(DECK)
    sim = Simulation(cfg)
    cells = int(np.prod(sim.grid.n_cell))
    dt = jnp.asarray(1e-3, sim.dtype)

    for k in ks:
        states = perturbed_states(sim, k)

        @jax.jit
        def loop_adv(states, ctx):
            return [sim._advance_impl(s, ctx, dt_force=dt) for s in states]

        @jax.jit
        def vmap_adv(batched, ctx):
            return jax.vmap(
                lambda s: sim._advance_impl(s, ctx, dt_force=dt))(batched)

        ctx = sim._ctx()
        t_loop = time_fn(loop_adv, states, ctx)

        batched = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *states)
        t_vmap = time_fn(vmap_adv, batched, ctx)

        # parity: batched element 0 vs loop element 0
        o_l = loop_adv(states, ctx)[0].level.velocity
        o_v = vmap_adv(batched, ctx).level.velocity[0]
        diff = float(jnp.max(jnp.abs(o_l - o_v)))

        tot = k * cells
        print(f"K={k}: loop {t_loop:8.2f} ms ({tot / t_loop * 1e3 / 1e6:7.1f}M cells/s)"
              f" | vmap {t_vmap:8.2f} ms ({tot / t_vmap * 1e3 / 1e6:7.1f}M cells/s)"
              f" | speedup {t_loop / t_vmap:5.2f}x | max|diff| {diff:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
