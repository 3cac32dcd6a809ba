"""Benchmark: cell-updates/sec/chip for the full jit-compiled advance().

Runs the 3D double-shear-layer configuration (reference
test_no_eb/benchmark.double_shear_layer_x scaled up; Godunov + PPM +
Crank-Nicolson + MAC & nodal multigrid projections -- the full advance
path) and prints ONE JSON line.

vs_baseline compares against BASELINE.json's driver-set target anchor:
the reference publishes no throughput numbers (BASELINE.md), so the
anchor is an estimated single-node CPU incflo throughput of 2.0e7
cell-updates/s (a generous estimate for a 32-core node on this scheme;
the driver target is >= 10x that, i.e. vs_baseline >= 10).
"""

import json
import os
import sys
import time

BASELINE_CPU_CUPS = 2.0e7


def main():
    import jax

    n = int(os.environ.get("INCFLO_BENCH_N", "128"))
    nz = max(n // 4, 8)
    steps = int(os.environ.get("INCFLO_BENCH_STEPS", "5"))
    dtype = os.environ.get("INCFLO_BENCH_DTYPE", "float32")
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    from incflo_tpu.config import IncfloConfig
    from incflo_tpu.simulation import Simulation

    # float32 path relaxes the MG tolerances to realistic f32 levels
    tol = "1e-11" if dtype == "float64" else "1e-5"
    atol = "1e-14" if dtype == "float64" else "1e-7"
    text = f"""
amr.n_cell = {n} {n} {nz}
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
incflo.dtype = {dtype}
mac_proj.mg_rtol = {tol}
mac_proj.mg_atol = {atol}
nodal_proj.mg_rtol = {tol}
nodal_proj.mg_atol = {atol}
scalar_diffusion.mg_rtol = {tol}
scalar_diffusion.mg_atol = {atol}
"""
    cfg = IncfloConfig.from_text(text)
    sim = Simulation(cfg)
    s = sim.init_state()

    # warmup (compile + one step).  NOTE: on the axon TPU tunnel
    # block_until_ready returns early; a host transfer is the only
    # reliable synchronization, so we sync on a scalar pulled to host.
    def sync(state):
        import numpy as _np
        return float(_np.asarray(state.dt))

    for _ in range(3):   # compile + reach steady MG warm-start behavior
        s = sim.advance(s)
    sync(s)

    t0 = time.perf_counter()
    for _ in range(steps):
        s = sim.advance(s)
    sync(s)
    dt_wall = (time.perf_counter() - t0) / steps

    ncells = n * n * nz
    cups = ncells / dt_wall
    print(json.dumps({
        "metric": "cell_updates_per_sec_per_chip",
        "value": cups,
        "unit": "cells/s",
        "vs_baseline": cups / BASELINE_CPU_CUPS,
        "config": f"double_shear_layer_3d {n}x{n}x{nz} {dtype} godunov+ppm+CN",
        "sec_per_step": dt_wall,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
