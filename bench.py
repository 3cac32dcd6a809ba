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


def _deck(config, n, dtype):
    """The five BASELINE.json benchmark configurations."""
    tol = "1e-11" if dtype == "float64" else "1e-5"
    atol = "1e-14" if dtype == "float64" else "1e-7"
    common = f"""
incflo.initial_iterations = 0
incflo.dtype = {dtype}
mac_proj.mg_rtol = {tol}
mac_proj.mg_atol = {atol}
nodal_proj.mg_rtol = {tol}
nodal_proj.mg_atol = {atol}
scalar_diffusion.mg_rtol = {tol}
scalar_diffusion.mg_atol = {atol}
stop_time = -1
max_step = 1000000
"""
    nz = max(n // 4, 8)
    if config == "shear3d":
        return common + f"""
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
""", n * n * nz
    if config == "tgv2d":
        return common + f"""
amr.n_cell = {n} {n}
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
incflo.probtype = 1
incflo.mu = 0.01
incflo.cfl = 0.45
""", n * n
    if config == "rt":
        return common + f"""
amr.n_cell = {n//2} {n//2} {n}
geometry.prob_lo = 0. 0. 0.
geometry.prob_hi = 0.5 0.5 1.0
geometry.is_periodic = 1 1 0
zlo.type = "sw"
zhi.type = "sw"
incflo.probtype = 5
incflo.gravity = 0. 0. -0.1
incflo.use_godunov = true
incflo.constant_density = false
incflo.advect_tracer = true
incflo.mu = 0.001
incflo.mu_s = 0.001
incflo.diffusion_type = 1
incflo.cfl = 0.9
incflo.init_shrink = 1.0
""", (n // 2) * (n // 2) * n
    if config == "poiseuille_cyl_bingham":
        return common + f"""
amr.n_cell = {n} {n} {nz}
geometry.prob_lo = 0. 0. 0.
geometry.prob_hi = 4. 4. 0.5
geometry.is_periodic = 1 1 1
incflo.delp = 0. 0. 2.
incflo.geometry = "cylinder"
cylinder.internal_flow = true
cylinder.radius = 1.
cylinder.direction = 2
cylinder.center = 2. 2. 0.
incflo.fluid_model = "bingham"
incflo.mu = 1.
incflo.tau_0 = 1.
incflo.papa_reg = 0.001
incflo.fixed_dt = 0.01
""", n * n * nz
    if config == "channel_cyl":
        return common + f"""
amr.n_cell = {n} {n//2} {max(n//8,8)}
geometry.prob_lo = 0. 0. 0.
geometry.prob_hi = 1.2 0.4 0.1
geometry.is_periodic = 0 0 1
ylo.type = "nsw"
yhi.type = "nsw"
xlo.type = "mi"
xlo.velocity = 1. 0. 0.
xlo.tracer = 1.
xhi.type = "po"
xhi.pressure = 0.0
incflo.geometry = "cylinder"
cylinder.internal_flow = false
cylinder.radius = 0.05000001
cylinder.direction = 2
cylinder.center = 0.15 0.2 0.0
incflo.probtype = 31
incflo.ic_u = 1.0
incflo.mu = 0.001
incflo.ntrac = 1
incflo.advect_tracer = true
incflo.mu_s = 0.001
incflo.cfl = 0.45
""", n * (n // 2) * max(n // 8, 8)
    raise SystemExit(f"unknown INCFLO_BENCH_CONFIG {config}")


def main():
    import jax

    n = int(os.environ.get("INCFLO_BENCH_N", "128"))
    steps = int(os.environ.get("INCFLO_BENCH_STEPS", "5"))
    dtype = os.environ.get("INCFLO_BENCH_DTYPE", "float32")
    config = os.environ.get("INCFLO_BENCH_CONFIG", "shear3d")
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    from incflo_tpu.config import IncfloConfig
    from incflo_tpu.simulation import Simulation

    text, ncells = _deck(config, n, dtype)
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
        s = sim.advance(s, donate=True)
    sync(s)

    t0 = time.perf_counter()
    for _ in range(steps):
        s = sim.advance(s, donate=True)
    sync(s)
    dt_wall = (time.perf_counter() - t0) / steps

    cups = ncells / dt_wall
    import numpy as _np
    finite = bool(_np.all(_np.isfinite(_np.asarray(s.level.velocity))))
    print(json.dumps({
        "metric": "cell_updates_per_sec_per_chip",
        "value": cups,
        "unit": "cells/s",
        "vs_baseline": cups / BASELINE_CPU_CUPS,
        "config": f"{config} n={n} ({ncells} cells) {dtype}",
        "sec_per_step": dt_wall,
        "finite": finite,
        "device": str(jax.devices()[0]),
    }))
    if not finite:
        raise SystemExit("benchmark produced non-finite velocity field")


if __name__ == "__main__":
    main()
