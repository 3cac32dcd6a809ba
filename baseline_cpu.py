"""Measure the CPU-substitute baseline for BASELINE.md.

The reference (asalmgren/incflo) depends on AMReX, which is not vendored
in /root/reference and cannot be fetched in this zero-egress image, so
the reference binary cannot be built here.  As the documented substitute
(BASELINE.md "measured" section), this script measures the SAME
numerical pipeline -- the full predictor[-corrector] advance with
reference float64 tolerances (mg_rtol 1e-11 / atol 1e-14, incflo.H:342)
-- through XLA's CPU backend on this machine, per bench.py config.

Output: one JSON line per config with cells/s on N_CPU_CORES cores
(this image exposes 1), plus a documented 32-core linear-scaling
node-equivalent (generous to the reference: AMReX MPI weak-scales well
at these sizes, so linear is an upper bound for a 32-core node).

Usage: JAX_PLATFORMS= python baseline_cpu.py [config ...]
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import bench  # noqa: E402
from incflo_tpu.config import IncfloConfig  # noqa: E402
from incflo_tpu.simulation import Simulation  # noqa: E402


def measure(config, n, steps=3):
    text, ncells = bench._deck(config, n, "float64")
    cfg = IncfloConfig.from_text(text)
    sim = Simulation(cfg)
    s = sim.init_state()
    s = sim.advance(s)          # compile + warm
    float(s.dt)
    t0 = time.perf_counter()
    for _ in range(steps):
        s = sim.advance(s)
    float(s.dt)
    dt_wall = (time.perf_counter() - t0) / steps
    return ncells / dt_wall, dt_wall, ncells


def main():
    import multiprocessing
    cores = multiprocessing.cpu_count()
    configs = sys.argv[1:] or ["tgv2d", "shear3d", "rt",
                               "poiseuille_cyl_bingham", "channel_cyl"]
    sizes = {"tgv2d": 128, "shear3d": 64, "rt": 64,
             "poiseuille_cyl_bingham": 32, "channel_cyl": 64}
    for config in configs:
        n = sizes[config]
        try:
            cups, sec, ncells = measure(config, n)
            print(json.dumps({
                "config": config, "n": n, "cells": ncells,
                "cpu_cores": cores,
                "cells_per_sec_measured": cups,
                "sec_per_step": sec,
                "node32_equiv_cells_per_sec": cups * 32 / cores,
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"config": config, "n": n,
                              "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
