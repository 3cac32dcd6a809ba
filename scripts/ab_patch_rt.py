"""A/B: Rayleigh-Taylor 2-level AMR, slab-patch mode vs dense-fine mode.

Measures wall-clock per step and cell-updates advanced per step for the
reference benchmark.rayleigh_taylor configuration (2 refinement levels,
regrid every 2 steps, gradrhoerr tagging) in both AMR modes, plus the
interface accuracy of patch mode against the dense-fine solution
(reference: /root/reference/test_no_eb/benchmark.rayleigh_taylor).
Feeds the PERF.md patch-AMR table (VERDICT r2 next-item 3).

Usage: python scripts/ab_patch_rt.py [n_base] [steps]
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

import numpy as np

from incflo_tpu.config import IncfloConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30

# reference test_no_eb/benchmark.rayleigh_taylor, scaled to N (base grid
# N/2 x N/2 x N, max_level=2 -> finest-equivalent 2N x 2N x 4N)
DECK = f"""
amr.n_cell = {N} {N} {2 * N}
amr.max_level = 2
amr.regrid_int = 2
amr.gradrhoerr = 0.1
geometry.prob_lo = 0. 0. 0.
geometry.prob_hi = 0.5 0.5 2.0
geometry.is_periodic = 1 1 0
zlo.type = "sw"
zhi.type = "sw"
incflo.probtype = 5
incflo.gravity = 0. 0. -0.3
incflo.use_godunov = true
incflo.constant_density = false
incflo.advect_tracer = false
incflo.mu = 0.001
incflo.diffusion_type = 1
incflo.cfl = 0.9
incflo.init_shrink = 0.1
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


def run_mode(mode):
    cfg = IncfloConfig.from_text(DECK + f'amr.patch_mode = "{mode}"\n')
    if mode == "slab":
        from incflo_tpu.amr_patch import SlabAMRSimulation
        amr = SlabAMRSimulation(cfg)
    else:
        from incflo_tpu.amr import AMRSimulation
        amr = AMRSimulation(cfg)
    s = amr.init_state()
    # warm: compile + settle dt ramp + first regrids
    for _ in range(6):
        s = amr.advance(s)
    float(np.asarray(s.dt))
    cells = []
    t0 = time.perf_counter()
    for _ in range(STEPS):
        s = amr.advance(s)
        if mode == "slab":
            cells.append(sum(int(np.prod(sim.grid.n_cell))
                             for sim in amr.sims))
        else:
            cells.append(int(np.prod(amr.fine_cfg.grid.n_cell)))
    float(np.asarray(s.dt))
    dt_wall = (time.perf_counter() - t0) / STEPS
    return amr, s, dt_wall, float(np.mean(cells))


def coarse_rho(amr, s, mode):
    """Solution restricted to the base grid for accuracy comparison."""
    if mode == "slab":
        return np.asarray(s.levels[0].level.density)
    # dense mode: average the fine field down to base resolution
    rho = np.asarray(s.level.density)
    r = 2 ** amr.cfg.max_level
    nd = rho.ndim
    for ax in range(nd):
        rho = rho.reshape(rho.shape[:ax] + (rho.shape[ax] // r, r)
                          + rho.shape[ax + 1:]).mean(axis=ax + 1)
    return rho


def main():
    amr_s, ss, wall_s, cells_s = run_mode("slab")
    amr_d, sd, wall_d, cells_d = run_mode("dense")
    rho_s = coarse_rho(amr_s, ss, "slab")
    rho_d = coarse_rho(amr_d, sd, "dense")
    # trajectories share dt history (same hierarchy-min dt formula) up to
    # solver differences; compare at matched step count
    t_s, t_d = float(np.asarray(ss.t)), float(np.asarray(sd.t))
    err = np.abs(rho_s - rho_d).mean() / np.abs(rho_d).mean()
    print(f"# rayleigh_taylor base {N}x{N}x{2*N}, max_level=2, "
          f"regrid_int=2, {STEPS} timed steps, f32")
    print(f"slab : {wall_s*1e3:8.2f} ms/step  {cells_s/1e3:9.1f}k cells "
          f"advanced/step  ({cells_s/wall_s/1e6:7.2f}M cells/s)  t={t_s:.4f}")
    print(f"dense: {wall_d*1e3:8.2f} ms/step  {cells_d/1e3:9.1f}k cells "
          f"advanced/step  ({cells_d/wall_d/1e6:7.2f}M cells/s)  t={t_d:.4f}")
    print(f"cell-updates ratio dense/slab: {cells_d/cells_s:.2f}x")
    print(f"mean-relative |rho_slab - rho_dense| on base grid: {err:.3e}")


if __name__ == "__main__":
    main()
