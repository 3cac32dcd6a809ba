"""A/B-tune MG cycle shape (nu1/nu2) for the MAC and nodal projection
solves at the flagship size, same-process so device-epoch drift cancels.

Times K repeated solves (scan harness) of the REAL first-step systems:
rhs from a settled shear3d state, warm-started like production.  Prints
ms/solve and iteration count per (nu1, nu2).

Usage: python scripts/tune_mg.py [n] [K]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.environ.get("INCFLO_JAX_CACHE",
                        os.path.expanduser("~/.cache/incflo_tpu_xla"))
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

from incflo_tpu.config import IncfloConfig
from incflo_tpu.simulation import Simulation
from incflo_tpu.ops import mac_projection, multigrid as mg
from incflo_tpu.ops.stencil import inner

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
NZ = max(N // 4, 8)

DECK = f"""
amr.n_cell = {N} {N} {NZ}
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


def timeit(fn, arg, k=K):
    @jax.jit
    def run(c0):
        return lax.scan(lambda c, _: (fn(c), None), c0, None, length=k)[0]
    r = run(arg)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    r = run(arg)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter() - t0) / k * 1e3


def main():
    cfg = IncfloConfig.from_text(DECK)
    sim = Simulation(cfg)
    s = sim.init_state()
    s = sim.advance(s)
    lvl = s.level
    dt = float(s.dt)
    ng = cfg.nghost_state()
    grid = sim.grid
    dtype = sim.dtype
    print(f"# MG nu tuning, shear3d {N}x{N}x{NZ} f32, K={K}")

    vel = lvl.velocity
    vel_g = sim.grow_vel(vel, ng)
    vf = sim.compute_vel_forces(lvl.density, lvl.tracer, lvl.tracer, lvl.gp)
    vf_g = sim.grow_force(vf)
    rho_g1 = inner(sim.grow_rho(lvl.density, ng), ng - 1, grid.ndim)
    beta = mac_projection.inv_rho_on_faces(rho_g1, grid)
    umac_raw = sim.godunov.predict(vel_g, vf_g, dt, ng, sim.vel_bcrec)

    # -- MAC: rhs = div(umac_raw), warm start = previous phi ----------
    bc_lo, bc_hi = mac_projection.projection_solver_bc(cfg.bc_kind, grid)
    for (nu1, nu2) in [(1, 1), (2, 2), (3, 3), (2, 1), (4, 4)]:
        beta_f = []
        for d in range(grid.ndim):
            shape = tuple(n + (1 if ax == d else 0)
                          for ax, n in enumerate(grid.cell_shape))
            beta_f.append(jnp.full(shape, 1.0 / cfg.ro_0, dtype))
        solver = mg.CellSolver(grid.dx, bc_lo, bc_hi, alpha=0.0, beta=1.0,
                               acoef=None, bcoef=tuple(beta_f),
                               nu1=nu1, nu2=nu2)

        def project(u0, solver=solver):
            out = mac_projection.project_mac_velocities(
                [u0] + list(umac_raw[1:]), beta, grid, cfg.bc_kind,
                phi0=lvl.mac_phi, rtol=cfg.mac_mg_rtol,
                atol=cfg.mac_mg_atol, maxiter=cfg.mac_mg_maxiter,
                eb=None, prebuilt_solver=solver)
            return out[0][0] + jnp.sum(out[1]) * 1e-32

        _, _, res, it = mac_projection.project_mac_velocities(
            umac_raw, beta, grid, cfg.bc_kind, phi0=lvl.mac_phi,
            rtol=cfg.mac_mg_rtol, atol=cfg.mac_mg_atol,
            maxiter=cfg.mac_mg_maxiter, eb=None, prebuilt_solver=solver)
        ms = timeit(project, umac_raw[0])
        print(f"mac   nu=({nu1},{nu2}): {ms:7.3f} ms  iters={int(it)} "
              f"res={float(res):.2e}")

    # -- nodal: real projection system -------------------------------
    for (nu1, nu2) in [(2, 2), (1, 1), (3, 3), (4, 4)]:
        nodal = mg.NodalSolver(
            grid.dx, grid.periodic, bc_lo, bc_hi,
            jnp.full(grid.cell_shape, 1.0 / cfg.ro_0, dtype),
            nu1=nu1, nu2=nu2)
        sim._nodal_hat = nodal

        def nproj(v):
            out = sim.apply_projection(v, vel, lvl.density, lvl.gp, lvl.p,
                                       dt, False, jnp.zeros((), dtype))
            return v + jnp.sum(out[1]) * 1e-32

        _, _, _, res, it = sim.apply_projection(
            vel, vel, lvl.density, lvl.gp, lvl.p, dt, False,
            jnp.zeros((), dtype))
        ms = timeit(nproj, vel)
        print(f"nodal nu=({nu1},{nu2}): {ms:7.3f} ms  iters={int(it)} "
              f"res={float(res):.2e}")


if __name__ == "__main__":
    main()
