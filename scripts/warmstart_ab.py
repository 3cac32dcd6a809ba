"""A/B: does time-extrapolated warm starting (x0 = 2 phi_n - phi_{n-1})
cut MAC/nodal PCG iterations vs the current x0 = phi_n?

Runs real consecutive steps of the flagship deck, captures phi at two
times, then solves step n+1's REAL system from both starts.  Prints
iterations + ms (same-process A/B; epoch drift cancels).
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
from incflo_tpu.ops import mac_projection
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
    # settle several steps so phi history is physical
    for _ in range(4):
        s = sim.advance(s)
    s_prev = s
    s = sim.advance(s)
    lvl_p, lvl = s_prev.level, s.level
    dt = float(s.dt)
    ng = cfg.nghost_state()
    grid = sim.grid
    dtype = sim.dtype
    print(f"# warm-start A/B, shear3d {N}x{N}x{NZ} f32")

    # step n+1's MAC system
    vel_g = sim.grow_vel(lvl.velocity, ng)
    vf = sim.compute_vel_forces(lvl.density, lvl.tracer, lvl.tracer, lvl.gp)
    vf_g = sim.grow_force(vf)
    rho_g1 = inner(sim.grow_rho(lvl.density, ng), ng - 1, grid.ndim)
    beta = mac_projection.inv_rho_on_faces(rho_g1, grid)
    umac_raw = sim.godunov.predict(vel_g, vf_g, dt, ng, sim.vel_bcrec)

    for name, phi0 in [
            ("current  (phi_n)   ", lvl.mac_phi),
            ("extrap (2p_n-p_nm1)", 2.0 * lvl.mac_phi - lvl_p.mac_phi),
            ("cold   (zeros)     ", jnp.zeros_like(lvl.mac_phi))]:
        _, _, res, it = mac_projection.project_mac_velocities(
            umac_raw, beta, grid, cfg.bc_kind, phi0=phi0,
            rtol=cfg.mac_mg_rtol, atol=cfg.mac_mg_atol,
            maxiter=cfg.mac_mg_maxiter, eb=None,
            prebuilt_solver=sim._mac_solver)

        def proj(u0, phi0=phi0):
            out = mac_projection.project_mac_velocities(
                [u0] + list(umac_raw[1:]), beta, grid, cfg.bc_kind,
                phi0=phi0, rtol=cfg.mac_mg_rtol, atol=cfg.mac_mg_atol,
                maxiter=cfg.mac_mg_maxiter, eb=None,
                prebuilt_solver=sim._mac_solver)
            return u0 + jnp.sum(out[1]) * 1e-32

        ms = timeit(proj, umac_raw[0])
        print(f"mac   {name}: {ms:7.3f} ms  iters={int(it)} "
              f"res={float(res):.2e}")

    # step n+1's nodal system: build vel_star quickly (advect+forces only,
    # skip diffusion -- the projection input statistics are what matter)
    conv_u = sim.godunov.advect(vel_g, umac_raw, vf_g, dt, ng,
                                sim.vel_bcrec, [0] * grid.ndim, True)
    vel_star = lvl.velocity + dt * (conv_u + vf)
    for name, p0 in [
            ("current  (p_n)   ", lvl.p),
            ("extrap (2p-p_nm1)", 2.0 * lvl.p - lvl_p.p)]:
        _, _, _, res, it = sim.apply_projection(
            vel_star, lvl.velocity, lvl.density, lvl.gp, p0, dt, False,
            jnp.zeros((), dtype))

        def nproj(v, p0=p0):
            out = sim.apply_projection(v, lvl.velocity, lvl.density,
                                       lvl.gp, p0, dt, False,
                                       jnp.zeros((), dtype))
            return v + jnp.sum(out[1]) * 1e-32

        ms = timeit(nproj, vel_star)
        print(f"nodal {name}: {ms:7.3f} ms  iters={int(it)} "
              f"res={float(res):.2e}")


if __name__ == "__main__":
    main()
