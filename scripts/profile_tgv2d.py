"""Per-phase device-time profile of the tgv2d bench deck (128^2 f32).

Same scan-harness method as profile_phases.py, but for the 2D
Taylor-Green deck (MOL predictor+corrector, implicit diffusion, all
solves fast-diag direct).  Feeds the tgv2d launch-floor analysis.

Usage:  python scripts/profile_tgv2d.py [n] [iters]
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
from incflo_tpu.ops import mac_projection, diffusion
from incflo_tpu.ops.stencil import inner

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 50

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


def measure(name, fn, carry0, k=K, const=None):
    @jax.jit
    def run(c0, cst):
        return lax.scan(lambda c, _: (fn(c, cst), None), c0, None,
                        length=k)[0]

    r = run(carry0, const)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    r = run(carry0, const)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    dtms = (time.perf_counter() - t0) / k * 1e3
    print(f"{name:28s} {dtms:8.3f} ms")
    return dtms


def chain(x, out):
    s = jnp.zeros((), x.dtype)
    for leaf in jax.tree_util.tree_leaves(out):
        s = s + jnp.sum(leaf).astype(x.dtype) * jnp.asarray(1e-32, x.dtype)
    return x + s


def main():
    cfg = IncfloConfig.from_text(DECK)
    sim = Simulation(cfg)
    s = sim.init_state()
    s = sim.advance(s)
    lvl = s.level
    dt = float(s.dt) if float(s.dt) > 0 else 1e-3
    ng = cfg.nghost_state()
    grid = sim.grid
    print(f"# tgv2d {N}x{N} f32, dt={dt:.3e}, MOL={not cfg.use_godunov}, "
          f"diff_type={cfg.diff_type}")

    vel, rho = lvl.velocity, lvl.density
    vel_g = sim.grow_vel(vel, ng)
    rho_g = sim.grow_rho(rho, ng)
    eta_g1 = sim._viscosity(vel_g, ng)
    eta_faces = diffusion.eta_to_faces(eta_g1, grid, eb=None)
    vf = sim.compute_vel_forces(rho, lvl.tracer, lvl.tracer, lvl.gp)
    rho_g1 = inner(rho_g, ng - 1, grid.ndim)
    beta = mac_projection.inv_rho_on_faces(rho_g1, grid)
    ctx = sim._ctx()

    def in_ctx(f):
        def g(c, cst):
            saved = sim._swap_ctx(cst)
            try:
                return f(c, cst)
            finally:
                sim._swap_ctx(saved)
        return g

    t = {}
    t["conv_term_mol"] = measure(
        "conv_term_mol", in_ctx(lambda v, _: chain(v, sim.convective_term_mol(
            v, rho, lvl.tracer, lvl.mac_phi))), vel, const=ctx)
    dt_diff = dt
    t["diffuse_vel"] = measure(
        "diffuse_vel",
        lambda v, cst: chain(v, diffusion.diffuse_velocity(
            v, rho, eta_faces, dt_diff, cfg, grid, eb=None,
            eta_g1=eta_g1, grow_fn=lambda q: sim.grow_vel(q, ng), ng=ng,
            grow_hom_fn=lambda q: sim.grow_vel_hom(q, ng),
            prebuilt_solver=cst[2])), vel, const=ctx)
    t["nodal_project"] = measure(
        "nodal_project", in_ctx(lambda v, _: chain(v, sim.apply_projection(
            v, vel, rho, lvl.gp, lvl.p, dt, False,
            jnp.zeros((), sim.dtype))[:3])), vel, const=ctx)
    t["compute_dt"] = measure(
        "compute_dt", lambda v, _: chain(v, sim.compute_dt(
            v, rho, vf, s)), vel)
    t["FULL advance"] = measure(
        "FULL advance",
        lambda st, cst: sim._advance_impl(st, cst, dt_force=dt), s,
        k=K, const=ctx)
    t["FULL advance+dt"] = measure(
        "FULL advance+dt",
        lambda st, cst: sim._advance_impl(st, cst), s,
        k=K, const=ctx)
    # predictor + corrector each call conv + diffuse + project
    approx = 2 * (t["conv_term_mol"] + t["diffuse_vel"]
                  + t["nodal_project"]) + t["compute_dt"]
    print(f"{'2x(conv+diff+proj)+dt':28s} {approx:8.3f} ms")
    cells = N * N
    print(f"throughput (full+dt): "
          f"{cells / t['FULL advance+dt'] * 1e3 / 1e6:.1f} M cells/s")


if __name__ == "__main__":
    main()
