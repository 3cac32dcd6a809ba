"""Per-phase device-time profile of the flagship advance (shear3d f32).

Measures each phase of the Godunov predictor step in isolation with the
scan harness (the only reliable device-timing method through the axon
tunnel: wrap the phase in lax.scan inside ONE jit, chain the carry so
iterations serialize, sync with a scalar pull).  Prints a table; feeds
PERF.md's "per-phase device time" section.

Usage:  python scripts/profile_phases.py [n] [iters]
        INCFLO_PALLAS_GODUNOV=0 python scripts/profile_phases.py   # A/B
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
K = int(sys.argv[2]) if len(sys.argv) > 2 else 30
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


def measure(name, fn, carry0, k=K, const=None):
    """Scan-harness timing: ms per iteration of fn(carry, const) ->
    carry.  `const` (e.g. the solver context) is threaded as a jit
    ARGUMENT so large coefficient hierarchies never lower as literal
    constants (the 256-class executable-size failure)."""
    @jax.jit
    def run(c0, cst):
        return lax.scan(lambda c, _: (fn(c, cst), None), c0, None,
                        length=k)[0]

    r = run(carry0, const)               # compile + warm
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    r = run(carry0, const)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    dtms = (time.perf_counter() - t0) / k * 1e3
    print(f"{name:28s} {dtms:8.3f} ms")
    return dtms


def chain(x, out):
    """Fold a dependence on `out` into carry `x` without changing it
    meaningfully (prevents DCE / cross-iteration overlap)."""
    s = jnp.zeros((), x.dtype)
    for leaf in jax.tree_util.tree_leaves(out):
        s = s + jnp.sum(leaf).astype(x.dtype) * jnp.asarray(1e-32, x.dtype)
    return x + s


def main():
    cfg = IncfloConfig.from_text(DECK)
    sim = Simulation(cfg)
    s = sim.init_state()
    s = sim.advance(s)                    # one real step to settle fields
    lvl = s.level
    dt = float(s.dt) if float(s.dt) > 0 else 1e-3
    ng = cfg.nghost_state()
    grid = sim.grid
    print(f"# shear3d {N}x{N}x{NZ} f32, dt={dt:.3e}, "
          f"pallas_godunov={os.environ.get('INCFLO_PALLAS_GODUNOV', '1')}")

    vel, rho = lvl.velocity, lvl.density
    vel_g = sim.grow_vel(vel, ng)
    rho_g = sim.grow_rho(rho, ng)
    eta_g1 = sim._viscosity(vel_g, ng)
    eta_faces = diffusion.eta_to_faces(eta_g1, grid, eb=None)
    vf = sim.compute_vel_forces(rho, lvl.tracer, lvl.tracer, lvl.gp)
    vf_g = sim.grow_force(vf)
    rho_g1 = inner(rho_g, ng - 1, grid.ndim)
    beta = mac_projection.inv_rho_on_faces(rho_g1, grid)

    # realistic mid-step intermediates: each solver phase is timed on the
    # SAME input distribution (and warm start) it sees inside a real step
    divtau_o = diffusion.compute_divtau(vel, vel_g, rho, eta_faces, eta_g1,
                                        cfg, grid, ng, eb=None) \
        if (cfg.need_divtau() or cfg.use_tensor_correction) else None
    umac_raw = sim.godunov.predict(vel_g, vf_g, dt, ng, sim.vel_bcrec)
    umac, mac_phi, mac_res, mac_it = mac_projection.project_mac_velocities(
        umac_raw, beta, grid, cfg.bc_kind, phi0=lvl.mac_phi,
        rtol=cfg.mac_mg_rtol, atol=cfg.mac_mg_atol,
        maxiter=cfg.mac_mg_maxiter, eb=None,
        prebuilt_solver=sim._mac_solver)
    print(f"  mac solve: {int(mac_it)} iters, res {float(mac_res):.2e}")
    conv_u = sim.godunov.advect(vel_g, umac, vf_g, dt, ng, sim.vel_bcrec,
                                [0] * grid.ndim, True)
    vel_star0 = vel + dt * (conv_u + vf
                            + (0.5 * divtau_o if divtau_o is not None
                               else 0.0))
    dt_diff = dt if cfg.diff_type == 2 else 0.5 * dt
    vel_star = diffusion.diffuse_velocity(
        vel_star0, rho, eta_faces, dt_diff, cfg, grid, eb=None,
        eta_g1=eta_g1, grow_fn=lambda q: sim.grow_vel(q, ng), ng=ng,
        grow_hom_fn=lambda q: sim.grow_vel_hom(q, ng),
        prebuilt_solver=sim._diff_proto) \
        if cfg.diff_type in (1, 2) else vel_star0
    _, _, _, nres, nit = sim.apply_projection(
        vel_star, vel, rho, lvl.gp, lvl.p, dt, False,
        jnp.zeros((), sim.dtype))
    print(f"  nodal solve: {int(nit)} iters, res {float(nres):.2e}")

    ctx = sim._ctx()

    def in_ctx(f):
        """Run f under a trace-time solver-context swap so prebuilt
        hierarchies come from the jit argument, not the closure."""
        def g(c, cst):
            saved = sim._swap_ctx(cst)
            try:
                return f(c, cst)
            finally:
                sim._swap_ctx(saved)
        return g

    t = {}
    t["grow+forces+eta"] = measure(
        "grow+forces+eta", lambda v, _: chain(v, (
            sim.grow_vel(v, ng),
            sim.compute_vel_forces(rho, lvl.tracer, lvl.tracer, lvl.gp),
            diffusion.eta_to_faces(
                sim._viscosity(sim.grow_vel(v, ng), ng), grid, eb=None))),
        vel)
    if divtau_o is not None:
        t["divtau"] = measure(
            "divtau", lambda v, _: chain(v, diffusion.compute_divtau(
                v, sim.grow_vel(v, ng), rho, eta_faces, eta_g1, cfg,
                grid, ng, eb=None)), vel)
    t["predict"] = measure(
        "predict", lambda vg, _: chain(vg, sim.godunov.predict(
            vg, vf_g, dt, ng, sim.vel_bcrec)), vel_g)
    t["mac_project"] = measure(
        "mac_project", lambda u0, cst: chain(
            u0, mac_projection.project_mac_velocities(
                [u0] + list(umac_raw[1:]), beta, grid, cfg.bc_kind,
                phi0=mac_phi, rtol=cfg.mac_mg_rtol, atol=cfg.mac_mg_atol,
                maxiter=cfg.mac_mg_maxiter, eb=None,
                prebuilt_solver=cst[0])[:2]), umac_raw[0], const=ctx)
    t["advect_u"] = measure(
        "advect_u", lambda vg, _: chain(vg, sim.godunov.advect(
            vg, umac, vf_g, dt, ng, sim.vel_bcrec, [0] * grid.ndim, True)),
        vel_g)
    if cfg.diff_type in (1, 2):
        t["diffuse_vel"] = measure(
            "diffuse_vel",
            lambda v, cst: chain(v, diffusion.diffuse_velocity(
                v, rho, eta_faces, dt_diff, cfg, grid, eb=None,
                eta_g1=eta_g1, grow_fn=lambda q: sim.grow_vel(q, ng), ng=ng,
                grow_hom_fn=lambda q: sim.grow_vel_hom(q, ng),
                prebuilt_solver=cst[2])), vel_star0, const=ctx)
    t["nodal_project"] = measure(
        "nodal_project", in_ctx(lambda v, _: chain(v, sim.apply_projection(
            v, vel, rho, lvl.gp, lvl.p, dt, False,
            jnp.zeros((), sim.dtype))[:3])), vel_star, const=ctx)
    t["compute_dt"] = measure(
        "compute_dt", lambda v, _: chain(v, sim.compute_dt(
            v, rho, sim.compute_vel_forces(rho, lvl.tracer, lvl.tracer,
                                           lvl.gp), s)), vel)
    t["FULL advance"] = measure(
        "FULL advance",
        lambda st, cst: sim._advance_impl(st, cst, dt_force=dt), s,
        k=max(K // 3, 5), const=ctx)
    t["FULL advance+dt"] = measure(
        "FULL advance+dt",
        lambda st, cst: sim._advance_impl(st, cst), s,
        k=max(K // 3, 5), const=ctx)
    accounted = sum(v for p, v in t.items() if p != "FULL advance")
    print(f"{'sum of phases':28s} {accounted:8.3f} ms")
    cells = N * N * NZ
    print(f"throughput (full): {cells / t['FULL advance'] * 1e3 / 1e6:.1f} "
          f"M cells/s")


if __name__ == "__main__":
    main()
