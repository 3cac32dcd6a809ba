"""CLI driver: the `incflo` executable analog.

Usage:  python -m incflo_tpu.main <inputs-file> [key=value ...]

Mirrors reference src/main.cpp + incflo::Evolve (src/incflo.cpp:106-166):
reads a ParmParse deck, initializes (or restarts), evolves with the
plot/checkpoint cadence, and prints the same style of step/timing lines.
"""

from __future__ import annotations

import math
import os
import sys
import time as wallclock

import jax


def write_now(step: int, t: float, dt: float, last_plt: int, cfg) -> bool:
    """reference incflo::writeNow (incflo.cpp:221-266)."""
    if cfg.plot_int > 0:
        return step % cfg.plot_int == 0
    if cfg.plot_per_exact > 0:
        eps = 1.0e-14
        return abs(math.remainder(t, cfg.plot_per_exact)) < eps * max(1.0, abs(t)) \
            or abs((t / cfg.plot_per_exact) - round(t / cfg.plot_per_exact)) < 1e-10
    if cfg.plot_per_approx > 0:
        eps = 1.0e-14
        n_prev = int((t - dt + eps) / cfg.plot_per_approx)
        n_now = int((t + eps) / cfg.plot_per_approx)
        return n_now > n_prev
    return False


def run(argv):
    # INCFLO_PLATFORM=cpu|tpu forces the jax backend.  Needed because
    # experimental platform plugins (axon) override the JAX_PLATFORMS
    # env var; only jax.config wins.
    plat = os.environ.get("INCFLO_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    # persistent executable cache: step programs (incl. Mosaic kernels)
    # compile once per machine instead of once per process.
    # INCFLO_JAX_CACHE="" disables; any path overrides the default.
    cache = os.environ.get("INCFLO_JAX_CACHE",
                           os.path.expanduser("~/.cache/incflo_tpu_xla"))
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if argv and argv[0] == "--describe":
        # build-info dump (reference main.cpp --describe / writeBuildInfo)
        import incflo_tpu
        print(f"incflo_tpu {incflo_tpu.__version__}")
        print(f"jax {jax.__version__}")
        print(f"devices: {jax.devices()}")
        import subprocess
        try:
            git = subprocess.run(["git", "rev-parse", "HEAD"],
                                 capture_output=True, text=True,
                                 cwd=__file__.rsplit("/", 2)[0])
            print(f"git hash: {git.stdout.strip()}")
        except Exception:
            pass
        return 0
    if not argv:
        print("usage: python -m incflo_tpu.main <inputs-file> [key=value ...]")
        return 2

    from incflo_tpu.config import IncfloConfig
    try:
        cfg = IncfloConfig.from_file(argv[0], argv[1:])
    except FileNotFoundError:
        print(f"error: inputs file not found: {argv[0]}", file=sys.stderr)
        return 2

    if cfg.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    from incflo_tpu.simulation import Simulation
    from incflo_tpu.utils import io

    patch_mode = cfg.patch_mode
    if cfg.max_level > 0 and patch_mode == "":
        # auto-select: slab patches are the production refinement path
        # whenever the tags localize (reference AMR always refines
        # tagged boxes; dense-fine is the explicit fallback)
        from incflo_tpu import amr_patch
        patch_mode = amr_patch.choose_patch_mode(cfg)
        print(f"amr.patch_mode auto-selected: {patch_mode}")
    if cfg.max_level > 0 and patch_mode in ("slab", "box"):
        cfg.patch_mode = patch_mode     # record the resolved mode
        from incflo_tpu.amr_patch import SlabAMRSimulation
        amr = SlabAMRSimulation(cfg)
        sim = amr.sim0
        io_cfg = cfg
        driver = amr

        def write_plot(path, s):
            io.write_plotfile_patch(path, s, amr, cfg)
    elif cfg.max_level > 0:
        from incflo_tpu.amr import AMRSimulation
        amr = AMRSimulation(cfg)
        sim = amr.sim
        io_cfg = amr.fine_cfg
        driver = amr

        def write_plot(path, s):
            io.write_plotfile_amr(path, s, amr, cfg)
    else:
        amr = None
        sim = Simulation(cfg)
        io_cfg = cfg
        driver = sim

        def write_plot(path, s):
            io.write_plotfile(path, s, cfg, sim)

    if cfg.max_level > 0 and patch_mode in ("slab", "box"):
        def write_chk(path, s):
            io.write_checkpoint_patch(path, s, amr, cfg)
    else:
        def write_chk(path, s):
            io.write_checkpoint(path, s, io_cfg)

    # optional device profiling (jax profiler traces; reference analog:
    # AMReX TinyProfiler via TINY_PROFILE)
    prof_dir = os.environ.get("INCFLO_PROFILE_DIR")
    if prof_dir:
        jax.profiler.start_trace(prof_dir)

    # EB surface dump (reference WriteMyEBSurface)
    if sim.eb is not None and int(cfg.pp.scoped("incflo").query(
            "write_eb_surface", 0)):
        from incflo_tpu.eb import geometry as ebgeom
        from incflo_tpu.eb import surface
        phi_if = ebgeom.make_eb_geometry(cfg.eb_geometry, cfg.pp, io_cfg.grid)
        data = ebgeom.compute_eb_data(phi_if, io_cfg.grid)
        surface.write_eb_surface("eb_surface.stl", data, io_cfg.grid)
        print("Wrote eb_surface.stl")

    t0 = wallclock.time()
    if cfg.restart_file:
        print(f"Restarting from checkpoint {cfg.restart_file}")
        if patch_mode in ("slab", "box") and cfg.max_level > 0:
            s = io.read_checkpoint_patch(cfg.restart_file, amr, cfg)
        else:
            s = io.read_checkpoint(cfg.restart_file, io_cfg, sim.dtype)
            if amr is not None:
                amr.regrid(s)
        if cfg.plotfile_on_restart:
            path = f"{cfg.plot_file}{int(s.step):05d}"
            write_plot(path, s)
    else:
        s = driver.init_state()
        if cfg.check_int > 0:
            write_chk(f"{cfg.check_file}{int(s.step):05d}", s)
        if cfg.plot_int > 0 or cfg.plot_per_exact > 0 or cfg.plot_per_approx > 0:
            path = f"{cfg.plot_file}{int(s.step):05d}"
            write_plot(path, s)
            io.write_job_info(path, cfg)
    init_time = wallclock.time() - t0
    print(f"Time spent in InitData():    {init_time}")

    from incflo_tpu.utils import diagnostics

    t0 = wallclock.time()
    last_plt = -1
    last_chk = -1
    nsteps = 0
    # batch steps into one device dispatch when nothing needs a per-step
    # host sync (no verbose prints, no steady-state test, no time-based
    # plotting).  Same pattern as a scanned training loop; removes the
    # per-dispatch latency tax.  stop_time decks batch too: the batch
    # size is bounded by a conservative prediction of the dt-crossing
    # (dt grows at most 1.1x/step -- compute_dt's growth limiter), so
    # the in-step stop_time clamp only ever fires on single steps.
    can_batch = (amr is None and cfg.verbose <= 0 and not cfg.steady_state
                 and cfg.plot_per_exact <= 0
                 and cfg.plot_per_approx <= 0)

    def _steps_to_stop(t, dt_now, limit):
        """Largest k <= limit with t + sum_{i<=k} dt*1.1^i safely below
        stop_time (conservative upper envelope of the next k dts)."""
        if cfg.stop_time < 0:
            return limit
        if dt_now <= 0.0:
            return 1
        k, tt, dtk = 0, t, dt_now
        while k < limit:
            dtk *= 1.1
            if tt + dtk >= cfg.stop_time * (1.0 - 1e-12):
                break
            tt += dtk
            k += 1
        return max(1, k)

    def _next_boundary(step):
        """Steps until the next cadence point (plot/check/KE/max_step)."""
        dists = []
        for ival in (cfg.plot_int, cfg.check_int, cfg.KE_int):
            if ival > 0:
                dists.append(ival - step % ival)
        if cfg.max_step >= 0:
            dists.append(cfg.max_step - step)
        return max(1, min(dists)) if dists else 16

    while True:
        t, step = float(s.t), int(s.step)
        if cfg.stop_time >= 0 and t >= cfg.stop_time - 1e-15 \
                and not cfg.steady_state:
            break
        if cfg.max_step >= 0 and step >= cfg.max_step:
            break

        step_t0 = wallclock.time()
        prev_level = s.level
        if can_batch:
            # power-of-two batch sizes only: each distinct n is a separate
            # XLA compilation of the scanned step (expensive on TPU)
            limit = _steps_to_stop(t, float(s.dt), min(_next_boundary(step), 16))
            nbatch = 1
            while nbatch * 2 <= limit:
                nbatch *= 2
        else:
            nbatch = 1
        if nbatch > 1:
            s = sim.advance_n(s, nbatch)
        else:
            s = driver.advance(s)
        jax.block_until_ready(s.level.velocity)
        nsteps += nbatch
        t, step, dt = float(s.t), int(s.step), float(s.dt)
        if cfg.verbose > 0:
            print(f"Step {step} : t = {t:.12g}, dt = {dt:.12g} "
                  f"[{wallclock.time()-step_t0:.3f}s]")
        if cfg.verbose > 1:
            diagnostics.print_max_values(s.level, t)
        if cfg.KE_int > 0 and step % cfg.KE_int == 0:
            ke = diagnostics.kinetic_energy(s.level, io_cfg.grid)
            print(f"Time, Kinetic Energy: {t}, {ke}")
        if cfg.steady_state and diagnostics.steady_state_reached(
                prev_level, s.level, dt, cfg.steady_state_tol):
            print(f"Steady state reached at step {step}, t = {t}")
            break

        if write_now(step, t, dt, last_plt, cfg):
            path = f"{cfg.plot_file}{step:05d}"
            write_plot(path, s)
            io.write_job_info(path, cfg)
            last_plt = step
        if cfg.check_int > 0 and step % cfg.check_int == 0:
            write_chk(f"{cfg.check_file}{step:05d}", s)
            last_chk = step

    if prof_dir:
        jax.profiler.stop_trace()
        print(f"Wrote profiler trace to {prof_dir}")

    evolve_time = wallclock.time() - t0
    print(f"Time spent in Evolve():    {evolve_time}")
    if nsteps:
        print(f"Time per step:    {evolve_time/nsteps}")

    # final outputs (reference Evolve tail)
    t, step = float(s.t), int(s.step)
    if cfg.plot_int > 0 or cfg.plot_per_exact > 0 or cfg.plot_per_approx > 0:
        if step != last_plt:
            write_plot(f"{cfg.plot_file}{step:05d}", s)
    if cfg.check_int > 0 and step != last_chk:
        write_chk(f"{cfg.check_file}{step:05d}", s)
    return 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))
