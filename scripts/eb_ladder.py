"""EB wall-accuracy convergence ladder (VERDICT r3 Next #4).

Steady Poiseuille flow in a cylinder (reference
benchmark.poiseuille_cylinder_newtonian geometry, Newtonian), driven by
delp, run to t=4 (viscous steady state; R^2/nu = 1) at n=16/32/64.
Prints all-fluid L2/Linf errors vs the exact parabola and the observed
orders.  Round-3 PERF.md baseline: L2 4.67e-2 / 2.82e-2 / 1.32e-2
(orders 0.73 / 1.09 -- first order globally).

Usage:  python scripts/eb_ladder.py [n ...]   (default 16 32 64)
Env:    INCFLO_LADDER_DTYPE=float32|float64, INCFLO_EB_NODAL=stencil|fine
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_one(n, dtype="float32"):
    import jax
    if os.environ.get("INCFLO_LADDER_CPU") == "1":
        # the experimental axon TPU platform wins over the JAX_PLATFORMS
        # env var; jax.config is authoritative (tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("INCFLO_JAX_CACHE",
                           os.path.expanduser("~/.cache/incflo_tpu_xla"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from incflo_tpu.config import IncfloConfig
    from incflo_tpu.simulation import Simulation

    mu = 1.0
    dt = float(os.environ.get("INCFLO_LADDER_DT", "0.05"))
    steps = int(round(4.0 / dt))
    text = f"""
amr.n_cell = {n} {n} 4
geometry.prob_lo = 0. 0. 0.
geometry.prob_hi = 4. 4. 0.5
geometry.is_periodic = 1 1 1
incflo.probtype = 0
incflo.dtype = {dtype}
incflo.mu = {mu}
incflo.ro_0 = 1.
incflo.fixed_dt = {dt}
incflo.diffusion_type = 2
incflo.initial_iterations = 0
incflo.delp = 0. 0. 2.
incflo.geometry = "cylinder"
cylinder.internal_flow = true
cylinder.radius = 1.
cylinder.direction = 2
cylinder.center = 2. 2. 0.
"""
    cfg = IncfloConfig.from_text(text)
    sim = Simulation(cfg)
    s = sim.init_state()
    left = steps
    while left > 0:
        k = min(left, 20)
        s = sim.advance_n(s, k)
        left -= k
    w = np.asarray(s.level.velocity[..., 2])
    assert np.isfinite(w).all()
    wc = w[:, :, 2]
    dx = 4.0 / n
    xc = (np.arange(n) + 0.5) * dx
    r2 = (xc.reshape(-1, 1) - 2) ** 2 + (xc.reshape(1, -1) - 2) ** 2
    exact = np.maximum(0.0, 4.0 / (4 * mu) * (1.0 - r2))
    fluid = np.asarray(sim.eb.fluid[:, :, 2]) > 0.5
    err = (wc - exact)[fluid]
    l2c = float(np.sqrt(np.mean(err ** 2)))
    linfc = float(np.abs(err).max())
    # centroid-consistent norm: the FV unknown is the fluid average ==
    # the fluid-CENTROID point value to 2nd order, so the consistent
    # pointwise comparison evaluates the exact parabola at the fluid
    # centroid (offsets are zero in regular cells -> identical there)
    cent = np.asarray(sim.eb.ccent_g2)[2:-2, 2:-2, 2 + 2, :]
    xg = xc.reshape(-1, 1) + cent[..., 0] * dx
    yg = xc.reshape(1, -1) + cent[..., 1] * dx
    r2g = (xg - 2) ** 2 + (yg - 2) ** 2
    exact_g = np.maximum(0.0, 4.0 / (4 * mu) * (1.0 - r2g))
    errg = (wc - exact_g)[fluid]
    l2 = float(np.sqrt(np.mean(errg ** 2)))
    linf = float(np.abs(errg).max())
    return l2, linf, l2c, linfc


def main():
    ns = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
    dtype = os.environ.get("INCFLO_LADDER_DTYPE", "float32")
    rows = []
    for n in ns:
        l2, linf, l2c, linfc = run_one(n, dtype)
        rows.append((n, l2, linf, l2c, linfc))
        print(f"n={n:4d}  L2={l2:.4e}  Linf={linf:.4e}  "
              f"[center-sampled L2={l2c:.4e}  Linf={linfc:.4e}]",
              flush=True)
    for i in range(1, len(rows)):
        n0, l0, i0, lc0, ic0 = rows[i - 1]
        n1, l1, i1, lc1, ic1 = rows[i]
        r = np.log2(n1 / n0)
        print(f"order {n0}->{n1}:  L2 {np.log2(l0 / l1) / r:.2f}  "
              f"Linf {np.log2(i0 / i1) / r:.2f}  "
              f"[center-sampled L2 {np.log2(lc0 / lc1) / r:.2f}  "
              f"Linf {np.log2(ic0 / ic1) / r:.2f}]")


if __name__ == "__main__":
    main()
