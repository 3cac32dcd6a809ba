"""Diagnostics: max-value prints, NaN checks, kinetic energy, steady state.

The reference stubs most of these (src/utilities/diagnostics.cpp:8-85
`#if 0`, incflo_steady_state.cpp "Abort(TODO)"); here they are
implemented per the reference's documented spec.
"""

from __future__ import annotations

import jax.numpy as jnp

from incflo_tpu.state import LevelState, SimState


def max_values(lvl: LevelState) -> dict:
    """PrintMaxValues payload: max |u|,|v|,|w|, |gp|, rho/tracer ranges."""
    nd = lvl.velocity.shape[-1]
    out = {}
    names = "uvw"
    for d in range(nd):
        out[f"max_{names[d]}"] = float(jnp.max(jnp.abs(lvl.velocity[..., d])))
        out[f"max_gp{'xyz'[d]}"] = float(jnp.max(jnp.abs(lvl.gp[..., d])))
    out["rho_min"] = float(jnp.min(lvl.density))
    out["rho_max"] = float(jnp.max(lvl.density))
    out["max_p"] = float(jnp.max(jnp.abs(lvl.p)))
    return out


def print_max_values(lvl: LevelState, time: float):
    mv = max_values(lvl)
    print(f"  t = {time:.8g}: " + "  ".join(f"{k}={v:.6g}"
                                            for k, v in mv.items()))


def check_for_nans(lvl: LevelState) -> bool:
    """True if any state field contains a non-finite value."""
    bad = False
    for f in (lvl.velocity, lvl.density, lvl.tracer, lvl.gp, lvl.p):
        bad = bad or (not bool(jnp.isfinite(f).all()))
    return bad


def kinetic_energy(lvl: LevelState, grid) -> float:
    """0.5 * integral(rho |u|^2) (the reference's KE_int hook,
    ComputeKineticEnergy stub)."""
    vol = 1.0
    for d in grid.dx:
        vol *= d
    ke = 0.5 * jnp.sum(lvl.density * jnp.sum(lvl.velocity ** 2, axis=-1)) * vol
    return float(ke)


def steady_state_reached(old: LevelState, new: LevelState, dt,
                         tol: float) -> bool:
    """The spec'd formula from reference incflo_steady_state.cpp:5-17
    (stubbed there): max |u_new - u_old| / dt < tol, or the relative L1
    change < tol."""
    diff = jnp.abs(new.velocity - old.velocity)
    max_change = float(jnp.max(diff) / dt)
    denom = float(jnp.sum(jnp.abs(new.velocity)))
    rel_l1 = float(jnp.sum(diff)) / max(denom, 1e-300)
    return max_change < tol or rel_l1 < tol
