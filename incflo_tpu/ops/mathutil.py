"""Numeric helpers hardened for the TPU float64 emulation path."""

import jax.numpy as jnp

# tanh saturates to 1.0 in float64 for |x| >= ~19; the TPU f64 emulation
# overflows (NaN) for |x| >= ~88, so clamp well inside the safe range.
_TANH_CLAMP = 30.0


def safe_tanh(x):
    return jnp.tanh(jnp.clip(x, -_TANH_CLAMP, _TANH_CLAMP))


def expterm(nu):
    """Papanastasiou regularisation (1-exp(-nu))/nu with the series
    fallback for tiny nu (reference src/rheology/incflo_rheology.cpp:8-13)."""
    small = nu < 1.0e-9
    safe = jnp.where(small, 1.0, nu)
    series = 1.0 - 0.5 * nu + nu * nu * (1.0 / 6.0) - (nu * nu * nu) * (1.0 / 24.0)
    return jnp.where(small, series, -jnp.expm1(-safe) / safe)
