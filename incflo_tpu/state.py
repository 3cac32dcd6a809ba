"""Simulation state pytrees.

The TPU-native replacement for the reference's per-level `LevelData`
(src/incflo.H:470-503, src/setup/incflo_arrays.cpp:5-61): one dense jnp
array per field, no ghost cells stored, old/new pairs handled
functionally by the step.

Field layout (C order, x index first):
  velocity : (*cell_shape, ndim)
  density  : (*cell_shape)
  tracer   : (*cell_shape, ntrac)
  gp       : (*cell_shape, ndim)   lagged pressure gradient (state!)
  p        : (*node_shape)         node-centred pressure
  mac_phi  : (*cell_shape)         MAC-projection potential (warm start)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from incflo_tpu.grid import Grid


class LevelState(NamedTuple):
    velocity: jax.Array
    density: jax.Array
    tracer: jax.Array
    gp: jax.Array
    p: jax.Array
    mac_phi: jax.Array


class SimState(NamedTuple):
    """Whole-simulation state advanced by one jit step."""
    level: LevelState          # single-level for now; AMR adds a tuple
    t: jax.Array               # current time
    dt: jax.Array              # current dt
    prev_dt: jax.Array
    prev_prev_dt: jax.Array
    step: jax.Array            # int step count


def zeros_level(grid: Grid, ntrac: int, dtype) -> LevelState:
    cs = grid.cell_shape
    ns = grid.node_shape
    d = grid.ndim
    return LevelState(
        velocity=jnp.zeros(cs + (d,), dtype),
        density=jnp.ones(cs, dtype),
        tracer=jnp.zeros(cs + (ntrac,), dtype),
        gp=jnp.zeros(cs + (d,), dtype),
        p=jnp.zeros(ns, dtype),
        mac_phi=jnp.zeros(cs, dtype),
    )
