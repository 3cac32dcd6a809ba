"""Multi-chip domain decomposition via jax.sharding + GSPMD.

The reference's parallelism is spatial domain decomposition: BoxArray
chopped into boxes, boxes assigned to MPI ranks, ghost cells exchanged
by FillBoundary (SURVEY.md 2.12).  The TPU-native equivalent: shard the
dense level arrays over a device Mesh along the cell axes and let the
XLA SPMD partitioner turn every stencil pad/shift into ICI halo
collectives.  No hand-written communication is needed: the same
jnp-level advance() runs on 1 or N chips; only the shardings differ.

Reductions (ComputeDt's max-CFL, residual norms in the multigrid
while_loops) lower to cross-device all-reduces automatically.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from incflo_tpu.state import LevelState, SimState


def _factor2(n: int):
    """Split n into two near-square factors."""
    a = int(math.isqrt(n))
    while n % a:
        a -= 1
    return max(a, n // a), min(a, n // a)


def make_mesh(devices: Optional[Sequence] = None,
              axis_names=("dx", "dy")) -> Mesh:
    """2D device mesh over the first two grid axes."""
    devices = list(devices if devices is not None else jax.devices())
    a, b = _factor2(len(devices))
    dev = np.asarray(devices).reshape(a, b)
    return Mesh(dev, axis_names)


def _axis_spec(shape, grid_ndim: int, mesh: Mesh) -> P:
    """Spec sharding the first two grid axes of `shape`, but only where
    the extent divides the mesh axis evenly: nodal arrays carry n+1
    extents on non-periodic axes (e.g. pressure at 17 nodes over a
    4-way mesh axis), and device_put/jit reject uneven shardings.
    Undivisible axes replicate; GSPMD still distributes the interior
    solve via sharding propagation from the divisible operands."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    parts = []
    for i, n in enumerate(shape):
        ax = mesh.axis_names[i] if i < min(2, grid_ndim, len(mesh.axis_names)) \
            else None
        parts.append(ax if ax is not None and n % sizes[ax] == 0 else None)
    return P(*parts)


def level_specs(lvl: LevelState, grid_ndim: int, mesh: Mesh) -> LevelState:
    """PartitionSpecs for every LevelState field: shard the first two
    cell axes over the mesh (where even), replicate component axes."""
    return jax.tree.map(
        lambda a: _axis_spec(a.shape, grid_ndim, mesh), lvl)


def sim_state_shardings(state: SimState, mesh: Mesh) -> SimState:
    if np.prod(mesh.devices.shape) > 1:
        # whole-array Pallas kernels must not see sharded operands;
        # kernels with shard_map wrappers read the registered mesh
        from incflo_tpu.ops import pallas_guard
        pallas_guard.set_sharded(True)
        pallas_guard.set_mesh(mesh)
    ndim = state.level.density.ndim
    lvl = level_specs(state.level, ndim, mesh)
    rep = P()
    mk = lambda spec: NamedSharding(mesh, spec)
    return SimState(level=jax.tree.map(mk, lvl), t=mk(rep), dt=mk(rep),
                    prev_dt=mk(rep), prev_prev_dt=mk(rep), step=mk(rep))


def shard_sim_state(state: SimState, mesh: Mesh) -> SimState:
    sh = sim_state_shardings(state, mesh)
    return jax.tree.map(jax.device_put, state, sh)
