"""Process-global guard for Pallas kernel dispatch under sharding.

The fused MG smoother kernels are whole-array `pallas_call`s: feeding
them a GSPMD-sharded operand would force XLA to all-gather the full
array onto every device (silently destroying the domain decomposition)
or fail to partition.  Sharding is data-driven (jit propagates it from
the inputs), so the operand's placement is NOT visible at trace time --
drivers that shard the simulation state flip this flag instead
(parallel.mesh.sim_state_shardings / shard_sim_state), and every Pallas
`enabled()` consults it.
"""

_sharded = False

# the driver's jax.sharding.Mesh, registered alongside set_sharded so
# kernels that DO support sharding (shard_map halo-exchange wrappers,
# ops/pallas_godunov.predict_sharded) can build their collectives; None
# when the run is unsharded or the driver never registered one
_mesh = None


def set_mesh(mesh) -> None:
    global _mesh
    _mesh = mesh


def mesh():
    return _mesh

# set while TRACING the fused whole-step kernel (ops/pallas_step2d):
# code under this flag must emit only Mosaic-lowerable primitives --
# no lax.while_loop (data-dependent trip counts), no FFT, no nested
# pallas_call.  Solver code consults it to pick fixed-trip-count
# equivalents of its adaptive loops.
_in_kernel = False


def set_sharded(flag: bool = True) -> None:
    global _sharded
    _sharded = bool(flag)


def sharded() -> bool:
    return _sharded


def set_in_kernel(flag: bool = True) -> None:
    global _in_kernel
    _in_kernel = bool(flag)


def in_kernel() -> bool:
    return _in_kernel
