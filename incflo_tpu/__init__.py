"""incflo_tpu: a TPU-native incompressible Navier-Stokes engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of incflo
(adaptive-mesh, variable-density incompressible Navier-Stokes with no
subcycling in time).  Governing equations (see reference
Docs/sphinx_documentation/source/FluidEquations.rst:19-36):

    d(rho)/dt   + div(rho U)      = 0
    d(rho U)/dt + div(rho U U) + grad(p) = div(tau) + rho g
    div(U) = 0
    d(rho s)/dt + div(rho U s)    = div(mu_s grad s) + rho f_s

Staggering: velocity/density/tracer at cell centers, pressure at nodes,
MAC advection velocities at faces.

Design (TPU-first, not a port):
  * State is a pytree of dense jnp arrays (no ghost cells stored);
    ghost bands are materialised functionally by `bcs.grow` and fused
    into consumers by XLA.
  * One `advance()` = one jit-compiled XLA program (dt reduce, MAC
    projection multigrid, advection, diffusion solves, nodal projection
    multigrid all inside).
  * Linear solves are matrix-free geometric multigrid in pure JAX
    (ops/multigrid.py) instead of AMReX MLMG.
  * Multi-chip: shard the cell arrays over a jax.sharding.Mesh and let
    GSPMD turn the stencil pads/shifts into ICI halo exchanges
    (parallel/mesh.py); no hand-written MPI analogue is needed.
"""

__version__ = "0.1.0"

from incflo_tpu.parmparse import ParmParse
from incflo_tpu.grid import Grid
from incflo_tpu.config import IncfloConfig

__all__ = ["ParmParse", "Grid", "IncfloConfig"]
