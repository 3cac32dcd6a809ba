"""Adaptive mesh refinement, TPU-native "dense" design.

The reference manages AMR as BoxArrays of tagged patches regridded every
`regrid_int` steps (AmrCore; SURVEY.md 3.5).  Dynamic box lists are
hostile to XLA's static-shape compilation model, so this framework makes
a deliberately different architectural choice:

  * The solution is ADVANCED on the finest level's dense uniform grid
    (n_cell * 2^max_level).  On TPU, dense regular compute is the
    efficient representation; the whole hierarchy advances with one
    jit-compiled step and no subcycling, exactly like the reference's
    no-subcycling scheme collapsed onto its finest resolution.  The
    computed solution is at least as accurate as box-based AMR (no
    coarse-fine interpolation error anywhere).
  * The AMR STRUCTURE is preserved as data: ErrorEst tagging (rho /
    grad-rho thresholds, static regions, cut cells; reference
    incflo_tagging.cpp:11-141) produces per-level refinement masks on
    the regrid_int cadence.  Masks are runtime arrays, so "regrid"
    never triggers recompilation.
  * Plotfiles/checkpoints expose the standard multi-level hierarchy:
    level l data is the fine solution averaged down to level l's
    resolution plus its refinement mask, so downstream tooling sees the
    same level structure the reference would produce.

This trades the memory/FLOP savings of patch-based AMR for dense-grid
throughput.  The PATCH mode delivering real savings is
incflo_tpu/amr_patch.py (slab patches with coarse-fine fillpatch,
Dirichlet solver closures, and average_down sync), selected with
`amr.patch_mode = slab`; this dense mode remains the default because it
is the more accurate hierarchy (no coarse-fine interpolation error) and
the faster one whenever the refined region is a large fraction of the
domain.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from incflo_tpu.config import IncfloConfig
from incflo_tpu.grid import Grid
from incflo_tpu.simulation import Simulation
from incflo_tpu.state import LevelState, SimState


def average_down(field: jnp.ndarray, ratio: int, ndim: int) -> jnp.ndarray:
    """2^d-child averaging, `ratio` must be a power of 2 (amrex
    average_down)."""
    out = field
    r = ratio
    while r > 1:
        for ax in range(ndim):
            n = out.shape[ax]
            lo = [slice(None)] * out.ndim
            hi = [slice(None)] * out.ndim
            lo[ax] = slice(0, n, 2)
            hi[ax] = slice(1, n, 2)
            out = 0.5 * (out[tuple(lo)] + out[tuple(hi)])
        r //= 2
    return out


def _dilate(mask: jnp.ndarray, n: int, grid: Grid) -> jnp.ndarray:
    """Grow a boolean mask by n cells (error buffer)."""
    m = mask.astype(jnp.float32)
    for _ in range(n):
        acc = m
        for ax in range(grid.ndim):
            if grid.periodic[ax]:
                up = jnp.roll(m, 1, axis=ax)
                dn = jnp.roll(m, -1, axis=ax)
            else:
                pad = [(0, 0)] * m.ndim
                pad[ax] = (1, 1)
                mp = jnp.pad(m, pad)
                sl_up = [slice(None)] * m.ndim
                sl_dn = [slice(None)] * m.ndim
                sl_up[ax] = slice(0, m.shape[ax])
                sl_dn[ax] = slice(2, m.shape[ax] + 2)
                up, dn = mp[tuple(sl_up)], mp[tuple(sl_dn)]
            acc = jnp.maximum(acc, jnp.maximum(up, dn))
        m = acc
    return m > 0.5


class AMRSimulation:
    """Driver for amr.max_level > 0 decks."""

    def __init__(self, cfg: IncfloConfig):
        self.cfg = cfg
        self.base_grid = cfg.grid
        self.max_level = cfg.max_level
        self.ratio = cfg.ref_ratio
        fine_factor = self.ratio ** self.max_level
        fine_grid = Grid(tuple(n * fine_factor for n in cfg.grid.n_cell),
                         cfg.grid.prob_lo, cfg.grid.prob_hi,
                         cfg.grid.periodic)
        self.fine_cfg = dataclasses.replace(cfg, grid=fine_grid)
        self.sim = Simulation(self.fine_cfg)
        self.dtype = self.sim.dtype
        # per-level refinement masks at each level's own resolution:
        # masks[l] marks the region covered by level l+1 (l < max_level)
        self.masks: List[Optional[jnp.ndarray]] = [None] * self.max_level
        self._tag = jax.jit(self._tag_impl)

    # ------------------------------------------------------------------
    def level_grid(self, lev: int) -> Grid:
        f = self.ratio ** lev
        return Grid(tuple(n * f for n in self.base_grid.n_cell),
                    self.base_grid.prob_lo, self.base_grid.prob_hi,
                    self.base_grid.periodic)

    def level_view(self, s: SimState, lev: int) -> LevelState:
        """Level-l view of the solution (average_down of the fine data)."""
        r = self.ratio ** (self.max_level - lev)
        nd = self.base_grid.ndim
        lvl = s.level
        if r == 1:
            return lvl
        return LevelState(
            velocity=average_down(lvl.velocity, r, nd),
            density=average_down(lvl.density, r, nd),
            tracer=average_down(lvl.tracer, r, nd),
            gp=average_down(lvl.gp, r, nd),
            p=lvl.p[tuple(slice(0, n, r) for n in lvl.p.shape)],
            mac_phi=average_down(lvl.mac_phi, r, nd),
        )

    # ------------------------------------------------------------------
    # ErrorEst (reference incflo_tagging.cpp)
    # ------------------------------------------------------------------
    def _tag_impl(self, fine_density: jnp.ndarray):
        cfg = self.cfg
        masks = []
        for lev in range(self.max_level):
            g = self.level_grid(lev)
            r = self.ratio ** (self.max_level - lev)
            rho = average_down(fine_density, r, g.ndim)
            tags = jnp.zeros(g.cell_shape, bool)
            if lev < len(cfg.rhoerr):
                tags = jnp.logical_or(tags, rho > cfg.rhoerr[lev])
            if lev < len(cfg.gradrhoerr):
                thr = cfg.gradrhoerr[lev]
                for ax in range(g.ndim):
                    if g.periodic[ax]:
                        dp = jnp.abs(jnp.roll(rho, -1, axis=ax) - rho)
                        dm = jnp.abs(rho - jnp.roll(rho, 1, axis=ax))
                    else:
                        pad = [(0, 0)] * rho.ndim
                        pad[ax] = (1, 1)
                        rp = jnp.pad(rho, pad, mode="edge")
                        n = rho.shape[ax]
                        sl = lambda a, b: tuple(
                            slice(a, b) if x == ax else slice(None)
                            for x in range(rho.ndim))
                        dp = jnp.abs(rp[sl(2, n + 2)] - rho)
                        dm = jnp.abs(rho - rp[sl(0, n)])
                    tags = jnp.logical_or(tags, jnp.maximum(dp, dm) > thr)
            if cfg.tag_region:
                coords = [jnp.asarray(g.cell_centers_1d(ax)).reshape(
                    [-1 if a == ax else 1 for a in range(g.ndim)])
                    for ax in range(g.ndim)]
                inside = jnp.ones(g.cell_shape, bool)
                for ax in range(g.ndim):
                    inside = jnp.logical_and(
                        inside, jnp.logical_and(
                            coords[ax] >= cfg.tag_region_lo[ax],
                            coords[ax] <= cfg.tag_region_hi[ax])
                        | jnp.zeros(g.cell_shape, bool))
                tags = jnp.logical_or(tags, inside)
            if self.sim.eb is not None:
                # TagCutCells (forced on with EB)
                cut_fine = self.sim.eb.cut > 0.5
                cut_lev = average_down(cut_fine.astype(jnp.float32), r,
                                       g.ndim) > 0.0
                tags = jnp.logical_or(tags, cut_lev)
            tags = _dilate(tags, 2, g)   # n_error_buf-style buffer
            masks.append(tags)
        return masks

    def regrid(self, s: SimState):
        self.masks = self._tag(s.level.density)

    # ------------------------------------------------------------------
    def init_state(self) -> SimState:
        s = self.sim.init_state()
        self.regrid(s)
        return s

    def advance(self, s: SimState) -> SimState:
        s = self.sim.advance(s)
        if self.cfg.regrid_int > 0 and int(s.step) % self.cfg.regrid_int == 0:
            self.regrid(s)
        return s
