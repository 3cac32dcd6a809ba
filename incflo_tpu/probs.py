"""Problem library: initial-condition registry keyed by incflo.probtype.

Vectorised re-expression of reference src/prob/prob_init_fluid.cpp:6-683.
Coordinate conventions follow the reference exactly: most probtypes use
x=(i+0.5)*dx (no prob_lo offset); rayleigh_taylor adds prob_lo.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from incflo_tpu.config import IncfloConfig
from incflo_tpu.grid import Grid
from incflo_tpu.state import LevelState, zeros_level
from incflo_tpu.ops.mathutil import safe_tanh

TWOPI = 2.0 * math.pi
PI = math.pi


def _coords_no_offset(grid: Grid, dtype):
    """(i+0.5)*dx per axis in the ROOT-DOMAIN index frame, broadcastable
    (the reference's common idiom: coordinates from the global fine
    index, so a window grid -- an AMR patch -- must add its offset from
    the root origin or its ICs evaluate in the wrong place)."""
    out = []
    for ax in range(grid.ndim):
        off = grid.prob_lo[ax] - grid.origin[ax]
        c = off + (np.arange(grid.n_cell[ax]) + 0.5) * grid.dx[ax]
        shape = [1] * grid.ndim
        shape[ax] = -1
        out.append(jnp.asarray(c.reshape(shape), dtype=dtype))
    return out


def _coords_with_offset(grid: Grid, dtype):
    out = []
    for ax in range(grid.ndim):
        c = grid.prob_lo[ax] + (np.arange(grid.n_cell[ax]) + 0.5) * grid.dx[ax]
        shape = [1] * grid.ndim
        shape[ax] = -1
        out.append(jnp.asarray(c.reshape(shape), dtype=dtype))
    return out


def init_fluid(cfg: IncfloConfig, grid: Grid, dtype) -> LevelState:
    """prob_init_fluid: build t=0 LevelState on `grid`."""
    st = zeros_level(grid, cfg.ntrac, dtype)
    cs = grid.cell_shape
    nd = grid.ndim
    pt = cfg.probtype

    density = jnp.full(cs, cfg.ro_0, dtype)
    vel_comps = [jnp.full(cs, v, dtype)
                 for v in (cfg.ic_u, cfg.ic_v, cfg.ic_w)[:nd]]
    tracer = jnp.zeros(cs + (cfg.ntrac,), dtype)

    if pt in (0, 114):
        pass
    elif pt == 1:  # Taylor-Green 2D (steady-error harness)
        x, y = _coords_no_offset(grid, dtype)[:2]
        u = jnp.sin(TWOPI * x) * jnp.cos(TWOPI * y)
        v = -jnp.cos(TWOPI * x) * jnp.sin(TWOPI * y)
        vel_comps[0] = jnp.broadcast_to(u, cs)
        vel_comps[1] = jnp.broadcast_to(v, cs)
        if nd == 3:
            vel_comps[2] = jnp.zeros(cs, dtype)
    elif pt == 2:  # decaying Taylor vortex (convergence harness)
        x, y = _coords_no_offset(grid, dtype)[:2]
        u0 = v0 = 1.0
        u = u0 - jnp.cos(PI * x) * jnp.sin(PI * y)
        v = v0 + jnp.sin(PI * x) * jnp.cos(PI * y)
        vel_comps[0] = jnp.broadcast_to(u, cs)
        vel_comps[1] = jnp.broadcast_to(v, cs)
        if nd == 3:
            vel_comps[2] = jnp.zeros(cs, dtype)
    elif pt == 3:  # Taylor-Green 3D
        x, y, z = _coords_no_offset(grid, dtype)
        u = jnp.sin(TWOPI * x) * jnp.cos(TWOPI * y) * jnp.cos(TWOPI * z)
        v = -jnp.cos(TWOPI * x) * jnp.sin(TWOPI * y) * jnp.cos(TWOPI * z)
        vel_comps[0] = jnp.broadcast_to(u, cs)
        vel_comps[1] = jnp.broadcast_to(v, cs)
        vel_comps[2] = jnp.zeros(cs, dtype)
    elif pt == 4:  # couette: u *= (y-0.5) with y=(j+0.5)/ny
        yn = (np.arange(grid.n_cell[1]) + 0.5) / grid.n_cell[1]
        shape = [1] * nd
        shape[1] = -1
        yn = jnp.asarray(yn.reshape(shape), dtype=dtype)
        vel_comps[0] = vel_comps[0] * jnp.broadcast_to(yn - 0.5, cs)
        for d in range(1, nd):
            vel_comps[d] = jnp.zeros(cs, dtype)
    elif pt == 5:  # rayleigh-taylor
        coords = _coords_with_offset(grid, dtype)
        rho_1, rho_2 = 0.5, 2.0
        tra_1, tra_2 = 0.0, 1.0
        width = 0.005
        splitx = 0.5 * (grid.prob_lo[0] + grid.prob_hi[0])
        L_x = grid.prob_hi[0] - grid.prob_lo[0]
        for d in range(nd):
            vel_comps[d] = jnp.zeros(cs, dtype)
        if nd == 2:
            x, y = coords
            r2d = jnp.minimum(jnp.abs(x - splitx), 0.5 * L_x)
            pert = 0.5 - 0.01 * jnp.cos(2.0 * PI * r2d / L_x)
            prof = 0.5 * (1.0 + safe_tanh((y - pert) / width))
        else:
            x, y, z = coords
            splity = 0.5 * (grid.prob_lo[1] + grid.prob_hi[1])
            r2d = jnp.minimum(jnp.hypot(x - splitx, y - splity), 0.5 * L_x)
            pert = 0.5 - 0.01 * jnp.cos(2.0 * PI * r2d / L_x)
            prof = 0.5 * (1.0 + safe_tanh((z - pert) / width))
        density = jnp.broadcast_to(rho_1 + (rho_2 - rho_1) * prof, cs)
        tra = jnp.broadcast_to(tra_1 + (tra_2 - tra_1) * prof, cs)
        tracer = tracer.at[..., 0].set(tra)
    elif pt == 11:  # tuscan
        half = grid.n_cell[nd - 1] // 2
        kidx = np.arange(grid.n_cell[nd - 1])
        shape = [1] * nd
        shape[nd - 1] = -1
        mask = jnp.asarray((kidx > half).reshape(shape))
        for d in range(nd):
            vel_comps[d] = jnp.zeros(cs, dtype)
        density = jnp.ones(cs, dtype)
        tracer = tracer.at[..., 0].set(
            jnp.broadcast_to(jnp.where(mask, 0.01, 0.0).astype(dtype), cs))
    elif pt in (111, 112, 113):  # boussinesq bubble
        coords = _coords_no_offset(grid, dtype)
        for d in range(nd):
            vel_comps[d] = jnp.zeros(cs, dtype)
        density = jnp.ones(cs, dtype)
        if nd == 2:
            x, y = coords
            r = jnp.sqrt((x - 0.25) ** 2 + (y - 0.5) ** 2)
        else:
            x, y, z = coords
            if pt == 111:
                r = jnp.sqrt((x - 0.5) ** 2 + (y - 0.25) ** 2 + (z - 0.25) ** 2)
            elif pt == 112:
                r = jnp.sqrt((x - 0.25) ** 2 + (y - 0.5) ** 2 + (z - 0.25) ** 2)
            else:
                r = jnp.sqrt((x - 0.25) ** 2 + (y - 0.25) ** 2 + (z - 0.5) ** 2)
        tracer = tracer.at[..., 0].set(
            jnp.broadcast_to(jnp.where(r < 0.1, 0.0, 0.01).astype(dtype), cs))
    elif pt == 12:  # periodic tracer
        coords = _coords_no_offset(grid, dtype)
        L = grid.prob_hi[0] - grid.prob_lo[0]
        C = TWOPI / L
        A = 1.0
        vel_comps[0] = jnp.ones(cs, dtype)
        if nd == 3:
            x, y, z = coords
            vel_comps[1] = jnp.broadcast_to(
                0.1 * (jnp.sin(C * (x + z) - 0.00042) + 1.0) * jnp.exp(y), cs)
            vel_comps[2] = jnp.broadcast_to(
                0.1 * (jnp.sin(C * (x + y) - 0.00042) + 1.0) * jnp.exp(z), cs)
            tracer = tracer.at[..., 0].set(jnp.broadcast_to(
                A * (jnp.sin(C * (y + z) - 0.00042) + 1.0) * jnp.exp(x), cs))
        else:
            # 2D reduction (the reference only defines probtype 12 in 3D)
            x, y = coords
            vel_comps[1] = jnp.broadcast_to(
                0.1 * (jnp.sin(C * x - 0.00042) + 1.0) * jnp.exp(y), cs)
            tracer = tracer.at[..., 0].set(jnp.broadcast_to(
                A * (jnp.sin(C * y - 0.00042) + 1.0) * jnp.exp(x), cs))
    elif pt in (21, 22, 23):  # double shear layer
        coords = _coords_no_offset(grid, dtype)
        if pt == 21:
            x, y = coords[0], coords[1]
            vel_comps[0] = jnp.broadcast_to(
                safe_tanh(30.0 * (0.25 - jnp.abs(y - 0.5))), cs)
            vel_comps[1] = jnp.broadcast_to(0.05 * jnp.sin(TWOPI * x), cs)
            if nd == 3:
                vel_comps[2] = jnp.zeros(cs, dtype)
            r = jnp.sqrt((x - 0.5) ** 2 + (y - 0.25) ** 2)
        elif pt == 22:
            y, z = coords[1], coords[2]
            vel_comps[1] = jnp.broadcast_to(
                safe_tanh(30.0 * (0.25 - jnp.abs(z - 0.5))), cs)
            vel_comps[2] = jnp.broadcast_to(0.05 * jnp.sin(TWOPI * y), cs)
            vel_comps[0] = jnp.zeros(cs, dtype)
            r = jnp.sqrt((y - 0.5) ** 2 + (z - 0.5) ** 2)
        else:
            x, z = coords[0], coords[2]
            vel_comps[2] = jnp.broadcast_to(
                safe_tanh(30.0 * (0.25 - jnp.abs(x - 0.5))), cs)
            vel_comps[0] = jnp.broadcast_to(0.05 * jnp.sin(TWOPI * z), cs)
            vel_comps[1] = jnp.zeros(cs, dtype)
            r = jnp.sqrt((x - 0.5) ** 2 + (z - 0.5) ** 2)
        tracer = tracer.at[..., 0].set(
            jnp.broadcast_to(jnp.where(r < 0.1, 0.0, 0.01).astype(dtype), cs))
    elif pt in (31, 311, 32, 322, 33, 333, 41):
        vel_comps, tracer = _init_plane_poiseuille(cfg, grid, cs, nd, dtype,
                                                   vel_comps, tracer)
    elif pt == 6:
        # channel_slant (EB rotated cylinder; reference
        # prob_init_fluid.cpp:230-265): with cylinder.rotation > 0 the
        # velocity is aligned with the rotated axis and tracer bands are
        # laid along x.
        rotation = 0.0
        if cfg.pp is not None:
            rotation = float(cfg.pp.scoped("cylinder").query("rotation", 0))
        rotation = rotation / 180.0 * math.pi
        if rotation > 0:
            u = cfg.ic_u
            vel_comps[0] = jnp.full(cs, u * math.cos(rotation), dtype)
            vel_comps[1] = jnp.full(cs, u * math.sin(rotation), dtype)
            if nd == 3:
                vel_comps[2] = jnp.zeros(cs, dtype)
            idx = _index_coord(grid, 0, nd)
            dhi = grid.n_cell[0] - 1
            vals = jnp.zeros(cs + (cfg.ntrac,), dtype)
            if cfg.ntrac > 0:
                vals = vals.at[..., 0].set(jnp.broadcast_to(
                    jnp.where(idx <= dhi // 8, 1.0, 0.0).astype(dtype), cs))
            if cfg.ntrac > 1:
                vals = vals.at[..., 1].set(jnp.broadcast_to(
                    jnp.where(idx <= dhi // 2, 2.0, 0.0).astype(dtype), cs))
            if cfg.ntrac > 2:
                vals = vals.at[..., 2].set(jnp.broadcast_to(
                    jnp.where(idx <= dhi * 3 // 4, 3.0, 0.0).astype(dtype), cs))
            tracer = vals
    else:
        raise ValueError(f"prob_init_fluid: unknown probtype {pt}")

    velocity = jnp.stack(vel_comps, axis=-1)
    return st._replace(velocity=velocity, density=density, tracer=tracer)


def _norm_coord(grid, axis, nd, dtype):
    c = (np.arange(grid.n_cell[axis]) + 0.5) / grid.n_cell[axis]
    shape = [1] * nd
    shape[axis] = -1
    return jnp.asarray(c.reshape(shape), dtype=dtype)


def _index_coord(grid, axis, nd):
    c = np.arange(grid.n_cell[axis])
    shape = [1] * nd
    shape[axis] = -1
    return jnp.asarray(c.reshape(shape))


def _init_plane_poiseuille(cfg, grid, cs, nd, dtype, vel_comps, tracer):
    """probtypes 31/311/41/32/322/33/333 (reference prob_init_fluid.cpp:526-683)."""
    pt = cfg.probtype
    ntrac = cfg.ntrac
    for d in range(nd):
        vel_comps[d] = jnp.zeros(cs, dtype)

    def parab(axis, amp):
        s = _norm_coord(grid, axis, nd, dtype)
        return jnp.broadcast_to(6.0 * amp * s * (1.0 - s), cs)

    tr_axis = 0
    if pt == 31:
        vel_comps[0] = parab(1, cfg.ic_u)
        tr_axis = 0
    elif pt == 311:
        vel_comps[0] = parab(2, cfg.ic_u)
        tr_axis = 0
    elif pt == 41:
        z = _norm_coord(grid, 2, nd, dtype)
        vel_comps[0] = jnp.broadcast_to(0.5 * z, cs)
        tr_axis = 0
    elif pt == 32:
        vel_comps[1] = parab(2, cfg.ic_v)
        tr_axis = 1
    elif pt == 322:
        vel_comps[1] = parab(0, cfg.ic_v)
        tr_axis = 1
    elif pt == 33:
        vel_comps[2] = parab(0, cfg.ic_w)
        tr_axis = 2
    elif pt == 333:
        vel_comps[2] = parab(1, cfg.ic_w)
        tr_axis = 2

    idx = _index_coord(grid, tr_axis, nd)
    dhi = grid.n_cell[tr_axis] - 1
    vals = jnp.zeros(cs + (ntrac,), dtype)
    if ntrac > 0:
        vals = vals.at[..., 0].set(jnp.broadcast_to(
            jnp.where(idx <= dhi // 8, 1.0, 0.0).astype(dtype), cs))
    if ntrac > 1:
        vals = vals.at[..., 1].set(jnp.broadcast_to(
            jnp.where(idx <= dhi // 2, 2.0, 0.0).astype(dtype), cs))
    if ntrac > 2:
        vals = vals.at[..., 2].set(jnp.broadcast_to(
            jnp.where(idx <= dhi * 3 // 4, 3.0, 0.0).astype(dtype), cs))
    return vel_comps, vals
