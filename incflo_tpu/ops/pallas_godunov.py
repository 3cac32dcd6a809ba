"""Pallas TPU kernels: fused Godunov corner-transport-upwind advection.

The jnp Godunov chain (ops/godunov.py) is the largest device cost of the
flagship step (predict 1.8 ms + advect 2.5 ms of 8.7 ms at 128x128x32
f32, round-2 PERF.md) because XLA materializes dozens of trace/edge/
corner intermediates in HBM and launches hundreds of small kernels.
These kernels run the ENTIRE chain -- PPM/PLM characteristic traces,
transverse-velocity Riemann solves, 3D corner coupling, final upwinding
and (for advect) the flux divergence -- in one `pallas_call` over
VMEM-resident x-slabs, touching HBM once per input and once per output.

Data layout (same as ops/pallas_smoother.py): (y, z) merged into the
lane axis (m = ny*nz, m % 128 == 0), tiling over x slabs with a 4-cell
halo DMA'd from HBM.  Neighbor access:
  x +- s  -> sublane roll (wrap garbage stays in the halo rows: the CTU
             chain consumes <= 4 cells of x extent, see module tests)
  y +- s  -> lane roll by s*nz (EXACT for periodic y)
  z +- 1  -> lane roll by 1 with a masked wrap fix at the z edges
             (exact for periodic z); z +- 2 = two applications

Scope: 3D, float32, ALL axes periodic, no EB (EB decks dispatch through
MOL anyway -- simulation.py:49-66), use_forces_in_trans=False,
use_mac_phi_in_godunov=False.  Anything else falls back to the jnp path.

Face-array convention in-kernel: a face field is stored CELL-shaped,
entry i = the LO face of cell i (periodic face n coincides with face 0);
the hi face of cell i is a +1 shift.  Reference semantics mirrored from
src/convection/incflo_godunov_{ppm.H,plm.H,predict_3D.cpp,
advection_3D.cpp} via the jnp implementation in ops/godunov.py.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:   # pragma: no cover
    HAVE_PALLAS = False

INTERPRET = False

SMALL_VEL = 1.0e-8          # reference incflo_godunov_ppm.H:16
HALO = 4
VMEM_BUDGET = 11 * 1024 * 1024
# live-array estimates for tile sizing (validated against Mosaic's
# scoped-vmem accounting on a v5e at m = 4096)
N_LIVE_PREDICT = 30
N_LIVE_ADVECT = 26


def _roll(a, shift, axis):
    if INTERPRET or not HAVE_PALLAS:
        return jnp.roll(a, shift, axis=axis)
    return pltpu.roll(a, shift % a.shape[axis], axis=axis)


def _sh1(a, axis, sgn, ny, nz):
    """a(idx + sgn*e_axis) by one cell, merged (y,z) lanes, periodic y/z.
    Along x the roll wraps slab rows; the wrapped rows are halo-only."""
    if axis == 0:
        return _roll(a, -sgn, 0)
    if axis == 1:
        return _roll(a, -sgn * nz, 1)
    r = _roll(a, -sgn, 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    kk = idx % nz
    if sgn > 0:
        return jnp.where(kk == nz - 1, _roll(a, nz - 1, 1), r)
    return jnp.where(kk == 0, _roll(a, -(nz - 1), 1), r)


def _sh(a, axis, s, ny, nz):
    if s == 0:
        return a
    sgn = 1 if s > 0 else -1
    for _ in range(abs(s)):
        a = _sh1(a, axis, sgn, ny, nz)
    return a


def _van_leer(a, b, c):
    """vanLeer(center, plus, minus) (godunov_ppm.H:18-28)."""
    dsc = 0.5 * (b - c)
    dsl = 2.0 * (a - c)
    dsr = 2.0 * (b - a)
    lim = jnp.sign(dsc) * jnp.minimum(
        jnp.abs(dsc), jnp.minimum(jnp.abs(dsl), jnp.abs(dsr)))
    return jnp.where(dsl * dsr > 1.0e-20, lim, 0.0)


def _mc2_parts(a, b, c):
    dl = 2.0 * (b - a)
    dr = 2.0 * (c - b)
    dc = 0.5 * (c - a)
    dlim = jnp.where(dl * dr >= 0.0,
                     jnp.minimum(jnp.abs(dl), jnp.abs(dr)), 0.0)
    return dc, dlim


def _mc4(qm2, qm1, q0, qp1, qp2):
    """Order-4 MC slope (amrex_calc_xslope order 4; periodic interior)."""
    dcm, dlimm = _mc2_parts(qm2, qm1, q0)
    sm = jnp.sign(dcm) * jnp.minimum(jnp.abs(dcm), dlimm)
    dcp, dlimp = _mc2_parts(q0, qp1, qp2)
    sp = jnp.sign(dcp) * jnp.minimum(jnp.abs(dcp), dlimp)
    dc, dlim = _mc2_parts(qm1, q0, qp1)
    dq = (4.0 / 3.0) * dc - (1.0 / 6.0) * (sp + sm)
    return jnp.sign(dq) * jnp.minimum(jnp.abs(dq), dlim)


def _upwind(lo, hi, w):
    st = jnp.where(w >= 0.0, lo, hi)
    return jnp.where(jnp.abs(w) < SMALL_VEL, 0.5 * (hi + lo), st)


def _riemann(stl, sth):
    st = jnp.where(stl + sth >= 0.0, stl, sth)
    ltm = jnp.logical_or(jnp.logical_and(stl <= 0.0, sth >= 0.0),
                         jnp.abs(stl + sth) < SMALL_VEL)
    return jnp.where(ltm, 0.0, st)


def _traces(q, ax, wlo, whi, dtdx, use_ppm, ny, nz):
    """Per-cell characteristic traces (Im, Ip) along axis `ax` with wave
    speeds wlo/whi at the cell's lo/hi faces (godunov.py _ppm_traces /
    _plm_traces, periodic interior forms)."""
    sm2 = _sh(q, ax, -2, ny, nz)
    sm1 = _sh(q, ax, -1, ny, nz)
    s0 = q
    sp1 = _sh(q, ax, 1, ny, nz)
    sp2 = _sh(q, ax, 2, ny, nz)
    if not use_ppm:
        slp = _mc4(sm2, sm1, s0, sp1, sp2)
        Im = s0 + 0.5 * (-1.0 - wlo * dtdx) * slp
        Ip = s0 + 0.5 * (1.0 - whi * dtdx) * slp
        return Im, Ip

    d1 = _van_leer(s0, sp1, sm1)
    d2 = _van_leer(sm1, s0, sm2)
    sedge1 = 0.5 * (s0 + sm1) - (1.0 / 6.0) * (d1 - d2)
    sedge1 = jnp.clip(sedge1, jnp.minimum(s0, sm1), jnp.maximum(s0, sm1))
    d1p = _van_leer(sp1, sp2, s0)
    sedge2 = 0.5 * (sp1 + s0) - (1.0 / 6.0) * (d1p - d1)
    sedge2 = jnp.clip(sedge2, jnp.minimum(s0, sp1), jnp.maximum(s0, sp1))

    flat = (sedge2 - s0) * (s0 - sedge1) < 0.0
    big_p = jnp.abs(sedge2 - s0) >= 2.0 * jnp.abs(sedge1 - s0)
    big_m = jnp.abs(sedge1 - s0) >= 2.0 * jnp.abs(sedge2 - s0)
    sp = jnp.where(flat, s0,
                   jnp.where(big_p, 3.0 * s0 - 2.0 * sedge1, sedge2))
    sm = jnp.where(flat, s0,
                   jnp.where(jnp.logical_and(~big_p, big_m),
                             3.0 * s0 - 2.0 * sedge2, sedge1))

    s6 = 6.0 * s0 - 3.0 * (sm + sp)
    sig_p = jnp.abs(whi) * dtdx
    sig_m = jnp.abs(wlo) * dtdx
    Ip = jnp.where(whi > SMALL_VEL,
                   sp - 0.5 * sig_p * ((sp - sm)
                                       - (1.0 - 2.0 / 3.0 * sig_p) * s6),
                   s0)
    Im = jnp.where(wlo < -SMALL_VEL,
                   sm + 0.5 * sig_m * ((sp - sm)
                                       + (1.0 - 2.0 / 3.0 * sig_m) * s6),
                   s0)
    return Im, Ip


# ---------------------------------------------------------------------
# MAC prediction kernels
#
# The whole chain in one kernel needs ~21 MB of scoped VMEM at m = 4096
# (measured) -- over the 16 MB v5e limit.  Split: a small kernel for the
# three transverse Riemann velocities u_ad, then one kernel per output
# direction d (each re-traces component d along all axes and reads u_ad
# back from HBM).  4 dispatches instead of the jnp path's hundreds.
# ---------------------------------------------------------------------

def _start_wait(in_refs, slabs, sems, cx, S):
    copies = [pltpu.make_async_copy(r.at[pl.ds(cx, S)], s, sems.at[i])
              for i, (r, s) in enumerate(zip(in_refs, slabs))]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


def _uad_kernel(TB, ny, nz, dx, use_ppm, dt_ref, *refs):
    """u_ad[ax]: Riemann-selected own-component face velocity."""
    in_refs, out_refs, slabs, sems = refs[:3], refs[3:6], refs[6:9], refs[-1]
    cx = pl.program_id(0) * TB
    S = TB + 2 * HALO
    _start_wait(in_refs, slabs, sems, cx, S)
    dt = dt_ref[0]
    vel = [slabs[i][...] for i in range(3)]
    for ax in range(3):
        Im, Ip = _traces(vel[ax], ax, vel[ax], vel[ax], dt / dx[ax],
                         use_ppm, ny, nz)
        lo = _sh(Ip, ax, -1, ny, nz)
        out_refs[ax][...] = _riemann(lo, Im)[HALO:HALO + TB]


def _predict_d_kernel(TB, ny, nz, dx, use_ppm, with_forces, d,
                      dt_ref, *refs):
    """Final MAC face state for direction d = component d."""
    n_in = 6 + (1 if with_forces else 0)
    in_refs = refs[:n_in]
    out_ref = refs[n_in]
    slabs = refs[n_in + 1:n_in + 1 + n_in]
    sems = refs[-1]
    cx = pl.program_id(0) * TB
    S = TB + 2 * HALO
    _start_wait(in_refs, slabs, sems, cx, S)
    dt = dt_ref[0]
    vel = [slabs[i][...] for i in range(3)]
    u_ad = [slabs[3 + i][...] for i in range(3)]
    Fc = slabs[6][...] if with_forces else None
    sh = lambda a, ax, s: _sh(a, ax, s, ny, nz)
    c = d

    # traces of component c along every axis (wave speed = cell velocity)
    xlo, xhi, edge = {}, {}, {}
    for ax in range(3):
        Im, Ip = _traces(vel[c], ax, vel[ax], vel[ax], dt / dx[ax],
                         use_ppm, ny, nz)
        xlo[ax] = sh(Ip, ax, -1)
        xhi[ax] = Im
        edge[ax] = _upwind(xlo[ax], xhi[ax], u_ad[ax])

    stl, sth = xlo[d], xhi[d]
    for t in (a for a in range(3) if a != d):
        o = 3 - d - t
        # corner-coupled t-face states (godunov.py _corner_stage,
        # non-conservative dt/6 correction from axis o)
        corr_o = (dt / (6.0 * dx[o])
                  * (sh(u_ad[o], o, 1) + u_ad[o])
                  * (sh(edge[o], o, 1) - edge[o]))
        lo_t = xlo[t] - sh(corr_o, t, -1)
        hi_t = xhi[t] - corr_o
        inter = _upwind(lo_t, hi_t, u_ad[t])
        # final transverse correction (dt/4)
        corr_t = (dt / (4.0 * dx[t])
                  * (sh(u_ad[t], t, 1) + u_ad[t])
                  * (sh(inter, t, 1) - inter))
        stl = stl - sh(corr_t, d, -1)
        sth = sth - corr_t
    if with_forces:
        stl = stl + 0.5 * dt * sh(Fc, d, -1)
        sth = sth + 0.5 * dt * Fc
    out_ref[...] = _riemann(stl, sth)[HALO:HALO + TB]


# ---------------------------------------------------------------------
# advective-update kernel
# ---------------------------------------------------------------------

def _advect_kernel(TB, ny, nz, dx, use_ppm, icons, with_forces,
                   dt_ref, *refs):
    """dq/dt for ONE component (one dispatch per component keeps the
    scoped-VMEM footprint well under the 16 MB limit)."""
    n_in = 4 + (1 if with_forces else 0)
    in_refs = refs[:n_in]
    out_ref = refs[n_in]
    slabs = refs[n_in + 1:n_in + 1 + n_in]
    sems = refs[-1]
    cx = pl.program_id(0) * TB
    S = TB + 2 * HALO
    _start_wait(in_refs, slabs, sems, cx, S)

    dt = dt_ref[0]
    q = slabs[0][...]
    mac = [slabs[1 + ax][...] for ax in range(3)]
    Fq = slabs[4][...] if with_forces else None
    sh = lambda a, ax, s: _sh(a, ax, s, ny, nz)
    mac_hi = [sh(mac[ax], ax, 1) for ax in range(3)]

    xlo, xhi, edge = {}, {}, {}
    for ax in range(3):
        Im, Ip = _traces(q, ax, mac[ax], mac_hi[ax], dt / dx[ax],
                         use_ppm, ny, nz)
        xlo[ax] = sh(Ip, ax, -1)
        xhi[ax] = Im
        edge[ax] = _upwind(xlo[ax], xhi[ax], mac[ax])

    rate = None
    for d in range(3):
        stl, sth = xlo[d], xhi[d]
        for t in (a for a in range(3) if a != d):
            o = 3 - d - t
            e_lo, e_hi = edge[o], sh(edge[o], o, 1)
            if icons:
                corr_o = (dt / (3.0 * dx[o])
                          * ((e_hi * mac_hi[o] - e_lo * mac[o])
                             - q * (mac_hi[o] - mac[o])))
            else:
                corr_o = (dt / (6.0 * dx[o])
                          * (mac_hi[o] + mac[o]) * (e_hi - e_lo))
            lo_t = xlo[t] - sh(corr_o, t, -1)
            hi_t = xhi[t] - corr_o
            inter = _upwind(lo_t, hi_t, mac[t])
            i_hi = sh(inter, t, 1)
            if icons:
                corr_t = (dt / (2.0 * dx[t])
                          * ((i_hi * mac_hi[t] - inter * mac[t])
                             - q * (mac_hi[t] - mac[t])))
            else:
                corr_t = (dt / (4.0 * dx[t])
                          * (mac_hi[t] + mac[t]) * (i_hi - inter))
            stl = stl - sh(corr_t, d, -1)
            sth = sth - corr_t
        if with_forces:
            stl = stl + 0.5 * dt * sh(Fq, d, -1)
            sth = sth + 0.5 * dt * Fq
        qf = _upwind(stl, sth, mac[d])
        qf_hi = sh(qf, d, 1)
        if icons:
            term = (mac[d] * qf - mac_hi[d] * qf_hi) / dx[d]
        else:
            term = 0.5 * (mac[d] + mac_hi[d]) * (qf - qf_hi) / dx[d]
        rate = term if rate is None else rate + term
    out_ref[...] = rate[HALO:HALO + TB]


# ---------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------

def enabled() -> bool:
    import os
    if os.environ.get("INCFLO_PALLAS_GODUNOV", "1") != "1":
        return False
    from incflo_tpu.ops import pallas_guard
    if pallas_guard.sharded():
        return False
    if INTERPRET:
        return True
    return jax.default_backend() in ("tpu", "axon")


def _choose_tile(nx, m, n_live):
    for tb in (64, 32, 16, 8):
        if nx % tb:
            continue
        if n_live * (tb + 2 * HALO) * m * 4 <= VMEM_BUDGET:
            return tb
    return None


def supported(grid, dtype, n_live=None) -> bool:
    if not HAVE_PALLAS or grid.ndim != 3 or not all(grid.periodic):
        return False
    if dtype != jnp.float32 and not INTERPRET:
        return False
    nx, ny, nz = grid.n_cell
    m = ny * nz
    if m % 128 != 0 or nx % 8 != 0:
        return False
    if n_live is None:
        n_live = max(N_LIVE_PREDICT, N_LIVE_ADVECT)
    return _choose_tile(nx, m, n_live) is not None


def _padx(a3, h=HALO):
    """(nx, ny, nz) cell field -> periodic-x-padded merged (nx+2h, m)."""
    f = a3.reshape(a3.shape[0], -1)
    return jnp.concatenate([f[-h:], f, f[:h]], axis=0)


def _call(kern, n_in, n_out, nx, m, TB, dtype, dt_arr, ins):
    return pl.pallas_call(
        kern,
        interpret=INTERPRET,
        grid=(nx // TB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * n_in,
        out_specs=[pl.BlockSpec((TB, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((nx, m), dtype)] * n_out,
        scratch_shapes=[pltpu.VMEM((TB + 2 * HALO, m), dtype)] * n_in
        + [pltpu.SemaphoreType.DMA((n_in,))],
    )(dt_arr, *ins)


def predict(grid, vel, forces, dt, use_ppm: bool) -> List[jnp.ndarray]:
    """vel (nx,ny,nz,3) interior; forces interior or None.  Returns the
    three MAC face arrays in standard (n+1)-along-own-axis layout."""
    nx, ny, nz = grid.n_cell
    m = ny * nz
    with_forces = forces is not None
    TB = _choose_tile(nx, m, n_live=N_LIVE_PREDICT)
    dt_arr = jnp.full((1,), dt, vel.dtype)
    vel_p = [_padx(vel[..., c]) for c in range(3)]

    uad = _call(functools.partial(_uad_kernel, TB, ny, nz, grid.dx,
                                  use_ppm),
                3, 3, nx, m, TB, vel.dtype, dt_arr, vel_p)
    uad_p = [jnp.concatenate([u[-HALO:], u, u[:HALO]], axis=0)
             for u in uad]

    umac = []
    for d in range(3):
        ins = vel_p + uad_p
        if with_forces:
            ins = ins + [_padx(forces[..., d])]
        kern = functools.partial(_predict_d_kernel, TB, ny, nz, grid.dx,
                                 use_ppm, with_forces, d)
        (out,) = _call(kern, len(ins), 1, nx, m, TB, vel.dtype, dt_arr,
                       ins)
        a = out.reshape(nx, ny, nz)
        sl = [slice(None)] * 3
        sl[d] = slice(0, 1)
        umac.append(jnp.concatenate([a, a[tuple(sl)]], axis=d))
    return umac


def advect(grid, q, umac, forces, dt, iconserv: Tuple[int, ...],
           use_ppm: bool) -> jnp.ndarray:
    """q (nx,ny,nz,ncomp) interior; umac standard face arrays; forces
    interior (nx,ny,nz,ncomp) or None.  Returns dq/dt (interior)."""
    nx, ny, nz = grid.n_cell
    m = ny * nz
    ncomp = q.shape[-1]
    with_forces = forces is not None
    TB = _choose_tile(nx, m, n_live=N_LIVE_ADVECT)
    dt_arr = jnp.full((1,), dt, q.dtype)
    mac_p = []
    for ax in range(3):
        sl = [slice(None)] * 3
        sl[ax] = slice(0, -1)      # periodic: face n == face 0
        mac_p.append(_padx(umac[ax][tuple(sl)]))
    outs = []
    for n in range(ncomp):
        ins = [_padx(q[..., n])] + mac_p
        if with_forces:
            ins.append(_padx(forces[..., n]))
        kern = functools.partial(_advect_kernel, TB, ny, nz, grid.dx,
                                 use_ppm, bool(iconserv[n]), with_forces)
        (out,) = _call(kern, len(ins), 1, nx, m, TB, q.dtype, dt_arr,
                       ins)
        outs.append(out.reshape(nx, ny, nz))
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------------
# shard_map wrappers: the same kernels under multi-chip x-decomposition
# ---------------------------------------------------------------------
# The reference runs its whole kernel set under MPI domain decomposition
# (test/incflo-tests.ini useMPI=1); the TPU-native equivalent keeps the
# fused Mosaic kernels in the sharded program by wrapping them in
# shard_map over the mesh "dx" axis with explicit ppermute halo
# exchange -- the slab-DMA HALO structure of the kernels is already
# tile-shaped, so each shard runs the identical kernel on its x-slab
# with neighbor halos riding the ICI (VERDICT r4 Next #4).

def shard_info(grid, dtype, n_live=None):
    """(mesh, nshard, nx_local) when the sharded fast path applies:
    x-only decomposition (mesh "dx" sharded, every other mesh axis of
    size 1 -- y/z shifts run inside the merged lane dim and must stay
    shard-local), per-shard extents kernel-eligible."""
    import os
    if os.environ.get("INCFLO_PALLAS_GODUNOV_SHARD", "1") != "1":
        return None
    from incflo_tpu.ops import pallas_guard
    if not pallas_guard.sharded():
        return None
    if not INTERPRET and jax.default_backend() not in ("tpu", "axon"):
        return None
    mesh = pallas_guard.mesh()
    if mesh is None or not HAVE_PALLAS:
        return None
    if grid.ndim != 3 or not all(grid.periodic):
        return None
    if dtype != jnp.float32 and not INTERPRET:
        return None
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    nshard = sizes.get("dx", 1)
    if nshard <= 1:
        return None
    if any(v > 1 for k, v in sizes.items() if k != "dx"):
        return None
    nx, ny, nz = grid.n_cell
    if nx % nshard:
        return None
    nxl = nx // nshard
    m = ny * nz
    if m % 128 or nxl % 8:
        return None
    if n_live is None:
        n_live = max(N_LIVE_PREDICT, N_LIVE_ADVECT)
    if _choose_tile(nxl, m, n_live) is None:
        return None
    return mesh, nshard, nxl


def _halo_x(f2, nshard, h=HALO):
    """Periodic x-halo exchange of a merged (nx_local, m) block inside
    shard_map: neighbors' boundary slabs arrive over ICI ppermute."""
    hi, lo = f2[-h:], f2[:h]
    left = jax.lax.ppermute(hi, "dx",
                            [(i, (i + 1) % nshard) for i in range(nshard)])
    right = jax.lax.ppermute(lo, "dx",
                             [(i, (i - 1) % nshard) for i in range(nshard)])
    return jnp.concatenate([left, f2, right], axis=0)


def _shard_map(body, mesh, in_specs, out_specs):
    from jax.sharding import PartitionSpec
    try:
        from jax import shard_map as _sm          # jax >= 0.7 API
        return _sm(body, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(body, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_rep=False)


def predict_sharded(grid, vel, forces, dt, use_ppm: bool, info):
    """predict() under x-decomposition: per-shard kernels + halo
    ppermutes inside shard_map; the periodic wrap face is appended
    OUTSIDE (GSPMD-land), keeping shard blocks even."""
    from jax.sharding import PartitionSpec as P
    mesh, nshard, nxl = info
    nx, ny, nz = grid.n_cell
    m = ny * nz
    with_forces = forces is not None
    TB = _choose_tile(nxl, m, n_live=N_LIVE_PREDICT)
    dt_arr = jnp.full((1,), dt, vel.dtype)

    def body(vel_b, forces_b, dt_a):
        vel_p = [_halo_x(vel_b[..., c].reshape(nxl, m), nshard)
                 for c in range(3)]
        uad = _call(functools.partial(_uad_kernel, TB, ny, nz, grid.dx,
                                      use_ppm),
                    3, 3, nxl, m, TB, vel_b.dtype, dt_a, vel_p)
        uad_p = [_halo_x(u, nshard) for u in uad]
        outs = []
        for d in range(3):
            ins = vel_p + uad_p
            if with_forces:
                ins = ins + [_halo_x(forces_b[..., d].reshape(nxl, m),
                                     nshard)]
            kern = functools.partial(_predict_d_kernel, TB, ny, nz,
                                     grid.dx, use_ppm, with_forces, d)
            (out,) = _call(kern, len(ins), 1, nxl, m, TB, vel_b.dtype,
                           dt_a, ins)
            outs.append(out.reshape(nxl, ny, nz))
        return tuple(outs)

    fr = forces if with_forces else jnp.zeros((1, 1, 1, 3), vel.dtype)
    mapped = _shard_map(
        body, mesh,
        in_specs=(P("dx"), P("dx") if with_forces else P(), P()),
        out_specs=(P("dx"),) * 3)
    outs = mapped(vel, fr, dt_arr)
    umac = []
    for d in range(3):
        a = outs[d]
        sl = [slice(None)] * 3
        sl[d] = slice(0, 1)
        umac.append(jnp.concatenate([a, a[tuple(sl)]], axis=d))
    return umac


def advect_sharded(grid, q, umac, forces, dt, iconserv, use_ppm: bool,
                   info):
    """advect() under x-decomposition (see predict_sharded)."""
    from jax.sharding import PartitionSpec as P
    mesh, nshard, nxl = info
    nx, ny, nz = grid.n_cell
    m = ny * nz
    ncomp = q.shape[-1]
    with_forces = forces is not None
    TB = _choose_tile(nxl, m, n_live=N_LIVE_ADVECT)
    dt_arr = jnp.full((1,), dt, q.dtype)
    # periodic: face n == face 0; drop it so every operand is cell-even
    mac_t = []
    for ax in range(3):
        sl = [slice(None)] * 3
        sl[ax] = slice(0, -1)
        mac_t.append(umac[ax][tuple(sl)])

    def body(q_b, m0, m1, m2, forces_b, dt_a):
        mac_p = [_halo_x(mm.reshape(nxl, m), nshard) for mm in (m0, m1, m2)]
        outs = []
        for n in range(ncomp):
            ins = [_halo_x(q_b[..., n].reshape(nxl, m), nshard)] + mac_p
            if with_forces:
                ins.append(_halo_x(forces_b[..., n].reshape(nxl, m),
                                   nshard))
            kern = functools.partial(_advect_kernel, TB, ny, nz, grid.dx,
                                     use_ppm, bool(iconserv[n]),
                                     with_forces)
            (out,) = _call(kern, len(ins), 1, nxl, m, TB, q_b.dtype,
                           dt_a, ins)
            outs.append(out.reshape(nxl, ny, nz))
        return jnp.stack(outs, axis=-1)

    fr = forces if with_forces else jnp.zeros((1, 1, 1, ncomp), q.dtype)
    mapped = _shard_map(
        body, mesh,
        in_specs=(P("dx"), P("dx"), P("dx"), P("dx"),
                  P("dx") if with_forces else P(), P()),
        out_specs=P("dx"))
    return mapped(q, mac_t[0], mac_t[1], mac_t[2], fr, dt_arr)
