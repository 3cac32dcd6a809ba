"""EB-aware kernels: cut-cell convective rate, flux redistribution,
small-cell correction, connectivity.

Reference: src/convection/incflo_compute_advection_term.cpp
(compute_convective_rate_eb :384-428, redistribute_eb :430-515) and
incflo_correct_small_cells.cpp.  The scatter-with-atomics redistribution
is re-expressed as a gather over the 3^d-1 neighbor offsets (no atomics
on a vector machine); connectivity, neighbor volume sums and scatter
weights are STATIC geometry so they are precomputed host-side.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from incflo_tpu.eb.geometry import COVERED, CUT, REGULAR, EBData
from incflo_tpu.grid import Grid


@dataclasses.dataclass(frozen=True)
class EBArrays:
    """Device-resident static cut-cell data (passed into the jit step).

    Registered as a jax dataclass with `offsets` as METADATA: it is a
    tuple of python-int stencil offsets consumed as static slice bounds
    (eb/mol._ext); as a pytree leaf (the NamedTuple behavior) each int
    would become a traced scalar under jit and break the slicing."""
    vfrac: jnp.ndarray
    afrac: Tuple[jnp.ndarray, ...]
    cut: jnp.ndarray          # float mask 1.0 where cut
    covered: jnp.ndarray      # float mask 1.0 where covered
    fluid: jnp.ndarray        # 1 - covered
    small: jnp.ndarray        # vfrac < 1e-4 but not covered
    eb_area: jnp.ndarray      # EB boundary area fraction per cell
    # redistribution statics:
    nbr_conn: jnp.ndarray     # (noff, cells) connectivity masks (float)
    vtot: jnp.ndarray         # sum of connected neighbor vfrac
    wtot_inv: jnp.ndarray     # 1/sum of connected neighbor weights
    offsets: tuple            # static tuple of offset tuples
    # centroid-aware MOL statics (reference EBFArrayBoxFactory data
    # consumed by incflo_mol_{predict,fluxes}_eb.cpp):
    face_cent: Tuple[jnp.ndarray, ...] = ()  # per axis: faces+(d,), dx units
    ccent_g2: Optional[jnp.ndarray] = None   # cell fluid centroid, 2 ghosts
    conn_g1: Optional[jnp.ndarray] = None    # (noff, cells+2) conn, 1 ghost
    # packed symmetric inverse of the least-squares normal matrix
    # M = sum_off conn*delta*delta^T (2D: [xx,xy,yy]; 3D: [xx,xy,xz,yy,yz,zz])
    lsq_minv_g1: Optional[jnp.ndarray] = None  # cells+2 + (npack,)
    near_g1: Optional[jnp.ndarray] = None      # 1.0 within 2 cells of non-regular
    # octant (2x-lattice) fluid fractions: integration data of the exact
    # cut-cell nodal FEM operator (multigrid.eb_nodal_apply)
    vfrac_oct: Optional[jnp.ndarray] = None
    # Dirichlet wall-stencil geometry (ops/diffusion._eb_wall_coef):
    # physical centroid-to-wall distance, |A_eb|/V, and unit normal
    # (into the fluid) per cut cell
    wall_dist: Optional[jnp.ndarray] = None
    area_ov: Optional[jnp.ndarray] = None
    eb_normal: Optional[jnp.ndarray] = None
    # Johansen-Colella wall-gradient probe statics: trilinear
    # interpolation points along the inward wall normal at d1/d2 from
    # the wall (ops/diffusion._eb_wall_correction).  probe_lo int32
    # (cells, 2, D) lower-corner cell index (unwrapped), probe_frac
    # (cells, 2, D) in [0,1), probe_ok float 1.0 where both probes'
    # corners are regular fluid cells
    probe_lo: Optional[jnp.ndarray] = None
    probe_frac: Optional[jnp.ndarray] = None
    probe_ok: Optional[jnp.ndarray] = None
    # curvature correction statics: nearest cell per probe + validity of
    # its +-1 neighborhood (subtracting the multilinear interpolation
    # error 1/2 sum_d f(1-f) h^2 u''_dd makes probe reads exact for
    # quadratics -- the trilinear read alone biases the wall gradient by
    # the near-wall curvature)
    probe_nn: Optional[jnp.ndarray] = None
    probe_c2ok: Optional[jnp.ndarray] = None

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)


jax.tree_util.register_dataclass(
    EBArrays,
    data_fields=["vfrac", "afrac", "cut", "covered", "fluid", "small",
                 "eb_area", "nbr_conn", "vtot", "wtot_inv", "face_cent",
                 "ccent_g2", "conn_g1", "lsq_minv_g1", "near_g1",
                 "vfrac_oct", "wall_dist", "area_ov", "eb_normal",
                 "probe_lo", "probe_frac", "probe_ok", "probe_nn",
                 "probe_c2ok"],
    meta_fields=["offsets"])


def _connectivity(eb: EBData, grid: Grid) -> Tuple[np.ndarray, list]:
    """Boolean connectivity masks per neighbor offset, approximating
    AMReX's EBCellFlag connectivity: a neighbor is connected if it is
    uncovered and some axis-ordered face path between the two cells has
    open faces (afrac > 0) through uncovered intermediate cells."""
    nd = grid.ndim
    n = grid.n_cell
    cov = (eb.flags == COVERED)

    def pad_bool(a, val=True):
        return np.pad(a, 1, constant_values=val)

    covp = pad_bool(cov)
    for d in range(nd):
        if grid.periodic[d]:
            sl_lo = [slice(1, -1)] * nd
            sl_hi = [slice(1, -1)] * nd
            sl_lo[d] = slice(0, 1)
            sl_hi[d] = slice(-1, None)
            src_hi = [slice(1, -1)] * nd
            src_lo = [slice(1, -1)] * nd
            src_hi[d] = slice(-2, -1)
            src_lo[d] = slice(1, 2)
            covp[tuple(sl_lo)] = covp[tuple(src_hi)]
            covp[tuple(sl_hi)] = covp[tuple(src_lo)]

    # face-open masks: open[d][cell, toward +] etc., padded
    def face_open(d):
        a = eb.afrac[d] > 1e-12
        return a   # faces n+1 along d

    opens = [face_open(d) for d in range(nd)]

    def cell_at(arr_p, off):
        sl = [slice(1 + off[d], 1 + off[d] + n[d]) for d in range(nd)]
        return arr_p[tuple(sl)]

    def step_open(pos_off, d, sgn):
        """Face between cell (i+pos_off) and (i+pos_off+sgn*e_d) open?"""
        a = opens[d]
        idx = []
        for ax in range(nd):
            if ax == d:
                f = pos_off[ax] + (1 if sgn > 0 else 0)
                idx.append(_face_take(a.shape[ax], f, n[ax],
                                      grid.periodic[ax]))
            else:
                idx.append(_cell_take(a.shape[ax], pos_off[ax], n[ax],
                                      grid.periodic[ax]))
        return a[np.ix_(*idx)]

    offsets = [off for off in itertools.product((-1, 0, 1), repeat=nd)
               if any(off)]
    masks = []
    for off in offsets:
        nbr_ok = ~cell_at(covp, off)
        # all axis orderings of the staircase path
        axes = [d for d in range(nd) if off[d] != 0]
        path_ok = np.zeros(n, bool)
        for perm in itertools.permutations(axes):
            ok = np.ones(n, bool)
            pos = [0] * nd
            for step_i, d in enumerate(perm):
                sgn = off[d]
                ok &= step_open(tuple(pos), d, sgn)
                pos[d] += sgn
                if step_i < len(perm) - 1:   # intermediate cell open?
                    ok &= ~cell_at(covp, tuple(pos))
            path_ok |= ok
        masks.append(nbr_ok & path_ok)
    return np.stack(masks), offsets


def _cell_take(size, off, n, periodic):
    idx = np.arange(n) + off
    if periodic:
        return idx % n
    return np.clip(idx, 0, n - 1)  # afrac lookups clipped (masked anyway)


def _face_take(size, f, n, periodic):
    idx = np.arange(n) + f
    if periodic:
        # faces 0..n with face n == face 0
        return idx % n
    return np.clip(idx, 0, n)


def _pad_geom(a: np.ndarray, k: int, grid: Grid, ncomp_axes: int = 0
              ) -> np.ndarray:
    """Pad static geometry by k ghost cells per spatial axis: periodic
    wrap, else edge replicate (domain-adjacent geometry is regular in all
    supported decks; boundary faces are overridden by the BC path).
    ncomp_axes trailing axes are never padded."""
    out = a
    for ax in range(grid.ndim):
        p = [(0, 0)] * a.ndim
        p[ax] = (k, k)
        mode = "wrap" if grid.periodic[ax] else "edge"
        out = np.pad(out, p, mode=mode)
    return out


def _dilate_np(mask: np.ndarray, k: int, grid: Grid) -> np.ndarray:
    """Grow a boolean mask by k cells (host-side, wrap/edge like _pad_geom)."""
    m = mask
    for _ in range(k):
        mp = _pad_geom(m, 1, grid)
        acc = m.copy()
        for ax in range(grid.ndim):
            sl_lo = [slice(1, 1 + s) for s in m.shape]
            sl_hi = [slice(1, 1 + s) for s in m.shape]
            sl_lo[ax] = slice(0, m.shape[ax])
            sl_hi[ax] = slice(2, m.shape[ax] + 2)
            acc |= mp[tuple(sl_lo)] | mp[tuple(sl_hi)]
        m = acc
    return m


def _lsq_statics(eb: EBData, grid: Grid, conn: np.ndarray, offsets):
    """Static least-squares slope geometry on the grown-by-1 box:
    M(i) = sum_off conn(i,off) * delta delta^T,
    delta = off + ccent(i+off) - ccent(i);
    returns (ccent_g2, conn_g1, packed Minv_g1).  The normal matrix is
    pure geometry, so its (pseudo)inverse is precomputed host-side and
    the runtime slope is npack multiply-adds per cell."""
    nd = grid.ndim
    ccent_g2 = _pad_geom(eb.centroid, 2, grid, ncomp_axes=1)
    conn_g1 = np.stack([_pad_geom(m, 1, grid) for m in conn])
    g1_shape = tuple(s + 2 for s in grid.n_cell)
    M = np.zeros(g1_shape + (nd, nd))
    c0 = ccent_g2[tuple(slice(1, 1 + s) for s in g1_shape)]
    for m, off in zip(conn_g1, offsets):
        cn = ccent_g2[tuple(slice(1 + off[ax], 1 + off[ax] + g1_shape[ax])
                            for ax in range(nd))]
        delta = np.asarray(off, float) + cn - c0
        w = m.astype(float)
        for a in range(nd):
            for b in range(a, nd):
                M[..., a, b] += w * delta[..., a] * delta[..., b]
    for a in range(nd):
        for b in range(a):
            M[..., a, b] = M[..., b, a]
    # pseudo-inverse: rank-deficient neighborhoods (sliver cells connected
    # along fewer than nd directions) get the minimum-norm least-squares
    # slope in the spanned directions and zero across the unseen ones;
    # fully isolated/covered cells get Minv = 0 (slope 0)
    Minv = np.linalg.pinv(M, rcond=1e-10, hermitian=True)
    pairs = [(a, b) for a in range(nd) for b in range(a, nd)]
    packed = np.stack([Minv[..., a, b] for a, b in pairs], axis=-1)
    return ccent_g2, conn_g1, packed


PROBE_D1 = 1.5   # probe distances from the wall, in units of min(dx)
PROBE_D2 = 3.0


def _wall_probes(eb: EBData, grid: Grid):
    """Statics for the Johansen-Colella second-order EB wall gradient:
    for every cut cell, two trilinear interpolation points along the
    INWARD wall normal at d1/d2 = PROBE_D1/D2 * min(dx) from the wall.
    A probe is usable only when all 2^D surrounding cells have their
    center in the fluid (REGULAR, or cut with vfrac > 0.5 as the
    standard center-in-fluid proxy -- a solid-side center would poison
    the trilinear read); cells failing that keep the centroid-Taylor
    fallback.
    Reference discretization: MLEBABecLap/MLEBTensorOp EB-Dirichlet
    flux stencils (src/diffusion/DiffusionTensorOp.cpp:32-43)."""
    nd = grid.ndim
    n = grid.n_cell
    dx = np.asarray(grid.dx, np.float64)
    if eb.wall_dist is None:
        return None
    hmin = dx.min()
    ctr = np.stack(np.meshgrid(*[(np.arange(m) + 0.5) * dx[d]
                                 for d, m in enumerate(n)],
                               indexing="ij"), axis=-1)
    xw = ctr + eb.centroid * dx - eb.wall_dist[..., None] * eb.eb_normal
    cut = eb.flags == CUT
    usable = (eb.flags == REGULAR) | (cut & (eb.vfrac > 0.5))
    regp = np.pad(usable, 1, constant_values=False)
    for d in range(nd):
        if grid.periodic[d]:
            sl_lo = [slice(1, -1)] * nd
            sl_hi = [slice(1, -1)] * nd
            sl_lo[d] = slice(0, 1)
            sl_hi[d] = slice(-1, None)
            src_hi = [slice(1, -1)] * nd
            src_lo = [slice(1, -1)] * nd
            src_hi[d] = slice(-2, -1)
            src_lo[d] = slice(1, 2)
            regp[tuple(sl_lo)] = regp[tuple(src_hi)]
            regp[tuple(sl_hi)] = regp[tuple(src_lo)]
    def usable_at(ci):
        """All-usable test for integer cell indices ci (cells, D)."""
        in_dom = np.ones(n, bool)
        idx = []
        for d in range(nd):
            c = ci[..., d]
            if grid.periodic[d]:
                idx.append(c % n[d])
            else:
                in_dom &= (c >= 0) & (c < n[d])
                idx.append(np.clip(c, 0, n[d] - 1))
        return in_dom & regp[tuple(i + 1 for i in idx)]

    lo_all, fr_all, nn_all = [], [], []
    ok = cut & (eb.wall_dist > 0)
    c2ok = np.ones(n + (2,), bool)
    for k, dist in ((0, PROBE_D1 * hmin), (1, PROBE_D2 * hmin)):
        p = xw + dist * eb.eb_normal              # physical probe point
        g = p / dx - 0.5                          # cell-index space
        lo = np.floor(g).astype(np.int64)
        fr = g - lo
        nn = np.rint(g).astype(np.int64)
        lo_all.append(lo)
        fr_all.append(fr)
        nn_all.append(nn)
        for corner in itertools.product((0, 1), repeat=nd):
            ok = ok & usable_at(lo + np.asarray(corner))
        # curvature-correction stencil: nn and its +-1 axis neighbors
        cu = usable_at(nn)
        for d in range(nd):
            e = np.zeros(nd, np.int64)
            e[d] = 1
            cu = cu & usable_at(nn + e) & usable_at(nn - e)
        c2ok[..., k] = cu
    probe_lo = np.stack(lo_all, axis=-2)          # (cells, 2, D)
    probe_frac = np.stack(fr_all, axis=-2)
    probe_nn = np.stack(nn_all, axis=-2)
    return (probe_lo, probe_frac, ok.astype(np.float64), probe_nn,
            c2ok.astype(np.float64))


def build_eb_arrays(eb: EBData, grid: Grid, dtype) -> EBArrays:
    conn, offsets = _connectivity(eb, grid)
    nd = grid.ndim
    n = grid.n_cell
    cut = (eb.flags == CUT)
    cov = (eb.flags == COVERED)

    def nbr(arr, off):
        out = arr
        for d in range(nd):
            if off[d] == 0:
                continue
            out = np.roll(out, -off[d], axis=d)
            if not grid.periodic[d]:
                sl = [slice(None)] * nd
                if off[d] > 0:
                    sl[d] = slice(n[d] - off[d], n[d])
                else:
                    sl[d] = slice(0, -off[d])
                out[tuple(sl)] = 0.0
        return out

    vtot = np.zeros(n)
    wtot = np.zeros(n)
    for m, off in zip(conn, offsets):
        vtot += m * nbr(eb.vfrac, off)
        wtot += m * nbr(eb.vfrac, off)   # wgt == 1 inside domain
    small = (eb.vfrac < 1e-4) & ~cov

    ccent_g2, conn_g1, lsq_minv = _lsq_statics(eb, grid, conn, offsets)
    near = _dilate_np(eb.flags != REGULAR, 2, grid)
    near_g1 = _pad_geom(near, 1, grid)
    if eb.face_cent is not None:
        face_cent = tuple(jnp.asarray(fc, dtype) for fc in eb.face_cent)
    else:
        face_cent = tuple(jnp.zeros(a.shape + (nd,), dtype)
                          for a in eb.afrac)

    mk = lambda a: jnp.asarray(a, dtype)
    return EBArrays(
        vfrac=mk(eb.vfrac),
        afrac=tuple(mk(a) for a in eb.afrac),
        cut=mk(cut), covered=mk(cov), fluid=mk(~cov), small=mk(small),
        eb_area=mk(eb.eb_area),
        nbr_conn=mk(conn),
        # masked reciprocals, NOT eps-regularized: 1/(0+1e-80)=1e80
        # overflows to inf in float32 and inf*0 = NaN poisons the
        # redistribution scatter in covered cells
        vtot=mk(np.where(vtot > 0.0, vtot, 1.0)),
        wtot_inv=mk(np.where(wtot > 0.0, 1.0 / np.where(wtot > 0.0, wtot, 1.0), 0.0)),
        offsets=tuple(offsets),
        face_cent=face_cent,
        ccent_g2=mk(ccent_g2),
        conn_g1=mk(conn_g1),
        lsq_minv_g1=mk(lsq_minv),
        near_g1=mk(near_g1),
        vfrac_oct=mk(eb.vfrac_oct) if eb.vfrac_oct is not None else None,
        wall_dist=mk(eb.wall_dist) if eb.wall_dist is not None else None,
        area_ov=mk(_area_over_volume(eb, grid)),
        eb_normal=mk(eb.eb_normal),
        **(dict(probe_lo=jnp.asarray(probes[0], jnp.int32),
                probe_frac=mk(probes[1]), probe_ok=mk(probes[2]),
                probe_nn=jnp.asarray(probes[3], jnp.int32),
                probe_c2ok=mk(probes[4]))
           if (probes := _wall_probes(eb, grid)) is not None else {}),
    )


def _area_over_volume(eb: EBData, grid: Grid) -> np.ndarray:
    """|A_eb| / V_cell (physical 1/length) from the divergence theorem:
    A_eb n_d = (afrac_lo - afrac_hi)_d * V/dx_d, exact for planar cuts
    including anisotropic dx."""
    nd = grid.ndim
    n = grid.n_cell
    s = np.zeros(n)
    for d in range(nd):
        a = eb.afrac[d]
        lo = np.take(a, range(0, n[d]), axis=d)
        hi = np.take(a, range(1, n[d] + 1), axis=d)
        s = s + ((lo - hi) / grid.dx[d]) ** 2
    return np.sqrt(s)


def _roll_nbr(a: jnp.ndarray, off, grid: Grid):
    """a(i+off) with zero beyond non-periodic domain faces."""
    nd = grid.ndim
    out = a
    for d in range(nd):
        if off[d] == 0:
            continue
        out = jnp.roll(out, -off[d], axis=d)
        if not grid.periodic[d]:
            n = grid.n_cell[d]
            idx = jnp.arange(n) + off[d]
            valid = jnp.logical_and(idx >= 0, idx < n)
            shape = [1] * out.ndim
            shape[d] = -1
            out = out * valid.reshape(shape).astype(out.dtype)
    return out


def eb_convective_rate(fluxes: Sequence[jnp.ndarray], grid: Grid,
                       eb: EBArrays) -> jnp.ndarray:
    """Cut-cell finite-volume rate: regular flux difference in regular
    cells; (1/vfrac) sum(ap*f) in cut cells; 0 in covered cells
    (reference compute_convective_rate_eb)."""
    from incflo_tpu.ops.stencil import window
    out = None
    for d in range(grid.ndim):
        f = fluxes[d]
        ap = eb.afrac[d][..., None]
        dxi = 1.0 / grid.dx[d]
        t = (window(ap * f, d, 0, 1) - window(ap * f, d, 1, 0)) * dxi
        out = t if out is None else out + t
    vf = jnp.where(eb.covered > 0.5, 1.0, eb.vfrac)
    out = out / vf[..., None]
    return out * eb.fluid[..., None]


def redistribute(dUdt_in: jnp.ndarray, grid: Grid, eb: EBArrays
                 ) -> jnp.ndarray:
    """Mass-conservative neighborhood redistribution of the cut-cell
    defect (reference redistribute_eb, gather form)."""
    vf = eb.vfrac[..., None]
    # divnc: connected-neighbor volume-weighted average of dUdt_in
    acc = 0.0
    for m, off in zip(eb.nbr_conn, eb.offsets):
        acc = acc + (m * _roll_nbr(eb.vfrac, off, grid))[..., None] \
            * _roll_nbr_nc(dUdt_in, off, grid)
    divnc = acc / eb.vtot[..., None]
    optmp = (1.0 - vf) * (divnc - dUdt_in) * (eb.cut[..., None])
    delm = -vf * optmp
    send = delm * eb.wtot_inv[..., None]      # per-cut-cell share
    # gather: cell c receives send(c-off) for each offset where the
    # SENDER (c-off) is cut and connected toward +off
    recv = 0.0
    for m, off in zip(eb.nbr_conn, eb.offsets):
        neg = tuple(-o for o in off)
        sender_mask = (m * eb.cut)
        contrib = sender_mask[..., None] * send
        recv = recv + _roll_nbr_nc(contrib, neg, grid)
    return dUdt_in + optmp + recv


def _roll_nbr_nc(a: jnp.ndarray, off, grid: Grid):
    """_roll_nbr for arrays with a trailing component axis."""
    nd = grid.ndim
    out = a
    for d in range(nd):
        if off[d] == 0:
            continue
        out = jnp.roll(out, -off[d], axis=d)
        if not grid.periodic[d]:
            n = grid.n_cell[d]
            idx = jnp.arange(n) + off[d]
            valid = jnp.logical_and(idx >= 0, idx < n)
            shape = [1] * out.ndim
            shape[d] = -1
            out = out * valid.reshape(shape).astype(out.dtype)
    return out


def correct_small_cells(vel: jnp.ndarray, umac: Sequence[jnp.ndarray],
                        grid: Grid, eb: EBArrays) -> jnp.ndarray:
    """Cells with 0 < vfrac < 1e-4: overwrite the cell-centered velocity
    with the area-weighted average of the face MAC velocities
    (reference incflo_correct_small_cells.cpp:5-75)."""
    from incflo_tpu.ops.stencil import window
    comps = []
    for d in range(grid.ndim):
        ap = eb.afrac[d]
        u = umac[d]
        ap_lo = window(ap, d, 0, 1)
        ap_hi = window(ap, d, 1, 0)
        u_lo = window(u, d, 0, 1)
        u_hi = window(u, d, 1, 0)
        denom = ap_lo + ap_hi
        avg = jnp.where(denom > 1e-30,
                        (ap_lo * u_lo + ap_hi * u_hi) /
                        jnp.maximum(denom, 1e-30),
                        vel[..., d])
        comps.append(jnp.where(eb.small > 0.5, avg, vel[..., d]))
    return jnp.stack(comps, axis=-1)


# ---------------------------------------------------------------------
# one-sided derivatives at cut cells (reference incflo_derive_K.H:7-164:
# quadratic one-sided (-1.5, 2, -0.5) stencils toward connected cells)
# ---------------------------------------------------------------------

def _axis_conn(eb: EBArrays, axis: int, sign: int):
    """Connectivity mask toward the +/- unit offset along `axis`."""
    off = tuple(sign if d == axis else 0 for d in range(len(eb.vfrac.shape)))
    return eb.nbr_conn[eb.offsets.index(off)]


def eb_cc_derivative(q_g: jnp.ndarray, comp, axis: int, grid: Grid,
                     ng: int, eb: EBArrays) -> jnp.ndarray:
    """d q[..., comp] / dx_axis at cell centers on the interior:
    central in regular cells; quadratic one-sided (c0,c1,c2) =
    (-1.5, 2, -0.5) toward the connected side at cut cells with a
    covered neighbor (needs ng >= 2 ghosts)."""
    from incflo_tpu.ops.stencil import window
    nd = grid.ndim
    v = q_g[..., comp] if comp is not None else q_g

    def interior(a, shift):
        """a(i + shift e_axis) on the interior cells."""
        out = a
        for ax in range(nd):
            lo = ng + (shift if ax == axis else 0)
            hi = ng - (shift if ax == axis else 0)
            out = window(out, ax, lo, hi)
        return out

    idx = 1.0 / grid.dx[axis]
    c0, c1, c2 = -1.5, 2.0, -0.5
    central = 0.5 * (interior(v, 1) - interior(v, -1)) * idx
    backward = -(c0 * interior(v, 0) + c1 * interior(v, -1)
                 + c2 * interior(v, -2)) * idx
    forward = (c0 * interior(v, 0) + c1 * interior(v, 1)
               + c2 * interior(v, 2)) * idx
    conn_p = _axis_conn(eb, axis, +1) > 0.5
    conn_m = _axis_conn(eb, axis, -1) > 0.5
    cut = eb.cut > 0.5
    # each one-sided stencil needs the OPPOSITE side connected 2 deep;
    # an isolated sliver (both sides covered) gets derivative 0 rather
    # than a stencil through covered-cell garbage
    one_sided = jnp.where(jnp.logical_and(cut, jnp.logical_and(~conn_p,
                                                               conn_m)),
                          backward,
                          jnp.where(jnp.logical_and(
                              cut, jnp.logical_and(~conn_m, conn_p)),
                              forward, central))
    one_sided = jnp.where(jnp.logical_and(cut, jnp.logical_and(~conn_p,
                                                               ~conn_m)),
                          0.0, one_sided)
    return one_sided * eb.fluid


def eb_strainrate(vel_g: jnp.ndarray, grid: Grid, ng: int, eb: EBArrays
                  ) -> jnp.ndarray:
    """||2S|| with one-sided derivatives at cut cells (interior only;
    reference incflo_strainrate_eb)."""
    nd = grid.ndim
    d = lambda c, ax: eb_cc_derivative(vel_g, c, ax, grid, ng, eb)
    if nd == 2:
        ux, vx = d(0, 0), d(1, 0)
        uy, vy = d(0, 1), d(1, 1)
        return jnp.sqrt(2 * ux * ux + 2 * vy * vy + (uy + vx) ** 2)
    ux, vx, wx = d(0, 0), d(1, 0), d(2, 0)
    uy, vy, wy = d(0, 1), d(1, 1), d(2, 1)
    uz, vz, wz = d(0, 2), d(1, 2), d(2, 2)
    return jnp.sqrt(2 * ux * ux + 2 * vy * vy + 2 * wz * wz
                    + (uy + vx) ** 2 + (vz + wy) ** 2 + (wx + uz) ** 2)


def eb_vorticity(vel_g: jnp.ndarray, grid: Grid, ng: int, eb: EBArrays
                 ) -> jnp.ndarray:
    """2D omega_z / 3D |curl u| with one-sided cut-cell derivatives
    (reference incflo_derive.cpp EB branches)."""
    d = lambda c, ax: eb_cc_derivative(vel_g, c, ax, grid, ng, eb)
    if grid.ndim == 2:
        return d(1, 0) - d(0, 1)
    wy, vz = d(2, 1), d(1, 2)
    uz, wx = d(0, 2), d(2, 0)
    vx, uy = d(1, 0), d(0, 1)
    return jnp.sqrt((wy - vz) ** 2 + (uz - wx) ** 2 + (vx - uy) ** 2)
