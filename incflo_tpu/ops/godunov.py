"""Godunov (corner-transport-upwind) advection: the reference's primary
scheme (incflo.use_godunov), re-expressed as vectorised jnp windows.

Mirrors reference src/convection/incflo_godunov_{plm.H,ppm.H,
predict_2D.cpp,predict_3D.cpp,advection_2D.cpp,advection_3D.cpp}:

  predict():  half-time face-normal velocities for the MAC projection
              (PLM/PPM characteristic traces with the cell velocity as
              wave speed, transverse "trans" velocities, corner coupling
              in 3D, Riemann upwind selection + backflow prevention).
  advect():   dq/dt = -div(umac q) (iconserv) or -(u.grad)q, with full
              corner-transport transverse corrections using the
              MAC-projected velocities.

Structure note: every transverse correction in the reference is a
CELL-indexed quantity applied to a face state as
    lo(face f) -= corr(cell f-1);  hi(face f) -= corr(cell f)
which is what _apply_cell_corr does; the corner-couple and final stages
differ only in the coefficient (dt/3 vs dt/2 conservative, dt/6 vs dt/4
not) and in which edge/velocity arrays feed corr.  The incompressible
divu==0 simplification is applied (the reference zero-fills divu,
advection_3D.cpp:112-114).

All stages operate on arrays tagged with a global-index origin (class F)
so every stencil window is explicit.  Face arrays use face ids along
their own axis (face f between cells f-1 and f).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from incflo_tpu.bcs import BCType
from incflo_tpu.grid import Grid

SMALL_VEL = 1.0e-8   # reference incflo_godunov_ppm.H:16


@dataclasses.dataclass(frozen=True)
class F:
    a: jnp.ndarray
    org: Tuple[int, ...]

    def win(self, ranges) -> jnp.ndarray:
        sl = []
        for d, (lo, hi) in enumerate(ranges):
            s, e = lo - self.org[d], hi - self.org[d]
            if not (0 <= s <= e <= self.a.shape[d]):
                raise IndexError(
                    f"window {(lo, hi)} outside field axis {d} "
                    f"(org {self.org[d]}, size {self.a.shape[d]})")
            sl.append(slice(s, e))
        return self.a[tuple(sl)]


def _iota_mask(shape, axis, org, value):
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis) + org
    return idx == value


def _mc2_parts(a, b, c):
    dl = 2.0 * (b - a)
    dr = 2.0 * (c - b)
    dc = 0.5 * (c - a)
    dlim = jnp.where(dl * dr >= 0.0,
                     jnp.minimum(jnp.abs(dl), jnp.abs(dr)), 0.0)
    return dc, dlim


def _mc4(qm2, qm1, q0, qp1, qp2):
    """Order-4 MC-limited slope (amrex_calc_xslope order 4)."""
    dcm, dlimm = _mc2_parts(qm2, qm1, q0)
    sm = jnp.sign(dcm) * jnp.minimum(jnp.abs(dcm), dlimm)
    dcp, dlimp = _mc2_parts(q0, qp1, qp2)
    sp = jnp.sign(dcp) * jnp.minimum(jnp.abs(dcp), dlimp)
    dc, dlim = _mc2_parts(qm1, q0, qp1)
    dq = (4.0 / 3.0) * dc - (1.0 / 6.0) * (sp + sm)
    return jnp.sign(dq) * jnp.minimum(jnp.abs(dq), dlim)


def _mc4_extdir(qm2, qm1, q0, qp1, qp2, on_lo, on_hi, near_lo, near_hi):
    """Order-4 slope with extdir boundary forms (amrex_calc_xslope_extdir):
    at the boundary cell the derivative is fitted through the face value
    in the ghost cell (dq = -16/15 qm1 + 1/2 q0 + 2/3 qp1 - 1/10 qp2 on
    the lo side, mirrored on hi); the order-2 slopes feeding the interior
    4th-order form use the 3-pt one-sided dc at the boundary cell
    (near_lo/near_hi mark cells i-1==domlo / i+1==domhi)."""
    def mc2(a, b, c, lo_m, hi_m):
        dl = 2.0 * (b - a)
        dr = 2.0 * (c - b)
        dc = 0.5 * (c - a)
        dc = jnp.where(lo_m, (c + 3.0 * b - 4.0 * a) / 3.0, dc)
        dc = jnp.where(hi_m, (4.0 * c - 3.0 * b - a) / 3.0, dc)
        dlim = jnp.where(dl * dr >= 0.0,
                         jnp.minimum(jnp.abs(dl), jnp.abs(dr)), 0.0)
        return jnp.sign(dc) * jnp.minimum(jnp.abs(dc), dlim)

    false = jnp.zeros_like(on_lo)
    sm = mc2(qm2, qm1, q0, near_lo, false)   # slope at cell i-1
    sp = mc2(q0, qp1, qp2, false, near_hi)   # slope at cell i+1
    dc, dlim = _mc2_parts(qm1, q0, qp1)
    dc = jnp.where(on_lo, (qp1 + 3.0 * q0 - 4.0 * qm1) / 3.0, dc)
    dc = jnp.where(on_hi, (4.0 * qp1 - 3.0 * q0 - qm1) / 3.0, dc)
    dq = (4.0 / 3.0) * dc - (1.0 / 6.0) * (sp + sm)
    dq = jnp.where(on_lo, -16.0 / 15.0 * qm1 + 0.5 * q0
                   + 2.0 / 3.0 * qp1 - 0.1 * qp2, dq)
    dq = jnp.where(on_hi, 16.0 / 15.0 * qp1 - 0.5 * q0
                   - 2.0 / 3.0 * qm1 + 0.1 * qm2, dq)
    return jnp.sign(dq) * jnp.minimum(jnp.abs(dq), dlim)


def _van_leer(a, b, c):
    """vanLeer(a=center, b=plus, c=minus) (ppm.H:18-28)."""
    dsc = 0.5 * (b - c)
    dsl = 2.0 * (a - c)
    dsr = 2.0 * (b - a)
    lim = jnp.sign(dsc) * jnp.minimum(
        jnp.abs(dsc), jnp.minimum(jnp.abs(dsl), jnp.abs(dsr)))
    return jnp.where(dsl * dsr > 1.0e-20, lim, 0.0)


class GodunovScheme:
    def __init__(self, grid: Grid, use_ppm: bool, use_forces_in_trans: bool):
        self.grid = grid
        self.use_ppm = use_ppm
        self.uft = use_forces_in_trans
        self.nd = grid.ndim

    # ------------------------------------------------------------------
    # range helpers
    # ------------------------------------------------------------------
    def _cells1(self):
        """cells [-1, n+1) on every axis (bxg1)."""
        return [(-1, n + 1) for n in self.grid.n_cell]

    def _rng(self, spec: Dict[int, Tuple[int, int]], default=(0, 0)):
        """ranges with per-axis overrides; default = interior cells
        extended by (lo, hi)."""
        out = []
        for d, n in enumerate(self.grid.n_cell):
            lo, hi = spec.get(d, default)
            out.append((lo, n + hi))
        return out

    # ------------------------------------------------------------------
    # traces: per-cell Im/Ip on cells [-1, n+1) for one component
    # ------------------------------------------------------------------
    def _traces(self, qf: F, axis: int, comp_bc, wlo_c, whi_c, dt,
                is_velocity: bool, comp: int):
        if self.use_ppm:
            return self._ppm_traces(qf, axis, comp_bc, wlo_c, whi_c, dt,
                                    is_velocity, comp)
        return self._plm_traces(qf, axis, comp_bc, wlo_c, whi_c, dt,
                                is_velocity, comp)

    def _shift(self, qf: F, axis, off):
        r = self._cells1()
        r[axis] = (r[axis][0] + off, r[axis][1] + off)
        return qf.win(r)

    def _plm_traces(self, qf, axis, comp_bc, wlo_c, whi_c, dt,
                    is_velocity, comp):
        g = self.grid
        n = g.n_cell[axis]
        dtdx = dt / g.dx[axis]
        qm2, qm1, q0, qp1, qp2 = (self._shift(qf, axis, o)
                                  for o in (-2, -1, 0, 1, 2))
        bclo, bchi = comp_bc
        extdir_lo = (bclo in (BCType.ext_dir, BCType.hoextrap)
                     and not g.periodic[axis])
        extdir_hi = (bchi in (BCType.ext_dir, BCType.hoextrap)
                     and not g.periodic[axis])
        if extdir_lo or extdir_hi:
            zero = jnp.zeros(q0.shape, bool)
            on_lo = _iota_mask(q0.shape, axis, -1, 0) if extdir_lo else zero
            on_hi = _iota_mask(q0.shape, axis, -1, n - 1) if extdir_hi else zero
            nr_lo = _iota_mask(q0.shape, axis, -1, 1) if extdir_lo else zero
            nr_hi = _iota_mask(q0.shape, axis, -1, n - 2) if extdir_hi else zero
            slp = _mc4_extdir(qm2, qm1, q0, qp1, qp2, on_lo, on_hi,
                              nr_lo, nr_hi)
        else:
            slp = _mc4(qm2, qm1, q0, qp1, qp2)

        Im = q0 + 0.5 * (-1.0 - wlo_c * dtdx) * slp
        Ip = q0 + 0.5 * (1.0 - whi_c * dtdx) * slp

        # ext_dir boundary-face overrides (Godunov_plm_fpu_*:34-51)
        if not g.periodic[axis]:
            if bclo == BCType.ext_dir:
                ghost = _iota_mask(q0.shape, axis, -1, -1)
                Ip = jnp.where(ghost, q0, Ip)
                if comp == axis and is_velocity:
                    first = _iota_mask(q0.shape, axis, -1, 0)
                    Im = jnp.where(first, qm1, Im)
            if bchi == BCType.ext_dir:
                ghost = _iota_mask(q0.shape, axis, -1, n)
                Im = jnp.where(ghost, q0, Im)
                if comp == axis and is_velocity:
                    last = _iota_mask(q0.shape, axis, -1, n - 1)
                    Ip = jnp.where(last, qp1, Ip)
        org = (-1,) * self.nd
        return F(Im, org), F(Ip, org)

    def _ppm_traces(self, qf, axis, comp_bc, wlo_c, whi_c, dt,
                    is_velocity, comp):
        g = self.grid
        n = g.n_cell[axis]
        dtdx = dt / g.dx[axis]
        sm2, sm1, s0, sp1, sp2 = (self._shift(qf, axis, o)
                                  for o in (-2, -1, 0, 1, 2))
        d1 = _van_leer(s0, sp1, sm1)
        d2 = _van_leer(sm1, s0, sm2)
        sedge1 = 0.5 * (s0 + sm1) - (1.0 / 6.0) * (d1 - d2)
        sedge1 = jnp.clip(sedge1, jnp.minimum(s0, sm1), jnp.maximum(s0, sm1))
        d1 = _van_leer(sp1, sp2, s0)
        d2 = _van_leer(s0, sp1, sm1)
        sedge2 = 0.5 * (sp1 + s0) - (1.0 / 6.0) * (d1 - d2)
        sedge2 = jnp.clip(sedge2, jnp.minimum(s0, sp1), jnp.maximum(s0, sp1))

        def limit(sm, sp, s0):
            flat = (sp - s0) * (s0 - sm) < 0.0
            big_p = jnp.abs(sp - s0) >= 2.0 * jnp.abs(sm - s0)
            big_m = jnp.abs(sm - s0) >= 2.0 * jnp.abs(sp - s0)
            sp_n = jnp.where(flat, s0,
                             jnp.where(big_p, 3.0 * s0 - 2.0 * sm, sp))
            sm_n = jnp.where(flat, s0,
                             jnp.where(jnp.logical_and(~big_p, big_m),
                                       3.0 * s0 - 2.0 * sp, sm))
            return sm_n, sp_n

        sm, sp = limit(sedge1, sedge2, s0)

        bclo, bchi = comp_bc
        if not g.periodic[axis]:
            if bclo in (BCType.ext_dir, BCType.hoextrap):
                sm, sp = self._ppm_bc(axis, qf, sm, sp, sedge1, sedge2,
                                      s0.shape, side=0)
            if bchi in (BCType.ext_dir, BCType.hoextrap):
                sm, sp = self._ppm_bc(axis, qf, sm, sp, sedge1, sedge2,
                                      s0.shape, side=1)

        s6 = 6.0 * s0 - 3.0 * (sm + sp)
        sig_p = jnp.abs(whi_c) * dtdx
        sig_m = jnp.abs(wlo_c) * dtdx
        Ip = jnp.where(whi_c > SMALL_VEL,
                       sp - 0.5 * sig_p * ((sp - sm)
                                           - (1.0 - 2.0 / 3.0 * sig_p) * s6),
                       s0)
        Im = jnp.where(wlo_c < -SMALL_VEL,
                       sm + 0.5 * sig_m * ((sp - sm)
                                           + (1.0 - 2.0 / 3.0 * sig_m) * s6),
                       s0)
        org = (-1,) * self.nd
        return F(Im, org), F(Ip, org)

    def _ppm_bc(self, axis, qf, sm, sp, sedge1, sedge2, shape, side):
        """Godunov_ppm_*bc one-sided edge at the domain face + re-limit at
        the one-away cell (ppm.H:31-186)."""
        g = self.grid
        n = g.n_cell[axis]

        def at(cell):
            r = self._cells1()
            r[axis] = (cell, cell + 1)
            return qf.win(r)

        if side == 0:
            qg, q0, q1, q2 = at(-1), at(0), at(1), at(2)
            sedge = -0.2 * qg + 0.75 * q0 + 0.5 * q1 - 0.05 * q2
            sedge = jnp.clip(sedge, jnp.minimum(q0, q1), jnp.maximum(q0, q1))
            m0 = _iota_mask(shape, axis, -1, 0)
            m1 = _iota_mask(shape, axis, -1, 1)
            sm = jnp.where(m0, qg, sm)
            sp = jnp.where(m0, sedge, sp)
            # cell domlo+1: sm <- sedge; sp = sedge2(at that cell); re-limit
            smc = jnp.broadcast_to(sedge, shape)
            spc = sp
            c = at(1)
        else:
            qg, q0, q1, q2 = at(n), at(n - 1), at(n - 2), at(n - 3)
            sedge = -0.2 * qg + 0.75 * q0 + 0.5 * q1 - 0.05 * q2
            sedge = jnp.clip(sedge, jnp.minimum(q0, q1), jnp.maximum(q0, q1))
            m0 = _iota_mask(shape, axis, -1, n - 1)
            m1 = _iota_mask(shape, axis, -1, n - 2)
            sp = jnp.where(m0, qg, sp)
            sm = jnp.where(m0, sedge, sm)
            spc = jnp.broadcast_to(sedge, shape)
            smc = sm
            c = at(n - 2)

        flat = (spc - c) * (c - smc) <= 0.0
        big_p = jnp.abs(spc - c) >= 2.0 * jnp.abs(smc - c)
        big_m = jnp.abs(smc - c) >= 2.0 * jnp.abs(spc - c)
        sp_n = jnp.where(flat, c, jnp.where(big_p, 3.0 * c - 2.0 * smc, spc))
        sm_n = jnp.where(flat, c,
                         jnp.where(jnp.logical_and(~big_p, big_m),
                                   3.0 * c - 2.0 * spc, smc))
        sm = jnp.where(m1, sm_n, sm)
        sp = jnp.where(m1, sp_n, sp)
        return sm, sp

    # ------------------------------------------------------------------
    # face lo/hi states + BC fixes
    # ------------------------------------------------------------------
    def _face_lo_hi(self, d, Im: F, Ip: F, forces: Optional[F], dt,
                    trans_ext: int):
        """lo(face f)=Ip(cell f-1), hi(face f)=Im(cell f); faces 0..n_d,
        transverse cells [-trans_ext, n+trans_ext)."""
        spec_hi = {d: (0, 1)}
        r_hi = self._rng(spec_hi, default=(-trans_ext, trans_ext))
        r_lo = list(r_hi)
        r_lo[d] = (r_hi[d][0] - 1, r_hi[d][1] - 1)
        lo = Ip.win(r_lo)
        hi = Im.win(r_hi)
        if self.uft and forces is not None:
            lo = lo + 0.5 * dt * forces.win(r_lo)
            hi = hi + 0.5 * dt * forces.win(r_hi)
        return lo, hi, r_lo, r_hi

    def _face_org(self, d, trans_ext=1):
        return tuple(0 if a == d else -trans_ext for a in range(self.nd))

    def _trans_bc(self, d, lo, hi, qf: F, comp_bc, is_velocity, comp,
                  trans_ext: int):
        g = self.grid
        if g.periodic[d]:
            return lo, hi
        n = g.n_cell[d]
        bclo, bchi = comp_bc
        m_lo = _iota_mask(lo.shape, d, 0, 0)
        m_hi = _iota_mask(lo.shape, d, 0, n)
        r = self._rng({d: (0, 1)}, default=(-trans_ext, trans_ext))

        if bclo == BCType.ext_dir:
            rg = list(r)
            rg[d] = (-1, 0)
            bval = qf.win(rg)
            lo = jnp.where(m_lo, bval, lo)
            if comp == d and is_velocity:
                hi = jnp.where(m_lo, bval, hi)
        elif bclo in (BCType.foextrap, BCType.hoextrap, BCType.reflect_even):
            lo = jnp.where(m_lo, hi, lo)
        elif bclo == BCType.reflect_odd:
            lo = jnp.where(m_lo, 0.0, lo)
            hi = jnp.where(m_lo, 0.0, hi)

        if bchi == BCType.ext_dir:
            rg = list(r)
            rg[d] = (n, n + 1)
            bval = qf.win(rg)
            hi = jnp.where(m_hi, bval, hi)
            if comp == d and is_velocity:
                lo = jnp.where(m_hi, bval, lo)
        elif bchi in (BCType.foextrap, BCType.hoextrap, BCType.reflect_even):
            hi = jnp.where(m_hi, lo, hi)
        elif bchi == BCType.reflect_odd:
            lo = jnp.where(m_hi, 0.0, lo)
            hi = jnp.where(m_hi, 0.0, hi)
        return lo, hi

    def _cc_bc(self, d, stl, sth, qf: F, comp_bc, is_velocity, comp, r_face):
        g = self.grid
        if g.periodic[d]:
            return stl, sth
        n = g.n_cell[d]
        bclo, bchi = comp_bc
        m_lo = _iota_mask(stl.shape, d, 0, 0)
        m_hi = _iota_mask(stl.shape, d, 0, n)
        if bclo == BCType.ext_dir:
            rg = list(r_face)
            rg[d] = (-1, 0)
            bval = qf.win(rg)
            stl = jnp.where(m_lo, bval, stl)
            if comp == d and is_velocity:
                sth = jnp.where(m_lo, bval, sth)
        elif bclo in (BCType.foextrap, BCType.hoextrap, BCType.reflect_even):
            stl = jnp.where(m_lo, sth, stl)
        elif bclo == BCType.reflect_odd:
            sth = jnp.where(m_lo, 0.0, sth)
            stl = jnp.where(m_lo, 0.0, stl)
        if bchi == BCType.ext_dir:
            rg = list(r_face)
            rg[d] = (n, n + 1)
            bval = qf.win(rg)
            sth = jnp.where(m_hi, bval, sth)
            if comp == d and is_velocity:
                stl = jnp.where(m_hi, bval, stl)
        elif bchi in (BCType.foextrap, BCType.hoextrap, BCType.reflect_even):
            sth = jnp.where(m_hi, stl, sth)
        elif bchi == BCType.reflect_odd:
            stl = jnp.where(m_hi, 0.0, stl)
            sth = jnp.where(m_hi, 0.0, sth)
        return stl, sth

    def _prevent_backflow(self, d, stl, sth, comp_bc):
        g = self.grid
        if g.periodic[d]:
            return stl, sth
        n = g.n_cell[d]
        bclo, bchi = comp_bc
        if bclo in (BCType.foextrap, BCType.hoextrap):
            m = _iota_mask(stl.shape, d, 0, 0)
            v = jnp.minimum(sth, 0.0)
            sth = jnp.where(m, v, sth)
            stl = jnp.where(m, v, stl)
        if bchi in (BCType.foextrap, BCType.hoextrap):
            m = _iota_mask(stl.shape, d, 0, n)
            v = jnp.maximum(stl, 0.0)
            stl = jnp.where(m, v, stl)
            sth = jnp.where(m, v, sth)
        return stl, sth

    @staticmethod
    def _upwind_edge(lo, hi, w):
        st = jnp.where(w >= 0.0, lo, hi)
        return jnp.where(jnp.abs(w) < SMALL_VEL, 0.5 * (hi + lo), st)

    @staticmethod
    def _riemann(stl, sth):
        st = jnp.where(stl + sth >= 0.0, stl, sth)
        ltm = jnp.logical_or(jnp.logical_and(stl <= 0.0, sth >= 0.0),
                             jnp.abs(stl + sth) < SMALL_VEL)
        return jnp.where(ltm, 0.0, st)

    # ------------------------------------------------------------------
    # transverse corrections, cell-indexed
    # ------------------------------------------------------------------
    def _cell_corr(self, t, inter: F, w: F, qf: Optional[F], dt,
                   cell_ranges, conservative: bool, corner: bool):
        """Correction at the cells given by cell_ranges, from transverse
        axis t:  non-conservative: c*(w_hi+w_lo)(q_hi-q_lo)/dx_t with
        c = dt/6 (corner) or dt/4 (final);  conservative:
        c2*[(q_hi w_hi - q_lo w_lo) - q_cell (w_hi - w_lo)]/dx_t with
        c2 = dt/3 or dt/2 (divu terms drop: divu == 0)."""
        g = self.grid
        r_lo = list(cell_ranges)
        r_hi = list(cell_ranges)
        r_hi[t] = (cell_ranges[t][0] + 1, cell_ranges[t][1] + 1)
        wlo = w.win(r_lo)
        whi = w.win(r_hi)
        qlo = inter.win(r_lo)
        qhi = inter.win(r_hi)
        if conservative:
            coef = dt / (3.0 * g.dx[t]) if corner else 0.5 * dt / g.dx[t]
            qc = qf.win(cell_ranges)
            return coef * ((qhi * whi - qlo * wlo) - qc * (whi - wlo))
        coef = dt / (6.0 * g.dx[t]) if corner else 0.25 * dt / g.dx[t]
        return coef * (whi + wlo) * (qhi - qlo)

    def _apply_cell_corr(self, d, lo, hi, corrF: F, face_ranges):
        """lo(face f) -= corr(cell f-1); hi(face f) -= corr(cell f)."""
        r_hi = list(face_ranges)
        r_hi[d] = (face_ranges[d][0], face_ranges[d][1])
        r_lo = list(face_ranges)
        r_lo[d] = (face_ranges[d][0] - 1, face_ranges[d][1] - 1)
        return lo - corrF.win(r_lo), hi - corrF.win(r_hi)

    # ------------------------------------------------------------------
    # MAC prediction
    # ------------------------------------------------------------------
    def predict(self, vel_g: jnp.ndarray, forces_g: Optional[jnp.ndarray],
                dt, ng: int, bcrecs: np.ndarray,
                gmacphi: Optional[List[jnp.ndarray]] = None
                ) -> List[jnp.ndarray]:
        """gmacphi: (1/rho) grad(mac_phi) fluxes on faces for the
        use_mac_phi_in_godunov warm start (reference predict_*D.cpp:
        subtract 0.5*dt*gphi from the traces, add it back after the
        Riemann selection)."""
        from incflo_tpu.ops import pallas_godunov as pg
        if (gmacphi is None and not self.uft and pg.enabled()
                and pg.supported(self.grid, vel_g.dtype)):
            from incflo_tpu.ops.stencil import inner
            vel = inner(vel_g, ng, self.nd)
            forces = (inner(forces_g, 1, self.nd)
                      if forces_g is not None else None)
            return pg.predict(self.grid, vel, forces, dt, self.use_ppm)
        if gmacphi is None and not self.uft:
            info = pg.shard_info(self.grid, vel_g.dtype,
                                 pg.N_LIVE_PREDICT)
            if info is not None:
                from incflo_tpu.ops.stencil import inner
                vel = inner(vel_g, ng, self.nd)
                forces = (inner(forces_g, 1, self.nd)
                          if forces_g is not None else None)
                return pg.predict_sharded(self.grid, vel, forces, dt,
                                          self.use_ppm, info)
        return self._predict(vel_g, forces_g, dt, ng, bcrecs, gmacphi)

    def _predict(self, vel_g, forces_g, dt, ng, bcrecs, gmacphi=None):
        g = self.grid
        nd = self.nd
        org = (-ng,) * nd
        comps = [F(vel_g[..., c], org) for c in range(nd)]
        fcomps = [F(forces_g[..., c], (-1,) * nd) if forces_g is not None
                  else None for c in range(nd)]

        def bc_of(c, ax):
            return (BCType(int(bcrecs[c, ax, 0])), BCType(int(bcrecs[c, ax, 1])))

        Im, Ip = {}, {}
        for ax in range(nd):
            w = self._shift(comps[ax], ax, 0)   # cell velocity on cells1
            for c in range(nd):
                Im[(ax, c)], Ip[(ax, c)] = self._traces(
                    comps[c], ax, bc_of(c, ax), w, w, dt, True, c)

        # trans velocities (Riemann of own component)
        u_ad = {}
        for ax in range(nd):
            lo, hi, _, _ = self._face_lo_hi(ax, Im[(ax, ax)], Ip[(ax, ax)],
                                            fcomps[ax], dt, 1)
            lo, hi = self._trans_bc(ax, lo, hi, comps[ax], bc_of(ax, ax),
                                    True, ax, 1)
            u_ad[ax] = F(self._riemann(lo, hi), self._face_org(ax))

        # lo/hi + upwinded edge states per axis for each component
        xlo, xhi, edge = {}, {}, {}
        for ax in range(nd):
            for c in range(nd):
                lo, hi, _, _ = self._face_lo_hi(ax, Im[(ax, c)], Ip[(ax, c)],
                                                fcomps[c], dt, 1)
                lo, hi = self._trans_bc(ax, lo, hi, comps[c], bc_of(c, ax),
                                        True, c, 1)
                orgf = self._face_org(ax)
                xlo[(ax, c)] = F(lo, orgf)
                xhi[(ax, c)] = F(hi, orgf)
                edge[(ax, c)] = F(self._upwind_edge(lo, hi, u_ad[ax].a), orgf)

        out = []
        for d in range(nd):
            c = d
            t_axes = [a for a in range(nd) if a != d]
            r_face = self._rng({d: (0, 1)})      # faces 0..n x interior
            stl = xlo[(d, c)].win(r_face)
            sth = xhi[(d, c)].win(r_face)

            for t in t_axes:
                if nd == 2:
                    inter = edge[(t, c)]
                else:
                    o = [a for a in t_axes if a != t][0]
                    inter = self._corner_stage(t, o, d, c, xlo, xhi, edge,
                                               u_ad, comps[c], bc_of(c, t),
                                               True, dt, conservative=False,
                                               mac=u_ad)
                corr_cells = self._rng({d: (-1, 1)})
                corrF = F(self._cell_corr(t, inter, u_ad[t], None, dt,
                                          corr_cells, False, corner=False),
                          tuple(-1 if a == d else 0 for a in range(nd)))
                stl, sth = self._apply_cell_corr(d, stl, sth, corrF, r_face)

            if not self.uft and fcomps[c] is not None:
                r_lo = list(r_face)
                r_lo[d] = (r_face[d][0] - 1, r_face[d][1] - 1)
                stl = stl + 0.5 * dt * fcomps[c].win(r_lo)
                sth = sth + 0.5 * dt * fcomps[c].win(r_face)

            gphi = None
            if gmacphi is not None:
                # getFluxes returns (-1/rho G phi); use the negative
                gphi = -gmacphi[d]
                stl = stl - 0.5 * dt * gphi
                sth = sth - 0.5 * dt * gphi

            stl, sth = self._cc_bc(d, stl, sth, comps[c], bc_of(c, d),
                                   True, c, r_face)
            stl, sth = self._prevent_backflow(d, stl, sth, bc_of(c, d))
            q = self._riemann(stl, sth)
            if gphi is not None:
                q = q + 0.5 * dt * gphi
            out.append(q)
        return out

    def _corner_stage(self, t, o, d, c, xlo, xhi, edge, w_sel, qf, bc_t,
                      is_velocity, dt, conservative, mac, iconsv=False):
        """Corner-coupled t-face states for face direction d: start from
        (t-lo, t-hi), subtract the o-derivative correction built from the
        o-edge states, apply trans_bc(t), upwind with w_sel[t].

        Extents: t faces [0,n+1), d cells [-1,n+1), o cells [0,n)."""
        spec = {t: (0, 1), d: (-1, 1)}
        r_face = self._rng(spec)
        lo = xlo[(t, c)].win(r_face)
        hi = xhi[(t, c)].win(r_face)
        corr_cells = self._rng({t: (-1, 1), d: (-1, 1)})
        corr = self._cell_corr(o, edge[(o, c)], mac[o], qf, dt, corr_cells,
                               conservative and iconsv, corner=True)
        corrF = F(corr, tuple(-1 if a in (t, d) else 0 for a in range(self.nd)))
        lo, hi = self._apply_cell_corr(t, lo, hi, corrF, r_face)
        lo, hi = self._trans_bc_win(t, lo, hi, qf, bc_t, is_velocity, c, spec)
        w = w_sel[t].win(r_face)
        orgf = tuple(0 if a == t else (-1 if a == d else 0)
                     for a in range(self.nd))
        return F(self._upwind_edge(lo, hi, w), orgf)

    def _trans_bc_win(self, d, lo, hi, qf: F, comp_bc, is_velocity, comp,
                      spec):
        """_trans_bc for arbitrary window spec (d must map to faces)."""
        g = self.grid
        if g.periodic[d]:
            return lo, hi
        n = g.n_cell[d]
        bclo, bchi = comp_bc
        m_lo = _iota_mask(lo.shape, d, 0, 0)
        m_hi = _iota_mask(lo.shape, d, 0, n)
        r = self._rng(spec)
        if bclo == BCType.ext_dir:
            rg = list(r)
            rg[d] = (-1, 0)
            bval = qf.win(rg)
            lo = jnp.where(m_lo, bval, lo)
            if comp == d and is_velocity:
                hi = jnp.where(m_lo, bval, hi)
        elif bclo in (BCType.foextrap, BCType.hoextrap, BCType.reflect_even):
            lo = jnp.where(m_lo, hi, lo)
        elif bclo == BCType.reflect_odd:
            lo = jnp.where(m_lo, 0.0, lo)
            hi = jnp.where(m_lo, 0.0, hi)
        if bchi == BCType.ext_dir:
            rg = list(r)
            rg[d] = (n, n + 1)
            bval = qf.win(rg)
            hi = jnp.where(m_hi, bval, hi)
            if comp == d and is_velocity:
                lo = jnp.where(m_hi, bval, lo)
        elif bchi in (BCType.foextrap, BCType.hoextrap, BCType.reflect_even):
            hi = jnp.where(m_hi, lo, hi)
        elif bchi == BCType.reflect_odd:
            lo = jnp.where(m_hi, 0.0, lo)
            hi = jnp.where(m_hi, 0.0, hi)
        return lo, hi

    # ------------------------------------------------------------------
    # advective update (compute_godunov_advection)
    # ------------------------------------------------------------------
    def advect(self, q_g: jnp.ndarray, umac: Sequence[jnp.ndarray],
               forces_g: Optional[jnp.ndarray], dt, ng: int,
               bcrecs: np.ndarray, iconserv: Sequence[int],
               is_velocity: bool) -> jnp.ndarray:
        """q_g grown by ng>=3; umac: interior face arrays (n+1 own axis).
        Returns dq/dt on the interior."""
        from incflo_tpu.ops import pallas_godunov as pg
        if (not self.uft and pg.enabled()
                and pg.supported(self.grid, q_g.dtype)):
            from incflo_tpu.ops.stencil import inner
            q = inner(q_g, ng, self.nd)
            forces = (inner(forces_g, 1, self.nd)
                      if forces_g is not None else None)
            return pg.advect(self.grid, q, umac, forces, dt,
                             tuple(int(i) for i in iconserv), self.use_ppm)
        if not self.uft:
            info = pg.shard_info(self.grid, q_g.dtype, pg.N_LIVE_ADVECT)
            if info is not None:
                from incflo_tpu.ops.stencil import inner
                q = inner(q_g, ng, self.nd)
                forces = (inner(forces_g, 1, self.nd)
                          if forces_g is not None else None)
                return pg.advect_sharded(
                    self.grid, q, umac, forces, dt,
                    tuple(int(i) for i in iconserv), self.use_ppm, info)
        g = self.grid
        nd = self.nd
        ncomp = q_g.shape[-1]
        org = (-ng,) * nd

        # extend macs: own axis faces [-1, n+2), transverse cells [-1, n+1)
        macF = [self._extend_mac(umac[ax], ax) for ax in range(nd)]

        rates = []
        for c in range(ncomp):
            qf = F(q_g[..., c], org)
            fF = (F(forces_g[..., c], (-1,) * nd)
                  if forces_g is not None else None)
            icons = bool(iconserv[c])
            bc = lambda ax: (BCType(int(bcrecs[c, ax, 0])),
                             BCType(int(bcrecs[c, ax, 1])))

            Im, Ip = {}, {}
            for ax in range(nd):
                # wave speeds at the cell's low/high faces from umac
                r = self._cells1()
                r_lo = list(r)
                r_hi = list(r)
                r_hi[ax] = (r[ax][0] + 1, r[ax][1] + 1)
                wlo = macF[ax].win(r_lo)
                whi = macF[ax].win(r_hi)
                Im[ax], Ip[ax] = self._traces(qf, ax, bc(ax), wlo, whi, dt,
                                              is_velocity, c)

            xlo, xhi, edge = {}, {}, {}
            for ax in range(nd):
                lo, hi, _, _ = self._face_lo_hi(ax, Im[ax], Ip[ax],
                                                fF, dt, 1)
                lo, hi = self._trans_bc(ax, lo, hi, qf, bc(ax),
                                        is_velocity, c, 1)
                orgf = self._face_org(ax)
                w = macF[ax].win(self._rng({ax: (0, 1)}, default=(-1, 1)))
                xlo[ax] = F(lo, orgf)
                xhi[ax] = F(hi, orgf)
                edge[ax] = F(self._upwind_edge(lo, hi, w), orgf)

            # final face states per direction
            qface = {}
            for d in range(nd):
                t_axes = [a for a in range(nd) if a != d]
                r_face = self._rng({d: (0, 1)})
                stl = xlo[d].win(r_face)
                sth = xhi[d].win(r_face)
                for t in t_axes:
                    if nd == 2:
                        inter = edge[t]
                    else:
                        o = [a for a in t_axes if a != t][0]
                        inter = self._corner_stage_adv(
                            t, o, d, xlo, xhi, edge, macF, qf, bc(t),
                            is_velocity, c, dt, icons)
                    corr_cells = self._rng({d: (-1, 1)})
                    corrF = F(self._cell_corr(t, inter, macF[t], qf, dt,
                                              corr_cells, icons,
                                              corner=False),
                              tuple(-1 if a == d else 0 for a in range(nd)))
                    stl, sth = self._apply_cell_corr(d, stl, sth, corrF,
                                                     r_face)
                if not self.uft and fF is not None:
                    r_lo = list(r_face)
                    r_lo[d] = (r_face[d][0] - 1, r_face[d][1] - 1)
                    stl = stl + 0.5 * dt * fF.win(r_lo)
                    sth = sth + 0.5 * dt * fF.win(r_face)
                stl, sth = self._cc_bc(d, stl, sth, qf, bc(d),
                                       is_velocity, c, r_face)
                w = macF[d].win(self._rng({d: (0, 1)}))
                qface[d] = self._upwind_edge(stl, sth, w)

            # divergence
            rate = None
            for d in range(nd):
                dxi = 1.0 / g.dx[d]
                w = macF[d].win(self._rng({d: (0, 1)}))
                flo = jnp.take(qface[d], jnp.arange(0, g.n_cell[d]), axis=d)
                fhi = jnp.take(qface[d], jnp.arange(1, g.n_cell[d] + 1), axis=d)
                wlo = jnp.take(w, jnp.arange(0, g.n_cell[d]), axis=d)
                whi = jnp.take(w, jnp.arange(1, g.n_cell[d] + 1), axis=d)
                if icons:
                    term = dxi * (wlo * flo - whi * fhi)
                else:
                    term = 0.5 * dxi * (wlo + whi) * (flo - fhi)
                rate = term if rate is None else rate + term
            rates.append(rate)
        from incflo_tpu.ops.stencil import comp_stack
        return comp_stack(rates, axis=-1)

    def _corner_stage_adv(self, t, o, d, xlo, xhi, edge, macF, qf, bc_t,
                          is_velocity, comp, dt, icons):
        spec = {t: (0, 1), d: (-1, 1)}
        r_face = self._rng(spec)
        lo = xlo[t].win(r_face)
        hi = xhi[t].win(r_face)
        corr_cells = self._rng({t: (-1, 1), d: (-1, 1)})
        corr = self._cell_corr(o, edge[o], macF[o], qf, dt, corr_cells,
                               icons, corner=True)
        corrF = F(corr, tuple(-1 if a in (t, d) else 0
                              for a in range(self.nd)))
        lo, hi = self._apply_cell_corr(t, lo, hi, corrF, r_face)
        lo, hi = self._trans_bc_win(t, lo, hi, qf, bc_t, is_velocity,
                                    comp, spec)
        w = macF[t].win(r_face)
        orgf = tuple(0 if a == t else (-1 if a == d else 0)
                     for a in range(self.nd))
        return F(self._upwind_edge(lo, hi, w), orgf)

    def _extend_mac(self, m: jnp.ndarray, ax: int) -> F:
        """Extend a face array: own axis -> faces [-1, n+2) (wrap for
        periodic using face n-1/1 since faces 0 and n coincide; zero
        otherwise, matching setBndry(0)+FillBoundary); transverse axes ->
        one ghost cell (wrap or zero)."""
        g = self.grid
        nd = self.nd
        if g.periodic[ax]:
            n = g.n_cell[ax]
            lo = jnp.take(m, jnp.asarray([n - 1]), axis=ax)
            hi = jnp.take(m, jnp.asarray([1]), axis=ax)
            m = jnp.concatenate([lo, m, hi], axis=ax)
        else:
            widths = [(0, 0)] * nd
            widths[ax] = (1, 1)
            m = jnp.pad(m, widths)
        for a in range(nd):
            if a == ax:
                continue
            if g.periodic[a]:
                nlo = jnp.take(m, jnp.asarray([m.shape[a] - 1]), axis=a)
                nhi = jnp.take(m, jnp.asarray([0]), axis=a)
                m = jnp.concatenate([nlo, m, nhi], axis=a)
            else:
                widths = [(0, 0)] * nd
                widths[a] = (1, 1)
                m = jnp.pad(m, widths)
        return F(m, tuple(-1 for _ in range(nd)))
