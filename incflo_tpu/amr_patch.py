"""Tagged-box patch AMR: real refinement savings with TPU-static shapes.

The reference refines arbitrary tagged BoxArrays
(src/incflo_regrid.cpp:8-119) with two-level fillpatch ghosts
(src/boundary_conditions/incflo_fillpatch.cpp:10-255) and average_down
synchronization.  Arbitrary dynamic box lists are hostile to XLA's
static-shape compilation, so this module implements the TPU-native
middle ground between that and the dense-fine mode of amr.py:

  * Each patch is a BOX: a contiguous nd index range in its parent
    (amr.patch_mode = box; a Berger-Rigoutsos-style signature split
    clusters the tags into up to amr.max_patches boxes per parent --
    the reference's ErrorEst -> cluster -> BoxArray pipeline with the
    box count bounded for compile stability).  A handful of large
    dense boxes is the refinement bucketing a TPU wants: a few big
    fused kernels instead of many small boxes.
  * amr.patch_mode = slab constrains every box to span the whole
    domain on all but one axis (chosen where the tagged region
    localizes -- e.g. the interface band of rayleigh_taylor along z):
    the cheapest-to-compile mode, best for banded features.
  * Box bounds are bucketed to coarse blocks (blocking factor 4) and
    padded, so regrids usually keep the compiled shape; a genuine
    growth recompiles once.
  * No subcycling (like the reference): one dt = min over levels
    advances every level; the fine level's ghosts, and the Dirichlet
    closures of its MAC/nodal/diffusion solves at the two coarse-fine
    faces, are interpolated from the just-advanced parent state
    (one-way coupling); average_down feeds the fine solution back into
    the parent each step (two-way).

Coarse-fine closures (per solve):
  state ghosts      : bilinear cell interpolation of parent new-time
                      state via the ext_dir machinery (PatchEV)
  MAC projection    : Dirichlet phi at CF faces = interpolated parent
                      mac_phi                      (bc_override/phi_bvals)
  nodal projection  : Dirichlet phi at CF boundary nodes = nodal
                      prolongation of parent p     (dirichlet_vals)
  diffusion         : Dirichlet velocity/tracer at CF faces =
                      interpolated parent fields   (bvals_override)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from incflo_tpu import bcs, probs
from incflo_tpu.bcs import BCType
from incflo_tpu.config import IncfloConfig
from incflo_tpu.grid import Grid
from incflo_tpu.ops import mac_projection
from incflo_tpu.ops import multigrid as mg
from incflo_tpu.simulation import Simulation
from incflo_tpu.state import LevelState, SimState

BLOCK = 4          # box bounds snap to this many coarse cells
NG_CTX = 4         # interp ghost depth kept in the context arrays

# a patch box: per-axis half-open parent-cell ranges ((lo,...), (hi,...))
Box = Tuple[Tuple[int, ...], Tuple[int, ...]]


def _slab_box(lo: int, hi: int, axis: int, n_cell) -> Box:
    """Box spanning the whole domain except [lo, hi) along `axis`."""
    lo_t = tuple(lo if a == axis else 0 for a in range(len(n_cell)))
    hi_t = tuple(hi if a == axis else n for a, n in enumerate(n_cell))
    return lo_t, hi_t


# ---------------------------------------------------------------------
# interpolation helpers (parent cells -> child cells, ratio 2)
# ---------------------------------------------------------------------

def _prolong_window(cw: jnp.ndarray, nd: int) -> jnp.ndarray:
    """Bilinear 2x cell prolongation of a parent window that already
    carries one parent ghost on every spatial axis (the output drops the
    half-child overhang so it maps exactly onto 2*(w-2)+2 child cells:
    children of the interior plus ONE child ghost ring)."""
    out = cw
    for ax in range(nd):
        n = out.shape[ax]
        mid = mg._slice_axis(out, ax, slice(1, n - 1))
        left = mg._slice_axis(out, ax, slice(0, n - 2))
        right = mg._slice_axis(out, ax, slice(2, n))
        even = 0.75 * mid + 0.25 * left
        odd = 0.75 * mid + 0.25 * right
        body = mg._interleave(even, odd, ax)    # 2*(n-2) children
        lo = (0.75 * mg._slice_axis(out, ax, slice(0, 1))
              + 0.25 * mg._slice_axis(out, ax, slice(1, 2)))
        hi = (0.75 * mg._slice_axis(out, ax, slice(n - 1, n))
              + 0.25 * mg._slice_axis(out, ax, slice(n - 2, n - 1)))
        out = jnp.concatenate([lo, body, hi], axis=ax)
    return out


def _nodal_prolong_window(pw: jnp.ndarray, nd: int, periodic) -> jnp.ndarray:
    """Linear 2x nodal prolongation of a parent NODE window: bounded
    axes w -> 2w-1 (even copy, odd average); periodic axes hold UNIQUE
    nodes (w of them) and produce 2w children via wraparound."""
    out = pw
    for ax in range(nd):
        n = out.shape[ax]
        if periodic[ax]:
            wrapped = jnp.concatenate(
                [out, mg._slice_axis(out, ax, slice(0, 1))], axis=ax)
            odd = 0.5 * (mg._slice_axis(wrapped, ax, slice(0, n))
                         + mg._slice_axis(wrapped, ax, slice(1, n + 1)))
            out = mg._interleave(out, odd, ax)
        else:
            odd = 0.5 * (mg._slice_axis(out, ax, slice(0, n - 1))
                         + mg._slice_axis(out, ax, slice(1, n)))
            body = mg._interleave(mg._slice_axis(out, ax, slice(0, n - 1)),
                                  odd, ax)
            out = jnp.concatenate(
                [body, mg._slice_axis(out, ax, slice(n - 1, n))], axis=ax)
    return out


def _avg_down_window(f: jnp.ndarray, nd: int) -> jnp.ndarray:
    """2^nd child average over the first nd axes."""
    for ax in range(nd):
        n = f.shape[ax]
        f = 0.5 * (mg._slice_axis(f, ax, slice(0, n, 2))
                   + mg._slice_axis(f, ax, slice(1, n, 2)))
    return f


class PatchEV:
    """ExtDirValues for a patch: CF-interior faces read interpolated
    parent data; true domain faces delegate to the physical EV."""

    def __init__(self, base_ev, interior, full: jnp.ndarray, ng: int):
        self.base = base_ev
        self.interior = interior          # set of (axis, side)
        self.full = full                  # (n_f + 2ng per axis, ncomp)
        self.ng = ng
        self.ncomp = full.shape[-1]

    def slab(self, face_ax, side, comp, pads, dtype, g=1):
        if (face_ax, side) not in self.interior:
            return self.base.slab(face_ax, side, comp, pads, dtype, g=g)
        a = self.full[..., comp]
        nd = a.ndim
        sl = []
        for ax in range(nd):
            n_ax = a.shape[ax] - 2 * self.ng
            if ax == face_ax:
                if side == 0:
                    sl.append(slice(self.ng - g, self.ng))
                else:
                    sl.append(slice(self.ng + n_ax, self.ng + n_ax + g))
            else:
                p = pads[ax]
                sl.append(slice(self.ng - p, self.ng + n_ax + p))
        # trailing singleton: grow()'s ghost blocks carry the comp axis
        return a[tuple(sl)][..., None].astype(dtype)


class PatchSim(Simulation):
    """Simulation on a box patch with coarse-fine closures at the
    interior faces.  set_context() must be called (inside the parent
    trace) before any advance/init entry point runs."""

    def __init__(self, cfg: IncfloConfig, interior,
                 parent_lo: Tuple[int, ...]):
        super().__init__(cfg)
        self.cf_interior = frozenset(interior)   # {(axis, side)}
        # parent cell index of the patch lo corner, per axis
        self.parent_lo = tuple(parent_lo)
        # CF faces carry interpolated parent CELL data (FillPatch
        # semantics: stencils treat the ghosts as interior, not as a
        # face-located Dirichlet value -- the ext_dir slope forms are
        # O(h)-wrong at a CF boundary and cost a convergence order);
        # forces extrapolate (smooth fields, ghosts only feed stencils)
        for bcr in (self.vel_bcrec, self.den_bcrec, self.tra_bcrec):
            for (ax, side) in self.cf_interior:
                bcr[:, ax, side] = BCType.cf_fill
        for (ax, side) in self.cf_interior:
            self.force_bcrec[:, ax, side] = BCType.foextrap
        self._ctx_set = False
        self._base_evs = (self.vel_ev, self.den_ev, self.tra_ev)

    # -- context ------------------------------------------------------
    def _interp_full(self, field, grow_fn):
        """Bilinear parent->child interpolation of one parent field over
        the patch plus NG_CTX child ghosts on every axis."""
        nd = self.grid.ndim
        ngc = NG_CTX // 2 + 1                    # parent ghosts needed
        g = grow_fn(field, ngc)                  # parent + ngc ghosts
        sl = [slice(None)] * g.ndim
        for ax in range(nd):
            npatch_c = self.grid.n_cell[ax] // 2  # parent cells under patch
            lo = self.parent_lo[ax]               # grown-frame offset: the
            # window [lo-ngc, lo+npatch_c+ngc) in parent cells starts at
            # grown index lo (full-span axes: lo=0 -> whole grown extent)
            sl[ax] = slice(lo, lo + npatch_c + 2 * ngc)
        w = g[tuple(sl)]
        f = _prolong_window(w, nd)
        # prolong of (m + 2*ngc) parent cells per axis gives
        # 2m + 4*ngc - 2 children -> child ghost depth 2*ngc - 1
        have = 2 * ngc - 1
        t = [slice(have - NG_CTX, f.shape[a2] - (have - NG_CTX))
             for a2 in range(nd)]
        return f[tuple(t)]

    def _grow_foex(self, x, g):
        """Parent ghost fill with plain first-order extrapolation (for
        pressure-like fields with no physical BC machinery)."""
        rec = bcs.make_bcrecs(x.shape[-1], self._parent.grid.ndim) * 0 \
            + BCType.foextrap
        return bcs.grow(x, g, self._parent.grid, rec)

    def set_context(self, parent_lvl: LevelState,
                    parent_lvl_old: Optional[LevelState] = None):
        """Interpolate the parent level state into the patch halo and
        solver boundary values.  Runs at trace time inside the two-level
        step; the stored arrays are tracers of that step.

        parent_lvl_old, when given, feeds the STATE ghost fills (the
        old-time convective stencils of the fine step read the parent's
        old state, matching the reference's FillPatch at t_old --
        incflo_fillpatch.cpp two-level old-time fill); the implicit-solve
        closures (MAC/nodal/diffusion Dirichlet values) always come from
        the just-advanced parent_lvl."""
        nd = self.grid.ndim

        ghost_src = parent_lvl_old if parent_lvl_old is not None \
            else parent_lvl
        vel_g_full = self._interp_full(ghost_src.velocity,
                                       self._parent.grow_vel)
        rho_g_full = self._interp_full(
            ghost_src.density[..., None],
            lambda x, g: self._parent.grow_rho(x[..., 0], g)[..., None])
        tra_g_full = self._interp_full(ghost_src.tracer,
                                       self._parent.grow_tra)
        if parent_lvl_old is not None:
            vel_full = self._interp_full(parent_lvl.velocity,
                                         self._parent.grow_vel)
            rho_full = self._interp_full(
                parent_lvl.density[..., None],
                lambda x, g: self._parent.grow_rho(x[..., 0], g)[..., None])
            tra_full = self._interp_full(parent_lvl.tracer,
                                         self._parent.grow_tra)
        else:
            vel_full, rho_full, tra_full = (vel_g_full, rho_g_full,
                                            tra_g_full)
        mac_full = self._interp_full(parent_lvl.mac_phi[..., None],
                                     self._grow_foex)

        self.vel_ev = PatchEV(self._base_evs[0], self.cf_interior,
                              vel_g_full, NG_CTX)
        self.den_ev = PatchEV(self._base_evs[1], self.cf_interior,
                              rho_g_full, NG_CTX)
        self.tra_ev = PatchEV(self._base_evs[2], self.cf_interior,
                              tra_g_full, NG_CTX)

        # solver boundary values at the CF faces
        self._mac_bvals = {}
        self._vel_bvals = {}
        self._tra_bvals = {}
        for (fax, side) in self.cf_interior:
            def face_val(full):
                n_ax = full.shape[fax] - 2 * NG_CTX
                if side == 0:
                    gh = mg._slice_axis(full, fax,
                                        slice(NG_CTX - 1, NG_CTX))
                    inb = mg._slice_axis(full, fax,
                                         slice(NG_CTX, NG_CTX + 1))
                else:
                    gh = mg._slice_axis(full, fax,
                                        slice(NG_CTX + n_ax,
                                              NG_CTX + n_ax + 1))
                    inb = mg._slice_axis(full, fax,
                                         slice(NG_CTX + n_ax - 1,
                                               NG_CTX + n_ax))
                v = 0.5 * (gh + inb)
                # transverse axes BELOW fax are already ghost-padded by 1
                # when the solver's axis-ordered pad reaches fax: shape
                # the value block accordingly (wrap if periodic)
                for a2 in range(nd):
                    if a2 == fax:
                        continue
                    m = full.shape[a2] - 2 * NG_CTX
                    if a2 < fax:
                        v = mg._slice_axis(v, a2,
                                           slice(NG_CTX - 1, NG_CTX + m + 1))
                    else:
                        v = mg._slice_axis(v, a2, slice(NG_CTX, NG_CTX + m))
                return v

            self._mac_bvals[(fax, side)] = face_val(mac_full)[..., 0]
            self._vel_bvals[(fax, side)] = face_val(vel_full)
            self._tra_bvals[(fax, side)] = face_val(tra_full)

        # nodal Dirichlet values: prolong the parent nodal p window
        self._nodal_dvals = self._nodal_dvals_from(parent_lvl.p)
        self._nodal_dvals_override = None
        self._ctx_set = True

    def _nodal_dvals_from(self, parent_p):
        """CF Dirichlet node values from a parent nodal field."""
        pf = self._interp_nodal_p(parent_p)
        out = {}
        for (fax, side) in self.cf_interior:
            n_f = pf.shape[fax]
            s2 = [slice(None)] * pf.ndim
            s2[fax] = slice(0, 1) if side == 0 else slice(n_f - 1, n_f)
            out[(fax, side)] = pf[tuple(s2)]
        return out

    # -- hooks consumed by Simulation ---------------------------------
    def _mac_bc_args(self):
        assert self._ctx_set, "PatchSim.set_context() not called"
        ov = {f: mg.SolverBC.DIRICHLET for f in self.cf_interior}
        return {"bc_override": ov, "phi_bvals": dict(self._mac_bvals)}

    def _nodal_bc_args(self):
        assert self._ctx_set
        ov = {f: mg.SolverBC.DIRICHLET for f in self.cf_interior}
        if self._nodal_dvals_override is not None:
            # composite-sync correction solve: the Dirichlet data is the
            # parent's DELTA-p (an incremental phi), not the full p
            return ov, dict(self._nodal_dvals_override)
        return ov, dict(self._nodal_dvals)

    def _diff_bc_args(self, field):
        assert self._ctx_set
        ov = {f: mg.SolverBC.DIRICHLET for f in self.cf_interior}
        return ov, dict(self._vel_bvals if field == "vel"
                        else self._tra_bvals)

    def init_state_from(self, parent_state: SimState) -> SimState:
        """Initial fine state: OWN ICs for the advected fields (sharper
        interface than interpolation) but pressure/gp INHERITED from the
        parent's post-init solve.  Running the patch's own initial
        projection against the CF Dirichlet-phi closure would instead
        mint spurious velocity (u=0 with nonzero boundary phi projects
        to u = -sigma grad(harmonic extension) != 0); the reference
        avoids this by running InitialProjection on the composite
        hierarchy."""
        assert self._ctx_set
        base = self.init_from_parent(parent_state)
        own = probs.init_fluid(self.cfg, self.grid, self.dtype)
        lvl = base.level._replace(velocity=own.velocity,
                                  density=own.density,
                                  tracer=own.tracer)
        if self.eb is not None:
            f = self.eb.fluid
            lvl = lvl._replace(velocity=lvl.velocity * f[..., None],
                               tracer=lvl.tracer * f[..., None])
        return base._replace(level=lvl)

    # -- regrid support (reference MakeNewLevelFromCoarse) -------------
    def init_from_parent(self, parent_state: SimState) -> SimState:
        """Fine state purely by interpolation of the parent (the fill
        for newly refined cells; the caller copies surviving old fine
        data over the overlap)."""
        assert self._ctx_set
        nd = self.grid.ndim

        def interior(full):
            sl = tuple(slice(NG_CTX, full.shape[a] - NG_CTX)
                       for a in range(nd))
            return full[sl]

        gp_full = self._interp_full(parent_state.level.gp, self._grow_foex)
        lvl = LevelState(
            velocity=interior(self.vel_ev.full),
            density=interior(self.den_ev.full)[..., 0],
            tracer=interior(self.tra_ev.full),
            gp=interior(gp_full),
            p=self._interp_nodal_p(parent_state.level.p),
            mac_phi=interior(
                self._interp_full(parent_state.level.mac_phi[..., None],
                                  self._grow_foex))[..., 0],
        )
        return parent_state._replace(level=lvl)

    def _interp_nodal_p(self, p):
        nd = self.grid.ndim
        per = list(self.grid.periodic)
        pw = p
        for ax in range(nd):
            if per[ax]:
                # patch covers the whole periodic axis: unique nodes,
                # exact wraparound prolongation (a bounded window would
                # mint an extra node row)
                continue
            lo = self.parent_lo[ax]
            npatch_c = self.grid.n_cell[ax] // 2
            if self._parent.grid.periodic[ax]:
                idx = jnp.arange(lo, lo + npatch_c + 1) \
                    % self._parent.grid.n_cell[ax]
                pw = jnp.take(pw, idx, axis=ax)
            else:
                sl = [slice(None)] * pw.ndim
                sl[ax] = slice(lo, lo + npatch_c + 1)
                pw = pw[tuple(sl)]
        return _nodal_prolong_window(pw, nd, per)


def compute_tags(cfg: IncfloConfig, rho: np.ndarray, grid: Grid,
                 eb=None, lev: int = 0) -> np.ndarray:
    """ErrorEst tags on level `lev` (incflo_tagging.cpp:20-44; cut cells
    forced per :133-140).  rhoerr/gradrhoerr are PER-LEVEL arrays: level
    lev uses entry lev, with the last entry repeated past the end (the
    reference resizes the vectors to max_level+1 with the back value,
    incflo_tagging.cpp:24-44)."""
    tags = np.zeros(rho.shape, bool)
    if len(cfg.rhoerr) > 0:
        tags |= rho > cfg.rhoerr[min(lev, len(cfg.rhoerr) - 1)]
    if len(cfg.gradrhoerr) > 0:
        thr = cfg.gradrhoerr[min(lev, len(cfg.gradrhoerr) - 1)]
        for ax in range(rho.ndim):
            d = np.abs(np.diff(rho, axis=ax))
            pad = [(0, 1) if a == ax else (0, 0) for a in range(rho.ndim)]
            tags |= np.pad(d, pad) >= thr
            pad = [(1, 0) if a == ax else (0, 0) for a in range(rho.ndim)]
            tags |= np.pad(d, pad) >= thr
    if cfg.tag_region:
        coords = [np.asarray(grid.cell_centers_1d(ax)).reshape(
            [-1 if a == ax else 1 for a in range(grid.ndim)])
            for ax in range(grid.ndim)]
        inside = np.ones(grid.cell_shape, bool)
        for ax in range(grid.ndim):
            inside &= (coords[ax] >= cfg.tag_region_lo[ax]) \
                & (coords[ax] <= cfg.tag_region_hi[ax])
        tags |= inside
    if eb is not None:
        tags |= np.asarray(eb.cut) > 0.5
    return tags


def choose_patch_mode(cfg: IncfloConfig) -> str:
    """Auto patch-mode selection for amr.max_level > 0 decks: 'box'
    when nd box clustering captures the INITIAL tags with clearly less
    area than the best slab (tags localized in several axes, e.g. a
    bubble); 'slab' when they localize along one axis (a band); 'dense'
    (whole-domain fine advance) when they don't localize at all.  An
    explicit amr.patch_mode in the deck wins."""
    import jax.numpy as jnp
    lvl = probs.init_fluid(cfg, cfg.grid, jnp.dtype(cfg.dtype))
    tags = compute_tags(cfg, np.asarray(lvl.density), cfg.grid)
    if cfg.eb_geometry not in ("", "all_regular", "null"):
        # forced cut-cell tagging (incflo_tagging.cpp:133-140)
        from incflo_tpu.eb import geometry as ebgeom
        phi_if = ebgeom.make_eb_geometry(cfg.eb_geometry, cfg.pp, cfg.grid)
        data = ebgeom.compute_eb_data(phi_if, cfg.grid)
        if data.has_eb:
            tags |= data.flags == ebgeom.CUT
    if not tags.any():
        return "dense"
    best = 1.0
    for ax in range(tags.ndim):
        proj = tags
        for a2 in sorted(range(tags.ndim), reverse=True):
            if a2 != ax:
                proj = proj.any(axis=a2)
        best = min(best, float(proj.mean()))
    boxes = _choose_boxes(tags, cfg.grid.n_cell, cfg.max_patches)
    box_frac = sum(int(np.prod([h - l for l, h in zip(lo, hi)]))
                   for lo, hi in boxes) / tags.size
    if box_frac <= 0.5 and box_frac <= 0.5 * best:
        return "box"
    return "slab" if best <= 0.5 else "dense"


def _choose_slab(tags: np.ndarray, axis: int, n: int) -> Tuple[int, int]:
    """Tagged index range along `axis`, padded by 1 block and snapped."""
    return _choose_slabs(tags, axis, n, max_patches=1)[0]


def _choose_slabs(tags: np.ndarray, axis: int, n: int,
                  max_patches: int = 4) -> List[Tuple[int, int]]:
    """Cluster the tagged rows along `axis` into up to `max_patches`
    disjoint slabs, each padded by one block and snapped (the 1D analog
    of the reference's ErrorEst -> box clustering, incflo_regrid.cpp:
    8-119).  Runs separated by small gaps merge first; if the budget is
    exceeded the narrowest gaps keep merging."""
    proj = tags
    for a2 in sorted(range(tags.ndim), reverse=True):
        if a2 != axis:
            proj = proj.any(axis=a2)
    idx = np.nonzero(proj)[0]
    if len(idx) == 0:
        # nothing tagged: keep a minimal centered slab alive
        mid = n // 2
        return [(max(0, mid - BLOCK), min(n, mid + BLOCK))]
    # maximal runs of tagged rows
    runs = []
    start = prev = int(idx[0])
    for i in idx[1:]:
        i = int(i)
        if i == prev + 1:
            prev = i
            continue
        runs.append((start, prev + 1))
        start = prev = i
    runs.append((start, prev + 1))
    # pad + snap each run
    slabs = []
    for lo, hi in runs:
        lo = max(0, (lo // BLOCK - 1) * BLOCK)
        hi = min(n, ((hi + BLOCK - 1) // BLOCK + 1) * BLOCK)
        slabs.append([lo, hi])
    # merge overlapping/touching, then merge smallest gaps to budget
    def merge_once(i):
        slabs[i][1] = max(slabs[i][1], slabs[i + 1][1])
        del slabs[i + 1]

    i = 0
    while i < len(slabs) - 1:
        if slabs[i + 1][0] <= slabs[i][1]:
            merge_once(i)
        else:
            i += 1
    while len(slabs) > max_patches:
        gaps = [slabs[i + 1][0] - slabs[i][1]
                for i in range(len(slabs) - 1)]
        merge_once(int(np.argmin(gaps)))
    return [tuple(s) for s in slabs]


def _tag_bbox(tags: np.ndarray) -> Optional[Box]:
    nz = np.nonzero(tags)
    if len(nz[0]) == 0:
        return None
    return (tuple(int(a.min()) for a in nz),
            tuple(int(a.max()) + 1 for a in nz))


def _box_eff(tags: np.ndarray, box: Box) -> float:
    sl = tuple(slice(lo, hi) for lo, hi in zip(*box))
    sub = tags[sl]
    return float(sub.mean()) if sub.size else 1.0


def _split_box(tags: np.ndarray, box: Box):
    """One Berger-Rigoutsos split: cut at the longest zero run of the
    in-box tag signature (preferred) or at the strongest inflection of
    its second difference; each half shrinks to its own tag bounding
    box.  Returns None when no admissible cut exists (every axis too
    thin or signature featureless)."""
    lo_t, hi_t = box
    nd = tags.ndim
    sl = tuple(slice(lo, hi) for lo, hi in zip(lo_t, hi_t))
    sub = tags[sl]
    best = None                      # (kind, score, ax, cut)
    for ax in range(nd):
        n = sub.shape[ax]
        if n < 2 * BLOCK:
            continue
        sig = sub
        for a2 in sorted(range(nd), reverse=True):
            if a2 != ax:
                sig = sig.sum(axis=a2)
        # longest interior zero run
        zero = np.nonzero(sig == 0)[0]
        if len(zero):
            runs = np.split(zero, np.nonzero(np.diff(zero) > 1)[0] + 1)
            runs = [r for r in runs if r[0] > 0 and r[-1] < n - 1]
            if runs:
                r = max(runs, key=len)
                cand = ("zero", len(r), ax, int(r[len(r) // 2]) + 1)
                if best is None or (best[0] != "zero"
                                    or cand[1] > best[1]):
                    best = cand
                continue
        if best is not None and best[0] == "zero":
            continue
        # inflection of the signature Laplacian, away from the ends
        d2 = np.diff(sig.astype(np.int64), n=2)       # at cuts 1..n-2
        flip = np.nonzero(np.abs(np.diff(np.sign(d2))) > 0)[0]
        flip = flip[(flip >= BLOCK - 1) & (flip <= n - 1 - BLOCK)]
        if len(flip):
            mag = np.abs(d2[flip + 1] - d2[flip])
            k = int(np.argmax(mag))
            cand = ("infl", float(mag[k]), ax, int(flip[k]) + 2)
            if best is None or (best[0] == "infl" and cand[1] > best[1]):
                best = cand
    if best is None:
        return None
    _, _, ax, cut = best
    halves = []
    for r in (slice(0, cut), slice(cut, sub.shape[ax])):
        idx = [slice(None)] * nd
        idx[ax] = r
        bb = _tag_bbox(sub[tuple(idx)])
        if bb is None:
            continue
        off = [lo_t[a] for a in range(nd)]
        off[ax] += r.start
        halves.append((tuple(bb[0][a] + off[a] for a in range(nd)),
                       tuple(bb[1][a] + off[a] for a in range(nd))))
    return halves if len(halves) == 2 else None


def _boxes_overlap(a: Box, b: Box) -> bool:
    """Overlapping OR touching (closed-range test): touching siblings
    must merge too -- a patch's CF ghosts read only parent data, so an
    adjacent fine box would otherwise see coarse-interp ghosts where
    fine data exists."""
    return all(a[0][d] <= b[1][d] and b[0][d] <= a[1][d]
               for d in range(len(a[0])))


def _merge_boxes(a: Box, b: Box) -> Box:
    return (tuple(min(x, y) for x, y in zip(a[0], b[0])),
            tuple(max(x, y) for x, y in zip(a[1], b[1])))


def _choose_boxes(tags: np.ndarray, n_cell, max_patches: int
                  ) -> List[Box]:
    """Cluster the tags into up to max_patches nd boxes (the reference
    ErrorEst -> Berger-Rigoutsos cluster -> BoxArray pipeline,
    incflo_regrid.cpp:8-119, with the box budget bounded for compile
    stability).  Boxes are padded by one BLOCK and snapped per axis;
    overlapping boxes merge (patches must tile disjointly for
    average_down and the non-overlapping advance)."""
    nd = tags.ndim
    bb = _tag_bbox(tags)
    if bb is None:
        mid = tuple(s // 2 for s in tags.shape)
        return [(tuple(max(0, m - BLOCK) for m in mid),
                 tuple(min(n, m + BLOCK) for m, n in zip(mid, tags.shape)))]
    boxes = [bb]
    # split the least-efficient box until every box is tight or the
    # budget is reached (splitting can only add one box per pass)
    while len(boxes) < max_patches:
        order = sorted(range(len(boxes)),
                       key=lambda i: _box_eff(tags, boxes[i]))
        done = True
        for i in order:
            if _box_eff(tags, boxes[i]) >= 0.7:
                break
            halves = _split_box(tags, boxes[i])
            if halves is not None:
                boxes[i:i + 1] = halves
                done = False
                break
        if done:
            break
    # pad + snap + clip per axis
    out = []
    for lo_t, hi_t in boxes:
        lo2 = tuple(max(0, (lo // BLOCK - 1) * BLOCK) for lo in lo_t)
        hi2 = tuple(min(n, ((hi + BLOCK - 1) // BLOCK + 1) * BLOCK)
                    for hi, n in zip(hi_t, n_cell))
        out.append((lo2, hi2))
    # merge any overlapping pair to a bounding box until disjoint
    changed = True
    while changed:
        changed = False
        for i in range(len(out)):
            for j in range(i + 1, len(out)):
                if _boxes_overlap(out[i], out[j]):
                    out[i] = _merge_boxes(out[i], out[j])
                    del out[j]
                    changed = True
                    break
            if changed:
                break
    return sorted(out)


@jax.tree_util.register_pytree_node_class
class PatchState:
    """Pytree of per-level SimStates presenting the level-0 scalars with
    the single-level SimState surface (so the CLI driver loop works
    unchanged)."""

    def __init__(self, levels):
        self.levels = tuple(levels)

    def tree_flatten(self):
        return self.levels, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children)

    @property
    def t(self):
        return self.levels[0].t

    @property
    def dt(self):
        return self.levels[0].dt

    @property
    def prev_dt(self):
        return self.levels[0].prev_dt

    @property
    def step(self):
        return self.levels[0].step

    @property
    def level(self):
        return self.levels[0].level


class SlabAMRSimulation:
    """Tagged-box patch AMR driver (amr.patch_mode = box or slab).

    The hierarchy is a PATCH TREE stored flat: sims[0] is the base
    Simulation; every further entry is a PatchSim whose parent is
    sims[parent[i]].  Each level-(L-1) patch may carry SEVERAL disjoint
    level-L boxes (amr.max_patches per parent, the reference's ErrorEst
    box clustering with a bounded box budget).  In slab mode every box
    spans the whole domain except along the single axis where the tags
    localize (cheapest compile; banded features); box mode clusters in
    all dimensions (Berger-Rigoutsos-style signature splits)."""

    def __init__(self, cfg: IncfloConfig):
        assert cfg.max_level >= 1
        self.cfg = cfg
        self.base_grid = cfg.grid
        self.max_level = cfg.max_level
        self.max_patches = cfg.max_patches
        self.composite_sync = cfg.composite_sync
        self.box_mode = cfg.patch_mode == "box"
        self.sim0 = Simulation(cfg)
        self.dtype = self.sim0.dtype
        self.axis = self._pick_axis()
        self.sims: List[Simulation] = [self.sim0]
        self.bounds: List[Box] = [((0,) * cfg.grid.ndim,
                                   tuple(cfg.grid.n_cell))]
        self.parent: List[int] = [-1]
        self.level_of: List[int] = [0]
        self._adv_cache: Dict[Tuple, object] = {}
        self.masks: List[Optional[np.ndarray]] = [None]

    def _cluster(self, tags: np.ndarray, parent_sim) -> List[Box]:
        """Tags -> child boxes, by the active clustering mode.  No tags
        => no children (the reference builds no finer level when ErrorEst
        tags nothing; per-level thresholds can stop the tree early)."""
        if not tags.any():
            return []
        n_cell = parent_sim.grid.n_cell
        if self.box_mode:
            return _choose_boxes(tags, n_cell, self.max_patches)
        slabs = _choose_slabs(tags, self.axis, n_cell[self.axis],
                              self.max_patches)
        return [_slab_box(lo, hi, self.axis, n_cell) for lo, hi in slabs]

    # -- geometry of the hierarchy ------------------------------------
    def _best_axis(self, tags: np.ndarray) -> int:
        """Axis along which the tags localize (fewest tagged rows).
        Gravity/stratified problems tag a band normal to the last axis;
        default to it when nothing is tagged yet."""
        nd = tags.ndim
        best_ax, best_frac = nd - 1, 1.1
        for ax in range(nd):
            proj = tags
            for a2 in sorted(range(nd), reverse=True):
                if a2 != ax:
                    proj = proj.any(axis=a2)
            frac = proj.mean() if proj.size else 1.0
            if frac < best_frac - 1e-9:
                best_ax, best_frac = ax, frac
        return best_ax

    def _pick_axis(self) -> int:
        cfg = self.cfg
        lvl = probs.init_fluid(cfg, cfg.grid, self.dtype)
        return self._best_axis(
            self._tag_level(np.asarray(lvl.density), self.sim0))

    def _tag_level(self, rho: np.ndarray, parent_sim,
                   lev: int = 0) -> np.ndarray:
        """ErrorEst for the level refined NEXT above parent_sim
        (reference incflo_tagging.cpp:20-44 + forced cut-cell tagging
        :133-140).  Coordinates come from the PARENT level's grid (the
        density array lives there -- L>=2 patches have their own
        prob_lo/dx); `lev` is the level being TAGGED, selecting the
        per-level rhoerr/gradrhoerr entry."""
        return compute_tags(self.cfg, rho, parent_sim.grid,
                            eb=parent_sim.eb, lev=lev)

    def _build_patch(self, parent_idx: int, box: Box) -> "PatchSim":
        """Build a PatchSim over the parent-cell box [lo, hi) (per-axis
        half-open ranges) of sims[parent_idx]."""
        parent = self.sims[parent_idx]
        pg = parent.grid
        nd = pg.ndim
        lo_t, hi_t = box
        n_f = []
        prob_lo = list(pg.prob_lo)
        prob_hi = list(pg.prob_hi)
        periodic = list(pg.periodic)
        # a patch face is PHYSICAL when it coincides with the domain face
        # through every coarser level (walls/inflow carry over); anything
        # else -- including the wrap point of a partially covered
        # periodic axis -- is a coarse-fine interior face
        parent_dom = tuple((not pg.periodic[a], not pg.periodic[a])
                           for a in range(nd)) \
            if parent is self.sim0 else parent.face_domain
        interior = []
        face_dom = []
        for ax in range(nd):
            lo, hi = lo_t[ax], hi_t[ax]
            n_f.append(2 * (hi - lo))
            dx = pg.dx[ax]
            prob_lo[ax] = pg.prob_lo[ax] + lo * dx
            prob_hi[ax] = pg.prob_lo[ax] + hi * dx
            fd = (lo == 0 and parent_dom[ax][0],
                  hi == pg.n_cell[ax] and parent_dom[ax][1])
            face_dom.append(fd)
            if not (pg.periodic[ax] and lo == 0 and hi == pg.n_cell[ax]):
                periodic[ax] = False
                if not fd[0]:
                    interior.append((ax, 0))
                if not fd[1]:
                    interior.append((ax, 1))
        gf = Grid(tuple(n_f), tuple(prob_lo), tuple(prob_hi),
                  tuple(periodic),
                  domain_lo=pg.origin,
                  domain_hi=pg.domain_hi if pg.domain_hi is not None
                  else pg.prob_hi)
        cfgf = dataclasses.replace(self.cfg, grid=gf)
        ps = PatchSim(cfgf, interior, lo_t)
        ps._parent = parent
        ps.face_domain = tuple(face_dom)
        return ps

    # back-compat shim (legacy checkpoints, old tests): slab-axis ints
    def _build_level(self, lev: int, lo: int, hi: int) -> "PatchSim":
        pg = self.sims[lev - 1].grid
        return self._build_patch(
            lev - 1, _slab_box(lo, hi, self.axis, pg.n_cell))

    def _indices_at_level(self, lev: int) -> List[int]:
        return [i for i, l in enumerate(self.level_of) if l == lev]

    # -- lifecycle ----------------------------------------------------
    def init_state(self):
        """Returns the flat list of per-patch SimStates (parents before
        children)."""
        states = [self.sim0.init_state()]
        for lev in range(1, self.max_level + 1):
            for p in self._indices_at_level(lev - 1):
                parent_state = states[p]
                rho = np.asarray(parent_state.level.density)
                tags = self._tag_level(rho, self.sims[p], lev=lev - 1)
                for box in self._cluster(tags, self.sims[p]):
                    ps = self._build_patch(p, box)
                    self.sims.append(ps)
                    self.bounds.append(box)
                    self.parent.append(p)
                    self.level_of.append(lev)
                    self.masks.append(None)
                    ps.set_context(parent_state.level)
                    states.append(ps.init_state_from(parent_state))
                self.masks[p] = self._mask_of_children(p)
        return PatchState(states)

    def _mask_of_children(self, p: int) -> Optional[np.ndarray]:
        kids = [i for i in range(len(self.sims)) if i > 0
                and self.parent[i] == p]
        if not kids:
            return None
        g = self.sims[p].grid
        m = np.zeros(g.cell_shape, bool)
        for i in kids:
            lo_t, hi_t = self.bounds[i]
            m[tuple(slice(lo, hi) for lo, hi in zip(lo_t, hi_t))] = True
        return m

    # -- advance ------------------------------------------------------
    def advance(self, state: PatchState) -> PatchState:
        key = (self.axis,) + tuple(zip(self.parent[1:], self.bounds[1:]))
        fn = self._adv_cache.get(key)
        if fn is None:
            fn = jax.jit(self._advance_impl)
            self._adv_cache[key] = fn
        out = PatchState(fn(list(state.levels),
                            [sim._ctx() for sim in self.sims]))
        # the traced context arrays stored on each PatchSim during the
        # jit trace must not leak into later host-side consumers
        # (plotfiles, regrid, checkpoint ghost fills): refresh with the
        # concrete new states
        for i in range(1, len(self.sims)):
            self.sims[i].set_context(out.levels[self.parent[i]].level)
        if self.cfg.regrid_int > 0 \
                and int(out.step) % self.cfg.regrid_int == 0:
            out = self.regrid(out)
        return out

    def _advance_impl(self, states: List[SimState],
                      ctxs=None) -> List[SimState]:
        # Per-level device contexts (prebuilt solvers, EB arrays) arrive
        # as jit arguments and are swapped in for the whole hierarchy
        # advance (incl. reproject / composite sync) so no coefficient
        # hierarchy lowers as a literal constant (Simulation._ctx).
        if ctxs is not None:
            saved = [sim._swap_ctx(c) for sim, c in zip(self.sims, ctxs)]
            try:
                return self._advance_impl(states, None)
            finally:
                for sim, sv in zip(self.sims, saved):
                    sim._swap_ctx(sv)
        # one dt for the whole hierarchy (no subcycling)
        dt = self.sim0.peek_dt(states[0])
        for i in range(1, len(self.sims)):
            self.sims[i].set_context(states[self.parent[i]].level)
            dt = jnp.minimum(dt, self.sims[i].peek_dt(states[i]))
        out = [self.sim0._advance_impl(states[0], dt_force=dt)]
        for i in range(1, len(self.sims)):
            # new parent state closes the implicit solves; OLD parent
            # state feeds the old-time convective ghost fills
            p = self.parent[i]
            self.sims[i].set_context(out[p].level,
                                     parent_lvl_old=states[p].level)
            out.append(self.sims[i]._advance_impl(states[i],
                                                  dt_force=dt))
        # two-way coupling: average the fine solutions down into each
        # parent's covered ranges (reference average_down after Advance)
        for i in range(len(self.sims) - 1, 0, -1):
            p = self.parent[i]
            out[p] = self._sync_down(out[p], out[i], self.bounds[i])
        if self.composite_sync:
            # composite pressure sync: the averaged-down fine solution
            # generally leaves a flux mismatch at the CF boundary in the
            # coarse field; re-project each parent (absorbing the fine
            # data) and re-solve each patch's CORRECTION field with CF
            # Dirichlet data = the parent's prolonged DELTA-p.  One pass
            # of this two-level exchange is the multiplicative-Schwarz
            # step toward the reference's composite NodalProjector solve
            # (incflo_apply_nodal_projection.cpp:140-154).
            p_before = out[0].level.p
            out[0] = self.sim0.reproject(out[0], dt)
            dp = {0: out[0].level.p - p_before}
            for i in range(1, len(self.sims)):
                p = self.parent[i]
                self.sims[i].set_context(out[p].level)
                self.sims[i]._nodal_dvals_override = \
                    self.sims[i]._nodal_dvals_from(dp[p])
                pb = out[i].level.p
                out[i] = self.sims[i].reproject(out[i], dt)
                self.sims[i]._nodal_dvals_override = None
                dp[i] = out[i].level.p - pb
            for i in range(len(self.sims) - 1, 0, -1):
                p = self.parent[i]
                out[p] = self._sync_down(out[p], out[i], self.bounds[i])
        return out

    def _sync_down(self, cs: SimState, fs: SimState, bounds: Box) -> SimState:
        lo_t, hi_t = bounds
        nd = self.base_grid.ndim

        def put(cfield, ffield, ncomp_axes=0):
            avg = _avg_down_window(ffield, nd)
            sl = [slice(lo, hi) for lo, hi in zip(lo_t, hi_t)]
            sl += [slice(None)] * (cfield.ndim - nd)
            return cfield.at[tuple(sl)].set(avg.astype(cfield.dtype))

        lvl = cs.level
        new = LevelState(
            velocity=put(lvl.velocity, fs.level.velocity),
            density=put(lvl.density, fs.level.density),
            tracer=put(lvl.tracer, fs.level.tracer),
            gp=put(lvl.gp, fs.level.gp),
            p=lvl.p,
            mac_phi=lvl.mac_phi,
        )
        return cs._replace(level=new)

    # -- regrid -------------------------------------------------------
    def regrid(self, state: PatchState) -> PatchState:
        """Recompute the patch tree from the current tags.  The slab
        axis is RE-PICKED from the level-0 tags (slab mode); surviving
        patches (same parent entry, parent frame unchanged) keep their
        fine data over the overlap, everything else re-initializes from
        parent interpolation (reference RemakeLevel /
        MakeNewLevelFromCoarse semantics, incflo_regrid.cpp:8-119)."""
        states = list(state.levels)
        tags0 = self._tag_level(np.asarray(states[0].level.density),
                                self.sim0)
        new_axis = self._best_axis(tags0)
        axis_changed = (not self.box_mode) and new_axis != self.axis
        self.axis = new_axis
        old_sims, old_bounds = self.sims, self.bounds
        old_parent, old_levels, old_states = (self.parent, self.level_of,
                                              states)
        self.sims = [self.sim0]
        self.bounds = [((0,) * self.base_grid.ndim,
                        tuple(self.base_grid.n_cell))]
        self.parent = [-1]
        self.level_of = [0]
        self.masks = [None]
        new_states = [states[0]]
        # old entry index kept per NEW parent entry for overlap reuse
        kept_src = {0: (0, True)}      # new idx -> (old idx, frame_same)
        for lev in range(1, self.max_level + 1):
            for p in self._indices_at_level(lev - 1):
                parent_state = new_states[p]
                rho = np.asarray(parent_state.level.density)
                tags = self._tag_level(rho, self.sims[p], lev=lev - 1)
                boxes = self._cluster(tags, self.sims[p])
                src_p, frame_same = kept_src.get(p, (None, False))
                # the old children of the matching old parent entry
                old_kids = [] if src_p is None else \
                    [j for j in range(len(old_sims))
                     if j > 0 and old_parent[j] == src_p]
                # regrid hysteresis (VERDICT r3 Next #9): when every new
                # box is still contained in a distinct old kid, keep the
                # OLD layout -- the advance key (parent, bounds) is
                # unchanged and the jit cache re-hits instead of
                # recompiling a multi-minute XLA program for a one-block
                # box shift.  Old kids were disjoint, so reusing their
                # bounds keeps the tiling disjoint.
                if frame_same and not axis_changed and old_kids \
                        and boxes and len(boxes) <= len(old_kids):
                    taken: List[int] = []
                    reuse: List[Box] = []
                    for box in boxes:
                        j = next((j for j in old_kids if j not in taken
                                  and _contains(old_bounds[j], box)), None)
                        if j is None:
                            break
                        taken.append(j)
                        reuse.append(old_bounds[j])
                    if len(reuse) == len(boxes):
                        boxes = reuse
                for box in boxes:
                    ps = self._build_patch(p, box)
                    i = len(self.sims)
                    self.sims.append(ps)
                    self.bounds.append(box)
                    self.parent.append(p)
                    self.level_of.append(lev)
                    self.masks.append(None)
                    ps.set_context(parent_state.level)
                    match = None
                    if frame_same and not axis_changed:
                        best_ov = 0
                        for j in old_kids:
                            ov = _overlap_volume(box, old_bounds[j])
                            if ov > best_ov:
                                best_ov, match = ov, j
                    if match is not None and box == old_bounds[match]:
                        # identical placement: keep the old state whole
                        new_states.append(old_states[match])
                        kept_src[i] = (match, True)
                        continue
                    init = ps.init_from_parent(parent_state)
                    if match is not None:
                        init = _copy_overlap(init, old_states[match],
                                             box, old_bounds[match])
                    new_states.append(init)
                    kept_src[i] = (match, False)
                self.masks[p] = self._mask_of_children(p)
        return PatchState(new_states)


def _contains(outer: Box, inner: Box) -> bool:
    """outer box contains inner box (per-axis [lo, hi) ranges)."""
    return all(ol <= il and ih <= oh
               for ol, il, ih, oh in zip(outer[0], inner[0],
                                         inner[1], outer[1]))


def _overlap_volume(a: Box, b: Box) -> int:
    v = 1
    for d in range(len(a[0])):
        w = min(a[1][d], b[1][d]) - max(a[0][d], b[0][d])
        if w <= 0:
            return 0
        v *= w
    return v


def _copy_overlap(init: SimState, old: SimState, box: Box,
                  old_box: Box) -> SimState:
    """Copy the overlapping fine region (parent-cell box intersection)
    from the old fine state into the rebuilt one (host-side numpy)."""
    nd = len(box[0])
    ov_lo = [max(box[0][d], old_box[0][d]) for d in range(nd)]
    ov_hi = [min(box[1][d], old_box[1][d]) for d in range(nd)]
    if any(ov_hi[d] <= ov_lo[d] for d in range(nd)):
        return init

    def cp(a, b):
        a = np.asarray(a).copy()
        b = np.asarray(b)
        dst = [slice(2 * (ov_lo[d] - box[0][d]),
                     2 * (ov_hi[d] - box[0][d])) for d in range(nd)]
        src = [slice(2 * (ov_lo[d] - old_box[0][d]),
                     2 * (ov_hi[d] - old_box[0][d])) for d in range(nd)]
        dst += [slice(None)] * (a.ndim - nd)
        src += [slice(None)] * (b.ndim - nd)
        a[tuple(dst)] = b[tuple(src)]
        return jnp.asarray(a)

    lvl = LevelState(
        velocity=cp(init.level.velocity, old.level.velocity),
        density=cp(init.level.density, old.level.density),
        tracer=cp(init.level.tracer, old.level.tracer),
        gp=cp(init.level.gp, old.level.gp),
        p=init.level.p,
        mac_phi=init.level.mac_phi,
    )
    return init._replace(level=lvl)
