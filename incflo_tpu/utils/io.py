"""Checkpoint / plotfile I/O.

Preserves the reference's persistence CONTRACT (src/utilities/io.cpp):
  * checkpoint = directory with a text `Header` (version, step, time, dt,
    prev dts, prob domain, cell counts) + per-level field data; restart
    reconstructs the state regardless of device count (the arrays are
    resharded on load).
  * plotfile = directory with a text `Header` listing the plotted fields
    + the field data; the error-vs-exact fields print
    "Norm0/Norm2 of xxx error" lines (the convergence-harness metric,
    reference io.cpp:482-561).

Data is stored as .npz (dense, layout-stable) rather than VisMF binaries;
the Header carries the same information.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from incflo_tpu.config import IncfloConfig
from incflo_tpu.grid import Grid
from incflo_tpu.state import LevelState, SimState
from incflo_tpu.ops import derive, rheology
from incflo_tpu import bcs

HDR_VERSION = "Checkpoint version: 1"


LEVEL_FIELDS = ("velocity", "density", "tracer", "gp", "p", "mac_phi")


def _is_sharded(arr) -> bool:
    try:
        sh = arr.sharding
    except AttributeError:
        return False
    return (not sh.is_fully_replicated
            and len(arr.addressable_shards) > 1)


def write_checkpoint(path: str, s: SimState, cfg: IncfloConfig):
    """Checkpoint directory with the reference Header contract
    (src/utilities/io.cpp:16-102).

    Dense (single-device) runs write one Level_0.npz.  SHARDED runs
    write one Level_0.shard<device>.npz PER DEVICE SHARD plus a
    Shards.json manifest -- the analog of per-rank VisMF files -- with
    NO full-array gather to the host (each host serializes only its
    addressable shards; at 512^3+ a dense gather would not fit)."""
    import jax as _jax
    pidx = _jax.process_index()
    os.makedirs(path, exist_ok=True)
    grid = cfg.grid
    hdr = [
        HDR_VERSION,
        "1",                                     # number of levels
        f"{int(s.step)}",
        f"{float(s.t):.17g}",
        f"{float(s.dt):.17g}",
        f"{float(s.prev_dt):.17g}",
        f"{float(s.prev_prev_dt):.17g}",
        " ".join(f"{v:.17g}" for v in grid.prob_lo),
        " ".join(f"{v:.17g}" for v in grid.prob_hi),
        " ".join(str(n) for n in grid.n_cell),
        " ".join("1" if p else "0" for p in grid.periodic),
    ]
    if pidx == 0:          # one Header; shard writers race otherwise
        with open(os.path.join(path, "Header"), "w") as f:
            f.write("\n".join(hdr) + "\n")

    fields = {name: getattr(s.level, name) for name in LEVEL_FIELDS}
    if not any(_is_sharded(a) for a in fields.values()):
        np.savez(os.path.join(path, "Level_0.npz"),
                 **{k: np.asarray(v) for k, v in fields.items()})
        return

    # Multi-host: each process serializes only its addressable shards
    # into its own manifest (Shards.json for process 0, Shards.p<K>.json
    # for the rest -- device ids make the shard filenames globally
    # unique); the reader merges every manifest it finds.  This is the
    # analog of per-rank VisMF files (reference io.cpp:85-101).
    manifest = {"format": 1, "process": pidx, "fields": {}}
    payloads: Dict[str, Dict[str, np.ndarray]] = {}
    for name, arr in fields.items():
        entries = []
        seen = set()
        for sh in arr.addressable_shards:
            start = tuple(int(sl.start or 0) for sl in sh.index)
            if start in seen:        # replicated copy of the same block
                continue
            seen.add(start)
            fname = f"Level_0.shard{int(sh.device.id)}.npz"
            data = np.asarray(sh.data)
            payloads.setdefault(fname, {})[name] = data
            entries.append({"file": fname, "start": list(start),
                            "shape": list(data.shape)})
        manifest["fields"][name] = {
            "shape": list(arr.shape), "entries": entries}
    for fname, d in payloads.items():
        np.savez(os.path.join(path, fname), **d)
    mname = "Shards.json" if pidx == 0 else f"Shards.p{pidx}.json"
    with open(os.path.join(path, mname), "w") as f:
        json.dump(manifest, f)


def _read_field_shards(path, name, meta, dtype, npz_cache, region=None):
    """Assemble (a region of) a field from its shard files.  region is a
    tuple of slices into the global array (None = whole array)."""
    gshape = tuple(meta["shape"])
    if region is None:
        region = tuple(slice(0, n) for n in gshape)
    rshape = tuple(sl.stop - sl.start for sl in region)
    out = np.empty(rshape, dtype)
    covered = np.zeros(rshape, bool)
    for e in meta["entries"]:
        start = e["start"]
        shp = e["shape"]
        src_sl, dst_sl = [], []
        empty = False
        for ax, (sl, s0, n) in enumerate(zip(region, start, shp)):
            lo = max(sl.start, s0)
            hi = min(sl.stop, s0 + n)
            if hi <= lo:
                empty = True
                break
            src_sl.append(slice(lo - s0, hi - s0))
            dst_sl.append(slice(lo - sl.start, hi - sl.start))
        if empty:
            continue
        npz = npz_cache.setdefault(
            e["file"], np.load(os.path.join(path, e["file"])))
        out[tuple(dst_sl)] = npz[name][tuple(src_sl)]
        covered[tuple(dst_sl)] = True
    if not covered.all():
        raise ValueError(
            f"checkpoint field '{name}': manifest entries do not cover "
            f"the requested region (missing {int((~covered).sum())} of "
            f"{covered.size} elements)")
    return out


def read_checkpoint(path: str, cfg: IncfloConfig, dtype,
                    shardings: Optional[LevelState] = None) -> SimState:
    """Restart from a checkpoint.  `shardings` (a LevelState of
    jax.sharding.Sharding, e.g. parallel.mesh.sim_state_shardings(...)
    .level) reshards shard-format checkpoints onto ANY device mesh --
    each device block is assembled from only the overlapping shard
    files, never the full dense array (rank-count-independent restart,
    reference io.cpp:195)."""
    with open(os.path.join(path, "Header")) as f:
        lines = [l.rstrip("\n") for l in f]
    assert lines[0] == HDR_VERSION, f"bad checkpoint header: {lines[0]}"
    step = int(lines[2])
    t, dt, prev_dt, prev_prev_dt = (float(lines[i]) for i in range(3, 7))
    n_cell = tuple(int(v) for v in lines[9].split())
    assert n_cell == cfg.grid.n_cell, \
        f"checkpoint grid {n_cell} != inputs grid {cfg.grid.n_cell}"

    import glob as _glob
    import jax as _jax
    manifest_path = os.path.join(path, "Shards.json")
    if os.path.exists(manifest_path):
        # merge every per-process manifest (multi-host writers produce
        # Shards.json + Shards.p<K>.json; shard filenames are unique)
        manifest = None
        for mp in sorted(_glob.glob(os.path.join(path, "Shards*.json"))):
            with open(mp) as f:
                m = json.load(f)
            if manifest is None:
                manifest = m
            else:
                for name, meta in m["fields"].items():
                    manifest["fields"][name]["entries"].extend(
                        meta["entries"])
        npz_cache: Dict[str, object] = {}

        def load(name):
            meta = manifest["fields"][name]
            gshape = tuple(meta["shape"])
            if shardings is not None:
                shd = getattr(shardings, name)

                def cb(index):
                    region = tuple(
                        slice(sl.start or 0,
                              sl.stop if sl.stop is not None else n)
                        for sl, n in zip(index, gshape))
                    return _read_field_shards(path, name, meta, dtype,
                                              npz_cache, region)
                return _jax.make_array_from_callback(gshape, shd, cb)
            return jnp.asarray(
                _read_field_shards(path, name, meta, dtype, npz_cache),
                dtype)

        lvl = LevelState(**{name: load(name) for name in LEVEL_FIELDS})
    else:
        d = np.load(os.path.join(path, "Level_0.npz"))
        arrs = {name: jnp.asarray(d[name], dtype) for name in LEVEL_FIELDS}
        if shardings is not None:
            arrs = {name: _jax.device_put(a, getattr(shardings, name))
                    for name, a in arrs.items()}
        lvl = LevelState(**arrs)
    mk = lambda v: jnp.asarray(v, dtype)
    return SimState(level=lvl, t=mk(t), dt=mk(dt), prev_dt=mk(prev_dt),
                    prev_prev_dt=mk(prev_prev_dt),
                    step=jnp.asarray(step, jnp.int32))


# ---------------------------------------------------------------------
# plotfile
# ---------------------------------------------------------------------

def gather_plot_fields(s: SimState, cfg: IncfloConfig, sim) -> Dict[str, np.ndarray]:
    """Build the plotted field dict per cfg.plt_fields + plt_error_*."""
    grid = cfg.grid
    lvl = s.level
    nd = grid.ndim
    out: Dict[str, np.ndarray] = {}
    names = {0: "velx", 1: "vely", 2: "velz"}
    gp_names = {0: "gpx", 1: "gpy", 2: "gpz"}
    want = set(cfg.plt_fields)

    need_grown = {"vort", "strainrate", "divu", "eta"} & want
    vel_g = sim.grow_vel(lvl.velocity, 2) if need_grown else None

    for c in range(nd):
        if names[c] in want:
            out[names[c]] = np.asarray(lvl.velocity[..., c])
        if gp_names[c] in want:
            out[gp_names[c]] = np.asarray(lvl.gp[..., c])
    if "rho" in want:
        out["rho"] = np.asarray(lvl.density)
    if "tracer" in want:
        for n in range(cfg.ntrac):
            out[f"tracer{n}" if cfg.ntrac > 1 else "tracer"] = \
                np.asarray(lvl.tracer[..., n])
    if "p" in want:
        out["p"] = np.asarray(derive.node_to_cell(lvl.p, grid))
    if "macphi" in want:
        out["macphi"] = np.asarray(lvl.mac_phi)
    eb = getattr(sim, "eb", None)
    if "vort" in want:
        if eb is not None:
            from incflo_tpu.eb import ops as ebops
            out["vort"] = np.asarray(ebops.eb_vorticity(vel_g, grid, 2, eb))
        else:
            out["vort"] = np.asarray(derive.vorticity(vel_g, grid, 2))
    if "strainrate" in want:
        if eb is not None:
            from incflo_tpu.eb import ops as ebops
            out["strainrate"] = np.asarray(
                ebops.eb_strainrate(vel_g, grid, 2, eb))
        else:
            out["strainrate"] = np.asarray(
                rheology.strainrate(vel_g, grid, 2))
    if "divu" in want:
        out["divu"] = np.asarray(derive.divu_cc(vel_g, grid, 2))
    if "eta" in want:
        out["eta"] = np.asarray(
            rheology.compute_viscosity(vel_g, grid, 2, cfg, out_ng=0,
                                       eb=eb))
    if "vfrac" in want:
        # reference plots the EB volume fraction (io.cpp vfrac field);
        # all-regular domains plot 1.0 like EB_set_covered semantics
        if sim.eb is not None:
            out["vfrac"] = np.asarray(sim.eb.vfrac)
        else:
            out["vfrac"] = np.ones(grid.cell_shape, np.float64)
    if "forcing" in want:
        # instantaneous velocity forcing -(gp+gp0)/rho + g (or Boussinesq)
        f = sim.compute_vel_forces(lvl.density, lvl.tracer, lvl.tracer,
                                   lvl.gp)
        for c in range(nd):
            out[f"forcing{'xyz'[c]}"] = np.asarray(f[..., c])
    return out


def error_norm_fields(s: SimState, cfg: IncfloConfig) -> Dict[str, np.ndarray]:
    """error-vs-exact fields + printed norms (probtype 1/2 only;
    reference io.cpp:482-561 + incflo_error.cpp)."""
    out = {}
    grid = cfg.grid
    lvl = s.level
    dtype = lvl.velocity.dtype
    t, dt = float(s.t), float(s.dt)
    if cfg.plt_error_u or cfg.plt_error_v or cfg.plt_error_w:
        ex = derive.exact_velocity(cfg.probtype, grid, t, dtype)
        sel = [("u", 0, cfg.plt_error_u), ("v", 1, cfg.plt_error_v)]
        if grid.ndim == 3:
            sel.append(("w", 2, cfg.plt_error_w))
        for nm, c, on in sel:
            if on:
                out[f"error_{nm}"] = np.asarray(lvl.velocity[..., c] - ex[c])
    if cfg.plt_error_p:
        p_cc = derive.node_to_cell(lvl.p, grid)
        ex = derive.exact_pressure(cfg.probtype, grid, t, dt, dtype)
        err = np.asarray(p_cc - ex)
        out["error_p"] = err - err.mean()   # pressure defined up to constant
    if cfg.plt_error_mac_p:
        ex = derive.exact_pressure(cfg.probtype, grid, t, dt, dtype)
        err = np.asarray(lvl.mac_phi - ex)
        out["error_mac_p"] = err - err.mean()
    return out


def print_error_norms(fields: Dict[str, np.ndarray]):
    """The lines the convergence_{2d,3d}/todo_print harness greps."""
    name_map = {"error_u": "u", "error_v": "v", "error_w": "w",
                "error_p": "p", "error_mac_p": "mac_p"}
    for k, v in fields.items():
        if k not in name_map:
            continue
        nm = name_map[k]
        n0 = np.max(np.abs(v))
        n2 = np.sqrt(np.mean(v ** 2))
        print(f"  Norm0 of {nm} error {n0:.12e}")
        print(f"  Norm2 of {nm} error {n2:.12e}")


def write_plotfile(path: str, s: SimState, cfg: IncfloConfig, sim):
    os.makedirs(path, exist_ok=True)
    fields = gather_plot_fields(s, cfg, sim)
    err = error_norm_fields(s, cfg) if cfg.probtype in (1, 2) and (
        cfg.plt_error_u or cfg.plt_error_v or cfg.plt_error_w
        or cfg.plt_error_p or cfg.plt_error_mac_p) else {}
    if err:
        print_error_norms(err)
    fields.update(err)
    hdr = {
        "version": "IncfloTPU-Plotfile-1",
        "step": int(s.step), "time": float(s.t), "dt": float(s.dt),
        "prob_lo": list(cfg.grid.prob_lo), "prob_hi": list(cfg.grid.prob_hi),
        "n_cell": list(cfg.grid.n_cell),
        "fields": sorted(fields.keys()),
    }
    with open(os.path.join(path, "Header"), "w") as f:
        json.dump(hdr, f, indent=1)
    np.savez(os.path.join(path, "Level_0.npz"), **fields)
    return fields


def write_plotfile_amr(path: str, s: SimState, amrsim, cfg: IncfloConfig):
    """Multi-level plotfile: Level_l.npz holds the level-l view of the
    solution (average_down) plus its refinement mask; the Header lists
    the hierarchy like the reference's WriteMultiLevelPlotfile."""
    import dataclasses as _dc
    os.makedirs(path, exist_ok=True)
    fine_fields = gather_plot_fields(s, amrsim.fine_cfg, amrsim.sim)
    nd = cfg.grid.ndim
    from incflo_tpu.amr import average_down
    for lev in range(amrsim.max_level + 1):
        r = amrsim.ratio ** (amrsim.max_level - lev)
        out = {}
        for k, v in fine_fields.items():
            out[k] = np.asarray(average_down(jnp.asarray(v), r, nd)) \
                if r > 1 else v
        if lev < amrsim.max_level and amrsim.masks[lev] is not None:
            out["refine_mask"] = np.asarray(amrsim.masks[lev])
        np.savez(os.path.join(path, f"Level_{lev}.npz"), **out)
    hdr = {
        "version": "IncfloTPU-Plotfile-1",
        "step": int(s.step), "time": float(s.t), "dt": float(s.dt),
        "prob_lo": list(cfg.grid.prob_lo), "prob_hi": list(cfg.grid.prob_hi),
        "n_cell": list(cfg.grid.n_cell),
        "finest_level": amrsim.max_level,
        "ref_ratio": amrsim.ratio,
        "fields": sorted(fine_fields.keys()),
    }
    with open(os.path.join(path, "Header"), "w") as f:
        json.dump(hdr, f, indent=1)
    return fine_fields


def write_job_info(path: str, cfg: IncfloConfig):
    """Provenance dump (reference WriteJobInfo, io.cpp:228-313)."""
    import incflo_tpu
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "incflo_job_info"), "w") as f:
        f.write("incflo_tpu version: %s\n" % incflo_tpu.__version__)
        f.write("ndim: %d\nn_cell: %s\n" % (cfg.ndim, cfg.grid.n_cell,))
        import jax
        f.write("devices: %s\n" % (jax.devices(),))
        f.write("\n== full inputs ==\n")
        if cfg.pp is not None:
            f.write(cfg.pp.dump() + "\n")


# ---------------------------------------------------------------------
# slab-patch AMR hierarchy I/O (amr_patch.py)
# ---------------------------------------------------------------------

def write_plotfile_patch(path: str, state, amr, cfg: IncfloConfig):
    """Plotfile for the slab-patch tree: Level_i.npz holds patch i's OWN
    solution over its own (sub)domain, plus the placement metadata
    (parent entry, level, slab bounds)."""
    os.makedirs(path, exist_ok=True)
    for i, (sim, s) in enumerate(zip(amr.sims, state.levels)):
        fields = gather_plot_fields(s, sim.cfg, sim)
        if i > 0:
            fields["patch_lo"] = np.asarray(amr.bounds[i][0])
            fields["patch_hi"] = np.asarray(amr.bounds[i][1])
        if amr.masks[i] is not None:
            fields["refine_mask"] = np.asarray(amr.masks[i])
        np.savez(os.path.join(path, f"Level_{i}.npz"), **fields)
    hdr = {
        "version": "IncfloTPU-Plotfile-1",
        "step": int(state.step), "time": float(state.t),
        "dt": float(state.dt),
        "prob_lo": list(cfg.grid.prob_lo), "prob_hi": list(cfg.grid.prob_hi),
        "n_cell": list(cfg.grid.n_cell),
        "finest_level": max(amr.level_of),
        "ref_ratio": cfg.ref_ratio,
        "patch_axis": amr.axis,
        "patch_bounds": [list(b) for b in amr.bounds],
        "patch_parents": list(amr.parent),
        "patch_levels": list(amr.level_of),
    }
    with open(os.path.join(path, "Header"), "w") as f:
        json.dump(hdr, f, indent=1)


def write_checkpoint_patch(path: str, state, amr, cfg: IncfloConfig):
    """Checkpoint every patch + the tree metadata needed to rebuild the
    hierarchy on restart."""
    for i, s in enumerate(state.levels):
        lp = os.path.join(path, f"patch_level_{i}")
        write_checkpoint(lp, s, amr.sims[i].cfg)
    meta = {"axis": amr.axis,
            "bounds": [[list(b[0]), list(b[1])] for b in amr.bounds],
            "parents": list(amr.parent), "levels": list(amr.level_of),
            "nlevels": len(amr.sims)}
    with open(os.path.join(path, "Patch.json"), "w") as f:
        json.dump(meta, f)


def read_checkpoint_patch(path: str, amr, cfg: IncfloConfig):
    """Rebuild the slab tree recorded by write_checkpoint_patch and load
    every patch's state.  Pre-tree checkpoints (no "parents" entry) are
    read as a single-patch-per-level chain."""
    from incflo_tpu.amr_patch import PatchState
    with open(os.path.join(path, "Patch.json")) as f:
        meta = json.load(f)
    n = int(meta["nlevels"])
    parents = meta.get("parents", [-1] + list(range(0, n - 1)))
    levels = meta.get("levels", list(range(n)))
    amr.axis = int(meta["axis"])

    def as_box(b, parent_n_cell):
        # box format [[lo...],[hi...]]; legacy slab format [lo, hi]
        if isinstance(b[0], list):
            return tuple(b[0]), tuple(b[1])
        from incflo_tpu.amr_patch import _slab_box
        return _slab_box(int(b[0]), int(b[1]), amr.axis, parent_n_cell)

    states = [read_checkpoint(os.path.join(path, "patch_level_0"),
                              cfg, amr.dtype)]
    amr.sims = [amr.sim0]
    amr.bounds = [as_box(meta["bounds"][0], cfg.grid.n_cell)]
    amr.parent = [-1]
    amr.level_of = [0]
    amr.masks = [None]
    for i in range(1, n):
        p = int(parents[i])
        box = as_box(meta["bounds"][i], amr.sims[p].grid.n_cell)
        ps = amr._build_patch(p, box)
        amr.sims.append(ps)
        amr.bounds.append(box)
        amr.parent.append(p)
        amr.level_of.append(int(levels[i]))
        amr.masks.append(None)
        ps.set_context(states[p].level)
        states.append(read_checkpoint(
            os.path.join(path, f"patch_level_{i}"), ps.cfg, amr.dtype))
    for p in range(len(amr.sims)):
        amr.masks[p] = amr._mask_of_children(p)
    return PatchState(states)
