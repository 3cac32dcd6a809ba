"""Config surface tests: ParmParse grammar + IncfloConfig defaults against
the reference decks (reference test*/benchmark.* inputs files)."""

import numpy as np
import pytest

from incflo_tpu import bcs
from incflo_tpu.config import DiffusionType, FluidModel, IncfloConfig
from incflo_tpu.parmparse import ParmParse

TGV_2D = """
stop_time = 1.0
max_step = -1
incflo.fixed_dt = -1.
incflo.cfl = 0.45
amr.plot_per_exact = 0.1
incflo.gravity = 0. 0.
incflo.ro_0 = 1.
incflo.mu = 0.01
amr.n_cell = 32 32
amr.max_level = 0
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
incflo.probtype = 1
amr.plt_ccse_regtest = 1
"""


def test_parmparse_basics():
    pp = ParmParse.from_text(TGV_2D)
    assert pp.query("stop_time", -1.0) == 1.0
    assert pp.scoped("incflo").query("cfl", 0.5) == 0.45
    assert pp.scoped("amr").getarr("n_cell") == [32, 32]
    assert pp.scoped("geometry").queryarr("is_periodic", [0, 0], 2) == [1, 1]
    # defaults pass through
    assert pp.scoped("incflo").query("use_godunov", False) is False


def test_parmparse_overrides_and_strings():
    pp = ParmParse.from_text('amr.restart = ""\nzlo.type = "sw"\n# comment\n',
                             argv=["incflo.cfl=0.9"])
    assert pp.scoped("amr").query("restart", "x") == ""
    assert pp.scoped("zlo").query("type", "null") == "sw"
    assert pp.scoped("incflo").query("cfl", 0.5) == 0.9


def test_config_tgv2d():
    cfg = IncfloConfig.from_text(TGV_2D)
    assert cfg.grid.ndim == 2
    assert cfg.grid.n_cell == (32, 32)
    assert cfg.grid.dx == (1.0 / 32, 1.0 / 32)
    assert cfg.cfl == 0.45
    assert cfg.mu == 0.01
    assert cfg.probtype == 1
    assert not cfg.use_godunov
    assert cfg.diff_type == DiffusionType.Implicit
    assert cfg.fluid_model == FluidModel.Newtonian
    assert all(cfg.bc_kind[:, :].flatten() == int(bcs.BCKind.periodic))
    # plt_ccse_regtest default field set
    assert "velx" in cfg.plt_fields and "p" not in cfg.plt_fields


def test_config_reference_decks_parse():
    """Every no-EB reference deck must parse."""
    import glob
    decks = sorted(glob.glob("/root/reference/test_no_eb*/benchmark.*"))
    assert decks
    for d in decks:
        cfg = IncfloConfig.from_file(d)
        assert cfg.grid.ndim in (2, 3)


def test_bc_matrix_rayleigh_taylor():
    cfg = IncfloConfig.from_file(
        "/root/reference/test_no_eb/benchmark.rayleigh_taylor")
    assert cfg.grid.periodic == (True, True, False)
    assert bcs.BCKind(int(cfg.bc_kind[2, 0])) == bcs.BCKind.slip_wall
    rec = cfg.velocity_bcrecs()
    # slip wall: tangential hoextrap, normal ext_dir
    assert rec[0, 2, 0] == bcs.BCType.hoextrap
    assert rec[2, 2, 0] == bcs.BCType.ext_dir
    drec = cfg.density_bcrecs()
    assert drec[0, 2, 0] == bcs.BCType.hoextrap
    assert cfg.use_godunov
    assert cfg.diff_type == DiffusionType.Crank_Nicolson
    assert not cfg.constant_density and cfg.advect_tracer
    assert cfg.gravity == (0.0, 0.0, -0.1)
    # background pressure from gravity
    assert cfg.gp0 == (0.0, 0.0, -0.1)


def test_background_pressure_exclusive():
    with pytest.raises(ValueError):
        IncfloConfig.from_text(TGV_2D + "\nincflo.delp = 1.0 0.\n"
                               "incflo.gravity = 0.5 0.\n")


def test_cfl_validation():
    with pytest.raises(ValueError):
        IncfloConfig.from_text(TGV_2D.replace("cfl = 0.45", "cfl = 0.9"))
