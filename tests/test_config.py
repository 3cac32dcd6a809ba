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


def test_tensor_diffusion_mg_knobs():
    """tensor_diffusion.* scope feeds the velocity (tensor) solve
    (reference DiffusionTensorOp::readParameters)."""
    from incflo_tpu.parmparse import ParmParse
    from incflo_tpu.config import IncfloConfig
    pp = ParmParse.from_text("""
amr.n_cell = 8 8
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
incflo.probtype = 3
tensor_diffusion.mg_rtol = 1.e-7
tensor_diffusion.mg_atol = 1.e-9
tensor_diffusion.mg_max_iter = 33
scalar_diffusion.mg_rtol = 1.e-6
scalar_diffusion.mg_max_iter = 44
""")
    c = IncfloConfig.from_parmparse(pp)
    assert c.tensor_mg_rtol == 1.0e-7
    assert c.tensor_mg_atol == 1.0e-9
    assert c.tensor_mg_maxiter == 33
    assert c.diff_mg_rtol == 1.0e-6
    assert c.diff_mg_maxiter == 44


def test_plt_ccse_regtest_reset_then_override():
    """plt_ccse_regtest resets vort/vfrac to 0 (defaults are 1), and
    explicit plt_* queries still override afterwards (init.cpp:174-216)."""
    from incflo_tpu.parmparse import ParmParse
    from incflo_tpu.config import IncfloConfig
    base = """
amr.n_cell = 8 8
geometry.prob_lo = 0. 0.
geometry.prob_hi = 1. 1.
geometry.is_periodic = 1 1
incflo.probtype = 3
"""
    c = IncfloConfig.from_parmparse(ParmParse.from_text(base))
    assert "vort" in c.plt_fields and "vfrac" in c.plt_fields
    c = IncfloConfig.from_parmparse(ParmParse.from_text(
        base + "amr.plt_ccse_regtest = 1\n"))
    assert "vort" not in c.plt_fields and "vfrac" not in c.plt_fields
    c = IncfloConfig.from_parmparse(ParmParse.from_text(
        base + "amr.plt_ccse_regtest = 1\namr.plt_vort = 1\n"))
    assert "vort" in c.plt_fields and "vfrac" not in c.plt_fields
