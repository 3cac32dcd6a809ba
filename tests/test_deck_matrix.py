"""Smoke matrix: every reference benchmark deck parses and advances
stably at reduced resolution (the regression-deck surface of
test/incflo-tests.ini, run as stability checks since the golden
plotfiles live on LBL infrastructure)."""

import glob
import os

import numpy as np
import pytest

from incflo_tpu.config import IncfloConfig
from incflo_tpu.simulation import Simulation

DECKS = sorted(
    glob.glob("/root/reference/test_no_eb_2d/benchmark.*")
    + glob.glob("/root/reference/test_no_eb/benchmark.*")
    + glob.glob("/root/reference/test_2d/benchmark.*")
)


def _shrunk_overrides(cfg_path):
    """Clamp the grid so each axis is <= 16 cells (keeps the suite fast)."""
    from incflo_tpu.parmparse import ParmParse
    pp = ParmParse.from_file(cfg_path)
    n = pp.scoped("amr").getarr("n_cell")
    n = [min(int(v), 16) for v in n]
    return [f"amr.n_cell = {' '.join(str(v) for v in n)}",
            "max_step = 2", "stop_time = -1", "amr.max_level = 0",
            "incflo.initial_iterations = 1"]


@pytest.mark.slow
@pytest.mark.parametrize("deck", DECKS, ids=[
    os.path.basename(d) + "/" + d.split("/")[-2] for d in DECKS])
def test_deck_advances(deck):
    cfg = IncfloConfig.from_file(deck, _shrunk_overrides(deck))
    sim = Simulation(cfg)
    s = sim.init_state()
    for _ in range(2):
        s = sim.advance(s)
    for f in (s.level.velocity, s.level.density, s.level.tracer,
              s.level.p, s.level.gp):
        assert np.isfinite(np.asarray(f)).all(), deck
    assert float(s.dt) > 0
