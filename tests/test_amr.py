"""Dense-AMR tests: tagging, hierarchy views, RT deck end-to-end."""

import jax.numpy as jnp
import numpy as np
import pytest

from incflo_tpu.amr import AMRSimulation, average_down
from incflo_tpu.config import IncfloConfig


def test_average_down():
    x = jnp.arange(16.0).reshape(4, 4)
    c = average_down(x, 2, 2)
    assert c.shape == (2, 2)
    assert float(c[0, 0]) == (0 + 1 + 4 + 5) / 4


def _rt_cfg(extra=()):
    return IncfloConfig.from_file(
        "/root/reference/test_no_eb/benchmark.rayleigh_taylor",
        argv=["amr.n_cell = 8 8 16", "max_step = 2",
              "incflo.initial_iterations = 1", *extra])


def test_rt_amr_tagging_and_advance():
    cfg = _rt_cfg()
    assert cfg.max_level == 2
    assert cfg.gradrhoerr == (0.1, 0.1, 0.1)
    amr = AMRSimulation(cfg)
    assert amr.sim.grid.n_cell == (32, 32, 64)
    s = amr.init_state()
    # both mask levels must tag the RT interface
    assert amr.masks[0] is not None and int(jnp.sum(amr.masks[0])) > 0
    assert int(jnp.sum(amr.masks[1])) > 0
    # interface at z ~ 0.5: tagged region must straddle mid-height
    m0 = np.asarray(amr.masks[0])
    kmid = 8  # of 16
    assert m0[:, :, kmid - 1:kmid + 1].any()
    for _ in range(2):
        s = amr.advance(s)
    v = np.asarray(s.level.velocity)
    assert np.isfinite(v).all()
    # heavy fluid sinking: some downward velocity developed
    assert np.asarray(s.level.velocity[..., 2]).min() < 0

    # per-level views have the right shapes
    for lev, shape in ((0, (8, 8, 16)), (1, (16, 16, 32)), (2, (32, 32, 64))):
        view = amr.level_view(s, lev)
        assert view.density.shape == shape
