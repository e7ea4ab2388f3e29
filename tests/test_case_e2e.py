"""End-to-end case run: config -> grid -> ICs -> DNS loop -> log/restart.

The CPU-sized analog of the reference's examples/Case01 golden-file check
(examples/check_run.sh): run 10 adaptive-dt steps of the temporal shear
layer and validate the step log's physical sanity (CFL pinned at target,
dilatation decaying, no NaNs) plus restart-file round-trip.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tlab_tpu.config import load_case
from tlab_tpu.io import fields_io
from tlab_tpu.runtime import Simulation
from tlab_tpu.tools import dns as dns_tool
from tlab_tpu.tools.initialize import initial_state

pytestmark = pytest.mark.slow

INI = os.path.join(os.path.dirname(__file__), "data", "case01_small.ini")


@pytest.fixture(scope="module")
def case_run(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("case01"))
    case = load_case(INI)
    sim = Simulation.from_case(case)
    state = initial_state(sim, seed=7)
    run = dns_tool.run(sim, state, outdir=outdir, n_steps=10,
                       log_path=os.path.join(outdir, "dns.out"))
    return sim, run, outdir


def test_log_structure(case_run):
    sim, run, outdir = case_run
    # header + step lines for it=0..10 (IteraLog=1)
    data_lines = [ln for ln in run.log.lines if not ln.startswith("#")]
    assert len(data_lines) == 11
    assert os.path.exists(os.path.join(outdir, "dns.out"))


def test_cfl_tracks_target(case_run):
    sim, run, _ = case_run
    data = [ln.split() for ln in run.log.lines if not ln.startswith("#")]
    cfl = [float(d[4].replace("E", "e")) for d in data[1:]]
    assert all(abs(c - 1.2) < 0.05 for c in cfl), cfl


def test_no_nans_and_bounded(case_run):
    sim, run, _ = case_run
    assert np.isfinite(np.asarray(run.state.u)).all()
    assert float(jnp.max(jnp.abs(run.state.u))) < 2.0
    # passive scalar bounded by its initial range (tanh in [0, 1])
    assert float(jnp.max(run.state.s)) < 1.05
    assert float(jnp.min(run.state.s)) > -0.05


def test_dilatation_decays(case_run):
    """The broadband IC leaves a truncation-level dilatation that the
    projection damps over the first steps (reference Case01 log: 0.22 ->
    0.003 over 10 steps)."""
    sim, run, _ = case_run
    data = [ln.split() for ln in run.log.lines if not ln.startswith("#")]
    dmax0 = abs(float(data[1][8].replace("E", "e")))
    dmaxN = abs(float(data[-1][8].replace("E", "e")))
    assert dmaxN < dmax0


def test_restart_roundtrip(case_run):
    sim, run, outdir = case_run
    u, v, w, s, rtime, visc = fields_io.read_state(
        os.path.join(outdir, "flow"), os.path.join(outdir, "scal"),
        run.itime, sim.nsp.n_scalars)
    assert np.allclose(u, np.asarray(run.state.u), atol=1e-14)
    assert np.allclose(s[0], np.asarray(run.state.s[0]), atol=1e-14)
    assert abs(rtime - run.rtime) < 1e-12
    assert abs(visc - sim.nsp.visc) < 1e-15
