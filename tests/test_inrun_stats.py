"""In-run [Statistics] pdf/spectra/correlation cadence: the packed
single-fetch device computation (tools/dns._inrun_pdfs_spectra) must
write the same files as the direct per-field computations (reference
DNS_STATISTICS_TEMPORAL branches, dns_statistics.f90)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tlab_tpu.config import load_case
from tlab_tpu.runtime import Simulation
from tlab_tpu.dycore.state import State

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tests", "data")


@pytest.fixture(scope="module")
def sim_state(tmp_path_factory):
    src = open(os.path.join(DATA, "case01_small3d.ini")).read()
    src += ("\n[Statistics]\nPdfs=yes\nSpectrums=yes\nCorrelations=yes\n"
            "Intermittency=yes\nGateLevel=0.5\n")
    p = tmp_path_factory.mktemp("inrun") / "tlab.ini"
    p.write_text(src)
    sim = Simulation.from_case(load_case(str(p)))
    rng = np.random.default_rng(7)
    sh = sim.grid.shape
    st = State(u=jnp.asarray(rng.standard_normal(sh)),
               v=jnp.asarray(rng.standard_normal(sh)),
               w=jnp.asarray(rng.standard_normal(sh)),
               s=jnp.asarray(0.5 + 0.2 * rng.standard_normal((1,) + sh)))
    return sim, st


def test_packed_matches_direct(sim_state, tmp_path):
    from tlab_tpu.tools import dns as dns_tool
    from tlab_tpu.stats import spectra as spmod
    from tlab_tpu.stats import averages as avg
    from tlab_tpu.stats.pdfs import pdf1v_plane_table_device
    from tlab_tpu.io import reference_formats as rf

    sim, st = sim_state
    out = str(tmp_path)
    dns_tool._inrun_pdfs_spectra(sim, st, out, 3, 0.125)

    nx, ny, nz = sim.grid.shape
    # spectra + correlations, every field, both directions
    for name, a in (("uu", st.u), ("vv", st.v), ("ww", st.w),
                    ("11", st.s[0])):
        got = rf.read_spectrum_file(
            os.path.join(out, f"xsp3.E{name}"), nx // 2).T
        want = (0.5 * np.asarray(spmod.spectrum_x(a))[: nx // 2])
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=0,
                                   atol=0)
        got = rf.read_spectrum_file(
            os.path.join(out, f"zsp3.E{name}"), nz // 2).T
        want = (0.5 * np.asarray(spmod.spectrum_z(a))[: nz // 2])
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=0,
                                   atol=0)
        got = rf.read_spectrum_file(
            os.path.join(out, f"xcr3.C{name}"), nx // 2).T
        want = np.asarray(spmod.correlation_x(a))[: nx // 2]
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=0,
                                   atol=0)

    # pdf tables: reference binary layout, values equal the direct
    # device two-pass table
    rows = np.asarray(pdf1v_plane_table_device(st.u, 32))
    y = sim.grid.y.nodes
    ref_dir = str(tmp_path / "direct")
    os.makedirs(ref_dir)
    rf.write_pdf_file(ref_dir, "pdf3.u", 0.125, y, rows, 32)
    assert (open(os.path.join(out, "pdf3.u"), "rb").read()
            == open(os.path.join(ref_dir, "pdf3.u"), "rb").read())

    # intermittency column
    tab = np.loadtxt(os.path.join(out, "int3"))
    gamma = np.asarray(avg.intermittency(st.s[0] > 0.5))
    np.testing.assert_allclose(tab[:, 1], gamma, rtol=1e-6)


def test_single_device_fetch_count(sim_state, tmp_path, monkeypatch):
    """The cadence makes exactly ONE device->host fetch (VERDICT r4
    item 5: previously one dispatch+D2H per field per quantity)."""
    from tlab_tpu.tools import dns as dns_tool
    sim, st = sim_state
    sim._inrun_stats_fn = None
    calls = {"n": 0}
    orig = np.asarray

    def counting_asarray(a, *args, **kw):
        if isinstance(a, jnp.ndarray):
            calls["n"] += 1
        return orig(a, *args, **kw)

    monkeypatch.setattr(dns_tool.np, "asarray", counting_asarray)
    dns_tool._inrun_pdfs_spectra(sim, st, str(tmp_path), 5, 0.25)
    assert calls["n"] == 1
