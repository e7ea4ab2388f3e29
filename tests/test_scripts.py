"""The scripts/ plotting/extraction utilities run on this build's
outputs (the reference scripts/python analogs; plot_averages is covered
by the cloudtop example test)."""
import os
import runpy
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def _run(name, argv):
    old = sys.argv
    sys.argv = [name] + argv
    try:
        with pytest.raises(SystemExit) as e:
            runpy.run_path(os.path.join(SCRIPTS, name), run_name="__main__")
        assert e.value.code in (0, None)
    finally:
        sys.argv = old


def test_plot_and_extract_scripts(tmp_path):
    from tlab_tpu.io import reference_formats as rf
    from tlab_tpu.io.fields_io import write_field
    rng = np.random.default_rng(0)
    ny, nk = 16, 32
    os.chdir(tmp_path)

    # spectra file: (nk, ny) k-fastest layout
    rf.write_spectrum_file(str(tmp_path), "xsp", 5, "Euu",
                           np.abs(rng.standard_normal((nk, ny))))
    _run("plot_spectra.py", [str(tmp_path / "xsp5.Euu"), "--ny", str(ny),
                             "--out", str(tmp_path / "sp.png")])
    assert (tmp_path / "sp.png").exists()

    # pdf file
    rows = np.abs(rng.standard_normal((ny + 1, 32 + 2)))
    rf.write_pdf_file(str(tmp_path), "pdf5.u", 0.5,
                      np.linspace(0, 1, ny), rows, 32)
    _run("plot_pdfs.py", [str(tmp_path / "pdf5.u"),
                          "--out", str(tmp_path / "pdf.png")])
    assert (tmp_path / "pdf.png").exists()

    # tower records [t, it, ny vals]
    rec = np.column_stack([np.arange(4.0), np.arange(4),
                           rng.standard_normal((4, ny))])
    rec.astype("<f8").tofile(tmp_path / "tower.mean.u.000001")
    _run("plot_towers.py", [str(tmp_path / "tower.mean.u.000001"),
                            "--ny", str(ny),
                            "--out", str(tmp_path / "tw.png")])
    assert (tmp_path / "tw.png").exists()

    # planes file + extraction
    nx, nz = 12, 8
    f1 = rng.standard_normal((nx, ny, nz))
    f2 = rng.standard_normal((nx, ny, nz))
    rf.write_planes_file(str(tmp_path), 5, "k", [f1, f2], [2])
    _run("extract_planes.py", [str(tmp_path / "planesK.5"), "--axis", "k",
                               "--shape", f"{nx},{ny},{nz}",
                               "--nvars", "2", "--png"])
    got = np.load("planesK_5_var0.npy")
    np.testing.assert_allclose(got[0], f1[:, :, 2].astype(np.float32),
                               rtol=1e-6)

    # restart field line extraction
    f = rng.standard_normal((nx, ny, nz))
    write_field(str(tmp_path / "flow.5.1"), f, 5, (0.5, 1e-3))
    _run("extract_lines.py", [str(tmp_path / "flow.5.1"), "--axis", "y",
                              "--at", "3,2",
                              "--out", str(tmp_path / "lines.dat")])
    tab = np.loadtxt(tmp_path / "lines.dat")
    np.testing.assert_allclose(tab[:, 1], f[3, :, 2], rtol=1e-12)
