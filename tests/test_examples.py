"""The native examples/ cases run end-to-end (reduced sizes in CI; the
INIs themselves are the production configurations)."""
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EX = os.path.join(REPO, "examples")

pytestmark = pytest.mark.slow


def _cli(args, outdir, ini, devices=1):
    env = dict(os.environ)
    if devices > 1:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{devices}").strip()
    r = subprocess.run(
        [sys.executable, "-m", "tlab_tpu.tools.cli", *args, "--cpu",
         "--x64", "--ini", ini, "--outdir", outdir],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, (args, r.stderr[-2000:])


def test_shear3d_example(tmp_path):
    """examples/shear3d at a reduced grid: ini + dns + stats cadence."""
    src = open(os.path.join(EX, "shear3d", "tlab.ini")).read()
    for a, b in (("Imax=512", "Imax=64"), ("Jmax=256", "Jmax=48"),
                 ("Kmax=256", "Kmax=32"), ("points_1=513", "points_1=65"),
                 ("points_1=256", "points_1=48"),
                 ("points_1=257", "points_1=33"), ("End=50", "End=3"),
                 ("Restart=50", "Restart=3"),
                 ("Statistics=10", "Statistics=3")):
        assert a in src, a
        src = src.replace(a, b)
    ini = str(tmp_path / "tlab.ini")
    open(ini, "w").write(src)
    _cli(["ini"], str(tmp_path), ini)
    _cli(["dns"], str(tmp_path), ini)
    out = open(os.path.join(tmp_path, "dns.out")).read()
    assert re.search(r"^0\s+3\s", out, re.M)
    assert os.path.exists(os.path.join(tmp_path, "avg3"))


def test_ekman_mesh_example(tmp_path):
    """examples/ekman_mesh: [Parallel] Mesh=4,2 runs the production
    pencil engine on the 8-device CPU mesh; towers + dns.obs written."""
    src = open(os.path.join(EX, "ekman_mesh", "tlab.ini")).read()
    src = src.replace("End=20", "End=2").replace("Restart=20", "Restart=2")
    ini = str(tmp_path / "tlab.ini")
    open(ini, "w").write(src)
    _cli(["ini"], str(tmp_path), ini)
    _cli(["dns"], str(tmp_path), ini, devices=8)
    assert os.path.exists(os.path.join(tmp_path, "dns.obs"))
    assert any(n.startswith("tower.") for n in os.listdir(tmp_path))
    out = open(os.path.join(tmp_path, "dns.out")).read()
    assert re.search(r"^0\s+2\s", out, re.M)


def test_cloudtop_anelastic_example(tmp_path):
    """examples/cloudtop_anelastic at a reduced grid: anelastic AirWater
    ini + dns + averages, plus the plot_averages script on the output."""
    src = open(os.path.join(EX, "cloudtop_anelastic", "tlab.ini")).read()
    for a, b in (("Imax=256", "Imax=48"), ("Jmax=192", "Jmax=48"),
                 ("Kmax=128", "Kmax=24"),
                 ("points_1=257", "points_1=49"),
                 ("points_1=192", "points_1=48"),
                 ("points_1=129", "points_1=25"),
                 ("End=100", "End=3"), ("Restart=100", "Restart=3"),
                 ("Statistics=20", "Statistics=3")):
        assert a in src, a
        src = src.replace(a, b)
    ini = str(tmp_path / "tlab.ini")
    open(ini, "w").write(src)
    _cli(["ini"], str(tmp_path), ini)
    _cli(["dns"], str(tmp_path), ini)
    avg = os.path.join(tmp_path, "avg3")
    assert os.path.exists(avg)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "plot_averages.py"),
         avg, "rB", "fs", "--out", str(tmp_path / "fig.png")],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-500:]
    assert os.path.exists(tmp_path / "fig.png")


def test_particle_shear_example(tmp_path):
    """examples/particle_shear at a reduced grid: tracer particles +
    trajectories through ini/inipart/dns."""
    src = open(os.path.join(EX, "particle_shear", "tlab.ini")).read()
    for a, b in (("Imax=256", "Imax=48"), ("Jmax=128", "Jmax=32"),
                 ("Kmax=64", "Kmax=16"),
                 ("points_1=257", "points_1=49"),
                 ("points_1=128", "points_1=32"),
                 ("points_1=65", "points_1=17"),
                 ("Number=100000", "Number=2000"),
                 ("End=40", "End=3"), ("Restart=40", "Restart=3"),
                 ("Statistics=10", "Statistics=3")):
        assert a in src, a
        src = src.replace(a, b)
    ini = str(tmp_path / "tlab.ini")
    open(ini, "w").write(src)
    _cli(["ini"], str(tmp_path), ini)
    _cli(["inipart"], str(tmp_path), ini)
    _cli(["dns"], str(tmp_path), ini)
    assert os.path.exists(os.path.join(tmp_path, "part.3"))
    assert any(n.startswith("traj") for n in os.listdir(tmp_path))
