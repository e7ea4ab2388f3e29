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
