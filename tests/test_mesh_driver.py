"""Production multi-device driver: the CLI dns command on an ('x','z')
device mesh (--mesh PX,PZ / [Parallel] Mesh) must reproduce the
single-device run EXACTLY -- the analog of the reference's dns.x running
the same binary at any task count (tlab_mpi_procs.f90:39-68), with every
operator routed through the pencil all-to-all engine
(parallel/pencil.py) inside shard_map.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tests", "data")


def _cli(args, outdir, devices=1):
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (flags +
                        f" --xla_force_host_platform_device_count={devices}"
                        ).strip()
    r = subprocess.run(
        [sys.executable, "-m", "tlab_tpu.tools.cli", *args, "--cpu",
         "--x64", "--outdir", outdir],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, (args, r.stderr[-2000:])


@pytest.mark.parametrize("ini,comp,atol", [
    ("case01_small3d.ini", False, 0.0),
    ("case02_small3d.ini", True, 0.0),
    # mirrored-XBars IBM: spline fill on the gathered pencils + sliced
    # direct forcing (reference ibm_spline.f90:30 under MPI)
    ("case93_small3d.ini", False, 0.0),
    # + [Staggering]: the VP/PV interpolation operators route through
    # the pencil all-to-all like _d1 (opr_partial.f90:19-27), with the
    # staggered-wavenumber factorize solve distributed (late r4)
    ("case93stag_small3d.ini", False, 0.0),
    # compressible AirWater (Case14-class): dimensional p ~ 8e4 sets an
    # absolute round-off floor ~1e-9 on the (tiny) momentum fields --
    # dns.out stays digit-exact, fields compared at that floor
    ("case14_small3d.ini", True, 1e-8),
    # [Filter] compact cadence through make_pencil_filter + a Helmholtz
    # [PressureFilter] through the distributed pencil_helmholtz solve
    # (reference opr_filter.f90:285 runs any type at any task count)
    ("case_filter_small3d.ini", False, 0.0),
])
def test_mesh_dns_matches_single_device(tmp_path, ini, comp, atol):
    """ini -> dns single-device and on the 4x2 CPU mesh: dns.out files
    and restart fields must be identical (the pencil factorize Poisson /
    compressible pencil core are the same arithmetic as single-device up
    to XLA reduction order; observed bit-identical on CPU)."""
    ini_path = os.path.join(DATA, ini)
    d1 = str(tmp_path / "single")
    d8 = str(tmp_path / "mesh")
    os.makedirs(d1)
    os.makedirs(d8)
    _cli(["ini", "--ini", ini_path], d1)
    for f in os.listdir(d1):
        if f.startswith(("flow.", "scal.", "grid")):
            with open(os.path.join(d1, f), "rb") as src, \
                    open(os.path.join(d8, f), "wb") as dst:
                dst.write(src.read())
    _cli(["dns", "--ini", ini_path], d1)
    _cli(["dns", "--ini", ini_path, "--mesh", "4,2"], d8, devices=8)

    out1 = [ln for ln in open(os.path.join(d1, "dns.out"))
            if not ln.startswith("#")]
    out8 = [ln for ln in open(os.path.join(d8, "dns.out"))
            if not ln.startswith("#")]
    assert out1 == out8

    # restart fields match to round-off
    from tlab_tpu.io import fields_io
    tag = "flow.10.1"
    a, _, _ = fields_io.read_field(os.path.join(d1, tag))
    b, _, _ = fields_io.read_field(os.path.join(d8, tag))
    assert np.max(np.abs(a - b)) < atol + 1e-13 * max(1.0, np.max(np.abs(a)))


def test_mesh_stagger_compactdirect_elliptic(tmp_path):
    """Staggered pressure + EllipticOrder=CompactDirect6 on the mesh
    must use the STAGGERED-wavenumber eigen table (P['ell_stag'], padded
    by pencil_plans): mesh run matches single-device to round-off.  This
    combination bypasses the factorize solver, so it exercises the
    pencil_poisson ell_stag routing (late-r4 review fix)."""
    src = open(os.path.join(DATA, "case93stag_small3d.ini")).read()
    src = src.replace("SpaceOrder=CompactJacobian6",
                      "SpaceOrder=CompactJacobian6\n"
                      "EllipticOrder=CompactDirect6")
    ini_path = str(tmp_path / "tlab.ini")
    open(ini_path, "w").write(src)
    d1 = str(tmp_path / "single")
    d8 = str(tmp_path / "mesh")
    os.makedirs(d1)
    os.makedirs(d8)
    _cli(["ini", "--ini", ini_path], d1)
    for f in os.listdir(d1):
        if f.startswith(("flow.", "scal.", "grid")):
            with open(os.path.join(d1, f), "rb") as s_, \
                    open(os.path.join(d8, f), "wb") as t_:
                t_.write(s_.read())
    _cli(["dns", "--ini", ini_path], d1)
    _cli(["dns", "--ini", ini_path, "--mesh", "4,2"], d8, devices=8)
    from tlab_tpu.io import fields_io
    a, _, _ = fields_io.read_field(os.path.join(d1, "flow.10.1"))
    b, _, _ = fields_io.read_field(os.path.join(d8, "flow.10.1"))
    scale = max(1.0, float(np.max(np.abs(a))))
    assert np.max(np.abs(a - b)) < 1e-10 * scale


def test_mesh_rejects_bad_decomposition():
    """A mesh the grid cannot be block-decomposed on fails fast with a
    clear error, not a shape crash mid-run: the 2-D fixture (nz = 1)
    cannot shard z."""
    from tlab_tpu.config import load_case
    from tlab_tpu.runtime import Simulation
    from tlab_tpu.tools import dns as dns_tool
    from tlab_tpu.parallel.mesh import make_mesh

    sim = Simulation.from_case(
        load_case(os.path.join(DATA, "case01_small.ini")))
    with pytest.raises(ValueError, match="incompatible"):
        dns_tool.run(sim, sim.zero_state(), n_steps=0, checkpoint=False,
                     mesh=make_mesh(4, 2))
