"""Field I/O: native engine vs NumPy fallback round-trips."""
import numpy as np
import pytest

from tlab_tpu.io import fields_io


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((24, 16, 20))
    path = str(tmp_path / "f.1")
    fields_io.write_field(path, a, itime=42, params=(1.25, 3e-4))
    out, params, it = fields_io.read_field(path)
    assert np.array_equal(out, a)
    assert it == 42
    assert np.allclose(params, [1.25, 3e-4])


def test_native_and_numpy_agree(tmp_path):
    if fields_io._tlabio is None:
        pytest.skip("native engine not built")
    rng = np.random.default_rng(1)
    a = rng.standard_normal((17, 9, 13))     # odd sizes
    p_native = str(tmp_path / "n.1")
    p_numpy = str(tmp_path / "p.1")
    fields_io.write_field(p_native, a, itime=3, params=(0.5,))
    # force the numpy path by single-precision dtype
    fields_io.write_field(p_numpy, a, itime=3, params=(0.5,), dtype="<f4")
    out_n, _, _ = fields_io.read_field(p_native)
    out_p, _, _ = fields_io.read_field(p_numpy, dtype="<f4")
    assert np.array_equal(out_n, a)
    assert np.allclose(out_p, a, atol=1e-6)


def test_remesh_accuracy():
    """Cubic remeshing reproduces a smooth field at 4th order."""
    import jax.numpy as jnp
    from tlab_tpu.grid import uniform_grid
    from tlab_tpu.ops.interpolate import remesh_field
    g1 = uniform_grid(32, 33, 1, 2 * np.pi, 1.0, 1.0)
    g2 = uniform_grid(48, 49, 1, 2 * np.pi, 1.0, 1.0)
    X1 = g1.x.nodes[:, None, None]
    Y1 = g1.y.nodes[None, :, None]
    f1 = np.sin(X1) * np.cos(2 * np.pi * Y1) * np.ones((32, 33, 1))
    f2 = np.asarray(remesh_field(jnp.asarray(f1), g1, g2))
    X2 = g2.x.nodes[:, None, None]
    Y2 = g2.y.nodes[None, :, None]
    exact = np.sin(X2) * np.cos(2 * np.pi * Y2) * np.ones((48, 49, 1))
    assert np.max(np.abs(f2 - exact)) < 5e-4


def test_remesh_roundtrip_constant():
    import jax.numpy as jnp
    from tlab_tpu.grid import uniform_grid
    from tlab_tpu.ops.interpolate import remesh_field
    g1 = uniform_grid(16, 17, 8, 1.0, 1.0, 1.0)
    g2 = uniform_grid(24, 21, 12, 1.0, 1.0, 1.0)
    ones = np.ones(g1.shape)
    out = np.asarray(remesh_field(jnp.asarray(ones), g1, g2))
    assert np.max(np.abs(out - 1.0)) < 1e-12


def test_planes_and_towers_in_dns_loop(tmp_path):
    import os
    from tlab_tpu.config import load_case, Ini
    from tlab_tpu.runtime import Simulation
    from tlab_tpu.tools import dns as dns_tool
    from tlab_tpu.tools.initialize import initial_state
    ini_path = os.path.join(os.path.dirname(__file__), "data",
                            "case01_small.ini")
    text = open(ini_path).read() + (
        "\n[SavePlanes]\nPlanesJ=1,32\n"
        "[SaveTowers]\nStride=16,1\n")
    text = text.replace("[Iteration]", "[Iteration]\nSavePlanes=2")
    sim = Simulation.from_case(load_case(Ini(text=text)))
    state = initial_state(sim, seed=7)
    dns_tool.run(sim, state, outdir=str(tmp_path), n_steps=4)
    import glob
    # ONE reference-format file per direction per itime (planes.f90 +
    # IO_Write_Subarray): [u v w s1 p] x 2 planes, float32
    pl = sorted(glob.glob(str(tmp_path / "planesJ.*")))
    assert len(pl) == 2, pl                  # it=2 and it=4
    from tlab_tpu.io.reference_formats import read_planes_file
    a = read_planes_file(pl[0], "j", (128, 64, 1), nvars=5, nplanes=2)
    assert a.shape == (5, 2, 128, 1)
    assert np.isfinite(a).all()
    # tower flushed only at restart cadence (10); none yet -> buffer held
    tw = glob.glob(str(tmp_path / "tower.*"))
    assert len(tw) == 0


def test_sharded_io_roundtrip(tmp_path):
    """Per-shard restart I/O on the 8-device mesh: write shard slabs,
    reassemble on host, and reload directly onto devices."""
    import os
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as PSpec
    from tlab_tpu.parallel import make_mesh
    from tlab_tpu.io import sharded

    mesh = make_mesh(4, 2)
    sh = NamedSharding(mesh, PSpec("x", None, "z"))
    rng = np.random.default_rng(0)
    a = rng.standard_normal((16, 5, 8)).astype(np.float32)
    import jax.numpy as jnp
    ad = jax.device_put(jnp.asarray(a), sh)
    path = os.path.join(tmp_path, "fld")
    sharded.write_sharded(path, ad, params={"rtime": 1.5})
    assert len([f for f in os.listdir(tmp_path) if "shard" in f]) == 8
    back, params = sharded.read_sharded(path)
    assert params["rtime"] == 1.5
    assert np.array_equal(back, a)
    # direct device reload with the same sharding
    ad2 = sharded.read_sharded_to(path, sh)
    assert np.array_equal(np.asarray(ad2), a)
    assert ad2.sharding == sh


def test_filetype_single_restart_roundtrip(tmp_path):
    """[Main] FileType=single writes f32 restarts (io_fields.f90:37-40);
    read_field autodetects the item size from the file length."""
    from tlab_tpu.io import fields_io
    rng = np.random.default_rng(3)
    a = rng.standard_normal((6, 5, 4))
    p = str(tmp_path / "flow.5.1")
    fields_io.write_field(p, a, 5, (1.5, 2e-3), dtype="<f4")
    import os
    assert os.path.getsize(p) == 36 + a.size * 4
    b, params, it = fields_io.read_field(p)
    assert it == 5 and abs(params[0] - 1.5) < 1e-12
    np.testing.assert_allclose(b, a.astype(np.float32), rtol=0, atol=0)


def test_pressure_decomposition_modes():
    """FI_PRESSURE_BOUSSINESQ DCMP_* menu: the parts sum back to
    advdiff, and buoyancy/coriolis-only pressures exist when the terms
    are active."""
    import jax.numpy as jnp
    from tlab_tpu.config import load_case, Ini
    from tlab_tpu.runtime import Simulation
    from tlab_tpu.dycore.state import State
    from tlab_tpu.dycore.pressure import pressure_boussinesq
    import tests.test_pdf_modes as tpm
    txt = tpm.INI.replace("[BodyForce]", "[Rotation]\nType=explicit\n"
                          "Vector=0.0,1.0,0.0\n[BodyForce]")
    sim = Simulation.from_case(load_case(Ini(text=txt)))
    rng = np.random.default_rng(4)
    shp = sim.grid.shape
    st = State(u=jnp.asarray(rng.standard_normal(shp)) * 0.1,
               v=jnp.asarray(rng.standard_normal(shp)) * 0.1,
               w=jnp.asarray(rng.standard_normal(shp)) * 0.1,
               s=jnp.asarray(rng.standard_normal((1,) + shp)) * 0.1)
    p_adv = np.asarray(pressure_boussinesq(sim.P, st, "advection"))
    p_dif = np.asarray(pressure_boussinesq(sim.P, st, "diffusion"))
    p_ad = np.asarray(pressure_boussinesq(sim.P, st, "advdiff"))
    # linear solve + linear split: advection + diffusion == advdiff
    np.testing.assert_allclose(p_adv + p_dif, p_ad, rtol=1e-8, atol=1e-10)
    for mode in ("total", "coriolis", "buoyancy"):
        p = np.asarray(pressure_boussinesq(sim.P, st, mode))
        assert np.isfinite(p).all(), mode
        assert np.max(np.abs(p)) > 0, mode
