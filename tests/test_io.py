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
