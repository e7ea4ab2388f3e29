"""Reference RNG (Numerical Recipes ran0/rang) unit tests.

The generator must reproduce the reference stream EXACTLY -- the ultimate
anchor is Case01's dns.out matching dns.out.ref (test_reference_cases),
which only holds if every drawn value is identical. Here: C/Python-path
agreement, the documented Park-Miller structure, seeding semantics
(rand_local.f90:53-55), and statistical sanity of rang.
"""
import numpy as np

from tlab_tpu.utils import nrrandom
from tlab_tpu.utils.nrrandom import NRStream


def test_c_and_python_paths_identical():
    saved = nrrandom._lib
    try:
        nrrandom._lib = None
        a = NRStream(-7).uniform(4096)
        ga = NRStream(-7).gaussian(2048)
        st_c = NRStream(-7)
        st_c.uniform(100)
        nrrandom._lib = False
        b = NRStream(-7).uniform(4096)
        gb = NRStream(-7).gaussian(2048)
        st_p = NRStream(-7)
        st_p.uniform(100)
        assert np.array_equal(a, b)
        assert np.array_equal(ga, gb)
        assert np.array_equal(st_c._state, st_p._state)
    finally:
        nrrandom._lib = saved


def test_park_miller_lcg_core():
    """After warm-up the idum state follows idum' = 16807*idum mod (2^31-1)
    (Schrage factorization, random.f90 RAN0)."""
    st = NRStream(-7)
    st.uniform(50)
    i0 = int(st._state[0])
    st.uniform(1)
    i1 = int(st._state[0])
    assert i1 == (16807 * i0) % 2147483647


def test_stream_continuity():
    """Drawing n values in batches equals one batch (state carries)."""
    a = NRStream(-13).uniform(1000)
    st = NRStream(-13)
    b = np.concatenate([st.uniform(137), st.uniform(863)])
    assert np.array_equal(a, b)


def test_values_in_range_and_gaussian_moments():
    u = NRStream(-7).uniform(20000)
    assert np.all((u > 0.0) & (u < 1.0))
    g = NRStream(-7).gaussian(60000)
    assert abs(g.mean()) < 0.02
    assert abs(g.var() - 1.0) < 0.03


def test_reinitialization_on_negative_seed():
    """A negative idum triggers the shuffle-table rebuild: two streams with
    the same negative seed agree; different seeds differ."""
    a = NRStream(-5).uniform(64)
    b = NRStream(-5).uniform(64)
    c = NRStream(-6).uniform(64)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
