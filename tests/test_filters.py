"""Filter validation: DC preservation, high-wavenumber damping, polynomial
exactness (port of the reference's valid/filters intent)."""
import numpy as np
import pytest

from tlab_tpu.fdm import filters


def gain_periodic(F, k, n):
    x = np.arange(n) * (2 * np.pi / n)
    u = np.cos(k * x)
    uf = F @ u
    return np.dot(uf, u) / np.dot(u, u)


@pytest.mark.parametrize("alpha", [0.0, 0.3, 0.45])
def test_compact4_periodic_transfer(alpha):
    n = 64
    nodes = np.arange(n) * (2 * np.pi / n)
    F = filters.compact4_matrix(nodes, alpha, periodic=True)
    assert abs(gain_periodic(F, 1, n) - 1.0) < 1e-3          # DC-ish preserved
    g_nyq = gain_periodic(F, n // 2, n)
    assert abs(g_nyq) < 1e-10                                 # Nyquist killed
    # analytic transfer function of Lele C.2.4
    a = (5 + 6 * alpha) / 8
    b = (1 + 2 * alpha) / 2
    c = (2 * alpha - 1) / 8
    for k in (4, 11, 23):
        w = 2 * np.pi * k / n
        g_exact = (a + b * np.cos(w) + c * np.cos(2 * w)) / (1 + 2 * alpha * np.cos(w))
        assert abs(gain_periodic(F, k, n) - g_exact) < 1e-10


def test_compact4_bounded_polynomial_exact():
    n = 48
    nodes = np.linspace(0.0, 1.0, n) ** 1.2       # nonuniform
    F = filters.compact4_matrix(nodes, 0.45, periodic=False)
    for m in range(4):
        p = nodes ** m
        assert np.max(np.abs(F @ p - p)) < 1e-10, m


def test_explicit_filters_conserve_constants():
    n = 40
    nodes = np.linspace(0, 1, n)
    for F in (filters.explicit6_matrix(n, False),
              filters.explicit6_matrix(n, True),
              filters.explicit4_matrix(nodes, False),
              filters.tophat_matrix(nodes, 2, False)):
        ones = np.ones(n)
        assert np.max(np.abs(F @ ones - ones)) < 1e-12


def test_explicit6_damps_nyquist():
    n = 64
    F = filters.explicit6_matrix(n, True)
    x = np.arange(n)
    u = (-1.0) ** x                         # Nyquist mode
    assert np.max(np.abs(F @ u)) < 1e-12


def test_tophat_smooths():
    n = 64
    nodes = np.arange(n) / n
    F = filters.tophat_matrix(nodes, 4, True)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(n)
    assert np.var(F @ u) < np.var(u)
