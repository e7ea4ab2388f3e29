"""Partitioned (substructured) banded solver vs NumPy reference."""
import numpy as np
import jax.numpy as jnp

from tlab_tpu.ops import pallas_thomas as pt





def test_banded_der1_matches_dense():
    """banded_plan + banded_der1 equal the dense A^{-1}B application for a
    non-periodic compact D1 incl. the biased boundary rows."""
    from tlab_tpu.fdm.plan import build_deriv_plan
    from tlab_tpu.grid import make_axis
    n = 96
    ax = make_axis(np.linspace(0.0, 1.0, n), False)
    plan = build_deriv_plan(ax)
    bp = pt.banded_plan(plan.A1, plan.B1, jnp.float64)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((5, n, 4)))
    from tlab_tpu.constants import BC
    dense = np.einsum("ab,ibk->iak", plan.d1[BC.DD], np.asarray(u))
    got = np.asarray(pt.banded_der1(bp, u, 1))
    assert np.max(np.abs(got - dense)) < 1e-11


def test_thomas_production_selection(monkeypatch):
    """TLAB_TPU_THOMAS_MIN_N makes build_device_plans attach the banded
    backend for long non-periodic lines, and _d1 matches the dense path."""
    import os
    from tlab_tpu.dycore import incompressible as dyn
    from tlab_tpu.fdm.plan import build_fdm_plan
    from tlab_tpu.grid import uniform_grid
    from tlab_tpu.physics.params import NSParams
    monkeypatch.setenv("TLAB_TPU_THOMAS_MIN_N", "64")
    grid = uniform_grid(16, 96, 1, 1.0, 1.0, 1.0)
    fdm = build_fdm_plan(grid)
    P = dyn.build_device_plans(
        fdm, NSParams(schmidt=()), dyn.WallBCs.from_velocity_kind(
            "freeslip", "freeslip", scalar_bcs=()),
        dtype=jnp.float64, with_elliptic=False)
    assert "d1y_banded" in P and "d1x_banded" not in P   # x periodic
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.standard_normal(grid.shape))
    got = np.asarray(dyn._d1(P, "y", 1, a))
    dense = np.einsum("ab,ibk->iak", P["d1y"], np.asarray(a))
    assert np.max(np.abs(got - dense)) < 1e-11


def test_partitioned_periodic_selection_4d(monkeypatch):
    """TLAB_TPU_PARTITION_MIN_N attaches circulant banded plans on long
    periodic uniform axes, and _d1 takes the TRUE axis index of the array
    it is given (4-D stacks pass 1/2/3 -- regression for the double
    offset that broke the compressible banded routing)."""
    from tlab_tpu.dycore import incompressible as dyn
    from tlab_tpu.fdm.plan import build_fdm_plan
    from tlab_tpu.grid import uniform_grid
    from tlab_tpu.physics.params import NSParams
    monkeypatch.setenv("TLAB_TPU_PARTITION_MIN_N", "128")
    grid = uniform_grid(256, 8, 8, 1.0, 1.0, 1.0)
    fdm = build_fdm_plan(grid)
    P = dyn.build_device_plans(
        fdm, NSParams(schmidt=()), dyn.WallBCs.from_velocity_kind(
            "freeslip", "freeslip", scalar_bcs=()),
        dtype=jnp.float64, with_elliptic=False)
    assert "d1x_banded" in P and P["d1x_banded"].get("periodic")
    assert "d2x_banded" in P
    rng = np.random.default_rng(7)
    a3 = jnp.asarray(rng.standard_normal(grid.shape))
    dense3 = np.einsum("ab,bjk->ajk", P["d1x"], np.asarray(a3))
    got3 = np.asarray(dyn._d1(P, "x", 0, a3))
    assert np.max(np.abs(got3 - dense3)) < 1e-11
    a4 = jnp.asarray(rng.standard_normal((2,) + grid.shape))
    dense4 = np.einsum("ab,fbjk->fajk", P["d1x"], np.asarray(a4))
    got4 = np.asarray(dyn._d1(P, "x", 1, a4))    # true 4-D axis index
    assert got4.shape == a4.shape
    assert np.max(np.abs(got4 - dense4)) < 1e-11


def test_partitioned_solve_exact():
    """The substructured solve is EXACT algebra: matches a dense solve to
    round-off for the compact-scheme A, any segment split, f64."""
    from tlab_tpu.ops.pallas_thomas import partitioned_plan, partitioned_solve
    rng = np.random.default_rng(3)
    for n, L in ((256, 64), (384, 128), (1024, 128)):
        # compact-C6-like tri with biased wall rows
        A = np.zeros((n, n))
        idx = np.arange(n)
        A[idx, idx] = 1.0
        A[idx[1:], idx[:-1]] = 1.0 / 3.0
        A[idx[:-1], idx[1:]] = 1.0 / 3.0
        A[0, 1] = 2.0
        A[-1, -2] = 2.0
        plan = partitioned_plan(A, L=L, dtype=jnp.float64)
        rhs = rng.standard_normal((5, n))
        u = np.asarray(partitioned_solve(plan, jnp.asarray(rhs)))
        u_ref = np.linalg.solve(A, rhs.T).T
        err = np.max(np.abs(u - u_ref)) / np.max(np.abs(u_ref))
        assert err < 1e-12, (n, L, err)
