"""Pallas batched Thomas solver vs NumPy reference (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from tlab_tpu.ops import pallas_thomas as pt


def test_thomas_matches_dense():
    rng = np.random.default_rng(0)
    n, m = 64, 256
    b = 2.0 + rng.uniform(0.5, 1.0, n)          # diagonally dominant
    a = rng.uniform(-0.4, 0.4, n)
    c = rng.uniform(-0.4, 0.4, n)
    a[0] = 0.0
    c[-1] = 0.0
    A = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
    rhs = rng.standard_normal((m, n))
    u_ref = np.linalg.solve(A, rhs.T).T

    factors = pt.device_factors(a, b, c, dtype=jnp.float64)
    u = np.asarray(pt.thomas_solve(factors, jnp.asarray(rhs), interpret=True))
    assert np.max(np.abs(u - u_ref)) < 1e-11


def test_thomas_compact_derivative():
    """Use the Thomas backend to apply a compact D1 (A f' = B f) and match
    the dense-operator result."""
    from tlab_tpu.constants import BC
    from tlab_tpu.fdm.plan import build_deriv_plan
    from tlab_tpu.grid import make_axis
    n, m = 96, 128
    ax = make_axis(np.linspace(0, 1, n), periodic=False)
    plan = build_deriv_plan(ax)
    A1, B1 = plan.A1, plan.B1
    # extract tridiagonal bands of A1
    b = np.diag(A1).copy()
    a = np.concatenate([[0.0], np.diag(A1, -1)])
    c = np.concatenate([np.diag(A1, 1), [0.0]])
    rng = np.random.default_rng(1)
    f = rng.standard_normal((m, n))
    rhs = f @ B1.T
    factors = pt.device_factors(a, b, c, dtype=jnp.float64)
    df = np.asarray(pt.thomas_solve(factors, jnp.asarray(rhs),
                                    interpret=True))
    df_dense = f @ plan.d1[BC.DD].T
    assert np.max(np.abs(df - df_dense)) < 1e-10
