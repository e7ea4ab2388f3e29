"""Consume the reference's own example cases (/root/reference/examples):
INI parsing across all 48 cases, faithful inigrid construction (tanh
stretching, grid-file format), and a Case01 end-to-end run from the real
tlab.ini compared against dns.out.ref column by column (the reference's
`make check` analog, examples/check_run.sh:20-38)."""
import glob
import os
import re
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference/examples"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = [pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference examples not mounted"),
              pytest.mark.slow]


def test_all_example_inis_parse_and_grid():
    """Every reference case file loads and its grid builds with the shape
    declared in [Grid] (grid_main.f90:36-47 size accounting incl.
    periodic reduction and mirroring)."""
    from tlab_tpu.config import load_case
    from tlab_tpu.runtime import grid_from_case
    inis = sorted(glob.glob(f"{REF}/Case*/tlab.ini"))
    assert len(inis) >= 47
    for ini in inis:
        case = load_case(ini)
        g = grid_from_case(case)
        from tlab_tpu.config import Ini
        raw = Ini(ini)
        expect = (raw.get_int("Grid", "Imax", 1),
                  raw.get_int("Grid", "Jmax", 1),
                  raw.get_int("Grid", "Kmax", 1))
        assert g.shape == expect, (ini, g.shape, expect)


def test_case10_tanh_grid_reference_formula():
    """Case10's stretched y grid follows BLD_TANH exactly: uniform nodes
    plus (f-1) delta softplus((y-st)/delta), anchored at y=0
    (grid_local.f90:34-69). The physical end moves past scales_1."""
    from tlab_tpu.config import load_case
    from tlab_tpu.runtime import grid_from_case
    case = load_case(f"{REF}/Case10/tlab.ini")
    g = grid_from_case(case)
    y = g.y.nodes
    n = 257
    st, f, delta = 0.9375, 2.00, 0.0078125
    s = np.linspace(0.0, 1.0, n)
    work = (f - 1.0) * delta * np.logaddexp((s - st) / delta, 0.0)
    expect = s + work - work[0]
    assert np.max(np.abs(y - expect)) < 1e-14
    # spacing doubles across the transition
    dy = np.diff(y)
    assert abs(dy[-1] / dy[0] - f) < 1e-3
    # profile y-coordinates use the ACTUAL built scale
    assert abs(g.y.scale - expect[-1]) < 1e-14


def test_case03_two_mode_tanh_grid():
    from tlab_tpu.config import load_case
    from tlab_tpu.runtime import grid_from_case
    case = load_case(f"{REF}/Case03/tlab.ini")
    g = grid_from_case(case)
    dy = np.diff(g.y.nodes)
    # both wall regions coarsened by f=2, center fine
    assert abs(dy[0] / dy[len(dy) // 2] - 2.0) < 5e-2
    assert abs(dy[-1] / dy[len(dy) // 2] - 2.0) < 5e-2
    assert np.all(dy > 0)


def test_grid_file_byte_roundtrip(tmp_path):
    """grid written in the reference Fortran format reads back bitwise and
    re-writes to identical bytes (tlab_grid.f90:26-90)."""
    from tlab_tpu.config import load_case
    from tlab_tpu.runtime import grid_from_case
    from tlab_tpu.grid import (read_reference_grid, write_reference_grid)
    case = load_case(f"{REF}/Case10/tlab.ini")
    g = grid_from_case(case)
    p1 = tmp_path / "grid"
    p2 = tmp_path / "grid2"
    write_reference_grid(str(p1), g)
    g2 = read_reference_grid(str(p1))
    assert np.array_equal(g.y.nodes, g2.y.nodes)
    assert np.array_equal(g.x.nodes, g2.x.nodes)
    write_reference_grid(str(p2), g2)
    assert p1.read_bytes() == p2.read_bytes()


def _parse_dns_out(path):
    rows = []
    for line in open(path):
        if line.startswith("#"):
            continue
        parts = line.split()
        if len(parts) >= 8:
            rows.append([float(v) for v in parts])
    return np.asarray(rows)


def _assert_digit_exact(outdir, case_name):
    """dns.out must equal dns.out.ref on EVERY column of every row to the
    full printed precision (whitespace-insensitive).  Achieved by the
    reference-exact ran0/rang IC streams (utils/nrrandom.py) plus the
    reference-exact factorized elliptic composition
    (ops/elliptic_factorize.py): the IC realization, the projection's
    wall-row truncation signature, and the adaptive dt all coincide."""
    ours = [ln.split() for ln in open(os.path.join(outdir, "dns.out"))
            if not ln.startswith("#")]
    ref = [ln.split() for ln in open(f"{REF}/{case_name}/dns.out.ref")
           if not ln.startswith("#")]
    assert len(ours) == len(ref), (case_name, len(ours), len(ref))
    for a, b in zip(ours, ref):
        assert a == b, (case_name, a, b)


def _assert_print_exact_ulp(outdir, case_name, ulp=1):
    """Like _assert_digit_exact but allowing each printed number to
    differ by at most `ulp` units in its LAST printed digit (f64
    accumulated-rounding straddles on the 6-digit time column)."""
    import re
    ours = [ln.split() for ln in open(os.path.join(outdir, "dns.out"))
            if not ln.startswith("#")]
    ref = [ln.split() for ln in open(f"{REF}/{case_name}/dns.out.ref")
           if not ln.startswith("#")]
    assert len(ours) == len(ref), (case_name, len(ours), len(ref))
    for ra, rb in zip(ours, ref):
        assert len(ra) == len(rb), (case_name, ra, rb)
        for a, b in zip(ra, rb):
            if a == b:
                continue
            m = re.match(r"-?0\.(\d+)E([+-]\d+)$", b)
            assert m, (case_name, a, b)
            res = 10.0 ** (int(m.group(2)) - len(m.group(1)))
            assert abs(float(a) - float(b)) <= ulp * res * 1.0000001, \
                (case_name, a, b)


def test_case01_end_to_end_vs_reference_log(tmp_path):
    """The reference's own Case01 fixture (512x256x1 shear layer, 10 steps)
    run from its UNMODIFIED tlab.ini: dns.out is DIGIT-EXACT against
    dns.out.ref -- every column including the DilMin/DilMax signature of
    the factorized projection's wall rows."""
    env = dict(os.environ)
    out = str(tmp_path)
    ini = f"{REF}/Case01/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, r.stderr[-2000:]
    _assert_digit_exact(out, "Case01")
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    # restart fields written and finite
    from tlab_tpu.io import fields_io
    u10, params, _ = fields_io.read_field(os.path.join(out, "flow.10.1"))
    assert u10.shape == (512, 256, 1)
    assert np.isfinite(u10).all()
    # rtime in the header equals the logged final time (log prints 6
    # significant digits)
    assert abs(params[0] - ours[-1, 2]) < 1e-6 * max(abs(params[0]), 1.0)


@pytest.mark.parametrize("case", ["Case03", "Case08", "Case53"])
def test_broadband_cases_digit_exact(tmp_path, case):
    """More VorticityBroadband shear layers (two-mode tanh grid, 3-D,
    three-scalar): digit-exact dns.out from the unmodified INIs."""
    out = str(tmp_path)
    ini = f"{REF}/{case}/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, (case, r.stderr[-2000:])
    _assert_digit_exact(out, case)


def test_case43_mirrored_fixed_scale_channel():
    """Mirrored tanh grid with fixed_scale=2 (Case43 channel): symmetric
    about 0, wall-refined, exact span. Deliberate deviation from the
    reference's unconditional end-node pin, which deforms mirrored grids
    (grid_main.f90:103-108)."""
    from tlab_tpu.config import load_case
    from tlab_tpu.runtime import grid_from_case
    case = load_case(f"{REF}/Case43/tlab.ini")
    g = grid_from_case(case)
    y = g.y.nodes
    dy = np.diff(y)
    assert y.size == 192
    assert abs(y[0] + 1.0) < 1e-12 and abs(y[-1] - 1.0) < 1e-12
    assert np.all(dy > 0)
    assert abs(y[0] + y[-1]) < 1e-12          # symmetric
    assert dy[0] < 0.1 * dy[len(dy) // 2]     # wall-refined


def test_case51_lagrangian_end_to_end(tmp_path):
    """Case51 = Case01's shear layer + 800k Tracer particles
    (examples/Case51/tlab.ini). Full pipeline from the UNMODIFIED INI:
    ini -> inipart (YMeanRelativeIniP/DiamIniP slab placement,
    particle_main.f90:198-254) -> dns with the Lagrangian substep.
    dns.out flow columns obey the same tolerances as Case01; particle
    restart positions stay inside the y slab's reachable envelope."""
    out = str(tmp_path)
    ini = f"{REF}/Case51/tlab.ini"
    for cmd in (["ini"], ["inipart"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, (cmd, r.stderr[-2000:])
    _assert_digit_exact(out, "Case51")
    # particle restart: full population advected, y stays within the
    # initial slab ± the distance advectable at |v|<~0.2 over t=0.067
    from tlab_tpu.particles.io import read_particles
    ps0, _ = read_particles(os.path.join(out, "part.0"))
    ps, _ = read_particles(os.path.join(out, "part.10"))
    assert ps.x.shape[0] == 800000
    y0 = np.asarray(ps0.x[:, 1])
    assert abs(y0.mean() - 0.5) < 5e-3 and y0.min() > 0.24 and y0.max() < 0.76
    y = np.asarray(ps.x[:, 1])
    assert np.isfinite(np.asarray(ps.x)).all()
    assert y.min() > 0.2 and y.max() < 0.8
    # x stays inside the periodic box
    x = np.asarray(ps.x[:, 0])
    assert x.min() >= 0.0 and x.max() <= 2.0


def test_case25_anelastic_deterministic_end_to_end(tmp_path):
    """Case25 (anelastic dry convection, ScaleHeight=10.38, PlaneDiscrete
    scalar IC) is fully deterministic. Run from the unmodified reference
    tlab.ini: time/dt/CFL/D# match dns.out.ref to every printed digit
    and the anelastic-constraint dilatation div(rho_bar u) stays at
    round-off (the reference's is ~1e-7). This pins the whole anelastic
    chain: Gravity_Hydrostatic_Enthalpy background (cp-normalized ep,
    yref anchoring, reference rho normalization), explicit buoyancy,
    weighted projection."""
    out = str(tmp_path)
    ini = f"{REF}/Case25/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/Case25/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == 11
    for col in (2, 3, 4, 5, 6):          # time, dt, CFL, D#, visc exact
        assert np.allclose(ours[:, col], ref[:, col], rtol=1e-6,
                           atol=1e-12), col
    # anelastic constraint residual: round-off scale, never worse than
    # 3x the reference's own truncation-level dilatation
    dil = np.maximum(np.abs(ours[1:, 7]), np.abs(ours[1:, 8]))
    dil_ref = np.maximum(np.abs(ref[1:, 7]), np.abs(ref[1:, 8]))
    assert np.all(dil <= 3.0 * dil_ref + 1e-9)


_SING_LEGACY = {"TLAB_TPU_SING_MODE": "legacy"}


def _run_case_exact(tmp_path, case_name, cols=(2, 3, 4, 5, 6),
                    dil_factor=3.0, steps=11, time_rtol=1e-6,
                    col_rtol=None, with_particles=False, env_extra=None):
    """Run a fully deterministic reference case from its unmodified INI
    and require the given dns.out columns to match dns.out.ref to every
    printed digit; dilatation bounded by dil_factor x the reference's.
    time_rtol loosens only the accumulated-time column (dt differences
    below the printed 3 digits accumulate over adaptive steps).
    col_rtol: optional {col: rtol} override for columns that sit on a
    print-rounding boundary (one unit in the 3rd printed digit)."""
    out = str(tmp_path)
    ini = f"{REF}/{case_name}/tlab.ini"
    cmds = (["ini"], ["inipart"], ["dns"]) if with_particles \
        else (["ini"], ["dns"])
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    for cmd in cmds:
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, (case_name, r.stderr[-2000:])
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/{case_name}/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == steps
    for col in cols:
        rtol = time_rtol if col == 2 else 1e-6
        if col_rtol and col in col_rtol:
            rtol = col_rtol[col]
        assert np.allclose(ours[:, col], ref[:, col], rtol=rtol,
                           atol=1e-12), (case_name, col)
    if dil_factor is not None:
        dil = np.maximum(np.abs(ours[1:, 7]), np.abs(ours[1:, 8]))
        dil_ref = np.maximum(np.abs(ref[1:, 7]), np.abs(ref[1:, 8]))
        assert np.all(dil <= dil_factor * dil_ref + 1e-6), case_name
    return ours, ref


def test_case26_moist_anelastic_end_to_end(tmp_path):
    """Case26: anelastic AirVapor mixture (moist but unsaturated
    background), deterministic PlaneDiscrete IC. time/dt/CFL/D# match
    dns.out.ref to every printed digit -- pins the AirVapor branch of the
    hydrostatic background and buoyancy."""
    _run_case_exact(tmp_path, "Case26")


def test_case46_wavemaker_gravity_waves_end_to_end(tmp_path):
    """Case46: internal gravity waves forced by the [SpecialForcing]
    WaveMaker (relaxation toward a plane-wave field inside a Gaussian
    envelope, specialforcing.f90:105-223), linear stratification, tanh-
    stretched y grid, Jmax relaxation buffer. All columns exact --
    the growing CFL column is pure wavemaker response."""
    ours, ref = _run_case_exact(tmp_path, "Case46", dil_factor=None)
    # dilatation stays at round-off (reference level, both ~1e-8)
    assert np.max(np.abs(ours[1:, 7:9])) < 1e-6
    # flow actually grows from rest (forcing engaged)
    assert ours[-1, 4] > 0.4


def test_case70_ekman_semiimplicit_end_to_end(tmp_path):
    """Case70: laminar Ekman layer, RungeKuttaDiffusion3 semi-implicit
    diffusion, fixed dt. The EkmanP + companion EkmanV profile pair
    (tlab_background.f90:96-99) gives the exact CFL column."""
    ours, ref = _run_case_exact(tmp_path, "Case70", dil_factor=None)
    assert np.max(np.abs(ours[1:, 7:9])) < 1e-5


def test_case06_plane_discrete_end_to_end(tmp_path):
    """Case06: shear layer tripped by a PlaneDiscrete displacement of the
    scalar/velocity layer (deterministic). All columns exact."""
    _run_case_exact(tmp_path, "Case06")


def test_case11_delta_discrete_end_to_end(tmp_path):
    """Case11: RB-type layer with DeltaDiscrete thickness modulation on a
    257-point stretched grid. All columns exact."""
    _run_case_exact(tmp_path, "Case11")


def test_case16_stratocumulus_linear_end_to_end(tmp_path):
    """Case16: linearized stratocumulus (MIXT_TYPE_AIRWATER_LINEAR,
    diagnostic liquid scalar, evaporative buoyancy). time/dt/CFL/D#
    exact; dilatation DIGIT-EXACT with the literal NN_Sing convention
    (enabled by the zero-liquid bbackground fix, tlab_background.f90:194)."""
    ours, ref = _run_case_exact(tmp_path, "Case16", dil_factor=None)
    for col in (7, 8):
        assert np.allclose(ours[:, col], ref[:, col], rtol=1e-6,
                           atol=1e-12), col


def test_case42_homogeneous_forcing_end_to_end(tmp_path):
    """Case42: channel driven by the constant [SpecialForcing]
    Type=Homogeneous body force (specialforcing.f90:215-216). The
    shipped dns.out.ref is inconsistent with the INI's cold start (its
    rtime column is 1e21 -- a restart-header artifact), so this checks
    the physics instead: linear momentum spin-up u = f*t under the unit
    force, divergence at round-off."""
    out = str(tmp_path)
    ini = f"{REF}/Case42/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    # RungeKuttaDiffusion3 => dt is CFL-limited only (TIME_COURANT IMP3
    # branch): with u(t) = t (unit force from rest) the CFL column pins
    # at the 1.2 target while dt shrinks ~1/t; dt*time is ~constant
    assert np.allclose(ours[3:, 4], 1.2, rtol=1e-6)
    assert ours[10, 3] < ours[5, 3]
    assert abs((ours[10, 3] * ours[10, 2])
               / (ours[5, 3] * ours[5, 2]) - 1.0) < 0.15
    assert np.max(np.abs(ours[1:, 7:9])) < 1e-10
    from tlab_tpu.io import fields_io
    u10, _, _ = fields_io.read_field(os.path.join(out, "flow.10.1"))
    # interior (outside walls) spun up to ~t=0.1149 uniformly
    mid = u10[:, u10.shape[1] // 2, :]
    assert abs(float(np.mean(mid)) - ours[10, 2]) < 1e-3


def test_case12_flux_discrete_chemistry_end_to_end(tmp_path):
    """Case12: 4-scalar RB layer with FluxDiscrete magnitude perturbation
    and the quadratic reaction (Da per scalar, source Da_i p_i s2 s3,
    chemistry.f90:122-124). All columns exact; dilatation to ~3 digits."""
    ours, ref = _run_case_exact(tmp_path, "Case12", dil_factor=None)
    for col in (7, 8):
        assert np.allclose(ours[1:, col], ref[1:, col], rtol=5e-3), col
    # product scalar (s4) actually formed by the reaction
    from tlab_tpu.io import fields_io
    s4, _, _ = fields_io.read_field(os.path.join(str(tmp_path), "scal.10.4"))
    assert float(np.max(np.abs(s4))) > 1e-6


def test_case15_cloudtop_airwater_end_to_end(tmp_path):
    """Case15: evaporatively driven cloud-top mixing layer -- Boussinesq
    momentum + ANELASTIC AirWater thermodynamics ([Thermodynamics]
    Type=anelastic with Equations=incompressible, ScaleHeight=8700).
    With the literal NN_Sing convention every column incl. the
    DilMin/DilMax projection signature matches dns.out.ref to print
    precision (the NewtonRs saturation residual agrees in magnitude)."""
    ours, ref = _run_case_exact(tmp_path, "Case15", dil_factor=None)
    for col in (7, 8):
        assert np.allclose(ours[1:, col], ref[1:, col], rtol=1e-6), col
    assert np.all(ours[:, 9] < 1e-9)      # NewtonRs at round-off


def test_case24_radiative_stratocumulus_end_to_end(tmp_path):
    """Case24: smoke-cloud layer with Bulk1dLocal infrared cooling
    (radiation.f90:186-199 backwards-compatibility conversion to
    grayliquid) and strong buoyancy (Fr=1.7e-4).  With the literal
    NN_Sing singular convention (r3 default): every structural column
    exact, DilMin/DilMax to 4 significant digits, and the NewtonRs
    saturation-residual column present at the reference's magnitude."""
    out = str(tmp_path)
    ini = f"{REF}/Case24/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/Case24/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == 11
    assert ours.shape[1] == ref.shape[1] == 10    # incl. NewtonRs
    for col in (2, 3, 5, 6):
        assert np.allclose(ours[:, col], ref[:, col], rtol=1e-6), col
    # CFL straddles its 3rd printed digit late in the run (0.594/0.595)
    assert np.allclose(ours[:, 4], ref[:, 4], rtol=2e-3)
    for col in (7, 8):                            # DilMin DilMax
        assert np.allclose(ours[1:, col], ref[1:, col], rtol=2e-3), col
    assert np.all(ours[:, 9] < 1e-9)              # NewtonRs round-off


def test_case17_radiative_stratocumulus_linear_end_to_end(tmp_path):
    """Case17: AirWaterLinear stratocumulus with Bulk1dLocal infrared
    cooling AND the [IniFields] NormalizeR accumulated-radiation initial
    increment on the active scalar (scal_main.f90:120-131). dt/CFL exact
    at every step; D# within one unit of the 3rd printed digit (a print-
    rounding boundary at step 4); our dilatation below the reference's."""
    ours, ref = _run_case_exact(tmp_path, "Case17", dil_factor=None,
                                time_rtol=4e-4, col_rtol={5: 2e-3})
    for col in (7, 8):   # literal NN_Sing: dil to ~1% early, and to
        # ~1e-5 absolute once the transient has decayed to ~3e-5
        assert np.allclose(ours[1:, col], ref[1:, col], rtol=5e-2,
                           atol=1e-5), col


def test_case18_evaporative_buoyancy_end_to_end(tmp_path):
    """Case18: Case17 variant with the liquid scalar in the buoyancy
    (Gravity Linear c3 = 0.133 on the AirWaterLinear diagnostic liquid)
    and a psi-dependent equilibrium. dt/CFL/D# exact to every printed
    digit; dilatation to ~1% (literal NN_Sing convention)."""
    ours, ref = _run_case_exact(tmp_path, "Case18", dil_factor=None,
                                time_rtol=1e-4)
    for col in (7, 8):
        assert np.allclose(ours[1:, col], ref[1:, col], rtol=3e-2), col


def test_case20_smoke_cloud_end_to_end(tmp_path):
    """Case20: bottom-up smoke-cloud convection (AirWaterLinear 2-scalar,
    PlaneDiscrete IC, fixed dt). time/dt/CFL/D# exact to every printed
    digit; dilatation within 1% of the reference's envelope."""
    ours, ref = _run_case_exact(tmp_path, "Case20", dil_factor=None)
    for col in (7, 8):   # DIGIT-EXACT incl. dilatation (NN_Sing default)
        assert np.allclose(ours[:, col], ref[:, col], rtol=1e-6,
                           atol=1e-12), col


def test_case27_stratocumulus_airwater_end_to_end(tmp_path):
    """Case27 (DYCOMS-II RF01-derived stbl): anelastic AirWater mixture,
    ErfSurface profiles, explicit-buoyancy gravity, GrayLiquid infrared
    with reference AbsorptionComponent/BoundaryConditions keys, fixed dt.
    time/dt/CFL/D# exact to every printed digit.  The dilatation columns
    are not compared: the reference logs the pre-projection anelastic
    constraint source while we log the post-projection residual (ours is
    ~1e-9, structurally below theirs)."""
    ours, ref = _run_case_exact(tmp_path, "Case27", dil_factor=None)
    dil = np.maximum(np.abs(ours[1:, 7]), np.abs(ours[1:, 8]))
    dil_ref = np.maximum(np.abs(ref[1:, 7]), np.abs(ref[1:, 8]))
    assert np.all(dil <= 1.6 * dil_ref + 1e-9)


def test_case28_airwater_sedimentation_end_to_end(tmp_path):
    """Case28: Case27 + Type=AirWater sedimentation (flux form with the
    liquid static energy for the enthalpy scalar, microphysics.f90:
    141-158, thermo_anelastic.f90:258). time/dt/CFL/D# exact to every
    printed digit; dilatation not compared (see Case27)."""
    ours, ref = _run_case_exact(tmp_path, "Case28", dil_factor=None)
    dil = np.maximum(np.abs(ours[1:, 7]), np.abs(ours[1:, 8]))
    dil_ref = np.maximum(np.abs(ref[1:, 7]), np.abs(ref[1:, 8]))
    assert np.all(dil <= 1.6 * dil_ref + 1e-9)


def test_case19_sedimentation_end_to_end(tmp_path):
    """Case19: smoke cloud with AirWaterSimplified sedimentation
    (settling-scaled per-scalar parameters, derivative-first form,
    microphysics.f90:162-180) + Bulk1dLocal cooling + NormalizeR IC.
    dt/CFL/D# exact to every printed digit; dilatation to ~1%
    (literal NN_Sing convention)."""
    ours, ref = _run_case_exact(tmp_path, "Case19", dil_factor=None,
                                time_rtol=1e-4)
    for col in (7, 8):
        assert np.allclose(ours[1:, col], ref[1:, col], rtol=3e-2), col


def test_case54_bil_cloud_four_particles_end_to_end(tmp_path):
    """Case54: 800k BilinearCloudFour droplet particles riding the
    AirWaterLinear smoke cloud with Bulk1dLocal infrared cooling and
    adaptive dt. dt/CFL/D#/visc exact to every printed digit (time
    accumulates sub-print dt differences); dilatation below the
    reference's envelope."""
    ours, ref = _run_case_exact(tmp_path, "Case54", dil_factor=None, env_extra=_SING_LEGACY,
                                time_rtol=4e-4, with_particles=True,
                                col_rtol={3: 5e-3, 5: 5e-3})
    for col in (7, 8):   # legacy convention matches to ~1%
        assert np.allclose(ours[1:, col], ref[1:, col], rtol=3e-2), col
    # [Particles] CalculatePDF writes the reference-format histogram at
    # the statistics cadence (particle_pdf.f90)
    pdfs = [n for n in os.listdir(tmp_path)
            if n.startswith("particle_pdf.")]
    assert pdfs, os.listdir(tmp_path)
    rows = open(os.path.join(tmp_path, sorted(pdfs)[-1])).readlines()
    assert len(rows) == int(5 / 0.05)        # PdfMax/PdfInterval bins
    assert sum(int(r.split()[1]) for r in rows) > 0


def test_case55_three_scalar_chemistry_particles_end_to_end(tmp_path):
    """Case55: Case54 + a third prognostic scalar with LayeredRelaxation
    chemistry (tanh relaxation_strength at the scalar's ymean,
    chemistry.f90:82-95,117-120), 4-scalar linear buoyancy with the
    independent term at parameters(inb_scal_array+1) (gravity.f90:249),
    and the smoothing factor at thermo_param(inb_scal+1)
    (thermo_airwater.f90:500).  dt/CFL/D# exact; dilatation below the
    reference's."""
    ours, ref = _run_case_exact(tmp_path, "Case55", dil_factor=None, env_extra=_SING_LEGACY,
                                time_rtol=4e-4, col_rtol={3: 5e-3, 5: 5e-3})
    for col in (7, 8):   # legacy convention matches to ~1%
        assert np.allclose(ours[1:, col], ref[1:, col], rtol=3e-2), col


def test_case05_two_schmidt_diffusion_limited_dt(tmp_path):
    """Case05: two scalars with Schmidt=(2.0, 0.5) on the stretched grid,
    diffusion-limited dt. Digit-exact dns.out (exact IC realization +
    exact schmidtfactor formula)."""
    out = str(tmp_path)
    ini = f"{REF}/Case05/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    _assert_digit_exact(out, "Case05")


def test_case44_channel_end_to_end(tmp_path):
    """Case44: plane channel (mirrored fixed_scale tanh grid,
    PotentialBroadband IC).  With the exact RNG chain the IC dilatation
    row matches dns.out.ref to every printed digit and time/dt/CFL/D#/
    visc are exact; the projection residual then drifts <=4% per step
    (converging to <0.1% as the physical dilatation grows)."""
    out = str(tmp_path)
    ini = f"{REF}/Case44/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/Case44/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == 11
    for col in (2, 3, 5, 6):
        assert np.allclose(ours[:, col], ref[:, col], rtol=1e-6,
                           atol=1e-12), col
    assert np.allclose(ours[:, 4], ref[:, 4], rtol=1e-6)      # CFL exact
    for col in (7, 8):      # IC row digit-exact, evolution to 4%
        assert np.allclose(ours[0, col], ref[0, col], rtol=1e-6)
        assert np.allclose(ours[1:, col], ref[1:, col], rtol=4e-2,
                           atol=1e-4), col


def test_case82_ekman3d_planes_end_to_end(tmp_path):
    """Case82: 3-D Ekman layer with [SavePlanes] PlanesJ=1,2,3,7,11 but
    NO [Iteration] Saveplanes cadence -- the reference clamps
    nitera_pln<=0 to the run length (dns_read_local.f90:538), so no
    in-run planes are written. time/dt/D#/visc exact; CFL to 2%."""
    out = str(tmp_path)
    ini = f"{REF}/Case82/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/Case82/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == 11
    for col in (2, 3, 5, 6):
        assert np.allclose(ours[:, col], ref[:, col], rtol=1e-6,
                           atol=1e-12), col
    assert np.all(np.abs(ours[:, 4] / ref[:, 4] - 1.0) < 0.02)
    # the absent Saveplanes cadence means NO in-run plane files
    assert not [n for n in os.listdir(out) if n.startswith("planesJ.")]


@pytest.mark.parametrize("case", ["Case85", "Case86", "Case87"])
def test_case85_semiimplicit_adaptive_end_to_end(tmp_path, case):
    """Case85/86/87: 3-D Ekman layers with TimeOrder=RungeKuttaDiffusion3
    and ADAPTIVE dt -- the SMR91 semi-implicit dispatch with the
    diffusion dt limit dropped (TIME_COURANT RKM check). dt/time/D#
    within 0.5% of the reference (the small spread is the broadband
    RNG's max |u|); CFL pinned at the configured 1.0 and visc exact."""
    out = str(tmp_path)
    ini = f"{REF}/{case}/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/{case}/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == 11
    for col in (2, 3, 5):
        assert np.allclose(ours[:, col], ref[:, col], rtol=5e-3,
                           atol=1e-12), col
    assert np.allclose(ours[:, 4], ref[:, 4])     # CFL = 1.0 target
    assert np.allclose(ours[:, 6], ref[:, 6])     # visc


@pytest.mark.parametrize("case", ["Case41", "Case43"])
def test_channel_diffusion_limited_end_to_end(tmp_path, case):
    """Case41/43: plane channels (Case43 on the mirrored fixed_scale
    grid) with diffusion-limited dt: time/dt/D#/visc exact to every
    printed digit; CFL (RNG max |u|) within 10%."""
    out = str(tmp_path)
    ini = f"{REF}/{case}/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/{case}/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == 11
    for col in (2, 3, 5, 6):
        assert np.allclose(ours[:, col], ref[:, col], rtol=1e-6,
                           atol=1e-12), col
    assert np.all(np.abs(ours[:, 4] / ref[:, 4] - 1.0) < 0.10)


@pytest.mark.parametrize("case", ["Case08", "Case13", "Case53"])
def test_shear_layer_family_tolerance(tmp_path, case):
    """Case08/13/53: shear-layer variants with broadband RNG ICs
    (Case53 carries tracer particles without trajectories, Case13 the
    PotentialBroadband IC). Structural columns at Case01 tolerances."""
    out = str(tmp_path)
    ini = f"{REF}/{case}/tlab.ini"
    cmds = (["ini"], ["inipart"], ["dns"]) if case == "Case53" \
        else (["ini"], ["dns"])
    for cmd in cmds:
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/{case}/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == 11
    assert np.all(np.abs(ours[:, 3] / ref[:, 3] - 1.0) < 0.20)   # dt
    assert np.allclose(ours[:, 6], ref[:, 6])                    # visc
    ratio = (ours[:, 5] / ours[:, 3]) / (ref[:, 5] / ref[:, 3])
    assert np.all(np.abs(ratio - 1.0) < 0.02)                    # D#/dt
    # bounded, same-order dilatation (no instability)
    dil = np.maximum(np.abs(ours[1:, 7]), np.abs(ours[1:, 8]))
    dil_ref = np.maximum(np.abs(ref[1:, 7]), np.abs(ref[1:, 8]))
    assert np.all(dil <= 5.0 * dil_ref)


def test_case88_interactive_surface_end_to_end(tmp_path):
    """Case88: stably-stratified Ekman layer with the INTERACTIVE linear
    surface BC (Scalar1SfcTypeJmin=linear, Coupling=100): the surface
    reference state ref accumulates the flux anomaly and drives the wall
    TENDENCY (boundary_bcs.f90:478-545). Stable for 10 steps with
    dt within 10% of the reference (broadband RNG IC), CFL/visc exact,
    D#/dt ratio to 1%, dilatation the same order."""
    out = str(tmp_path)
    ini = f"{REF}/Case88/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/Case88/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == 11
    assert np.all(np.abs(ours[:, 3] / ref[:, 3] - 1.0) < 0.10)   # dt
    assert np.allclose(ours[:, 4], ref[:, 4])                    # CFL
    assert np.allclose(ours[:, 6], ref[:, 6])                    # visc
    ratio = (ours[:, 5] / ours[:, 3]) / (ref[:, 5] / ref[:, 3])
    assert np.all(np.abs(ratio - 1.0) < 0.01)
    dil = np.maximum(np.abs(ours[1:, 7]), np.abs(ours[1:, 8]))
    dil_ref = np.maximum(np.abs(ref[1:, 7]), np.abs(ref[1:, 8]))
    assert np.all(dil <= 2.0 * dil_ref)                          # stable


def test_case91_slope_flow_end_to_end(tmp_path):
    """Case91: rotating katabatic slope flow -- HOMOGENEOUS gravity along
    Ox on the buoyancy scalar, explicit Coriolis about Oz, two scalars
    with Schmidt=(0.71, 1.0) on a 194-point stretched wall grid.
    Diffusion-limited dt so time/dt/D#/visc are exact; the CFL column
    (deterministic mean-flow spin-up + RNG seed) to 3%."""
    out = str(tmp_path)
    ini = f"{REF}/Case91/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/Case91/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == 11
    for col in (2, 3, 5, 6):
        assert np.allclose(ours[:, col], ref[:, col], rtol=1e-6,
                           atol=1e-12), col
    assert np.all(np.abs(ours[:, 4] / ref[:, 4] - 1.0) < 0.03)
    dil = np.maximum(np.abs(ours[1:, 7]), np.abs(ours[1:, 8]))
    dil_ref = np.maximum(np.abs(ref[1:, 7]), np.abs(ref[1:, 8]))
    assert np.all(dil <= 2.0 * dil_ref)


def test_case52_tracer_trajectories_end_to_end(tmp_path):
    """Case52: Case01 + 50 tracer particles with TrajNumber=2 in-run
    trajectory accumulation (particle_trajectories.f90). Structural
    columns at Case01 tolerances; the trajectory file holds the 2 tagged
    particles at every step."""
    out = str(tmp_path)
    ini = f"{REF}/Case52/tlab.ini"
    for cmd in (["ini"], ["inipart"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    _assert_digit_exact(out, "Case52")
    traj = [n for n in os.listdir(out) if n.startswith("trajectories.")]
    assert traj, os.listdir(out)
    d = np.load(os.path.join(out, traj[0]))
    assert d["x"].shape == (10, 2, 3)
    assert np.isfinite(d["x"]).all()


def test_case21_potential_broadband_smoke_end_to_end(tmp_path):
    """Case21: Case20's smoke cloud started from a PotentialBroadband
    velocity IC (curl of a random potential, ForceDilatation=no).

    Known deviation (same family as Case17/18/19, see PARITY.md): this
    is the ONLY example exercising the Distribution=none random-phase
    spectral construction (rand_local.f90:151-156) for a velocity IC,
    and its golden CFL column differs from the current-source
    construction by ~4% at step 0, converging to print-exact by step 8.
    Our chain is line-by-line equivalent to the current reference
    (phase stream over the padded txc array, kx=0/Nyquist zero phase,
    SetPSD amplitudes — the latter digit-exact-validated by the
    Distribution=gaussian family, Case01/03/05/08/51/53), and swapping
    the realization (Distribution=gaussian) moves CFL0 by the same
    few %: the golden was evidently generated by a different RNG/
    constructor revision.  Structural columns (time/dt/D#/visc) are
    digit-exact; CFL asserted to 5% everywhere and print-exact over the
    final steps; dilatation envelope-bounded."""
    ours, ref = _run_case_exact(tmp_path, "Case21", dil_factor=None,
                                cols=(2, 3, 5, 6))
    assert np.allclose(ours[:, 4], ref[:, 4], rtol=5e-2)
    assert np.allclose(ours[8:, 4], ref[8:, 4], rtol=5e-3)
    dil = np.maximum(np.abs(ours[1:, 7]), np.abs(ours[1:, 8]))
    dil_ref = np.maximum(np.abs(ref[1:, 7]), np.abs(ref[1:, 8]))
    assert np.all(dil <= 2.0 * dil_ref)


def test_case81_ekman_viscchange_end_to_end(tmp_path):
    """Case81: laminar-start Ekman layer at Re=25000 with [ViscChange]
    Time=0.01 viscosity ramp and ObsLog=Ekman. Every structural column
    exact; dilatation converges to 4 significant digits after the
    2-step IC transient; dns.obs written."""
    ours, ref = _run_case_exact(tmp_path, "Case81", dil_factor=None)
    for col in (7, 8):
        assert np.allclose(ours[4:, col], ref[4:, col], rtol=5e-3), col
    dil = np.maximum(np.abs(ours[1:4, 7]), np.abs(ours[1:4, 8]))
    dil_ref = np.maximum(np.abs(ref[1:4, 7]), np.abs(ref[1:4, 8]))
    assert np.all(dil <= 1.2 * dil_ref)
    assert os.path.exists(os.path.join(str(tmp_path), "dns.obs"))


def test_case84_ekman3d_towers_end_to_end(tmp_path):
    """Case84: 3-D turbulent Ekman layer (128x96x128, CompactDirect6
    second derivatives, gravity + Jmax buffer, SaveTowers). dt is
    diffusion-limited so time/dt/D#/visc match the reference exactly;
    the CFL column (Ekman mean profile + broadband RNG) to 2%; the
    tower accumulator writes its stride file."""
    out = str(tmp_path)
    ini = f"{REF}/Case84/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/Case84/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == 11
    for col in (2, 3, 5, 6):
        assert np.allclose(ours[:, col], ref[:, col], rtol=1e-6,
                           atol=1e-12), col
    assert np.all(np.abs(ours[:, 4] / ref[:, 4] - 1.0) < 0.02)
    assert any(n.startswith("tower.") for n in os.listdir(out))
    # batch-mode visuals from the INI's [PostProcessing] block
    # (Files=0, ParamVisuals=0,1,2,3,9,11,14 menu indices)
    r = subprocess.run(
        [sys.executable, "-m", "tlab_tpu.tools.cli", "visuals", "--cpu",
         "--x64", "--ini", ini, "--outdir", out],
        cwd=REPO, capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, r.stderr[-2000:]
    for n in ("vis0.VelocityX", "vis0.Scalar1", "vis0.LogEnstrophy"):
        assert os.path.exists(os.path.join(out, n)), n


@pytest.mark.parametrize("case", ["Case02", "Case04"])
def test_compressible_internal_vs_reference_log(tmp_path, case):
    """Case02/04: single-species COMPRESSIBLE shear layer (internal-energy
    + skewsymmetric, RHS_FLOW_GLOBAL_2; Case04 on the two-sided
    tanh-stretched y grid).  DIGIT-EXACT to +-1 unit in the last printed
    digit of every column: needs the reference-exact RNG + factorize IC
    chain AND the conservative energy slot stored in the SOLVER
    formulation (rho e for Equations=internal -- storing rho(e+ke) there
    ke-contaminates p/c and was masked by the same bug in the CFL)."""
    out = str(tmp_path)
    ini = f"{REF}/{case}/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/{case}/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == 11
    _assert_print_exact_ulp(out, case)


def test_case14_compressible_airwater_end_to_end(tmp_path):
    """Case14: COMPRESSIBLE (internal-energy, skewsymmetric) AirWater
    cloud layer with gravity -- the full moist compressible chain:
    hydrostatic PRESSURE_MEAN via THERMO_AIRWATER_PH_RE, saturation
    adjustment per substep (THERMO_AIRWATER_RE Newton), RRATIO-scaled
    compressible thermodynamic units, characteristic y BCs with the local
    mixture gamma, conservative buffer relaxation.  EVERY column of
    dns.out (time/dt/CFL/D#/visc/PMin/PMax/RMin/RMax/NewtonRs) matches
    dns.out.ref to every printed digit, including the reference's Newton
    residual 0.917E-04."""
    _run_case_exact(tmp_path, "Case14",
                    cols=(2, 3, 4, 5, 6, 7, 8, 9, 10, 11),
                    dil_factor=None)


def test_case07_plane_discrete_rt_end_to_end(tmp_path):
    """Case07: Rayleigh-Taylor-type layer (linear gravity on an Erf
    scalar, PlaneDiscrete IC, zero velocity, stretched tanh grid).
    time/dt/CFL/D#/visc exact to every printed digit; dilatation within
    10% of the reference's round-off envelope."""
    ours, ref = _run_case_exact(tmp_path, "Case07", dil_factor=None)
    dil = np.maximum(np.abs(ours[1:, 7]), np.abs(ours[1:, 8]))
    dil_ref = np.maximum(np.abs(ref[1:, 7]), np.abs(ref[1:, 8]))
    assert np.all(dil <= 1.1 * dil_ref)


def test_case29_dimensional_stbl_end_to_end(tmp_path):
    """Case29 (DYCOMS-II RF01 sedimentation study): DIMENSIONAL anelastic
    AirWater run ([Thermodynamics] Nondimensional=no, thermodynamics.f90:
    518-556 skipped, GRATIO=1, SI property tables, ScaleHeight=1/g) with
    GrayLiquid infrared, ConstantDivergenceLocal subsidence and AirWater
    sedimentation.  time/dt/CFL/D#/visc exact to every printed digit;
    dilatation columns not compared (reference logs the pre-projection
    anelastic constraint source ~1e-5, ours is the post-projection
    residual ~1e-12)."""
    ours, ref = _run_case_exact(tmp_path, "Case29", dil_factor=None)
    dil = np.maximum(np.abs(ours[1:, 7]), np.abs(ours[1:, 8]))
    dil_ref = np.maximum(np.abs(ref[1:, 7]), np.abs(ref[1:, 8]))
    assert np.all(dil <= 1.6 * dil_ref + 1e-9)


def test_case30_gray_emission_end_to_end(tmp_path):
    """Case30: Case29 with the emitting Gray radiation type -- dimensional
    Stefan-Boltzmann emission b = sigma T^4 (radiation.f90:57,292) with
    per-component absorption kappa_l ql + kappa_v qv and surface
    emissivity 0.99.  time/dt/CFL/D#/visc exact to every printed digit;
    dilatation as Case29."""
    ours, ref = _run_case_exact(tmp_path, "Case30", dil_factor=None)
    dil = np.maximum(np.abs(ours[1:, 7]), np.abs(ours[1:, 8]))
    dil_ref = np.maximum(np.abs(ref[1:, 7]), np.abs(ref[1:, 8]))
    assert np.all(dil <= 1.6 * dil_ref + 1e-9)


def test_case10_deterministic_end_to_end(tmp_path):
    """Case10 (RB-type layer, stretched tanh grid, DeltaDiscrete scalar
    IC, zero initial velocity) is fully DETERMINISTIC -- no RNG anywhere.
    Run from the unmodified reference tlab.ini, the dns.out columns
    match dns.out.ref tightly: dt/CFL to all printed digits, dilatation
    min/max to ~0.2% (residual solver/discretization differences)."""
    out = str(tmp_path)
    ini = f"{REF}/Case10/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/Case10/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == 11
    # dt, CFL, D#, visc: exact to log precision at every step
    for col in (3, 4, 5, 6):
        assert np.allclose(ours[:, col], ref[:, col], rtol=1e-6,
                           atol=1e-12), col
    # time column exact
    assert np.allclose(ours[:, 2], ref[:, 2], rtol=1e-6)
    # dilatation extrema within 0.5% relative at every nonzero step
    for col in (7, 8):
        a, b = ours[1:, col], ref[1:, col]
        assert np.all(np.abs(a - b) <= 5e-3 * np.abs(b) + 1e-9), col


def _run_case_random_ic(tmp_path, case_name, cfl_rtol=5e-3,
                        dil_factor=1.5, steps=11):
    """Run a case with a random broadband IC: time/dt/D#/visc exact,
    CFL within cfl_rtol (different RNG realization than the reference),
    dilatation envelope within dil_factor of the reference's."""
    out = str(tmp_path)
    ini = f"{REF}/{case_name}/tlab.ini"
    for cmd in (["ini"], ["dns"]):
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *cmd, "--cpu",
             "--x64", "--ini", ini, "--outdir", out],
            cwd=REPO, capture_output=True, text=True, timeout=2400)
        assert r.returncode == 0, (case_name, r.stderr[-2000:])
    ours = _parse_dns_out(os.path.join(out, "dns.out"))
    ref = _parse_dns_out(f"{REF}/{case_name}/dns.out.ref")
    assert ours.shape[0] == ref.shape[0] == steps
    for col in (2, 3, 5, 6):
        assert np.allclose(ours[:, col], ref[:, col], rtol=1e-6), col
    assert np.allclose(ours[1:, 4], ref[1:, 4], rtol=cfl_rtol)
    dil = np.maximum(np.abs(ours[1:, 7]), np.abs(ours[1:, 8]))
    dil_ref = np.maximum(np.abs(ref[1:, 7]), np.abs(ref[1:, 8]))
    assert np.all(dil <= dil_factor * dil_ref + 1e-9), case_name
    return ours, ref


def test_case92_staggered_pressure_end_to_end(tmp_path):
    """Case92: no-slip channel with StaggerHorizontalPressure=yes +
    [PressureFilter] (rhs_global_incompressible_1.f90:216-320). The
    staggered projection solves the factorized Poisson with the
    STAGGERED derivative wavenumbers (opr_elliptic.f90:144-147, single
    singular mode) and the log reports the staggered dilatation
    (FI_INVARIANT_P_STAG). time/dt/CFL/D#/visc exact to print precision;
    dilatation tracks the reference per step to 3e-4 (r4: the pressure
    filter's wall/next-to-wall rows now use the reference's exact
    biased/zero closures, flt_compact.f90:130-224 -- this tightened the
    column 30x from the r3 0.5%/step)."""
    ours, ref = _run_case_random_ic(tmp_path, "Case92", cfl_rtol=1e-6,
                                    dil_factor=1.01)
    for col in (7, 8):
        assert np.allclose(ours[1:, col], ref[1:, col], rtol=3e-4), col


def test_case93_ibm_staggered_end_to_end(tmp_path):
    """Case93: Case92 + mirrored XBars IBM + EllipticOrder=CompactDirect6
    -- the direct eigen-pencil staggered solve. The mirrored tanh grid
    makes the NN/DD pencils reflection-symmetric with (near-)degenerate
    even/odd eigenpairs; the parity-split eigendecomposition
    (elliptic._pencil_eig) keeps cond(V) ~ 2 where the raw basis is
    defective (cond ~ 1e32)."""
    _run_case_random_ic(tmp_path, "Case93", cfl_rtol=2e-2, dil_factor=30.0)


def test_mirrored_grid_pencil_conditioning():
    """NN/DD eigen pencils on the reference's mirrored tanh channel grid
    (Case92 IniGridOy): parity-split eigenbasis is well-conditioned and
    solves match a dense solve to f64 round-off across the lambda range."""
    from tlab_tpu.config import load_case
    from tlab_tpu.runtime import Simulation
    from tlab_tpu.ops import elliptic
    from tlab_tpu.constants import BC
    import jax.numpy as jnp
    sim = Simulation.from_case(f"{REF}/Case92/tlab.ini", dtype=jnp.float64)
    rng = np.random.default_rng(1)
    ny = sim.grid.y.size
    for bc in (BC.NN, BC.DD):
        pl = elliptic.build_elliptic_plan(sim.fdm, ibc=bc)
        assert pl.eig_condition < 100.0, (bc, pl.eig_condition)
        fv = rng.standard_normal(ny)
        fv[0] = 0.0
        fv[-1] = 0.0
        for lam in (2.47, 25.0, 13909.0):
            den = 1.0 - (lam - pl.shift) * pl.lam_eig
            ue = pl.V @ ((pl.W @ fv) / den)
            ud = np.linalg.solve(pl.M0 - lam * pl.M1, pl.R @ fv)
            err = np.max(np.abs(ue - ud)) / np.max(np.abs(ud))
            assert err < 1e-8, (bc, lam, err)


def test_case84_on_production_mesh_bit_identical(tmp_path):
    """An UNMODIFIED reference case on the production mesh (VERDICT r4
    item 8): Case84 (3-D Ekman, 128x96x128, tanh-STRETCHED y grid,
    gravity + Jmax buffer, towers, CompactDirect6) runs `dns --mesh 4,2`
    from the same ICs as the single-device run and produces a
    bit-identical dns.out.  (The compressible reference examples are all
    2-D -- Kmax=1 cannot be pencil-decomposed -- so compressible mesh
    coverage lives in test_mesh_driver's case02/case14 3-D reductions.)"""
    ini = f"{REF}/Case84/tlab.ini"
    d1 = str(tmp_path / "single")
    d8 = str(tmp_path / "mesh")
    os.makedirs(d1)
    os.makedirs(d8)

    def cli(args, outdir, devices=1):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{devices}").strip()
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *args, "--cpu",
             "--x64", "--ini", ini, "--outdir", outdir],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=3000)
        assert r.returncode == 0, (args, r.stderr[-2000:])

    cli(["ini"], d1)
    for f in os.listdir(d1):
        if f.startswith(("flow.", "scal.")):
            with open(os.path.join(d1, f), "rb") as src, \
                    open(os.path.join(d8, f), "wb") as dst:
                dst.write(src.read())
    cli(["dns"], d1)
    cli(["dns", "--mesh", "4,2"], d8, devices=8)
    out1 = [ln for ln in open(os.path.join(d1, "dns.out"))
            if not ln.startswith("#")]
    out8 = [ln for ln in open(os.path.join(d8, "dns.out"))
            if not ln.startswith("#")]
    assert out1 == out8
    # and the single-device log matches the shipped reference as the
    # existing case84 test demands (diffusion-limited dt -> exact cols)
    ours = _parse_dns_out(os.path.join(d8, "dns.out"))
    ref = _parse_dns_out(f"{REF}/Case84/dns.out.ref")
    for col in (2, 3, 5, 6):
        assert np.allclose(ours[:, col], ref[:, col], rtol=1e-6,
                           atol=1e-12), col


def test_case92_on_production_mesh_bit_identical(tmp_path):
    """The UNMODIFIED staggered-pressure reference case on the
    production mesh (late r4: the VP/PV stagger operators route through
    the pencil all-to-all): Case92 (3-D channel, 128x194x128,
    [Staggering] StaggerHorizontalPressure=yes, homogeneous forcing,
    default factorize elliptic with staggered wavenumbers) --
    `dns --mesh 4,2` dns.out bit-identical to single-device.  (The
    stagger + EllipticOrder=CompactDirect6 eigen path is covered by
    test_mesh_driver.test_mesh_stagger_compactdirect_elliptic.)"""
    ini = f"{REF}/Case92/tlab.ini"
    d1 = str(tmp_path / "single")
    d8 = str(tmp_path / "mesh")
    os.makedirs(d1)
    os.makedirs(d8)

    def cli(args, outdir, devices=1):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{devices}").strip()
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *args, "--cpu",
             "--x64", "--ini", ini, "--outdir", outdir],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=3000)
        assert r.returncode == 0, (args, r.stderr[-2000:])

    cli(["ini"], d1)
    for f in os.listdir(d1):
        if f.startswith(("flow.", "scal.")):
            with open(os.path.join(d1, f), "rb") as src, \
                    open(os.path.join(d8, f), "wb") as dst:
                dst.write(src.read())
    cli(["dns"], d1)
    cli(["dns", "--mesh", "4,2"], d8, devices=8)
    out1 = [ln for ln in open(os.path.join(d1, "dns.out"))
            if not ln.startswith("#")]
    out8 = [ln for ln in open(os.path.join(d8, "dns.out"))
            if not ln.startswith("#")]
    assert out1 == out8


def test_case81_on_production_mesh_bit_identical(tmp_path):
    """A second UNMODIFIED 3-D reference case on the production mesh,
    chosen for feature diversity vs Case84: Case81 (laminar-start Ekman,
    128x96x128, [ViscChange] Time=0.01 viscosity ramp, ObsLog=Ekman) --
    exercises the traced visc-ramp aux leaf and the dns.obs bulk/friction
    reductions under sharding.  dns.out AND dns.obs must be bit-identical
    mesh-vs-single."""
    ini = f"{REF}/Case81/tlab.ini"
    d1 = str(tmp_path / "single")
    d8 = str(tmp_path / "mesh")
    os.makedirs(d1)
    os.makedirs(d8)

    def cli(args, outdir, devices=1):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{devices}").strip()
        r = subprocess.run(
            [sys.executable, "-m", "tlab_tpu.tools.cli", *args, "--cpu",
             "--x64", "--ini", ini, "--outdir", outdir],
            cwd=REPO, env=env, capture_output=True, text=True,
            timeout=3000)
        assert r.returncode == 0, (args, r.stderr[-2000:])

    cli(["ini"], d1)
    for f in os.listdir(d1):
        if f.startswith(("flow.", "scal.")):
            with open(os.path.join(d1, f), "rb") as src, \
                    open(os.path.join(d8, f), "wb") as dst:
                dst.write(src.read())
    cli(["dns"], d1)
    cli(["dns", "--mesh", "2,4"], d8, devices=8)
    for name in ("dns.out", "dns.obs"):
        l1 = [ln for ln in open(os.path.join(d1, name))
              if not ln.startswith("#")]
        l8 = [ln for ln in open(os.path.join(d8, name))
              if not ln.startswith("#")]
        assert l1 == l8, name
