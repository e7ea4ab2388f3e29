"""Compressible dynamical core (reference src/tools/dns/rhs_flow_euler_*,
rhs_flow_viscous_*, time.f90 TIME_SUBSTEP_COMPRESSIBLE).

Conservative formulation U = (rho, rho u, rho v, rho w, rho E) advanced with
the same low-storage RK schemes; all spatial terms are compact-FD dense
matmuls (divergence-form Euler fluxes + explicit viscous/conduction terms).
No pressure Poisson solve — compressible flows integrate the acoustics
(acoustic CFL), which also removes the elliptic solver's periodicity
constraints.

Nondimensionalization (reference NavierStokes/Thermodynamics conventions):
velocities by U0, temperature by T0, density by rho0; ideal gas
    p = rho T / (gamma M^2),    e = T / (gamma (gamma-1) M^2)
with gamma = cp/cv and M the Mach number. Viscous stress with constant
viscosity mu = 1/Re, Stokes hypothesis; heat conduction with Prandtl.

Boundary conditions: periodic x/z; y walls free-slip adiabatic (v=0,
d(tangential)/dy=0, dT/dy=0) imposed on the tendencies, or characteristic
NSCBC open boundaries (dycore.nscbc) via the nscbc argument.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tlab_tpu.dycore import incompressible as dyn


class CompState(NamedTuple):
    rho: jax.Array
    rhou: jax.Array
    rhov: jax.Array
    rhow: jax.Array
    rhoE: jax.Array          # total energy rho (e + |u|^2/2)
    rhos: jax.Array = None   # optional scalars (ns, nx, ny, nz) as rho*s


def primitive(P, U: CompState, gamma: float, mach: float, mix=None):
    rho = U.rho
    u = U.rhou / rho
    v = U.rhov / rho
    w = U.rhow / rho
    ke = 0.5 * (u * u + v * v + w * w)
    e = U.rhoE / rho - ke
    if mix is not None and U.rhos is not None:
        T, p, _ = mixture_thermal(U, e, mach, mix)
        return u, v, w, T, p
    T = e * gamma * (gamma - 1.0) * mach ** 2
    p = rho * T / (gamma * mach ** 2)
    return u, v, w, T, p


def mass_fractions(U: CompState):
    """(nsp, ...) species mass fractions from the transported rho*Y_i
    scalars, appending the balance species Y_n = 1 - sum (the reference
    carries nsp-1 scalars and derives the last, thermodynamics.f90
    inb_scal vs NSP)."""
    Y = U.rhos / U.rho[None]
    return jnp.concatenate([Y, (1.0 - jnp.sum(Y, axis=0))[None]], axis=0)


def mixture_thermal(U: CompState, e, mach: float, mix, n_newton: int = 8):
    """(T, p, cp) from nondimensional internal energy via the mixture
    caloric table (reference THERMO_CALORIC_TEMPERATURE Newton +
    THERMO_THERMAL_PRESSURE, thermo_caloric.f90/thermo_thermal.f90).

    Units follow the reference convention: e_code scaled by U0^2 with
    U0^2 = M^2 gama0 Rref T0, so e_nd (by cpref*T0) = e_code*(gama0-1)*M^2
    and e_nd = h_nd(T,Y) - (1-1/gama0) R_nd(Y) T."""
    from tlab_tpu.physics import mixtures as mx
    Y = mass_fractions(U)
    if Y.shape[0] != mix.nsp:
        raise ValueError(f"mixture {mix.name!r} expects {mix.nsp - 1} "
                         f"transported scalars, got {Y.shape[0] - 1}")
    g0 = mix.gama0
    e_nd = e * (g0 - 1.0) * mach ** 2
    R = mx.gas_constant(mix, Y)
    rfac = (g0 - 1.0) / g0          # rref/cpref
    # initial guess from the leading (constant-cp) caloric term so flame
    # temperatures T/TREF ~ 5-8 start near the root; the fixed-count
    # Newton (jit-friendly; reference THERMO_CALORIC_TEMPERATURE iterates
    # to tolerance) then converges quadratically
    a1 = jnp.asarray(mix.ai[0])[(...,) + (None,) * e_nd.ndim]
    a6 = jnp.asarray(mix.ai[5])[(...,) + (None,) * e_nd.ndim]
    cp0 = jnp.sum(a1 * Y, axis=0)
    h0 = jnp.sum(a6 * Y, axis=0)
    T = jnp.maximum((e_nd - h0) / jnp.maximum(cp0 - rfac * R, 1e-12), 0.05)
    for _ in range(n_newton):
        res = mx.h_mixture(mix, T, Y) - rfac * R * T - e_nd
        cv = mx.cp_mixture(mix, T, Y) - rfac * R
        T = T - res / cv
    cp = mx.cp_mixture(mix, T, Y)
    p = U.rho * R * T / (g0 * mach ** 2)
    return T, p, cp


def primitive_view(U: CompState):
    """Primitive velocities/scalars of a conservative state as a dycore
    State -- the shared shape for planes/towers/postprocessing."""
    from tlab_tpu.dycore.state import State
    rho = U.rho
    ns = U.rhos.shape[0] if U.rhos is not None else 0
    s = (U.rhos / rho[None]) if ns else jnp.zeros((0,) + rho.shape,
                                                  rho.dtype)
    return State(u=U.rhou / rho, v=U.rhov / rho, w=U.rhow / rho, s=s)


def _div(P, fx, fy, fz):
    return dyn._d1(P, "x", 0, fx) + dyn._d1(P, "y", 1, fy) \
        + dyn._d1(P, "z", 2, fz)


def _grad(P, a):
    return (dyn._d1(P, "x", 0, a), dyn._d1(P, "y", 1, a),
            dyn._d1(P, "z", 2, a))


def _d12_stack(P, axis_name: str, axis: int, stack):
    """(d1, d2) of (F, nx, ny, nz) stacked fields along one direction via
    the fused [D1;D2] matmul (the same compact-D2-with-Jacobian operator
    Burgers uses) -- replaces D1(D1(.)) for viscous/conduction terms,
    which loses the odd-even (grid-scale) modes (reference uses OPR_P2,
    fdm_derivative.f90:413). Pencil-aware: a sharded direction gathers
    the stack through the all-to-all engine, applies the GLOBAL operator
    and scatters both halves back (same pattern as _burgers_all)."""
    d12 = P.get(f"d12{axis_name}")
    if d12 is None:
        z = jnp.zeros_like(stack)
        return z, z
    comm = dyn._axis_comm(P, axis_name)
    if comm is not None:
        from tlab_tpu.parallel import pencil
        wire = comm.get("wire")
        stack_t = pencil.cast_on_wire(pencil.GATHER[axis_name], stack, 1,
                                      wire)
    else:
        stack_t = stack
    from tlab_tpu.ops.derivative import op_precision
    pref = jnp.float32 if stack.dtype in (jnp.bfloat16, jnp.float16) \
        else stack.dtype
    eins = {0: "ab,fbjk->fajk", 1: "ab,fibk->fiak", 2: "ab,fijb->fija"}[axis]
    both = jnp.einsum(eins, d12, stack_t, preferred_element_type=pref,
                      precision=op_precision(stack.dtype)
                      ).astype(stack.dtype)
    n = stack_t.shape[axis + 1]
    sl1 = [slice(None)] * 4
    sl2 = [slice(None)] * 4
    sl1[axis + 1] = slice(0, n)
    sl2[axis + 1] = slice(n, 2 * n)
    d1o, d2o = both[tuple(sl1)], both[tuple(sl2)]
    if comm is not None:
        d1o = pencil.cast_on_wire(pencil.SCATTER[axis_name], d1o, 1, wire)
        d2o = pencil.cast_on_wire(pencil.SCATTER[axis_name], d2o, 1, wire)
    return d1o, d2o


def _apply_visc_bc(P, dx2, dy2, dz2):
    """[BoundaryConditions] ViscousI/J/K row zeroing.  NOTE: in the
    CURRENT reference this flag is a legacy NO-OP (dns_read_local.f90
    writes column 2 of bcs_inf/bcs_out but opr_partial.f90:91 only reads
    column 1, and FDM_Der2_Solve takes no bc flag), so P['visc_bc'] is
    never populated by the runtime and this returns unchanged; kept for
    older-reference semantics behind an explicit plan entry."""
    vb = P.get("visc_bc")
    if not vb:
        return dx2, dy2, dz2
    # per direction: (stacked d2, axis index in the field, normal comp)
    out = []
    for axn, d2, axis, normal in (("x", dx2, 1, 0), ("y", dy2, 2, 1),
                                  ("z", dz2, 3, 2)):
        kind = vb.get(axn)
        if kind is None:
            out.append(d2)
            continue
        tang = [i for i in range(d2.shape[0]) if i != normal]
        idx_min = [slice(None)] * 4
        idx_max = [slice(None)] * 4
        idx_min[axis] = 0
        idx_max[axis] = -1
        comm = dyn._axis_comm(P, axn)

        def _mask(d2_, comps, side_idx, is_min):
            """Zero the GLOBAL boundary row: under the pencil engine the
            local row 0/-1 is the global boundary only on the first/last
            shard along the mesh axis (lax.axis_index gate)."""
            masked = d2_.at[(comps,) + tuple(side_idx[1:])].set(0.0)
            if comm is None:
                return masked
            from jax import lax
            nsh = comm.get(f"p{axn}", 1)
            idx = lax.axis_index(axn)
            on_edge = (idx == 0) if is_min else (idx == nsh - 1)
            return jnp.where(on_edge, masked, d2_)

        if kind == "outflow":
            d2 = _mask(d2, tang, idx_min, True)
            d2 = _mask(d2, tang, idx_max, False)
        else:   # inflow
            d2 = _mask(d2, tang, idx_max, False)
            d2 = _mask(d2, normal, idx_min, True)
        out.append(d2)
    return tuple(out)


def _visc_terms(P, u, v, w, T, mu, cond, variable_mu: bool):
    """(divtau_x, divtau_y, divtau_z, conduction, grads, Phi).

    Constant mu: div(tau)_i = mu [lap(u_i) + 1/3 d_i(div u)] and
    conduction = cond lap(T), all second derivatives from the compact D2
    (reference RHS_FLOW_VISCOUS_EXPLICIT / RHS_FLOW_CONDUCTION).
    Variable mu(T): stress divergence in conservative form (first
    derivatives of the stress, reference RHS_FLOW_VISCOUS_DIVERGENCE).
    Returns the velocity gradient tensor and dissipation Phi for the
    energy equations."""
    stack = jnp.stack([u, v, w, T])
    dx1, dx2 = _d12_stack(P, "x", 0, stack)
    dy1, dy2 = _d12_stack(P, "y", 1, stack)
    dz1, dz2 = _d12_stack(P, "z", 2, stack)
    dx2, dy2, dz2 = _apply_visc_bc(P, dx2, dy2, dz2)
    ux, vx, wx, Tx = dx1
    uy, vy, wy, Ty = dy1
    uz, vz, wz, Tz = dz1
    divu = ux + vy + wz
    lam = -2.0 / 3.0
    txx = mu * (2.0 * ux + lam * divu)
    tyy = mu * (2.0 * vy + lam * divu)
    tzz = mu * (2.0 * wz + lam * divu)
    txy = mu * (uy + vx)
    txz = mu * (uz + wx)
    tyz = mu * (vz + wy)
    phi = (txx * ux + tyy * vy + tzz * wz
           + txy * (uy + vx) + txz * (uz + wx) + tyz * (vz + wy))
    grads = (ux, uy, uz, vx, vy, vz, wx, wy, wz, Tx, Ty, Tz, divu)
    if variable_mu:
        dtx = _div(P, txx, txy, txz)
        dty = _div(P, txy, tyy, tyz)
        dtz = _div(P, txz, tyz, tzz)
        qx = cond * Tx
        qy = cond * Ty
        qz = cond * Tz
        conduction = _div(P, qx, qy, qz)
    else:
        lap_u = dx2[0] + dy2[0] + dz2[0]
        lap_v = dx2[1] + dy2[1] + dz2[1]
        lap_w = dx2[2] + dy2[2] + dz2[2]
        lap_T = dx2[3] + dy2[3] + dz2[3]
        gdx, gdy, gdz = _grad(P, divu)
        third = 1.0 / 3.0
        dtx = mu * (lap_u + third * gdx)
        dty = mu * (lap_v + third * gdy)
        dtz = mu * (lap_w + third * gdz)
        conduction = cond * lap_T
    stresses = (txx, tyy, tzz, txy, txz, tyz)
    return dtx, dty, dtz, conduction, grads, phi, stresses


def rhs_compressible(P, U: CompState, gamma: float, mach: float,
                     visc: float, prandtl: float, gas=None,
                     form: str = "divergence", mix=None):
    """Tendency of the conservative state.

    form: 'divergence' (reference RHS_FLOW_EULER_DIVERGENCE) or
    'skewsymmetric' (RHS_FLOW_EULER_SKEWSYMMETRIC: the advective terms are
    the average of divergence and convective forms, which conserves
    discrete kinetic energy in the inviscid limit).
    gas: optional physics.eos.GasParams enabling a variable transport law
    mu(T) (reference THERMO_VISCOSITY powerlaw/sutherland); the stress and
    conduction coefficients then vary pointwise with temperature.
    """
    rho = U.rho
    u, v, w, T, p = primitive(P, U, gamma, mach, mix=mix)

    h_rho = -_div(P, U.rhou, U.rhov, U.rhow)
    if form == "skewsymmetric":
        # 0.5 [ div(rho u phi) + rho u . grad phi + phi div(rho u) ]
        px_, py_, pz_ = _grad(P, p)

        def skew(phi, rphi):
            dv = _div(P, rphi * u, rphi * v, rphi * w)
            gx, gy, gz = _grad(P, phi)
            conv = U.rhou * gx + U.rhov * gy + U.rhow * gz
            return -0.5 * (dv + conv - phi * h_rho)
        h_ru = skew(u, rho * u) - px_
        h_rv = skew(v, rho * v) - py_
        h_rw = skew(w, rho * w) - pz_
        E_sp = U.rhoE / rho
        h_rE = skew(E_sp, U.rhoE) - _div(P, p * u, p * v, p * w)
    else:
        # Euler fluxes, divergence form
        h_ru = -_div(P, U.rhou * u + p, U.rhou * v, U.rhou * w)
        h_rv = -_div(P, U.rhov * u, U.rhov * v + p, U.rhov * w)
        h_rw = -_div(P, U.rhow * u, U.rhow * v, U.rhow * w + p)
        h_rE = -_div(P, (U.rhoE + p) * u, (U.rhoE + p) * v,
                     (U.rhoE + p) * w)

    # viscous stress + conduction via compact D2 for constant mu
    # (reference RHS_FLOW_VISCOUS_EXPLICIT + RHS_FLOW_CONDUCTION);
    # variable mu(T) falls back to the stress-divergence form
    variable_mu = gas is not None and gas.transport != "none"
    mu = visc
    if variable_mu:
        from tlab_tpu.physics import eos
        mu = visc * eos.viscosity(gas, T)
    cond = _conduction_coef(U, T, mu, prandtl, gamma, mach, mix)
    dtx, dty, dtz, conduction, grads, phi, _ = _visc_terms(
        P, u, v, w, T, mu, cond, variable_mu or mix is not None)

    h_ru = h_ru + dtx
    h_rv = h_rv + dty
    h_rw = h_rw + dtz

    # viscous work div(u . tau) = u . div(tau) + Phi (avoids another
    # round of first derivatives of products), + conduction
    h_rE = h_rE + u * dtx + v * dty + w * dtz + phi + conduction

    h_rs = _rhs_scalars(P, U, u, v, w, visc) if U.rhos is not None else None
    return CompState(h_rho, h_ru, h_rv, h_rw, h_rE, h_rs)


def _conduction_coef(U: CompState, T, mu, prandtl: float, gamma: float,
                     mach: float, mix):
    """Heat-conduction coefficient k/(Re Pr): mu cp_nd/(Pr (g0-1) M^2);
    cp_nd = 1 for the single-species gas, a field for mixtures
    (reference's k = cp mu/Pr weighting)."""
    if mix is None or U.rhos is None:
        return mu / (prandtl * (gamma - 1.0) * mach ** 2)
    from tlab_tpu.physics import mixtures as mx
    cp = mx.cp_mixture(mix, T, mass_fractions(U))
    return mu * cp / (prandtl * (mix.gama0 - 1.0) * mach ** 2)


def primitive_internal(P, U: CompState, gamma: float, mach: float,
                       mix=None):
    """Primitive recovery when rhoE carries INTERNAL energy rho e
    (reference DNS_EQNS_INTERNAL formulation)."""
    rho = U.rho
    u = U.rhou / rho
    v = U.rhov / rho
    w = U.rhow / rho
    e = U.rhoE / rho
    if mix is not None and U.rhos is not None:
        T, p, _ = mixture_thermal(U, e, mach, mix)
        return u, v, w, T, p
    T = e * gamma * (gamma - 1.0) * mach ** 2
    p = rho * T / (gamma * mach ** 2)
    return u, v, w, T, p


def rhs_compressible_internal(P, U: CompState, gamma: float, mach: float,
                              visc: float, prandtl: float, gas=None,
                              mix=None):
    """Internal-energy formulation (reference rhs_flow_global_2.f90 /
    DNS_EQNS_INTERNAL): d(rho e)/dt = -div(rho e u) - p div u + Phi +
    div(k grad T), with Phi = tau : grad u the viscous dissipation."""
    rho = U.rho
    u, v, w, T, p = primitive_internal(P, U, gamma, mach, mix=mix)

    h_rho = -_div(P, U.rhou, U.rhov, U.rhow)
    h_ru = -_div(P, U.rhou * u + p, U.rhou * v, U.rhou * w)
    h_rv = -_div(P, U.rhov * u, U.rhov * v + p, U.rhov * w)
    h_rw = -_div(P, U.rhow * u, U.rhow * v, U.rhow * w + p)

    variable_mu = gas is not None and gas.transport != "none"
    mu = visc
    if variable_mu:
        from tlab_tpu.physics import eos
        mu = visc * eos.viscosity(gas, T)
    cond = _conduction_coef(U, T, mu, prandtl, gamma, mach, mix)
    dtx, dty, dtz, conduction, grads, phi, _ = _visc_terms(
        P, u, v, w, T, mu, cond, variable_mu or mix is not None)
    divu = grads[-1]
    h_ru = h_ru + dtx
    h_rv = h_rv + dty
    h_rw = h_rw + dtz

    h_re = (-_div(P, U.rhoE * u, U.rhoE * v, U.rhoE * w)
            - p * divu + phi + conduction)
    h_rs = _rhs_scalars(P, U, u, v, w, visc) if U.rhos is not None else None
    return CompState(h_rho, h_ru, h_rv, h_rw, h_re, h_rs)


def _rhs_scalars(P, U: CompState, u, v, w, visc: float):
    """Compressible scalar transport d(rho s)/dt = -div(rho s u) +
    div(rho D grad s) (reference rhs_scal_* divergence form). The
    diffusion expands to D [rho lap(s) + grad rho . grad s] so the
    Laplacian uses the compact D2 (no odd-even loss)."""
    rhos = U.rhos
    rho = U.rho
    s = rhos / rho[None]
    h = -(dyn._d1(P, "x", 1, rhos * u[None])
          + dyn._d1(P, "y", 2, rhos * v[None])
          + dyn._d1(P, "z", 3, rhos * w[None]))
    diff = jnp.asarray(P["diff"], rhos.dtype)[:, None, None, None]
    sx1, sx2 = _d12_stack(P, "x", 0, s)
    sy1, sy2 = _d12_stack(P, "y", 1, s)
    sz1, sz2 = _d12_stack(P, "z", 2, s)
    rx, ry, rz = _grad(P, rho)
    lap_s = sx2 + sy2 + sz2
    h = h + diff * (rho[None] * lap_s
                    + rx[None] * sx1 + ry[None] * sy1 + rz[None] * sz1)
    return h


# ---------------------------------------------------------------------------
# AirWater (moist two-phase) compressible path -- reference MIXT_TYPE_AIRWATER
# with Equations=internal (RHS_FLOW_GLOBAL_2 + RHS_SCAL_GLOBAL_2).
# The prognostic energy is stored in the reference's THERMAL units
# (cp0 T0; thermodynamics.f90:543-549): mechanical terms in the energy
# equation carry the CRATIO_INV = (gama0-1) M^2 conversion and the
# pressure/gas constants ride the RRATIO scaling inside ThermoParams.
# ---------------------------------------------------------------------------

def primitive_airwater(U: CompState, tp, nr: int = 3):
    """(u, v, w, T, p, ql, newton_err) from the conservative state with
    rhoE = rho e in thermal units (internal-energy formulation) and
    rhos[0] = rho qt. Saturation adjustment via THERMO_AIRWATER_RE
    (the per-substep FI_DIAGNOSTIC -> THERMO_CALORIC_TEMPERATURE path);
    newton_err is the reference's NEWTONRAPHSON_ERROR log column."""
    from tlab_tpu.physics import thermo as th
    rho = U.rho
    u = U.rhou / rho
    v = U.rhov / rho
    w = U.rhow / rho
    e = U.rhoE / rho
    qt = U.rhos[0] / rho
    T, ql, err = th.airwater_re(tp, qt, e, rho, nr=nr)
    p = th.thermal_pressure(tp, qt, ql, rho, T)
    return u, v, w, T, p, ql, (jnp.max(err) if err is not None else 0.0)


def gamma_airwater(tp, qt, ql, T):
    """Local cp/cv field (THERMO_GAMMA airwater branch,
    thermo_caloric.f90:223)."""
    from tlab_tpu.physics import thermo as th
    cpm = tp.Cd + qt * tp.Cdv + ql * tp.Cvl
    return cpm / (cpm - tp.cratio_inv * th.mixture_R(tp, qt, ql))


def from_primitive_airwater(tp, rho, u, v, w, T, qt, ql) -> CompState:
    """Conservative state with e from THERMO_CALORIC_ENERGY (airwater)."""
    from tlab_tpu.physics import thermo as th
    e = th.caloric_energy(tp, qt, ql, T)
    return CompState(rho=rho, rhou=rho * u, rhov=rho * v, rhow=rho * w,
                     rhoE=rho * e, rhos=(rho * qt)[None])


def rhs_airwater_internal(P, U: CompState, tp, visc: float, prandtl: float,
                          schmidt: float, gvec=(0.0, 0.0, 0.0)):
    """Reference RHS_FLOW_GLOBAL_2 + RHS_SCAL_GLOBAL_2 for the AirWater
    mixture: skewsymmetric advection, explicit viscous/diffusion,
    internal-energy equation

      d(rho e)/dt = -skew(rho e u) + CRATIO_INV (Phi - p div u)
                    + (visc/Pr) lap(h(T, q))

    (conduction as the Laplacian of the caloric ENTHALPY, not T), gravity
    g_i rho in the momentum equations (no gravity work in the internal
    form), and plain diff lap(qt) scalar diffusion. The enthalpy-diffusion
    cross term for Sc != Pr (rhs_scal_global_2.f90:96-130) is not
    implemented: the reference cases run Sc = Pr."""
    from tlab_tpu.physics import thermo as th
    rho = U.rho
    u, v, w, T, p, ql, err = primitive_airwater(U, tp)
    qt = U.rhos[0] / rho
    ci = tp.cratio_inv

    h_rho = -_div(P, U.rhou, U.rhov, U.rhow)
    px_, py_, pz_ = _grad(P, p)

    def skew(phi, rphi):
        dv = _div(P, rphi * u, rphi * v, rphi * w)
        gx, gy, gz = _grad(P, phi)
        conv = U.rhou * gx + U.rhov * gy + U.rhow * gz
        return -0.5 * (dv + conv - phi * h_rho)

    h_ru = skew(u, U.rhou) - px_ + gvec[0] * rho
    h_rv = skew(v, U.rhov) - py_ + gvec[1] * rho
    h_rw = skew(w, U.rhow) - pz_ + gvec[2] * rho
    e_sp = U.rhoE / rho
    h_re = skew(e_sp, U.rhoE)

    # viscous terms (constant mu) with the caloric enthalpy riding the
    # stacked D2 slot normally used by T: conduction = cond lap(h)
    h_enth = th.caloric_enthalpy(tp, qt, ql, T)
    cond = visc / prandtl
    dtx, dty, dtz, conduction, grads, phi, _ = _visc_terms(
        P, u, v, w, h_enth, visc, cond, False)
    divu = grads[-1]
    h_ru = h_ru + dtx
    h_rv = h_rv + dty
    h_rw = h_rw + dtz
    h_re = h_re + ci * (phi - p * divu) + conduction

    # scalar qt: skewsymmetric advection + diff lap(qt)
    diff = visc / schmidt
    qx1, qx2 = _d12_stack(P, "x", 0, qt[None])
    qy1, qy2 = _d12_stack(P, "y", 1, qt[None])
    qz1, qz2 = _d12_stack(P, "z", 2, qt[None])
    h_rs = skew(qt, U.rhos[0])[None] + diff * (qx2 + qy2 + qz2)

    return CompState(h_rho, h_ru, h_rv, h_rw, h_re, h_rs), \
        (u, v, w, T, p, ql, err)


def _apply_buffer(h: CompState, U: CompState, buf):
    """Compressible buffer relaxation (BOUNDARY_BUFFER RELAX_BLOCK_CF /
    RELAX_BLOCK_RHO): conservative fields relax toward the plane-mean
    initial profiles; h_q -= tau(y) (q - ref(y))."""
    tau = buf["tau"]            # (1, ny, 1)
    refs = buf["refs"]          # name -> (1, ny, 1) conservative refs

    def rx(hc, qc, name):
        return hc - tau * (qc - refs[name])
    hs = h.rhos
    if hs is not None and "rs0" in refs:
        hs = jnp.stack([rx(hs[i], U.rhos[i], f"rs{i}")
                        for i in range(hs.shape[0])])
    return CompState(rx(h.rho, U.rho, "rho"),
                     rx(h.rhou, U.rhou, "rhou"),
                     rx(h.rhov, U.rhov, "rhov"),
                     rx(h.rhow, U.rhow, "rhow"),
                     rx(h.rhoE, U.rhoE, "rhoE"), hs)


def rk_step_airwater(P, U: CompState, dtime, tp, visc: float,
                     prandtl: float, schmidt: float, nscbc=None,
                     ly: float = 1.0, gvec=(0.0, 0.0, 0.0), buffer=None):
    """Low-storage RK step for the AirWater internal-energy core
    (TIME_SUBSTEP_COMPRESSIBLE with RHS_FLOW_GLOBAL_2). Returns the new
    state and the max Newton residual across substeps (NewtonRs)."""
    kdt = P["rk"]["kdt"]
    kco = P["rk"]["kco"]
    h = CompState(*(jnp.zeros_like(x) if x is not None else None
                    for x in U))
    err_max = jnp.zeros((), U.rho.dtype)
    for i, k in enumerate(kdt):
        dte = dtime * k
        dh, prim = rhs_airwater_internal(P, U, tp, visc, prandtl, schmidt,
                                         gvec=gvec)
        err_max = jnp.maximum(err_max, prim[6])
        h = CompState(*(a + b if a is not None else None
                        for a, b in zip(h, dh)))
        if nscbc is not None:
            from tlab_tpu.dycore.nscbc import apply_nscbc_airwater
            h = apply_nscbc_airwater(P, U, h, tp, nscbc, ly, prim,
                                     gvec=gvec)
        else:
            h = _apply_wall_bcs(P, h)
        if buffer is not None:
            h = _apply_buffer(h, U, buffer)
        U = CompState(*(q + dte * hq if q is not None else None
                        for q, hq in zip(U, h)))
        U = _clip_scalars(P, U)
        if i < len(kdt) - 1:
            a = kco[i]
            h = CompState(*(a * x if x is not None else None for x in h))
    return U, err_max


def acoustic_cfl_max_airwater(P, U: CompState, tp):
    """max((|u|+c)/dx + ...) with c = sqrt(gama0 p / rho) -- the
    reference's TIME_COURANT compressible branch uses the CONSTANT
    gama0, not the local mixture gamma (time.f90:429)."""
    u, v, w, T, p, ql, _ = primitive_airwater(U, tp)
    gama0 = tp.Cpd_dim / (tp.Cpd_dim - tp.Rd_dim)
    c = jnp.sqrt(gama0 * jnp.maximum(p, 1e-30) / U.rho)
    acc = 0.0
    if "iodx" in P:
        acc = acc + (jnp.abs(u) + c) * P["iodx"][:, None, None]
    if "iody" in P:
        acc = acc + (jnp.abs(v) + c) * P["iody"][None, :, None]
    if "iodz" in P:
        acc = acc + (jnp.abs(w) + c) * P["iodz"][None, None, :]
    return jnp.max(acc)


def diffusion_number_max(P, U: CompState, schmidt_factor: float):
    """Compressible diffusion-number density: schmidtfactor *
    max((1/dx^2 + 1/dy^2 + 1/dz^2)/rho) (TIME_COURANT, time.f90:493).
    schmidt_factor = visc * max(1, 1/Pr, 1/min(Sc))."""
    acc = 0.0
    if "iodx" in P:
        acc = acc + P["iodx"][:, None, None] ** 2
    if "iody" in P:
        acc = acc + P["iody"][None, :, None] ** 2
    if "iodz" in P:
        acc = acc + P["iodz"][None, None, :] ** 2
    return schmidt_factor * jnp.max(acc / U.rho)


def _clip_scalars(P, U: CompState) -> CompState:
    """Per-substep scalar bounds on the transported mass fractions
    (DNS_BOUNDS_LIMIT, dns_local.f90:67-90, [Control] ScalLimit)."""
    bounds = P.get("scal_bounds")
    if bounds is None or U.rhos is None:
        return U
    mins, maxs = bounds
    lo = jnp.asarray(mins, U.rhos.dtype)[:, None, None, None]
    hi = jnp.asarray(maxs, U.rhos.dtype)[:, None, None, None]
    s = jnp.clip(U.rhos / U.rho[None], lo, hi)
    return U._replace(rhos=s * U.rho[None])


def _apply_wall_bcs(P, h: CompState, sides=(True, True)):
    """Free-slip adiabatic walls at jmin/jmax: zero normal-momentum tendency;
    tangential/energy/density tendencies take their Neumann wall values.
    sides masks (jmin, jmax) so open (NSCBC) sides are left alone."""
    if P["sizes"][1] == 1 or P.get("y_periodic", False) or not any(sides):
        return h
    if sides != (True, True):
        # apply to the full state, then restore the untouched side's rows
        full = _apply_wall_bcs(P, h, (True, True))
        out = []
        for a, b in zip(h, full):
            if a is None:
                out.append(None)
                continue
            c = b
            if not sides[0]:
                c = c.at[..., 0, :].set(a[..., 0, :])
            if not sides[1]:
                c = c.at[..., -1, :].set(a[..., -1, :])
            out.append(c)
        return CompState(*out)
    rows = P["bc_rows"]
    hv = h.rhov.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
    out = []
    for name, comp in (("u", h.rhou), ("w", h.rhow)):
        out.append(dyn._apply_wall_rows(comp, rows[name]))
    hu, hw = out
    nn = rows["u"]     # reuse the NN rows for scalars-like fields
    hrho = dyn._apply_wall_rows(h.rho, nn)
    hE = dyn._apply_wall_rows(h.rhoE, nn)
    hs = h.rhos
    if hs is not None:
        srows = rows.get("s", ())
        hs = jnp.stack([
            dyn._apply_wall_rows(hs[i], srows[i] if i < len(srows) else nn)
            for i in range(hs.shape[0])])
    return CompState(hrho, hu, hv, hw, hE, hs)


def _add_gravity(h: CompState, U: CompState, gvec, energy: str):
    """Momentum + g_i rho; total energy adds the work rho g . u
    (reference rhs_flow_euler_*: hq_i += g_i rho, hq4 +=
    CRATIO_INV rho g.u -- the CRATIO_INV cancels in our code-units e)."""
    if not any(gvec):
        return h
    rho = U.rho
    h_ru = h.rhou + gvec[0] * rho
    h_rv = h.rhov + gvec[1] * rho
    h_rw = h.rhow + gvec[2] * rho
    h_rE = h.rhoE
    if energy == "total":
        h_rE = h_rE + (gvec[0] * U.rhou + gvec[1] * U.rhov
                       + gvec[2] * U.rhow)
    return CompState(h.rho, h_ru, h_rv, h_rw, h_rE, h.rhos)


def rk_step_compressible(P, U: CompState, dtime, gamma: float, mach: float,
                         visc: float, prandtl: float, nscbc=None,
                         ly: float = 1.0, gas=None, lx: float = 1.0,
                         form: str = "divergence", energy: str = "total",
                         mix=None, gvec=(0.0, 0.0, 0.0), buffer=None):
    kdt = P["rk"]["kdt"]
    kco = P["rk"]["kco"]
    h = CompState(*(jnp.zeros_like(x) if x is not None else None
                    for x in U))
    for i, k in enumerate(kdt):
        dte = dtime * k
        if energy == "internal":
            dh = rhs_compressible_internal(P, U, gamma, mach, visc,
                                           prandtl, gas=gas, mix=mix)
        else:
            dh = rhs_compressible(P, U, gamma, mach, visc, prandtl,
                                  gas=gas, form=form, mix=mix)
        dh = _add_gravity(dh, U, gvec, energy)
        h = CompState(*(a + b if a is not None else None
                        for a, b in zip(h, dh)))
        if nscbc is not None:
            from tlab_tpu.dycore.nscbc import apply_nscbc
            # y 'wall' sides keep the wall treatment; open sides get the
            # additive characteristic corrections (reference composes
            # BOUNDARY_BCS_Y on top of the full-domain RHS)
            h = _apply_wall_bcs(P, h, sides=(nscbc.ymin == "wall",
                                             nscbc.ymax == "wall"))
            h = apply_nscbc(P, U, h, gamma, mach, nscbc, ly, lx=lx,
                            energy=energy, mix=mix)
        else:
            h = _apply_wall_bcs(P, h)
        if buffer is not None:     # after BCs, as the reference (time.f90:808)
            h = _apply_buffer(h, U, buffer)
        U = CompState(*(q + dte * hq if q is not None else None
                        for q, hq in zip(U, h)))
        U = _clip_scalars(P, U)
        if i < len(kdt) - 1:
            a = kco[i]
            h = CompState(*(a * x if x is not None else None for x in h))
    return U


def acoustic_cfl_max(P, U: CompState, gamma: float, mach: float, mix=None,
                     energy: str = "total"):
    """max((|u|+c)/dx + ...) with c the sound speed (reference TIME_COURANT
    compressible branch).  `energy` must match the formulation the rhoE
    slot is stored in, else c is ke-contaminated (the reference derives
    p once per step from the matching conservative set, time.f90:429)."""
    if energy == "internal":
        u, v, w, T, p = primitive_internal(P, U, gamma, mach, mix=mix)
    else:
        u, v, w, T, p = primitive(P, U, gamma, mach, mix=mix)
    if mix is not None and U.rhos is not None:
        # c = sqrt(gama0 p/rho): the reference courant uses the CONSTANT
        # gama0 with the mixture pressure (time.f90:429)
        c = jnp.sqrt(jnp.maximum(mix.gama0 * p, 1e-12) / U.rho)
    else:
        c = jnp.sqrt(jnp.maximum(T, 1e-12)) / mach
    acc = 0.0
    if "iodx" in P:
        acc = acc + (jnp.abs(u) + c) * P["iodx"][:, None, None]
    if "iody" in P:
        acc = acc + (jnp.abs(v) + c) * P["iody"][None, :, None]
    if "iodz" in P:
        acc = acc + (jnp.abs(w) + c) * P["iodz"][None, None, :]
    return jnp.max(acc)


def from_primitive(rho, u, v, w, T, gamma: float, mach: float,
                   s=None, mix=None, energy: str = "total") -> CompState:
    """Conservative state from primitives.  `energy` selects the
    formulation the 5th field is stored in: 'total' rho(e + ke) for
    DNS_EQNS_TOTAL, 'internal' rho e for DNS_EQNS_INTERNAL (the
    reference's conservative arrays differ the same way, dns_main)."""
    if mix is not None and s is not None:
        from tlab_tpu.physics import mixtures as mx
        Y = jnp.concatenate([s, (1.0 - jnp.sum(s, axis=0))[None]], axis=0)
        g0 = mix.gama0
        e_nd = (mx.h_mixture(mix, T, Y)
                - (g0 - 1.0) / g0 * mx.gas_constant(mix, Y) * T)
        e = e_nd / ((g0 - 1.0) * mach ** 2)
    else:
        e = T / (gamma * (gamma - 1.0) * mach ** 2)
    ke = 0.5 * (u * u + v * v + w * w) if energy == "total" else 0.0
    return CompState(rho=rho, rhou=rho * u, rhov=rho * v, rhow=rho * w,
                     rhoE=rho * (e + ke),
                     rhos=rho[None] * s if s is not None else None)
