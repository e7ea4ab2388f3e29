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


def primitive(P, U: CompState, gamma: float, mach: float):
    rho = U.rho
    u = U.rhou / rho
    v = U.rhov / rho
    w = U.rhow / rho
    ke = 0.5 * (u * u + v * v + w * w)
    e = U.rhoE / rho - ke
    T = e * gamma * (gamma - 1.0) * mach ** 2
    p = rho * T / (gamma * mach ** 2)
    return u, v, w, T, p


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
    fdm_derivative.f90:413)."""
    d12 = P.get(f"d12{axis_name}")
    if d12 is None:
        z = jnp.zeros_like(stack)
        return z, z
    from tlab_tpu.ops.derivative import op_precision
    pref = jnp.float32 if stack.dtype in (jnp.bfloat16, jnp.float16) \
        else stack.dtype
    eins = {0: "ab,fbjk->fajk", 1: "ab,fibk->fiak", 2: "ab,fijb->fija"}[axis]
    both = jnp.einsum(eins, d12, stack, preferred_element_type=pref,
                      precision=op_precision(stack.dtype)
                      ).astype(stack.dtype)
    n = stack.shape[axis + 1]
    sl1 = [slice(None)] * 4
    sl2 = [slice(None)] * 4
    sl1[axis + 1] = slice(0, n)
    sl2[axis + 1] = slice(n, 2 * n)
    return both[tuple(sl1)], both[tuple(sl2)]


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
                     form: str = "divergence"):
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
    u, v, w, T, p = primitive(P, U, gamma, mach)

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
    cond = mu / (prandtl * (gamma - 1.0) * mach ** 2)
    dtx, dty, dtz, conduction, grads, phi, _ = _visc_terms(
        P, u, v, w, T, mu, cond, variable_mu)

    h_ru = h_ru + dtx
    h_rv = h_rv + dty
    h_rw = h_rw + dtz

    # viscous work div(u . tau) = u . div(tau) + Phi (avoids another
    # round of first derivatives of products), + conduction
    h_rE = h_rE + u * dtx + v * dty + w * dtz + phi + conduction

    h_rs = _rhs_scalars(P, U, u, v, w, visc) if U.rhos is not None else None
    return CompState(h_rho, h_ru, h_rv, h_rw, h_rE, h_rs)


def primitive_internal(P, U: CompState, gamma: float, mach: float):
    """Primitive recovery when rhoE carries INTERNAL energy rho e
    (reference DNS_EQNS_INTERNAL formulation)."""
    rho = U.rho
    u = U.rhou / rho
    v = U.rhov / rho
    w = U.rhow / rho
    e = U.rhoE / rho
    T = e * gamma * (gamma - 1.0) * mach ** 2
    p = rho * T / (gamma * mach ** 2)
    return u, v, w, T, p


def rhs_compressible_internal(P, U: CompState, gamma: float, mach: float,
                              visc: float, prandtl: float, gas=None):
    """Internal-energy formulation (reference rhs_flow_global_2.f90 /
    DNS_EQNS_INTERNAL): d(rho e)/dt = -div(rho e u) - p div u + Phi +
    div(k grad T), with Phi = tau : grad u the viscous dissipation."""
    rho = U.rho
    u, v, w, T, p = primitive_internal(P, U, gamma, mach)

    h_rho = -_div(P, U.rhou, U.rhov, U.rhow)
    h_ru = -_div(P, U.rhou * u + p, U.rhou * v, U.rhou * w)
    h_rv = -_div(P, U.rhov * u, U.rhov * v + p, U.rhov * w)
    h_rw = -_div(P, U.rhow * u, U.rhow * v, U.rhow * w + p)

    variable_mu = gas is not None and gas.transport != "none"
    mu = visc
    if variable_mu:
        from tlab_tpu.physics import eos
        mu = visc * eos.viscosity(gas, T)
    cond = mu / (prandtl * (gamma - 1.0) * mach ** 2)
    dtx, dty, dtz, conduction, grads, phi, _ = _visc_terms(
        P, u, v, w, T, mu, cond, variable_mu)
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


def rk_step_compressible(P, U: CompState, dtime, gamma: float, mach: float,
                         visc: float, prandtl: float, nscbc=None,
                         ly: float = 1.0, gas=None, lx: float = 1.0,
                         form: str = "divergence", energy: str = "total"):
    kdt = P["rk"]["kdt"]
    kco = P["rk"]["kco"]
    h = CompState(*(jnp.zeros_like(x) if x is not None else None
                    for x in U))
    for i, k in enumerate(kdt):
        dte = dtime * k
        if energy == "internal":
            dh = rhs_compressible_internal(P, U, gamma, mach, visc,
                                           prandtl, gas=gas)
        else:
            dh = rhs_compressible(P, U, gamma, mach, visc, prandtl,
                                  gas=gas, form=form)
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
                            energy=energy)
        else:
            h = _apply_wall_bcs(P, h)
        U = CompState(*(q + dte * hq if q is not None else None
                        for q, hq in zip(U, h)))
        if i < len(kdt) - 1:
            a = kco[i]
            h = CompState(*(a * x if x is not None else None for x in h))
    return U


def acoustic_cfl_max(P, U: CompState, gamma: float, mach: float):
    """max((|u|+c)/dx + ...) with c the sound speed (reference TIME_COURANT
    compressible branch)."""
    u, v, w, T, p = primitive(P, U, gamma, mach)
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
                   s=None) -> CompState:
    e = T / (gamma * (gamma - 1.0) * mach ** 2)
    ke = 0.5 * (u * u + v * v + w * w)
    return CompState(rho=rho, rhou=rho * u, rhov=rho * v, rhow=rho * w,
                     rhoE=rho * (e + ke),
                     rhos=rho[None] * s if s is not None else None)
