"""Plane-averaged statistics (temporal mode): AVG_FLOW_XZ / AVG_SCAL_XZ
equivalents (reference src/statistics/avg_flow_xz.f90, avg_scal_xz.f90).

Profiles are horizontal (x,z)-plane averages as functions of y. Implemented
as one jitted reduction producing the core groups of the reference's table:
means, Reynolds stresses, higher moments, TKE budget terms (production,
(pseudo)dissipation, turbulent/viscous transport), vorticity variances, and
per-scalar means/variances/fluxes. Output: self-describing ASCII table +
dict of arrays.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tlab_tpu.dycore import incompressible as dyn


def _pavg(a):
    """(x,z)-plane average -> (ny,)."""
    return jnp.mean(a, axis=(0, 2))


def flow_statistics(P, state, visc, p=None):
    """Returns dict name -> (ny,) profile.

    p: optional pressure field to use for the pressure-correlation terms
    (the projection pressure the dycore already computed this step);
    when absent the diagnostic Boussinesq pressure is re-solved as the
    reference's offline averages.x does."""
    u, v, w = state.u, state.v, state.w
    out = {}
    U, V, W = _pavg(u), _pavg(v), _pavg(w)
    out["rU"], out["rV"], out["rW"] = U, V, W

    uf = u - U[None, :, None]
    vf = v - V[None, :, None]
    wf = w - W[None, :, None]

    out["Rxx"] = _pavg(uf * uf)
    out["Ryy"] = _pavg(vf * vf)
    out["Rzz"] = _pavg(wf * wf)
    out["Rxy"] = _pavg(uf * vf)
    out["Rxz"] = _pavg(uf * wf)
    out["Ryz"] = _pavg(vf * wf)
    out["Tke"] = 0.5 * (out["Rxx"] + out["Ryy"] + out["Rzz"])

    # higher moments (guard AFTER the power: tiny**1.5 underflows to 0
    # and 0/0 poisons wall rows / quiescent components with NaN)
    for name, f in (("U", uf), ("V", vf), ("W", wf)):
        var = _pavg(f * f)
        m3 = _pavg(f ** 3)
        m4 = _pavg(f ** 4)
        eps = jnp.finfo(var.dtype).tiny
        out[f"S{name}"] = m3 / jnp.maximum(var ** 1.5, eps)
        out[f"F{name}"] = m4 / jnp.maximum(var ** 2, eps)

    # velocity gradients (full fields, then fluctuation parts)
    grads = {}
    for cname, comp in (("u", u), ("v", v), ("w", w)):
        for aname, axis in (("x", 0), ("y", 1), ("z", 2)):
            grads[cname + aname] = dyn._d1(P, aname, axis, comp)

    dUdy = P["d1y"] @ U if "d1y" in P else jnp.zeros_like(U)
    dWdy = P["d1y"] @ W if "d1y" in P else jnp.zeros_like(W)

    # TKE production against the mean shear: P = -Rxy dU/dy - Ryz dW/dy
    out["Prod"] = -out["Rxy"] * dUdy - out["Ryz"] * dWdy

    # pseudo-dissipation eps = nu <du'_i/dx_j du'_i/dx_j>
    eps_sum = 0.0
    mean_grad = {("u", "y"): dUdy, ("w", "y"): dWdy}
    for cname in ("u", "v", "w"):
        for aname in ("x", "y", "z"):
            g = grads[cname + aname]
            mg = mean_grad.get((cname, aname))
            gf = g - mg[None, :, None] if mg is not None else \
                g - _pavg(g)[None, :, None]
            eps_sum = eps_sum + _pavg(gf * gf)
    out["Eps"] = visc * eps_sum

    # turbulent transport of TKE: d/dy <v' (u'_i u'_i / 2)>
    t3 = _pavg(vf * 0.5 * (uf * uf + vf * vf + wf * wf))
    out["Trp"] = -(P["d1y"] @ t3) if "d1y" in P else jnp.zeros_like(t3)

    # vorticity statistics
    wx = grads["wy"] - grads["vz"]
    wy = grads["uz"] - grads["wx"]
    wz = grads["vx"] - grads["uy"]
    for name, om in (("X", wx), ("Y", wy), ("Z", wz)):
        m = _pavg(om)
        out[f"W{name}"] = m
        out[f"W{name}2"] = _pavg((om - m[None, :, None]) ** 2)

    # -- Complete Reynolds-stress budgets, all six components (reference
    # avg_flow_xz.f90 budget groups: production, turbulent transport,
    # pressure transport, pressure-strain, viscous transport, dissipation
    # and mean convection per R_ij) ----------------------------------------
    d1y = P.get("d1y")
    if d1y is not None:
        fl = {"x": uf, "y": vf, "z": wf}
        Rm = {"x": {"x": out["Rxx"], "y": out["Rxy"], "z": out["Rxz"]},
              "y": {"x": out["Rxy"], "y": out["Ryy"], "z": out["Ryz"]},
              "z": {"x": out["Rxz"], "y": out["Ryz"], "z": out["Rzz"]}}
        comp_of = {"x": "u", "y": "v", "z": "w"}
        gfl = {}
        for cname in ("u", "v", "w"):
            for aname in ("x", "y", "z"):
                g = grads[cname + aname]
                mg = mean_grad.get((cname, aname))
                gfl[cname + aname] = g - mg[None, :, None] \
                    if mg is not None else g - _pavg(g)[None, :, None]
        # mean-velocity y-gradients (homogeneous x,z: only d/dy survives)
        dmean = {"x": dUdy, "y": d1y @ V, "z": dWdy}
        # pressure: reuse the projection pressure when given
        if p is None:
            from tlab_tpu.dycore.pressure import pressure_boussinesq
            p = pressure_boussinesq(P, state)
        pf = p - _pavg(p)[None, :, None]

        pairs = (("xx", "x", "x"), ("yy", "y", "y"), ("zz", "z", "z"),
                 ("xy", "x", "y"), ("xz", "x", "z"), ("yz", "y", "z"))
        d2y = None
        for tag, i, j in pairs:
            ci, cj = comp_of[i], comp_of[j]
            # production: -R_iy dU_j/dy - R_jy dU_i/dy
            out[f"P{tag}"] = -(Rm[i]["y"] * dmean[j]
                               + Rm[j]["y"] * dmean[i])
            # dissipation: 2 nu <du'_i/dx_k du'_j/dx_k>
            acc = 0.0
            for aname in ("x", "y", "z"):
                acc = acc + _pavg(gfl[ci + aname] * gfl[cj + aname])
            out[f"E{tag}"] = 2.0 * visc * acc
            # turbulent transport: -d/dy <u'_i u'_j v'>
            out[f"T{tag}"] = -(d1y @ _pavg(fl[i] * fl[j] * vf))
            # pressure-strain: <p'(du'_i/dx_j + du'_j/dx_i)>
            out[f"PI{tag}"] = _pavg(pf * (gfl[ci + j] + gfl[cj + i]))
            # pressure transport: -d/dy(<p'u'_i> d_jy + <p'u'_j> d_iy)
            g = 0.0
            if j == "y":
                g = g + _pavg(pf * fl[i])
            if i == "y":
                g = g + _pavg(pf * fl[j])
            out[f"G{tag}"] = -(d1y @ g) if not isinstance(g, float) \
                else jnp.zeros_like(out["Tke"])
            # viscous transport: nu d^2 R_ij / dy^2
            out[f"D{tag}"] = visc * (d1y @ (d1y @ Rm[i][j]))
            # mean convection: -V d R_ij / dy
            out[f"C{tag}"] = -V * (d1y @ Rm[i][j])
        # legacy aliases kept for the core table
        out["PxxC"] = out["Pxx"]
        out["PzzC"] = out["Pzz"]
        out["PxyC"] = -out["Ryy"] * dUdy
        out["PresTrp"] = -(d1y @ _pavg(vf * pf))
        out["ViscTrp"] = visc * (d1y @ (d1y @ out["Tke"]))
    return out


def scalar_statistics(P, state, diff, i):
    s = state.s[i]
    u, v, w = state.u, state.v, state.w
    out = {}
    S = _pavg(s)
    out["rS"] = S
    sf = s - S[None, :, None]
    out["Rss"] = _pavg(sf * sf)
    out["Rsu"] = _pavg(sf * (u - _pavg(u)[None, :, None]))
    out["Rsv"] = _pavg(sf * (v - _pavg(v)[None, :, None]))
    out["Rsw"] = _pavg(sf * (w - _pavg(w)[None, :, None]))
    eps = jnp.finfo(S.dtype).tiny
    out["Ss"] = _pavg(sf ** 3) / jnp.maximum(out["Rss"] ** 1.5, eps)
    out["Fs"] = _pavg(sf ** 4) / jnp.maximum(out["Rss"] ** 2, eps)
    # scalar-variance dissipation chi = 2 D <grad s' . grad s'>
    chi = 0.0
    dSdy = P["d1y"] @ S if "d1y" in P else jnp.zeros_like(S)
    for aname, axis in (("x", 0), ("y", 1), ("z", 2)):
        g = dyn._d1(P, aname, axis, s)
        if aname == "y":
            g = g - dSdy[None, :, None]
        else:
            g = g - _pavg(g)[None, :, None]
        chi = chi + _pavg(g * g)
    out["Chi"] = 2.0 * diff * chi
    # scalar-variance budget (reference AVG_SCAL_XZ budget columns):
    # d<s'2>/dt = Pss + Tss + Dss - Chi (+ mean convection)
    d1y = P.get("d1y")
    if d1y is not None:
        vf = v - _pavg(v)[None, :, None]
        out["Pss"] = -2.0 * out["Rsv"] * dSdy
        out["Tss"] = -(d1y @ _pavg(vf * sf * sf))
        out["Dss"] = diff * (d1y @ (d1y @ out["Rss"]))
        out["Css"] = -_pavg(v) * (d1y @ out["Rss"])
    return out


def write_table(path: str, y: np.ndarray, groups: dict, itime: int,
                rtime: float) -> None:
    """ASCII table: header line of column names, then y + profiles."""
    names = list(groups.keys())
    cols = [np.asarray(groups[n]) for n in names]
    with open(path, "w") as fh:
        fh.write(f"# it={itime} rtime={rtime:.8e}\n")
        fh.write("# " + " ".join(["Y"] + names) + "\n")
        data = np.column_stack([y] + cols)
        for row in data:
            fh.write(" ".join(f"{x: .8e}" for x in row) + "\n")


def read_table(path: str):
    with open(path) as fh:
        fh.readline()
        names = fh.readline().split()[1:]
    data = np.loadtxt(path)
    return {n: data[:, i] for i, n in enumerate(names)}


# ---------------------------------------------------------------------------
# Conditional (gated) statistics -- intermittency analysis
# (reference src/statistics/cavg.f90, FI_GATE conditioning)
# ---------------------------------------------------------------------------

def intermittency(gate):
    """gamma(y): plane fraction of gated (gate > 0) points."""
    return _pavg((gate > 0).astype(jnp.float32))


def conditional_average(a, gate):
    """Plane average of `a` over gated points; (cond_avg(ny,), gamma(ny,))."""
    g = (gate > 0).astype(a.dtype)
    num = _pavg(a * g)
    den = _pavg(g)
    return num / jnp.maximum(den, jnp.finfo(a.dtype).tiny), den


def conditional_flow_statistics(P, state, gate):
    """Gated means and second moments of the velocity components."""
    out = {}
    for name, comp in (("U", state.u), ("V", state.v), ("W", state.w)):
        mean, gamma = conditional_average(comp, gate)
        out[f"c{name}"] = mean
        var, _ = conditional_average(comp * comp, gate)
        out[f"c{name}2"] = var - mean ** 2
    out["gamma"] = gamma
    return out
