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


def flow_statistics(P, state, visc):
    """Returns dict name -> (ny,) profile."""
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

    # higher moments
    for name, f in (("U", uf), ("V", vf), ("W", wf)):
        var = _pavg(f * f)
        m3 = _pavg(f ** 3)
        m4 = _pavg(f ** 4)
        eps = jnp.finfo(var.dtype).tiny
        out[f"S{name}"] = m3 / jnp.maximum(var, eps) ** 1.5
        out[f"F{name}"] = m4 / jnp.maximum(var, eps) ** 2

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

    # -- Reynolds-stress budget terms (reference avg_flow_xz.f90 budget
    # groups: per-component production, dissipation, pressure-strain,
    # turbulent/viscous/pressure transport of the TKE) ---------------------
    d1y = P.get("d1y")
    if d1y is not None:
        fl = {"u": uf, "v": vf, "w": wf}
        gfl = {}
        for cname in ("u", "v", "w"):
            for aname in ("x", "y", "z"):
                g = grads[cname + aname]
                mg = mean_grad.get((cname, aname))
                gfl[cname + aname] = g - mg[None, :, None] \
                    if mg is not None else g - _pavg(g)[None, :, None]
        # per-component production against the mean shear
        out["PxxC"] = -2.0 * out["Rxy"] * dUdy
        out["PzzC"] = -2.0 * out["Ryz"] * dWdy
        out["PxyC"] = -out["Ryy"] * dUdy
        # per-component dissipation eps_ij = 2 nu <du'_i/dx_k du'_j/dx_k>
        for tag, (ci, cj) in (("Exx", ("u", "u")), ("Eyy", ("v", "v")),
                              ("Ezz", ("w", "w")), ("Exy", ("u", "v"))):
            acc = 0.0
            for aname in ("x", "y", "z"):
                acc = acc + _pavg(gfl[ci + aname] * gfl[cj + aname])
            out[tag] = 2.0 * visc * acc
        # pressure fluctuation terms (diagnostic Boussinesq pressure)
        from tlab_tpu.dycore.pressure import pressure_boussinesq
        p = pressure_boussinesq(P, state)
        pf = p - _pavg(p)[None, :, None]
        out["PresTrp"] = -(d1y @ _pavg(vf * pf))
        for tag, (ci, ai, cj, aj) in (
                ("PIxx", ("u", "x", "u", "x")),
                ("PIyy", ("v", "y", "v", "y")),
                ("PIzz", ("w", "z", "w", "z")),
                ("PIxy", ("u", "y", "v", "x"))):
            out[tag] = _pavg(pf * (gfl[ci + ai] + gfl[cj + aj]))
        # viscous transport of TKE: nu d2<k>/dy2 via two first derivatives
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
    out["Ss"] = _pavg(sf ** 3) / jnp.maximum(out["Rss"], eps) ** 1.5
    out["Fs"] = _pavg(sf ** 4) / jnp.maximum(out["Rss"], eps) ** 2
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
