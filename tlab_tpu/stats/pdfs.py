"""Probability density functions (reference src/statistics/pdf.f90 +
tools/statistics/pdfs.f90).

Per-y-plane 1-D histograms with the reference's adaptive two-pass range
(PDF_ANALIZE), joint 2-D histograms with per-u-bin adaptive v ranges
(PDF2V), and the FULL pdfs.x analysis-mode menu (ParamPdfs,
pdfs.f90:193-800):
  1  main variables (u, v, w, p, scalars)
  2  scalar-gradient G_iG_i equation (GiGi, LnGiGi, production,
     diffusion, normal strain)
  3  enstrophy equation (WiWi, LnWiWi, production, diffusion,
     dilatation, baroclinic, rate)
  4  strain equation (2SijSij, Ln2SijSij, production, diffusion,
     pressure-strain)
  5  velocity-gradient invariants -> joint pdf (R, Q)      [pdf<it>.RQ]
  6  chi-flamelet strain (StrainAGiGi, StrainA)
  7  joint enstrophy and strain (log W_iW_i, log 2S_ijS_ij) [pdf<it>.WS]
  9  joint scalar and scalar gradient (s, ln G_iG_i)       [pdf<it>.SLnG]
  10 scalar-gradient components (Gx, Gy, Gz, Gtheta, Gphi) + GphiS joint
  11 rate-of-strain eigenvalues (Lambda1/2/3)
  12 eigenframe alignment cosines (cos(w,lambda_i), cos(G,lambda_i))
  13 longitudinal velocity derivatives (Sxx, Syy, Szz)
  14 potential vorticity (LnPotentialEnstrophy, CosPotentialEnstrophy)
  15 joint buoyancy and v [pdf<it>.bv] + b/v marginals
All outputs in the reference binary layout (io/reference_formats.py) so
scripts/python/PlotPdfs.py reads them unmodified.  gate_level > 0
conditions the 1-D pdfs on scalar1 > gate_level (the reference's
intermittency partition)."""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from tlab_tpu.io import reference_formats as rf


def pdf_per_plane(a, nbins: int = 64, vmin=None, vmax=None, gate=None):
    """Device-side histogram of `a` per y-plane (fast path for in-run
    monitoring; the reference-exact host tables are in
    reference_formats.pdf1v_plane_table)."""
    nx, ny, nz = a.shape
    ap = jnp.moveaxis(a, 1, 0).reshape(ny, nx * nz)
    if gate is not None:
        gp = jnp.moveaxis(gate, 1, 0).reshape(ny, nx * nz)
    lo = jnp.min(ap, axis=1) if vmin is None else jnp.full((ny,), vmin)
    hi = jnp.max(ap, axis=1) if vmax is None else jnp.full((ny,), vmax)
    span = jnp.where(hi > lo, hi - lo, 1.0)
    idx = jnp.clip(((ap - lo[:, None]) / span[:, None]
                    * nbins).astype(jnp.int32), 0, nbins - 1)
    weights = jnp.ones_like(ap) if gate is None else gp.astype(ap.dtype)

    def hist_row(irow, wrow):
        return jnp.zeros(nbins, ap.dtype).at[irow].add(wrow)

    counts = jax.vmap(hist_row)(idx, weights)
    edges = lo[:, None] + (hi - lo)[:, None] * jnp.linspace(
        0, 1, nbins + 1)[None]
    return counts, edges


import functools


@functools.partial(jax.jit, static_argnums=1)
def pdf1v_plane_table_device(field, nbins: int):
    """DEVICE-side reference-exact ibc=2 adaptive two-pass PDF table:
    per-y-plane rows + whole-volume row, (ny+1, nbins+2), equal to
    reference_formats.pdf1v_plane_table (PDF1V2D + PDF_ANALIZE,
    pdfs.f90:28-111,329-375).  Lets the in-run pdf cadence fetch only
    the (ny+1, nbins+2) table instead of the full 3-D field."""
    nx, ny, nz = field.shape

    def row(samples):
        dt = samples.dtype
        umin = jnp.min(samples)
        umax = jnp.max(samples)
        ustep = (umax - umin) / nbins
        u1 = jnp.where(ustep == 0.0, jnp.asarray(1.0, dt), ustep)
        up = ((samples - umin) / u1).astype(jnp.int32)
        counts1 = jnp.zeros(nbins, dt).at[
            jnp.minimum(up, nbins - 1)].add(1.0)
        # PDF_ANALIZE: trim bins below plim * max-count from both ends
        pmin = jnp.asarray(1.0e-4, dt) * jnp.max(counts1)
        idx = jnp.arange(nbins)
        mask = counts1 > pmin
        first = jnp.min(jnp.where(mask, idx, nbins))
        last = jnp.max(jnp.where(mask, idx, -1))
        lo = jnp.where(ustep == 0.0, umin, umin + first * ustep)
        hi = jnp.where(ustep == 0.0, umax, umin + (last + 1) * ustep)
        # second pass on the trimmed range, outliers dropped (ilim=0);
        # float->int conversion truncates toward zero exactly as the
        # host NumPy/Fortran INT()
        step2 = (hi - lo) / nbins
        s2 = jnp.where(step2 == 0.0, jnp.asarray(1.0, dt), step2)
        up2 = ((samples - lo) / s2).astype(jnp.int32)
        keep = (up2 >= 0) & (up2 <= nbins - 1)
        counts2 = jnp.zeros(nbins, dt).at[
            jnp.clip(up2, 0, nbins - 1)].add(keep.astype(dt))
        return jnp.concatenate(
            [counts2, jnp.stack([lo + 0.5 * step2, hi - 0.5 * step2])])

    planes = jnp.moveaxis(field, 1, 0).reshape(ny, nx * nz)
    rows = jax.vmap(row)(planes)
    vrow = row(field.reshape(nx * ny * nz))
    return jnp.concatenate([rows, vrow[None]], axis=0)


def _pdf1v_out(outdir, itime, rtime, y, tag, field, nbins, gate=None):
    f = np.asarray(field)
    if gate is not None:
        # conditioned histogram: keep gate samples only (per plane)
        rows = np.zeros((f.shape[1] + 1, nbins + 2))
        g = np.asarray(gate)
        sets = [(f[:, j, :][g[:, j, :]], j) for j in range(f.shape[1])]
        sets.append((f[g], f.shape[1]))
        for sample, j in sets:
            if sample.size == 0:
                continue
            row = rf.pdf1v2d(sample, nbins, ilim=1)
            lo, hi = rf.pdf_analize(nbins, row)
            rows[j] = rf.pdf1v2d(sample, nbins, ilim=0,
                                 umin_ext=lo, umax_ext=hi)
    else:
        rows = rf.pdf1v_plane_table(f, nbins=nbins, ibc=2)
    rf.write_pdf_file(outdir, f"pdf{itime}.{tag}", rtime, y, rows, nbins)


def _pdf2v_out(outdir, itime, rtime, y, tag, u, v, nbins2):
    rows = rf.pdf2v_table(np.asarray(u), np.asarray(v), nbins2)
    rf.write_pdf_file(outdir, f"pdf{itime}.{tag}", rtime, y, rows,
                      list(nbins2))


def _buoyancy_field(sim, state):
    """b(s) with zero background reference (the pdfs.x convention: the
    reference zeroes bbackground/wrk1d before Gravity_Buoyancy,
    pdfs.f90:404-409, 709-714); None without an active body force."""
    props = getattr(sim.case, "buoyancy", None)
    if props is None or getattr(props, "type", "none") == "none":
        return None
    from tlab_tpu.physics.gravity import buoyancy_field
    ref = jnp.zeros(sim.grid.y.nodes.shape[0], state.u.dtype)
    return buoyancy_field(props, state.s, ref)


def mode_fields(sim, state, pressure, opt_main: int = 1):
    """The 3-D fields of one ParamPdfs analysis mode
    (pdfs.f90:193-800): (marginals [(tag, field)...],
    joints [(tag, u_field, v_field)...]).  Separated from the histogram
    writer so tests can assert the fields themselves."""
    from tlab_tpu import mappings as mp
    from tlab_tpu.dycore import incompressible as dyn
    P = sim.P
    visc = sim.nsp.visc
    u, v, w = state.u, state.v, state.w
    tiny = 1e-300
    singles = []
    joints = []

    if opt_main == 1:
        singles = [("u", u), ("v", v), ("w", w)]
        if pressure is not None:
            singles.append(("p", pressure))
        singles += [(f"s{i + 1}", state.s[i])
                    for i in range(state.s.shape[0])]

    elif opt_main == 2 and state.s.shape[0]:
        # scalar-gradient equation (pdfs.f90:376-394)
        s0 = state.s[0]
        gigi = mp.gradient_magnitude2(P, s0)
        prod = mp.gradient_production(P, s0, u, v, w)
        diffu = sim.nsp.diffusivity(0) * mp.gradient_diffusion(P, s0)
        singles = [("GiGi", gigi), ("LnGiGi", jnp.log(gigi + tiny)),
                   ("ProductionMsGiGjSij", prod),
                   ("DiffusionNuGiLapGi", diffu),
                   ("StrainAMsNiNjSij", prod / (gigi + tiny))]

    elif opt_main == 3:
        # enstrophy equation (pdfs.f90:398-451)
        wiwi = mp.vorticity_magnitude2(P, u, v, w)
        prod = mp.vorticity_production(P, u, v, w)
        diffu = visc * mp.vorticity_diffusion(P, u, v, w)
        inv_p = -dyn.divergence(P, u, v, w)       # FI_INVARIANT_P
        b = _buoyancy_field(sim, state)
        ox, oy, oz = mp.curl(P, u, v, w)
        if b is not None:
            # curl of the buoyancy force (0, b g_y, 0):
            # (-d(b gy)/dz, 0, d(b gy)/dx) dotted with the vorticity
            gy_vec = sim.case.buoyancy.vector[1]
            bf = b * gy_vec
            baro = (ox * (-dyn._d1(P, "z", 2, bf))
                    + oz * dyn._d1(P, "x", 0, bf))
        else:
            baro = jnp.zeros_like(wiwi)
        singles = [("WiWi", wiwi), ("LnWiWi", jnp.log(wiwi + tiny)),
                   ("ProductionWiWjSij", prod),
                   ("DiffusionNuWiLapWi", diffu),
                   ("DilatationMsWiWiDivU", inv_p * wiwi),
                   ("Baroclinic", baro),
                   ("RateANiNjSij", prod / (wiwi + tiny))]

    elif opt_main == 4:
        # strain equation (pdfs.f90:455-486); needs the diagnostic p
        if pressure is None:
            from tlab_tpu.dycore.pressure import pressure_boussinesq
            pressure = pressure_boussinesq(P, state)
        s2 = 2.0 * mp.strain2(P, u, v, w)
        singles = [("2SijSij", s2), ("Ln2SijSij", jnp.log(s2 + tiny)),
                   ("ProductionMs2SijSjkS_ki",
                    2.0 * mp.strain_production(P, u, v, w)),
                   ("DiffusionNuSijLapSij",
                    2.0 * visc * mp.strain_diffusion(P, u, v, w)),
                   ("Pressure2SijPij",
                    2.0 * mp.strain_pressure(P, u, v, w, pressure))]

    elif opt_main == 5:
        _, Q, R = mp.invariants(P, u, v, w)
        joints = [("RQ", R, Q)]

    elif opt_main == 6 and state.s.shape[0]:
        # chi-flamelet strain (pdfs.f90:510-519)
        strain1, strain2_, _ = mp.strain_a(P, state.s[0], u, v, w)
        singles = [("StrainAGiGi", strain1), ("StrainA", strain2_)]

    elif opt_main == 7:
        ww = mp.vorticity_magnitude2(P, u, v, w)
        ss = 2.0 * mp.strain2(P, u, v, w)
        joints = [("WS", jnp.log(ww + tiny), jnp.log(ss + tiny))]

    elif opt_main == 9 and state.s.shape[0]:
        gigi = mp.gradient_magnitude2(P, state.s[0])
        joints = [("SLnG", state.s[0], jnp.log(gigi + tiny))]

    elif opt_main == 10 and state.s.shape[0]:
        # scalar-gradient components + angles (pdfs.f90:566-591)
        s0 = state.s[0]
        gx = dyn._d1(P, "x", 0, s0)
        gy = dyn._d1(P, "y", 1, s0)
        gz = dyn._d1(P, "z", 2, s0)
        mag = jnp.sqrt(gx * gx + gy * gy + gz * gz)
        gphi = jnp.arcsin(gy / jnp.maximum(mag, 1e-30))    # with Oy
        gtheta = jnp.arctan2(gz, gx)                       # with Ox in xOz
        singles = [("Gx", gx), ("Gy", gy), ("Gz", gz),
                   ("Gtheta", gtheta), ("Gphi", gphi)]
        joints = [("GphiS", gtheta, gphi)]

    elif opt_main == 11:
        # rate-of-strain eigenvalues (pdfs.f90:595-606)
        from tlab_tpu.stats.analysis import _sym_eigenvalues, _grad9
        g = _grad9(P, u, v, w)
        l1, l2, l3 = _sym_eigenvalues(
            g["ux"], g["vy"], g["wz"],
            0.5 * (g["uy"] + g["vx"]), 0.5 * (g["uz"] + g["wx"]),
            0.5 * (g["vz"] + g["wy"]))
        singles = [("Lambda1", l1), ("Lambda2", l2), ("Lambda3", l3)]

    elif opt_main == 12:
        # eigenframe alignment (pdfs.f90:610-661)
        from tlab_tpu.stats.analysis import eigenframe_cosine_fields
        cf = eigenframe_cosine_fields(P, state)
        names = {"cosWL1": "cos(w,lambda1)", "cosWL2": "cos(w,lambda2)",
                 "cosWL3": "cos(w,lambda3)", "cosGL1": "cos(G,lambda1)",
                 "cosGL2": "cos(G,lambda2)", "cosGL3": "cos(G,lambda3)"}
        singles = [(tag, cf[k]) for k, tag in names.items() if k in cf]

    elif opt_main == 13:
        # longitudinal velocity derivatives (pdfs.f90:665-676)
        singles = [("Sxx", dyn._d1(P, "x", 0, u)),
                   ("Syy", dyn._d1(P, "y", 1, v)),
                   ("Szz", dyn._d1(P, "z", 2, w))]

    elif opt_main == 14 and state.s.shape[0]:
        # potential vorticity w.grad(s1) (pdfs.f90:680-703)
        ox, oy, oz = mp.curl(P, u, v, w)
        wiwi = ox * ox + oy * oy + oz * oz
        s0 = state.s[0]
        gx = dyn._d1(P, "x", 0, s0)
        gy = dyn._d1(P, "y", 1, s0)
        gz = dyn._d1(P, "z", 2, s0)
        pv = ox * gx + oy * gy + oz * gz
        normb = jnp.sqrt(gx * gx + gy * gy + gz * gz + 1e-30)
        normw = jnp.sqrt(wiwi + 1e-30)
        singles = [("LnPotentialEnstrophy", jnp.log(pv * pv + 1e-30)),
                   ("CosPotentialEnstrophy", pv / (normb * normw))]

    elif opt_main == 15:
        # joint analysis of buoyancy and vertical velocity
        # (pdfs.f90:707-800): pdf<it>.bv + the two marginals
        b = _buoyancy_field(sim, state)
        if b is None:
            raise ValueError("ParamPdfs mode 15 needs [BodyForce]")
        ini = getattr(sim.case, "ini", None)
        froude = ini.get_float("Parameters", "Froude", 1.0) \
            if ini is not None else 1.0
        b = b / froude
        singles = [("b", b), ("v", v)]
        joints = [("bv", b, v)]

    else:
        raise NotImplementedError(f"ParamPdfs mode {opt_main}")

    return singles, joints


def run_pdf_mode(sim, state, pressure, outdir: str, itime: int,
                 rtime: float, opt_main: int = 1, nbins=(32, 32),
                 gate_level: float = 0.0) -> None:
    """One ParamPdfs analysis mode on a snapshot: compute the mode's
    fields and write reference-layout pdf<it>.<tag> files."""
    y = sim.grid.y.nodes
    nb = int(np.atleast_1d(nbins)[0])
    nb2 = (int(np.atleast_1d(nbins)[0]),
           int(np.atleast_1d(nbins)[-1]))
    gate = None
    if gate_level > 0.0 and state.s.shape[0]:
        gate = np.asarray(state.s[0]) > gate_level
    singles, joints = mode_fields(sim, state, pressure, opt_main)
    for tag, a in singles:
        _pdf1v_out(outdir, itime, rtime, y, tag, a, nb, gate=gate)
    for tag, a, b in joints:
        _pdf2v_out(outdir, itime, rtime, y, tag, a, b, nb2)

    if opt_main == 9 and state.s.shape[0]:
        # conditional averages (pdfs.f90:546-553): mean GiGi / LnGiGi on
        # bins of s (the first var, ibc=1 local range)
        from tlab_tpu import mappings as mp
        gigi = np.asarray(mp.gradient_magnitude2(sim.P, state.s[0]))
        s_np = np.asarray(state.s[0])
        for fname, fld in (("cavgGiGi", gigi),
                           ("cavgLnGiGi", np.log(gigi + 1e-300))):
            rows = rf.cavg1v_plane_table(s_np, fld, nb, ibc=1)
            rf.write_pdf_file(outdir, f"{fname}{itime}.s", rtime, y,
                              rows, nb)

    elif opt_main == 15:
        # conditional-average suite (pdfs.f90:719-800): each diagnostic
        # averaged on bins of b, of v, and on the joint (b, v)
        from tlab_tpu import mappings as mp
        from tlab_tpu.dycore import incompressible as dyn
        d = dict(singles)
        b_f = d["b"]
        if pressure is None:
            from tlab_tpu.dycore.pressure import pressure_boussinesq
            pressure = pressure_boussinesq(sim.P, state)
        fields = {"B": b_f,
                  "Bii": mp.laplacian(sim.P, b_f),
                  "U": state.u, "W": state.w,
                  "Vii": mp.laplacian(sim.P, state.v),
                  "P": pressure,
                  "Py": dyn._d1(sim.P, "y", 1, pressure)}
        b_np = np.asarray(b_f)
        v_np = np.asarray(state.v)
        for fname, fld in fields.items():
            fld = np.asarray(fld)
            for tag, cond in (("b", b_np), ("v", v_np)):
                rows = rf.cavg1v_plane_table(cond, fld, nb, ibc=1)
                rf.write_pdf_file(outdir, f"cavg{fname}{itime}.{tag}",
                                  rtime, y, rows, nb)
            rows = rf.cavg2v_table(b_np, v_np, fld, nb2)
            rf.write_pdf_file(outdir, f"cavg{fname}{itime}.bv", rtime, y,
                              rows, list(nb2))


def write_pdf(path: str, counts, edges, itime: int) -> None:
    """Legacy npz writer (kept for in-memory analysis helpers)."""
    np.savez(path, counts=np.asarray(counts), edges=np.asarray(edges),
             itime=itime)
