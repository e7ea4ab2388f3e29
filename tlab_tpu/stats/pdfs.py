"""Probability density functions (reference src/statistics/pdf.f90 +
tools/statistics/pdfs.f90).

Per-y-plane 1-D histograms with the reference's adaptive two-pass range
(PDF_ANALIZE), joint 2-D histograms with per-u-bin adaptive v ranges
(PDF2V), and the pdfs.x analysis-mode menu (ParamPdfs, pdfs.f90:234-730):
  1  main variables (u, v, w, p, scalars)
  2  scalar-gradient G_iG_i equation (GiGi, LnGiGi)
  5  velocity-gradient invariants -> joint pdf (R, Q)      [pdf<it>.RQ]
  7  joint enstrophy and strain (log W_iW_i, log 2S_ijS_ij) [pdf<it>.WS]
  9  joint scalar and scalar gradient (s, ln G_iG_i)       [pdf<it>.SLnG]
  10 scalar-gradient components (Gx, Gy, Gz)
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


def run_pdf_mode(sim, state, pressure, outdir: str, itime: int,
                 rtime: float, opt_main: int = 1, nbins=(32, 32),
                 gate_level: float = 0.0) -> None:
    """One ParamPdfs analysis mode on a snapshot (pdfs.f90:234-730)."""
    from tlab_tpu import mappings as mp
    P = sim.P
    y = sim.grid.y.nodes
    nb = int(np.atleast_1d(nbins)[0])
    nb2 = (int(np.atleast_1d(nbins)[0]),
           int(np.atleast_1d(nbins)[-1]))
    u, v, w = state.u, state.v, state.w
    gate = None
    if gate_level > 0.0 and state.s.shape[0]:
        gate = np.asarray(state.s[0]) > gate_level

    if opt_main == 1:
        fields = [("u", u), ("v", v), ("w", w)]
        if pressure is not None:
            fields.append(("p", pressure))
        fields += [(f"s{i + 1}", state.s[i])
                   for i in range(state.s.shape[0])]
        for tag, a in fields:
            _pdf1v_out(outdir, itime, rtime, y, tag, a, nb, gate=gate)

    elif opt_main == 2 and state.s.shape[0]:
        gigi = mp.gradient_magnitude2(P, state.s[0])
        _pdf1v_out(outdir, itime, rtime, y, "GiGi", gigi, nb, gate=gate)
        _pdf1v_out(outdir, itime, rtime, y, "LnGiGi",
                   jnp.log(gigi + 1e-300), nb, gate=gate)

    elif opt_main == 5:
        _, Q, R = mp.invariants(P, u, v, w)
        _pdf2v_out(outdir, itime, rtime, y, "RQ", R, Q, nb2)

    elif opt_main == 7:
        ww = mp.vorticity_magnitude2(P, u, v, w)
        ss = 2.0 * mp.strain2(P, u, v, w)
        _pdf2v_out(outdir, itime, rtime, y, "WS",
                   jnp.log(ww + 1e-300), jnp.log(ss + 1e-300), nb2)

    elif opt_main == 9 and state.s.shape[0]:
        gigi = mp.gradient_magnitude2(P, state.s[0])
        _pdf2v_out(outdir, itime, rtime, y, "SLnG", state.s[0],
                   jnp.log(gigi + 1e-300), nb2)

    elif opt_main == 10 and state.s.shape[0]:
        from tlab_tpu.dycore import incompressible as dyn
        s0 = state.s[0]
        for tag, ax, i in (("Gx", "x", 0), ("Gy", "y", 1), ("Gz", "z", 2)):
            _pdf1v_out(outdir, itime, rtime, y, tag,
                       dyn._d1(P, ax, i, s0), nb, gate=gate)

    else:
        raise NotImplementedError(f"ParamPdfs mode {opt_main}")


def write_pdf(path: str, counts, edges, itime: int) -> None:
    """Legacy npz writer (kept for in-memory analysis helpers)."""
    np.savez(path, counts=np.asarray(counts), edges=np.asarray(edges),
             itime=itime)
