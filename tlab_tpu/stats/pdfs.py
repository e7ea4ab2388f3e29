"""Probability density functions per y-plane (reference src/utils/pdfs.f90
and tools/statistics/pdfs.f90 equivalents)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def pdf_per_plane(a, nbins: int = 64, vmin=None, vmax=None, gate=None):
    """Histogram of `a` per y-plane.

    Returns (counts (ny, nbins), edges (ny, nbins+1)). Bounds default to the
    per-plane min/max like the reference's relative-range mode.
    """
    nx, ny, nz = a.shape
    ap = jnp.moveaxis(a, 1, 0).reshape(ny, nx * nz)
    if gate is not None:
        gp = jnp.moveaxis(gate, 1, 0).reshape(ny, nx * nz)
    lo = jnp.min(ap, axis=1) if vmin is None else jnp.full((ny,), vmin)
    hi = jnp.max(ap, axis=1) if vmax is None else jnp.full((ny,), vmax)
    span = jnp.where(hi > lo, hi - lo, 1.0)
    idx = jnp.clip(((ap - lo[:, None]) / span[:, None] * nbins).astype(jnp.int32),
                   0, nbins - 1)
    weights = jnp.ones_like(ap) if gate is None else gp.astype(ap.dtype)

    def hist_row(irow, wrow):
        return jnp.zeros(nbins, ap.dtype).at[irow].add(wrow)

    counts = jax.vmap(hist_row)(idx, weights)
    edges = lo[:, None] + (hi - lo)[:, None] * jnp.linspace(0, 1, nbins + 1)[None]
    return counts, edges


def write_pdf(path: str, counts, edges, itime: int) -> None:
    np.savez(path, counts=np.asarray(counts), edges=np.asarray(edges),
             itime=itime)
