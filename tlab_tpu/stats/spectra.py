"""1-D auto/cross spectra and correlations (reference tools/statistics/
spectra.f90 equivalents, xsp/zsp outputs).

Power spectral densities along the periodic directions, averaged over the
other horizontal direction, as functions of y.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def spectrum_x(a, b=None):
    """Cross-PSD along x averaged over z: (nkx, ny)."""
    ah = jnp.fft.rfft(a, axis=0)
    bh = ah if b is None else jnp.fft.rfft(b, axis=0)
    nx = a.shape[0]
    e = jnp.real(ah * jnp.conj(bh)) / nx ** 2
    e = e.at[1:-1].multiply(2.0)          # fold negative wavenumbers
    return jnp.mean(e, axis=2)


def spectrum_z(a, b=None):
    """Cross-PSD along z averaged over x: (nkz, ny)."""
    ah = jnp.fft.rfft(a, axis=2)
    bh = ah if b is None else jnp.fft.rfft(b, axis=2)
    nz = a.shape[2]
    e = jnp.real(ah * jnp.conj(bh)) / nz ** 2
    e = e.at[..., 1:-1].multiply(2.0)
    return jnp.mean(e, axis=0).T


def correlation_x(a, b=None):
    """Two-point correlation along x from the PSD (Wiener-Khinchin)."""
    ah = jnp.fft.rfft(a, axis=0)
    bh = ah if b is None else jnp.fft.rfft(b, axis=0)
    nx = a.shape[0]
    c = jnp.fft.irfft(ah * jnp.conj(bh), n=nx, axis=0) / nx
    return jnp.mean(c, axis=2)


def radial_spectrum(a, lx, lz):
    """Radial (shell-integrated) 2-D spectrum per y: (nk, ny)."""
    nx, ny, nz = a.shape
    ah = jnp.fft.fft(jnp.fft.rfft(a, axis=0), axis=2)
    e = jnp.abs(ah) ** 2 / (nx * nz) ** 2
    e = e.at[1:-1].multiply(2.0)
    kx = np.arange(nx // 2 + 1) * (2 * np.pi / lx)
    kz = np.fft.fftfreq(nz, d=1.0) * nz * (2 * np.pi / lz) if nz > 1 else np.zeros(1)
    kmag = np.sqrt(kx[:, None] ** 2 + kz[None, :] ** 2)
    dk = 2 * np.pi / max(lx, lz)
    nshell = int(np.max(kmag) / dk) + 1
    shell = np.minimum((kmag / dk).astype(int), nshell - 1)
    out = np.zeros((nshell, ny))
    e_np = np.asarray(e)
    for i in range(kx.shape[0]):
        for k in range(kz.shape[0]):
            out[shell[i, k]] += e_np[i, :, k]
    return out


def write_spectra(path: str, spec: np.ndarray, itime: int) -> None:
    np.savetxt(path, np.asarray(spec), header=f"it={itime} rows=k cols=y")


def correlation_z(a, b=None):
    """Two-point correlation along z from the PSD (Wiener-Khinchin)."""
    ah = jnp.fft.rfft(a, axis=2)
    bh = ah if b is None else jnp.fft.rfft(b, axis=2)
    nz = a.shape[2]
    c = jnp.fft.irfft(ah * jnp.conj(bh), n=nz, axis=2) / nz
    return jnp.mean(c, axis=0).T


def cross_phase_x(a, b):
    """Cross-spectrum power and phase along x (reference spectra.f90
    pow/pha outputs, opt_main=2): (nkx, ny) each."""
    ah = jnp.fft.rfft(a, axis=0)
    bh = jnp.fft.rfft(b, axis=0)
    nx = a.shape[0]
    cross = jnp.mean(ah * jnp.conj(bh), axis=2) / nx ** 2
    return jnp.abs(cross), jnp.angle(cross)


def spectrum_2d(a, b=None, y_blocks: int = 1):
    """Full 2-D cross-PSD E(kx, kz) averaged inside y blocks:
    (nkx, nkz, y_blocks) (reference spectra.f90 opt_block y-averaging of the
    2-D spectral density before the radial reduction)."""
    nx, ny, nz = a.shape
    ah = jnp.fft.fft(jnp.fft.rfft(a, axis=0), axis=2)
    bh = ah if b is None else jnp.fft.fft(jnp.fft.rfft(b, axis=0), axis=2)
    e = jnp.real(ah * jnp.conj(bh)) / (nx * nz) ** 2
    e = e.at[1:-1].multiply(2.0)
    nb = max(1, min(y_blocks, ny))
    edges = np.linspace(0, ny, nb + 1).astype(int)
    blocks = [jnp.mean(e[:, j0:j1, :], axis=1) for j0, j1 in
              zip(edges[:-1], edges[1:])]
    return jnp.stack(blocks, axis=-1)
