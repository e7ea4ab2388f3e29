"""Factorized Poisson solver: two first-order compact integrals per mode
(the reference's default TYPE_FACTORIZE, opr_elliptic.f90:263-364 +
opr_odes.f90; Mellado & Ansorge 2012, ZAMM).

For each horizontal mode with modified wavenumber kappa = sqrt(lambda),
  p'' - kappa^2 p = f  is factored as  (D + kappa) v = f,  (D - kappa) p = v,
each first-order equation solved with the compact D1 system itself:
  (B1 + kappa A1) u = A1 f  (+ one bc row)   -- lambda-affine pencils again,
diagonalized once (same eigen machinery as the direct solver). Because both
stages invert the SAME D1 operator used by the divergence, the projected
velocity field is divergence-free to round-off in the interior -- the
property that makes this formulation the reference's default.

Superposition closure per mode (re-derived; equivalent role to the
reference's OPR_ODE2_Factorize_NN 3x3 system):
  v = v0 + a em,   p = p0 + a sp + b ep
  em = S_min homogeneous (discrete e^{-kappa(y-y0)}),
  ep = S_max homogeneous (discrete e^{+kappa(y-yN)}), sp = S_max[em]
with (a, b) from the two Neumann conditions p' = v + kappa p at the walls.
The homogeneous responses are precomputed per mode at plan time.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from tlab_tpu.fdm.plan import DerivPlan, FdmPlan
from tlab_tpu.ops.derivative import op_precision


# ---------------------------------------------------------------------------
# Int1 pencils: P(kappa) = M0 + kappa M1, solve P u = R f with bc in the
# f-row at the bc end.
# ---------------------------------------------------------------------------

def build_int1_pencil(plan_y: DerivPlan, end: str):
    """(M0, M1, R) for u' + kappa u = f with u given at `end` ('min'/'max').

    Interior rows: (B1 + kappa A1) u = A1 f (reference FDM_Int1_CreateSystem,
    fdm_integral.f90:91-214); the wall-forcing column at the bc end is
    eliminated with the dropped biased row (kappa-independent multipliers,
    as in the direct pencil).
    """
    A, B = plan_y.A1, plan_y.B1
    n = plan_y.size
    Bi, Ai, Ri = B.copy(), A.copy(), A.copy()
    M0 = np.zeros((n, n))
    M1 = np.zeros((n, n))
    R = np.zeros((n, n))
    if end == "min":
        c = Ai[1:, 0] / A[0, 0]
        Bi[1:] -= np.outer(c, B[0])
        Ri[1:] -= np.outer(c, A[0])
        Ai[1:] -= np.outer(c, A[0])
        M0[1:] = Bi[1:]
        M1[1:] = Ai[1:]
        R[1:] = Ri[1:]
        R[1:, 0] = 0.0
        M0[0, 0] = 1.0
        R[0, 0] = 1.0
    else:
        c = Ai[:-1, -1] / A[-1, -1]
        Bi[:-1] -= np.outer(c, B[-1])
        Ri[:-1] -= np.outer(c, A[-1])
        Ai[:-1] -= np.outer(c, A[-1])
        M0[:-1] = Bi[:-1]
        M1[:-1] = Ai[:-1]
        R[:-1] = Ri[:-1]
        R[:-1, -1] = 0.0
        M0[-1, -1] = 1.0
        R[-1, -1] = 1.0
    return M0, M1, R


def _eigen(M0, M1, R, shift):
    """Complex eigendecomposition: the D1 pencil's spectrum is genuinely
    complex (near-antisymmetric operator), unlike the D2 pencil."""
    Ms = M0 + shift * M1
    K = np.linalg.solve(Ms, M1)
    lam, V = np.linalg.eig(K)
    return {"V": V, "W": np.linalg.inv(V) @ np.linalg.solve(Ms, R),
            "lam": lam, "cond": float(np.linalg.cond(V))}


@dataclasses.dataclass(frozen=True)
class FactorizePlan:
    ny: int
    shift: float
    emin: dict                  # eigen data for S_min (u' + kappa u)
    emax: dict                  # eigen data for S_max (u' - kappa u)
    kappa: np.ndarray           # (nkx, nz) per-mode sqrt(lambda), mwn-based
    sing: np.ndarray            # (nkx, nz) bool: kappa == 0 modes
    d1y_row0: np.ndarray        # D1 wall rows for dpdy checks (unused yet)


def build_factorize_plan(fdm: FdmPlan, shift: float = 1.0) -> FactorizePlan:
    plan_y = fdm.y
    emin = _eigen(*build_int1_pencil(plan_y, "min"), shift)
    emax = _eigen(*build_int1_pencil(plan_y, "max"), -shift)

    nx = fdm.x.size
    mwn_x = fdm.x.mwn1[: nx // 2 + 1] if fdm.x.periodic else np.zeros(1)
    mwn_z = fdm.z.mwn1 if fdm.z.size > 1 else np.zeros(1)
    lam = mwn_x[:, None] ** 2 + mwn_z[None, :] ** 2
    kappa = np.sqrt(lam)
    sing = kappa < 1e-12
    return FactorizePlan(ny=plan_y.size, shift=shift, emin=emin, emax=emax,
                         kappa=kappa, sing=sing,
                         d1y_row0=plan_y.d1[list(plan_y.d1)[0]][[0, -1], :])


def device_factorize_plan(plan: FactorizePlan, dtype=jnp.float32) -> dict:
    """Device arrays incl. per-mode homogeneous responses (em, sp, ep)."""
    ny = plan.ny
    kap = plan.kappa.astype(np.float64)
    nkx, nz = kap.shape

    def denom(e, sign_kappa, sgn_shift):
        # 1 + (kappa2 - shift2) lam_j for pencil P(kappa2)=Ms+(kappa2-s2)M1
        k2 = sign_kappa * kap.reshape(-1)
        return 1.0 + (k2[None, :].astype(complex) - sgn_shift) * e["lam"][:, None]

    dmin = denom(plan.emin, +1.0, plan.shift)
    dmax = denom(plan.emax, -1.0, -plan.shift)

    # homogeneous responses for all modes (plan-time matmuls, float64)
    e0 = np.zeros(ny)
    e0[0] = 1.0
    eN = np.zeros(ny)
    eN[-1] = 1.0
    w_em = (plan.emin["W"] @ e0)[:, None] / dmin          # (ny, nmodes)
    em = (plan.emin["V"] @ w_em).real       # physically real responses
    w_ep = (plan.emax["W"] @ eN)[:, None] / dmax
    ep = (plan.emax["V"] @ w_ep).real
    em_bc = em.astype(complex)
    em_bc[-1, :] = 0.0                                    # S_max input: bc row
    sp = (plan.emax["V"] @ ((plan.emax["W"] @ em_bc) / dmax)).real

    cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
    from tlab_tpu.ops.elliptic import _transform_mode
    dft = None
    if _transform_mode(dtype) == "matmul":
        from tlab_tpu.ops import rdft
        dft = rdft.device_rdft_plan(2 * (nkx - 1), nz, dtype)
    # complex constants stay HOST-side numpy: the axon tunnel cannot fetch
    # complex device arrays during jit lowering (D2H Unimplemented); numpy
    # constants embed directly into the HLO
    np_c = np.complex64 if dtype == jnp.float32 else np.complex128
    d = {
        "Vmin": np.asarray(plan.emin["V"], np_c),
        "Wmin": np.asarray(plan.emin["W"], np_c),
        "Vmax": np.asarray(plan.emax["V"], np_c),
        "Wmax": np.asarray(plan.emax["W"], np_c),
        "dmin": np.asarray(dmin.reshape(ny, nkx, nz), np_c),
        "dmax": np.asarray(dmax.reshape(ny, nkx, nz), np_c),
        "kappa": jnp.asarray(kap, dtype),
        "sing": jnp.asarray(plan.sing),
        "em": jnp.asarray(em.reshape(ny, nkx, nz), dtype),
        "ep": jnp.asarray(ep.reshape(ny, nkx, nz), dtype),
        "sp": jnp.asarray(sp.reshape(ny, nkx, nz), dtype),
    }
    if dft is not None:
        d["dft"] = dft
    return d


# ---------------------------------------------------------------------------
# Modal application
# ---------------------------------------------------------------------------

def _solve(V, W, dnm, f_hat):
    prec = op_precision(jnp.float32 if f_hat.dtype == jnp.complex64 else None)
    G = jnp.einsum("ab,kbz->kaz", W, f_hat.astype(W.dtype), precision=prec)
    G = G / jnp.moveaxis(dnm, 0, 1)
    return jnp.einsum("ab,kbz->kaz", V, G,
                      precision=prec).astype(f_hat.dtype)


def solve_modal_factorize(dev: dict, f_hat, gb, gt):
    """p and dpdy per mode for p'' - kappa^2 p = f, p'(walls) = gb/gt.

    f_hat: (nkx, ny, nz) complex; gb/gt: (nkx, nz) complex Neumann values.
    Returns (p_hat, dpdy_hat).
    """
    kap = dev["kappa"][:, None, :].astype(f_hat.dtype)     # (nkx,1,nz)
    em = jnp.moveaxis(dev["em"], 0, 1).astype(f_hat.dtype)  # (nkx,ny,nz)
    ep = jnp.moveaxis(dev["ep"], 0, 1).astype(f_hat.dtype)
    sp = jnp.moveaxis(dev["sp"], 0, 1).astype(f_hat.dtype)

    # stage 1: v0 with v(y0) = 0
    f1 = f_hat.at[:, 0, :].set(0.0)
    v0 = _solve(dev["Vmin"], dev["Wmin"], dev["dmin"], f1)
    # stage 2: p0 with p(yN) = 0
    v0b = v0.at[:, -1, :].set(0.0)
    p0 = _solve(dev["Vmax"], dev["Wmax"], dev["dmax"], v0b)

    # closure: [1 + k sp0, k ep0; em_N, k] [a b]^T = [gb - k p00, gt - v0N]
    k1 = kap[:, 0, :]
    sp0 = sp[:, 0, :]
    ep0 = ep[:, 0, :]
    em_N = em[:, -1, :]
    p00 = p0[:, 0, :]
    v0N = v0[:, -1, :]
    a11 = 1.0 + k1 * sp0
    a12 = k1 * ep0
    a21 = em_N
    a22 = k1
    r1 = gb - k1 * p00
    r2 = gt - v0N
    det = a11 * a22 - a12 * a21
    safe_det = jnp.where(dev["sing"], jnp.ones_like(det), det)
    a = (r1 * a22 - r2 * a12) / safe_det
    b = (a11 * r2 - a21 * r1) / safe_det
    # kappa = 0 (singular) modes: v' = f, p' = v; compatibility fixes
    # a = gt - v0N, p determined up to a constant (b -> 0)
    a = jnp.where(dev["sing"], r2, a)
    b = jnp.where(dev["sing"], 0.0, b)

    p = p0 + a[:, None, :] * sp + b[:, None, :] * ep
    v = v0 + a[:, None, :] * em
    dpdy = v + kap * p
    return p, dpdy


def poisson_factorize(dev: dict, f, bcs_b=None, bcs_t=None):
    """Physical-space NN Poisson via the factorized modal solver.

    Returns (p, dpdy); dpdy is the stage-consistent first derivative (the
    property that removes divergence to round-off)."""
    nx, ny, nz = f.shape
    zero = jnp.zeros((nx, nz), f.dtype)
    gb_phys = zero if bcs_b is None else bcs_b
    gt_phys = zero if bcs_t is None else bcs_t

    dft = dev.get("dft")

    def fwd(a):
        if dft is not None and a.shape[0] == dft["Cx"].shape[1]:
            from tlab_tpu.ops import rdft
            re, im = rdft.forward_parts(dft, a)
            return re + 1j * im
        ah = jnp.fft.rfft(a, axis=0)
        return jnp.fft.fft(ah, axis=-1) if nz > 1 else ah

    def bwd(ah):
        if dft is not None and ah.dtype != f.dtype:
            from tlab_tpu.ops import rdft
            return rdft.backward_parts(dft, jnp.real(ah), jnp.imag(ah))
        if nz > 1:
            ah = jnp.fft.ifft(ah, axis=-1)
        return jnp.fft.irfft(ah, n=nx, axis=0)

    f_hat = fwd(f)
    gb = fwd(gb_phys[:, None, :])[:, 0, :]
    gt = fwd(gt_phys[:, None, :])[:, 0, :]
    p_hat, dpdy_hat = solve_modal_factorize(dev, f_hat, gb, gt)
    return bwd(p_hat).astype(f.dtype), bwd(dpdy_hat).astype(f.dtype)
