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
import jax
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


def build_factorize_plan(fdm: FdmPlan, shift: float = 1.0,
                         mwn_x=None, mwn_z=None) -> FactorizePlan:
    """mwn_x/mwn_z override the horizontal modified wavenumbers (rfft
    ordering for x, full-fft ordering for z). The staggered pressure grid
    passes the staggered-derivative wavenumbers, which vanish only at the
    (0,0) mode (reference opr_elliptic.f90:144-147 'different modified
    wavenumbers', single singular mode)."""
    plan_y = fdm.y
    emin = _eigen(*build_int1_pencil(plan_y, "min"), shift)
    emax = _eigen(*build_int1_pencil(plan_y, "max"), -shift)

    nx = fdm.x.size
    if mwn_x is None:
        mwn_x = fdm.x.mwn1[: nx // 2 + 1] if fdm.x.periodic else np.zeros(1)
    if mwn_z is None:
        mwn_z = fdm.z.mwn1 if fdm.z.size > 1 else np.zeros(1)
    lam = mwn_x[:, None] ** 2 + mwn_z[None, :] ** 2
    kappa = np.sqrt(lam)
    sing = kappa < 1e-12
    return FactorizePlan(ny=plan_y.size, shift=shift, emin=emin, emax=emax,
                         kappa=kappa, sing=sing,
                         d1y_row0=plan_y.d1[list(plan_y.d1)[0]][[0, -1], :])


def device_factorize_plan(plan: FactorizePlan, dtype=jnp.float32) -> dict:
    """Small device plan; the per-mode denominators and homogeneous
    responses (em, ep, sp) are (ny, nkx, nz) tables -- far too large to
    embed as jit constants (135 MB each at production sizes; they also
    cannot ride the axon tunnel as complex device constants) -- so only
    the (ny, ny) eigen matrices, the per-solver eigenvalues and kappa are
    stored, and solve_modal_factorize reconstructs the tables on device
    (a few extra modal matmuls, fully fused by XLA)."""
    kap = plan.kappa.astype(np.float64)
    nkx, nz = kap.shape

    from tlab_tpu.ops.elliptic import _transform_mode
    dft = None
    if _transform_mode(dtype) == "matmul":
        from tlab_tpu.ops import rdft
        dft = rdft.device_rdft_plan(2 * (nkx - 1), nz, dtype)
    # complex constants stay HOST-side numpy: the axon tunnel cannot fetch
    # complex device arrays during jit lowering (D2H Unimplemented)
    np_c = np.complex64 if dtype == jnp.float32 else np.complex128
    d = {
        "Vmin": np.asarray(plan.emin["V"], np_c),
        "Wmin": np.asarray(plan.emin["W"], np_c),
        "Vmax": np.asarray(plan.emax["V"], np_c),
        "Wmax": np.asarray(plan.emax["W"], np_c),
        "lam_min": np.asarray(plan.emin["lam"], np_c),
        "lam_max": np.asarray(plan.emax["lam"], np_c),
        "shift": float(plan.shift),
        "kappa": np.asarray(kap, np.dtype(jnp.dtype(dtype))),
        "sing": np.asarray(plan.sing),
    }
    if dft is not None:
        d["dft"] = dft
    return d


# Modal application
# ---------------------------------------------------------------------------

def _solve(V, W, dnm, f_hat):
    prec = op_precision(jnp.float32 if f_hat.dtype == jnp.complex64 else None)
    G = jnp.einsum("ab,kbz->kaz", W, f_hat.astype(W.dtype), precision=prec)
    G = G / jnp.moveaxis(dnm, 0, 1)
    return jnp.einsum("ab,kbz->kaz", V, G,
                      precision=prec).astype(f_hat.dtype)


def build_tables(dev: dict, cd=None):
    """Per-mode denominators and homogeneous responses as device arrays.

    Jit this ONCE at setup and pass the result to poisson_factorize via
    tables= (a traced argument): the tables are (ny, nkx, nz) -- far too
    large to bake into the step graph as constants; computing them every
    substep costs ~4 modal matmuls.
    """
    if cd is None:
        cd = jnp.complex64 if dev["kappa"].dtype == jnp.float32 \
            else jnp.complex128
    kl = dev["kappa"].astype(cd)[None, :, :]               # (1,nkx,nz)
    shift = dev["shift"]
    # the factorized pencils are LINEAR in kappa (factors D +- kappa)
    dmin = 1.0 + (kl - shift) * jnp.asarray(dev["lam_min"],
                                            cd)[:, None, None]
    dmax = 1.0 + (-kl + shift) * jnp.asarray(dev["lam_max"],
                                             cd)[:, None, None]
    # homogeneous responses: em (v-response to v(y0)=1), ep (p-response to
    # p(yN)=1), sp (p-response to the em forcing)
    Vmin = jnp.asarray(dev["Vmin"], cd)
    Wmin = jnp.asarray(dev["Wmin"], cd)
    Vmax = jnp.asarray(dev["Vmax"], cd)
    Wmax = jnp.asarray(dev["Wmax"], cd)
    prec = op_precision(jnp.float32 if cd == jnp.complex64 else None)
    em = jnp.einsum("ab,bkz->akz", Vmin,
                    Wmin[:, 0][:, None, None] / dmin, precision=prec)
    ep = jnp.einsum("ab,bkz->akz", Vmax,
                    Wmax[:, -1][:, None, None] / dmax, precision=prec)
    em_bc = em.at[-1, :, :].set(0.0)
    sp = jnp.einsum("ab,bkz->akz", Vmax,
                    jnp.einsum("ab,bkz->akz", Wmax, em_bc,
                               precision=prec) / dmax, precision=prec)
    # all-real pytree: complex device arrays cannot cross the axon
    # host<->device boundary, and the responses are physically real anyway
    return {"dmin_re": jnp.real(dmin), "dmin_im": jnp.imag(dmin),
            "dmax_re": jnp.real(dmax), "dmax_im": jnp.imag(dmax),
            "em": jnp.real(em),
            "ep": jnp.real(ep),
            "sp": jnp.real(sp)}


def materialize_tables(dev: dict, dtype=jnp.float32):
    """build_tables + a host round-trip so the result consists of plain
    device_put arrays: on the axon backend, outputs of one executable
    cannot be fed as arguments to another (Unimplemented); falls back to
    None (solver rebuilds tables inline) if any step fails.

    The plan is CLOSED OVER (zero-argument jit), never passed as a jit
    argument: axon cannot device_put complex arrays (H2D Unimplemented),
    but complex host-numpy constants folded into the HLO are fine --
    and a failed dispatch wedges the axon client for the whole process,
    so this must not be allowed to fail."""
    try:
        import jax
        tb = jax.jit(lambda: build_tables(dev))()
        host = jax.tree_util.tree_map(np.asarray, tb)
        return jax.tree_util.tree_map(jnp.asarray, host)
    except Exception:
        return None


def solve_modal_factorize(dev: dict, f_hat, gb, gt, tables=None):
    """p and dpdy per mode for p'' - kappa^2 p = f, p'(walls) = gb/gt.

    f_hat: (nkx, ny, nz) complex; gb/gt: (nkx, nz) complex Neumann values.
    Returns (p_hat, dpdy_hat). tables: optional precomputed build_tables
    result (recomputed on the fly when absent).
    """
    cd = f_hat.dtype
    kap = dev["kappa"][:, None, :].astype(cd)              # (nkx,1,nz)
    if tables is None:
        tables = build_tables(dev, cd)
    dmin = jax.lax.complex(tables["dmin_re"],
                           tables["dmin_im"]).astype(cd)
    dmax = jax.lax.complex(tables["dmax_re"],
                           tables["dmax_im"]).astype(cd)
    Vmin = jnp.asarray(dev["Vmin"], cd)
    Wmin = jnp.asarray(dev["Wmin"], cd)
    Vmax = jnp.asarray(dev["Vmax"], cd)
    Wmax = jnp.asarray(dev["Wmax"], cd)

    em_t = jnp.moveaxis(tables["em"], 0, 1).astype(cd)
    ep_t = jnp.moveaxis(tables["ep"], 0, 1).astype(cd)
    sp_t = jnp.moveaxis(tables["sp"], 0, 1).astype(cd)

    # stage 1: v0 with v(y0) = 0
    f1 = f_hat.at[:, 0, :].set(0.0)
    v0 = _solve(Vmin, Wmin, dmin, f1)
    # stage 2: p0 with p(yN) = 0
    v0b = v0.at[:, -1, :].set(0.0)
    p0 = _solve(Vmax, Wmax, dmax, v0b)

    # closure: [1 + k sp0, k ep0; em_N, k] [a b]^T = [gb - k p00, gt - v0N]
    k1 = kap[:, 0, :]
    sp0 = sp_t[:, 0, :]
    ep0 = ep_t[:, 0, :]
    em_N = em_t[:, -1, :]
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

    p = p0 + a[:, None, :] * sp_t + b[:, None, :] * ep_t
    v = v0 + a[:, None, :] * em_t
    dpdy = v + kap * p
    return p, dpdy


def poisson_factorize(dev: dict, f, bcs_b=None, bcs_t=None,
                      tables=None):
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
    p_hat, dpdy_hat = solve_modal_factorize(dev, f_hat, gb, gt,
                                            tables=tables)
    return bwd(p_hat).astype(f.dtype), bwd(dpdy_hat).astype(f.dtype)
