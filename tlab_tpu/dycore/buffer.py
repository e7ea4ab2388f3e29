"""Buffer/sponge zones: relaxation toward reference profiles near walls
(reference src/tools/dns/boundary_buffer.f90).

tau(y) = strength * ((y - y_edge)/width)^sigma on PointsJmin/PointsJmax
strips; the tendency gains  h -= tau(y) (q - q_ref(y))  before the pressure
projection (reference BOUNDARY_BUFFER_RELAX_FLOW called at
rhs_global_incompressible_1.f90:172).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BufferSpec:
    type: str = "none"           # none | relaxation | filter | both
    points_jmin: int = 0
    points_jmax: int = 0
    points_imin: int = 0         # streamwise strips (spatial mode)
    points_imax: int = 0
    strength: float = 1.0
    sigma: float = 2.0


def tau_profile(y: np.ndarray, spec: BufferSpec) -> np.ndarray:
    """(ny,) relaxation rate, zero outside the strips."""
    ny = y.shape[0]
    tau = np.zeros(ny)
    if spec.points_jmin > 1:
        n = spec.points_jmin
        width = y[n - 1] - y[0]
        xi = (y[n - 1] - y[:n]) / width
        tau[:n] = spec.strength * xi ** spec.sigma
    if spec.points_jmax > 1:
        n = spec.points_jmax
        width = y[-1] - y[-n]
        xi = (y[-n:] - y[-n]) / width
        tau[-n:] = spec.strength * xi ** spec.sigma
    return tau


def tau_profile_x(x: np.ndarray, spec: BufferSpec) -> np.ndarray:
    """(nx,) relaxation rate for the Imin/Imax strips (spatial mode)."""
    nx = x.shape[0]
    tau = np.zeros(nx)
    if spec.points_imin > 1:
        n = spec.points_imin
        width = x[n - 1] - x[0]
        xi = (x[n - 1] - x[:n]) / width
        tau[:n] = spec.strength * xi ** spec.sigma
    if spec.points_imax > 1:
        n = spec.points_imax
        width = x[-1] - x[-n]
        xi = (x[-n:] - x[-n]) / width
        tau[-n:] = spec.strength * xi ** spec.sigma
    return tau


def build_buffer(y: np.ndarray, spec: BufferSpec, ref_profiles: dict,
                 dtype=jnp.float64, x: np.ndarray = None,
                 ref_inflow: dict = None):
    """ref_profiles: name -> (ny,) plane-averaged reference (from the ICs).
    ref_inflow (spatial mode): name -> (ny,) inflow-plane profile targeted
    by the Imin/Imax strips."""
    has_j = spec.points_jmin > 1 or spec.points_jmax > 1
    has_i = x is not None and (spec.points_imin > 1 or spec.points_imax > 1)
    if spec.type == "none" or not (has_j or has_i):
        return None
    buf = {}
    if has_j:
        buf["tau"] = np.asarray(tau_profile(y, spec),
                                np.dtype(jnp.dtype(dtype)))[None, :, None]
        buf["refs"] = {k: jnp.asarray(v, dtype)[None, :, None]
                       for k, v in ref_profiles.items()}
    if has_i:
        buf["tau_x"] = np.asarray(tau_profile_x(x, spec),
                                  np.dtype(jnp.dtype(dtype)))[:, None, None]
        refs = ref_inflow if ref_inflow is not None else ref_profiles
        buf["refs_x"] = {k: jnp.asarray(v, dtype)[None, :, None]
                         for k, v in refs.items()}
    return buf


def localize(buf, comm):
    """Device-local view of the buffer tables inside shard_map: slice the
    x-profile tau_x to this device's x block and any x/z-extended
    reference planes to the local block (y is never sharded).  Makes the
    Imin/Imax strips and unsteady-inflow planes run on the pencil mesh
    (the reference applies its buffers on rank-local strips,
    boundary_buffer.f90)."""
    if buf is None or comm is None:
        return buf
    px = comm.get("px", 1)
    pz = comm.get("pz", 1)
    if px == 1 and pz == 1:
        return buf
    from jax import lax
    zero = jnp.zeros((), jnp.int32)
    ix = lax.axis_index("x") if px > 1 else zero
    iz = lax.axis_index("z") if pz > 1 else zero
    out = dict(buf)
    if "tau_x" in buf and px > 1:
        t = jnp.asarray(buf["tau_x"])
        nxl = t.shape[0] // px
        out["tau_x"] = lax.dynamic_slice(t, (ix * nxl, zero, zero),
                                         (nxl,) + t.shape[1:])
    if "refs_x" in buf:
        rx = {}
        for k, v in buf["refs_x"].items():
            v = jnp.asarray(v)
            if v.shape[0] > 1 and px > 1:
                nxl = v.shape[0] // px
                v = lax.dynamic_slice(v, (ix * nxl, zero, zero),
                                      (nxl,) + v.shape[1:])
            if v.shape[2] > 1 and pz > 1:
                nzl = v.shape[2] // pz
                v = lax.dynamic_slice(v, (zero, zero, iz * nzl),
                                      v.shape[:2] + (nzl,))
            rx[k] = v
        out["refs_x"] = rx
    return out


def relax(buf, name: str, q, h):
    """h -= tau (q - ref), over the active strips."""
    if buf is None:
        return h
    if "tau" in buf:
        ref = buf["refs"].get(name)
        if ref is not None:
            h = h - buf["tau"] * (q - ref)
    if "tau_x" in buf:
        ref = buf["refs_x"].get(name)
        if ref is not None:
            h = h - buf["tau_x"] * (q - ref)
    return h


# ---------------------------------------------------------------------------
# Filter-type sponge (reference BOUNDARY_BUFFER_FILTER,
# src/tools/dns/boundary_buffer.f90:627-760 -- stubbed DNS_ERROR_UNDEVELOP
# there; this is a working implementation of the blend its dead code
# describes: q := (1-amp) q + amp F(q), amp = (1+tanh(eta/2 delta))/2 with
# delta = L_buffer/16 centered mid-strip)
# ---------------------------------------------------------------------------

def filter_sponge_amp(x: np.ndarray, points_imin: int, points_imax: int,
                      dtype=jnp.float64):
    """(nx,1,1) blend amplitude over the Imin/Imax strips, zero elsewhere."""
    nx = x.shape[0]
    amp = np.zeros(nx)
    if points_imax > 1:
        i0 = nx - points_imax
        delta = (x[-1] - x[i0]) / 16.0
        eta = x[i0:] - 0.5 * (x[-1] + x[i0])
        amp[i0:] = 0.5 * (1.0 + np.tanh(0.5 * eta / delta))
    if points_imin > 1:
        i1 = points_imin - 1
        delta = (x[i1] - x[0]) / 16.0
        eta = x[: points_imin] - 0.5 * (x[0] + x[i1])
        amp[: points_imin] = np.maximum(
            amp[: points_imin], 0.5 * (1.0 - np.tanh(0.5 * eta / delta)))
    return jnp.asarray(amp, dtype)[:, None, None]


def apply_filter_sponge(amp, filt_mats, state):
    """Post-step blend toward the filtered state inside the strips."""
    from tlab_tpu.ops.filter import filter_state
    f = filter_state(filt_mats, state)

    def blend(q, qf):
        return (1.0 - amp) * q + amp * qf

    return type(state)(u=blend(state.u, f.u), v=blend(state.v, f.v),
                       w=blend(state.w, f.w), s=blend(state.s, f.s),
                       sfc=state.sfc)
