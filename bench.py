"""Headline benchmark: grid-points/s/chip per RK substep on the 3-D shear layer.

Prints ONE JSON line. Baseline: the reference's JUWELS strong-scaling table
(BASELINE.md) gives 0.49-0.8 M grid-points/s per 48-core CPU node per RK
substep (fp64, full physics-off shear layer, RK4-5). vs_baseline compares a
single TPU chip against 0.8 M pts/s/node (the reference's best per-node
figure, 1536^3 @ 8 nodes).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tlab_tpu.dycore import incompressible as dyn
    from tlab_tpu.dycore.state import State
    from tlab_tpu.fdm.plan import build_fdm_plan
    from tlab_tpu.grid import uniform_grid
    from tlab_tpu.physics.params import NSParams

    nx, ny, nz = 512, 256, 256
    dtype = jnp.float32
    n_sub = 5                                   # RK4, 5 substeps

    grid = uniform_grid(nx, ny, nz, 2.0 * np.pi, 1.0, np.pi)
    fdm = build_fdm_plan(grid)
    nsp = NSParams(reynolds=5000.0, schmidt=(1.0,))
    bcs = dyn.WallBCs.from_velocity_kind(
        "freeslip", "freeslip", scalar_bcs=(("neumann", "neumann"),))
    P = dyn.build_device_plans(fdm, nsp, bcs, dtype=dtype)
    # production projection: factorized formulation (round-off divergence
    # removal), as Simulation.from_case defaults
    from tlab_tpu.ops import elliptic_factorize as fac
    P["ell_fac"] = fac.device_factorize_plan(fac.build_factorize_plan(fdm),
                                             dtype)

    key = jax.random.PRNGKey(0)
    ku, kv, kw = jax.random.split(key, 3)
    y1d = jnp.asarray(grid.y.nodes, dtype)[None, :, None]
    prof = 0.5 * jnp.tanh(-0.5 * (y1d - 0.5) / 0.05)

    env = jnp.sin(jnp.pi * y1d).astype(dtype)   # wall-clean noise envelope

    def noise(k):
        return 0.01 * env * jax.random.normal(k, (nx, ny, nz), dtype)

    state = State(u=prof + noise(ku), v=noise(kv), w=noise(kw),
                  s=(0.5 - prof)[None] * jnp.ones((1, nx, ny, nz), dtype))

    n_steps = 5
    # precompute the factorize response tables ON DEVICE and feed them as a
    # traced argument (too large to bake into the graph as constants)
    tables = fac.materialize_tables(P["ell_fac"])   # None -> inline rebuild
    # time a single device dispatch with the steps inside a fori_loop so
    # host<->device link latency (axon tunnel) cannot pollute the timing
    aux_of = (lambda tb: {"fac_tables": tb}) if tables is not None \
        else (lambda tb: None)
    step_n = jax.jit(lambda st, tb: jax.lax.fori_loop(
        0, n_steps,
        lambda i, s: dyn.rk_step(P, s, 5e-4, aux=aux_of(tb))[0], st))
    state = step_n(state, tables)                # compile + warmup
    jax.block_until_ready(state)

    best = float("inf")
    out = state
    for _ in range(3):
        t0 = time.perf_counter()
        out = step_n(state, tables)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    # validity: a substep of this size cannot run faster than ~20 ms on one
    # v5e chip; when the axon tunnel is degraded, block_until_ready has
    # been observed to return without syncing (garbage timings), so an
    # implausible result is refused unless a real scalar fetch confirms it
    plausible = best / n_steps / n_sub >= 0.020
    if not plausible:
        try:
            float(jnp.sum(out.u))   # true device sync (D2H)
        except Exception:
            raise SystemExit(
                "bench: device sync unavailable (axon tunnel degraded); "
                "timing implausible, refusing to report")
    dt_wall = best / n_steps

    npts = nx * ny * nz
    pts_per_s_per_substep = npts / (dt_wall / n_sub)
    baseline = 0.8e6                             # pts/s/node/substep (ref best)
    print(json.dumps({
        "metric": "grid-points/s/chip per RK substep (512x256x256 shear layer, fp32, RK4-5)",
        "value": round(pts_per_s_per_substep, 1),
        "unit": "points/s/chip/substep",
        "vs_baseline": round(pts_per_s_per_substep / baseline, 3),
    }))


if __name__ == "__main__":
    main()
