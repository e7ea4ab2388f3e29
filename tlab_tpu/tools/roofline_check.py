"""Memory-roofline evidence for the dense RK step (VERDICT r4 #1).

AOT-compiles the single-chip production RK step for a v5e target (no TPU
hardware needed -- CPU backend against a TopologyDescription, the same
trick as overlap_check) and reports the XLA-counted memory traffic:

- total bytes accessed per RK substep and per grid point (the bytes
  side of the roofline; bench.py divides by the measured substep time
  for achieved HBM GB/s vs the v5e peak);
- the per-op-kind breakdown (dot operand/result traffic vs explicit
  relayout copies/transposes vs fusion traffic) so the avoidable share
  is visible, not guessed.

The reference states a checkable communication cost model
(doc/scaling.tex:30-74); this is the single-chip memory analog.

Run:  python -m tlab_tpu.tools.roofline_check [nx ny nz]
"""
from __future__ import annotations

import re
import sys

_DT_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
             "c64": 8, "c128": 16, "s32": 4, "u32": 4, "s64": 8,
             "u64": 8, "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2}


def _shape_bytes(shape_str: str) -> int:
    """bytes of one HLO shape literal like f32[512,256,256]{2,1,0}."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt = _DT_BYTES.get(m.group(1), 4)
    dims = m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * dt


def _split_computations(hlo: str) -> dict:
    """name -> list of instruction lines, per HLO computation."""
    comps = {}
    cur = None
    for line in hlo.split("\n"):
        m = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s*->.*\{\s*$",
                     line)
        if m:
            cur = m.group(1)
            comps[cur] = []
            if line.startswith("ENTRY"):
                comps["__entry__"] = comps[cur]
            continue
        if cur is not None:
            if line.startswith("}"):
                cur = None
            else:
                comps[cur].append(line)
    return comps


def analyze_hlo(hlo: str):
    """Aggregate result bytes by op kind over the SCHEDULED computations
    only (entry + while bodies/conditions, transitively) -- fusion
    sub-computations are folded into their fusion op's result, so this
    approximates per-op HBM write traffic.  Returns (agg, top_ops)."""
    comps = _split_computations(hlo)
    sched = set()
    work = ["__entry__"]
    while work:
        name = work.pop()
        if name in sched or name not in comps:
            continue
        sched.add(name)
        for line in comps[name]:
            for m in re.finditer(r"(?:body|condition|branch_computations)="
                                 r"\{?%?([\w.\-]+)", line):
                work.append(m.group(1))
    pat = re.compile(r"=\s+((?:\w+\[[\d,]*\](?:\{[^}]*\})?|\([^)]*\)))\s+"
                     r"([\w\-]+)\(")
    meta_pat = re.compile(r'op_name="([^"]*)"')
    agg = {}
    top = []
    for name in sched:
        for line in comps[name]:
            m = pat.search(line)
            if not m:
                continue
            shape, op = m.group(1), m.group(2)
            if op in ("parameter", "constant", "get-tuple-element",
                      "bitcast", "tuple"):
                continue                       # not HBM writes
            if shape.startswith("("):
                b = sum(_shape_bytes(s)
                        for s in re.findall(r"\w+\[[\d,]*\]", shape))
            else:
                b = _shape_bytes(shape)
            d = agg.setdefault(op, [0, 0])
            d[0] += 1
            d[1] += b
            mm = meta_pat.search(line)
            top.append((b, op, mm.group(1) if mm else ""))
    top.sort(key=lambda t: -t[0])
    return agg, top


def main(nx=512, ny=256, nz=256, topo_name="v5e:2x2x1"):
    # smallest valid v5e topology is 2x2x1 (chips_per_host_bounds);
    # the step itself is compiled single-device on its first chip
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import topologies
    from tlab_tpu.dycore import incompressible as dyn
    from tlab_tpu.dycore.state import State
    from tlab_tpu.fdm.plan import build_fdm_plan
    from tlab_tpu.grid import uniform_grid
    from tlab_tpu.ops import elliptic_factorize as fac
    from tlab_tpu.physics.params import NSParams

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topo_name)
    dev = np.array(topo.devices).ravel()[0]

    grid = uniform_grid(nx, ny, nz, 2.0 * np.pi, 1.0, np.pi)
    fdm = build_fdm_plan(grid)
    nsp = NSParams(reynolds=5000.0, schmidt=(1.0,))
    bcs = dyn.WallBCs.from_velocity_kind(
        "freeslip", "freeslip", scalar_bcs=(("neumann", "neumann"),))
    P = dyn.build_device_plans(fdm, nsp, bcs, dtype=jnp.float32)
    P["ell_fac"] = fac.device_factorize_plan(fac.build_factorize_plan(fdm),
                                             jnp.float32)

    st = jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32)
    state = State(u=st, v=st, w=st,
                  s=jax.ShapeDtypeStruct((1, nx, ny, nz), jnp.float32))
    tables = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        fac.materialize_tables(P["ell_fac"]))

    def step(state, tb):
        return dyn.rk_step(P, state, 5e-4, aux={"fac_tables": tb})[0]

    from jax.sharding import SingleDeviceSharding
    sh = SingleDeviceSharding(dev)
    comp = (jax.jit(step)
            .trace(jax.tree.map(lambda s: jax.ShapeDtypeStruct(
                s.shape, s.dtype, sharding=sh), state),
                jax.tree.map(lambda s: jax.ShapeDtypeStruct(
                    s.shape, s.dtype, sharding=sh), tables))
            .lower()
            .compile())

    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    npts = nx * ny * nz
    flops = ca.get("flops", 0.0)
    byt = ca.get("bytes accessed", 0.0)
    # rk_step runs its substeps through ONE lax.scan body: the XLA cost
    # model counts the while body once, so the totals ARE per-substep
    # (cross-checked: flops/pt here ~29.5k matches bench.py's analytic
    # matmul model ~28k, and bytes/substep-time matches the achieved
    # TFLOP/s bench.py measures)
    print(f"grid {nx}x{ny}x{nz} (substep-body counted once by the "
          f"cost model)")
    print(f"XLA cost model, per RK substep: flops={flops:.4g}  "
          f"bytes accessed={byt:.4g}")
    print(f"-> {flops/npts:.0f} flops/pt/substep, "
          f"{byt/npts:.0f} bytes/pt/substep "
          f"({byt/npts/4:.0f} f32 field-passes)")

    hlo = comp.as_text()
    agg, top = analyze_hlo(hlo)
    total = sum(v[1] for v in agg.values())
    print(f"\nHLO result-bytes by op kind (scheduled computations only; "
          f"~HBM writes, total {total:.4g} B/substep = "
          f"{total/npts:.0f} B/pt):")
    for op, (cnt, b) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        if b > 0.005 * total:
            print(f"  {op:24s} n={cnt:4d}  {b:.4g} B "
                  f"({100*b/total:.1f}%)")
    print("\nTop individual ops by result bytes:")
    for b, op, meta in top[:30]:
        print(f"  {b/1e6:8.0f} MB  {op:16s} {meta[:110]}")
    return ca


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
