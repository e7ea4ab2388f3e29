"""Offline post-processing over saved snapshots: averages.x / pdfs.x /
spectra.x / visuals.x equivalents (reference src/tools/statistics,
src/tools/plot).

Each function loops over a snapshot iteration list, reads the restart
fields, computes on device, and writes analysis files.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from tlab_tpu import mappings
from tlab_tpu.dycore.state import State
from tlab_tpu.io import fields_io
from tlab_tpu.runtime import Simulation
from tlab_tpu.stats import averages, pdfs, spectra


def load_snapshot(sim: Simulation, outdir: str, itime: int):
    """(State, rtime): PRIMITIVE fields for either solver family.

    Compressible restarts (flow.<it>.1-5 conservative fields, reference
    inb_flow=5) are converted to primitive velocities/scalars so every
    postprocessor below works on both; the thermodynamic fields are
    available via comp_fields()."""
    if getattr(sim, "comp", None) is not None:
        from tlab_tpu.dycore.compressible import primitive_view
        U, rtime = _load_comp(sim, outdir, itime)
        return primitive_view(U), rtime
    u, v, w, s, rtime, _ = fields_io.read_state(
        os.path.join(outdir, "flow"), os.path.join(outdir, "scal"),
        itime, sim.nsp.n_scalars)
    st = State(u=jnp.asarray(u, sim.dtype), v=jnp.asarray(v, sim.dtype),
               w=jnp.asarray(w, sim.dtype), s=jnp.asarray(s, sim.dtype))
    return st, rtime


def _load_comp(sim: Simulation, outdir: str, itime: int):
    from tlab_tpu.dycore.compressible import CompState
    U, rtime, _ = fields_io.read_comp_state(os.path.join(outdir, "flow"),
                                            itime)
    return CompState(*(jnp.asarray(a, sim.dtype) if a is not None else None
                       for a in U)), rtime


def comp_fields(sim: Simulation, U):
    """(rho, T, p [, ql]) primitive thermodynamics of a compressible
    restart (FI_DIAGNOSTIC: THERMO_CALORIC_TEMPERATURE +
    THERMO_THERMAL_PRESSURE)."""
    from tlab_tpu.dycore import compressible as comp_mod
    c = sim.comp
    if c.get("aw") is not None:
        u, v, w, T, p, ql, _ = comp_mod.primitive_airwater(U, c["aw"])
        return U.rho, T, p, ql
    prim = comp_mod.primitive(sim.P, U, c["gamma"], c["mach"],
                              mix=c.get("mixture")) \
        if c["energy"] == "total" else comp_mod.primitive_internal(
            sim.P, U, c["gamma"], c["mach"], mix=c.get("mixture"))
    return U.rho, prim[3], prim[4], None


def run_averages(sim: Simulation, outdir: str, iterations,
                 gate_scalar: int = 0, gate_level: float = 0.0) -> None:
    """Plane-averaged statistics tables; gate_scalar>0 additionally writes
    gate-conditioned statistics and the intermittency profile, gated on
    scalar #gate_scalar exceeding gate_level (reference averages.f90
    conditional analysis, igate/gate_level)."""
    if getattr(sim, "comp", None) is not None:
        # compressible branch: the dns-side Favre table writer consumes
        # the conservative state directly (avg_flow_xz.f90 compressible)
        from tlab_tpu.tools.dns import write_statistics_compressible
        for it in iterations:
            U, rtime = _load_comp(sim, outdir, it)
            write_statistics_compressible(sim, U, outdir, it, rtime)
        return
    for it in iterations:
        st, rtime = load_snapshot(sim, outdir, it)
        extras = averages.build_extras(sim, st)
        flow = averages.flow_statistics(sim.P, st, sim.nsp.visc,
                                        extras=extras)
        _wr = averages.avg_writer(sim.case)
        _wr(os.path.join(outdir, f"avg{it}"),
                           sim.grid.y.nodes, flow, averages.FLOW_GROUPS,
                           it, rtime)
        sgroups = averages.scal_groups(st.s.shape[0])
        for i in range(sim.nsp.n_scalars):
            sc = averages.scalar_statistics(sim.P, st,
                                            sim.nsp.diffusivity(i), i,
                                            visc=sim.nsp.visc,
                                            extras=extras)
            _wr(os.path.join(outdir, f"avg{it}s{i + 1}"),
                               sim.grid.y.nodes, sc, sgroups, it, rtime)
        if gate_scalar > 0:
            gate = st.s[gate_scalar - 1] > gate_level
            cond = averages.conditional_flow_statistics(sim.P, st, gate)
            averages.write_table(os.path.join(outdir, f"cavg{it}"),
                                 sim.grid.y.nodes, cond, it, rtime)
            gamma = averages.intermittency(gate)
            averages.write_table(
                os.path.join(outdir, f"int{it}"), sim.grid.y.nodes,
                {"gamma": gamma}, it, rtime)
        # [PostProcessing] ParamAverages analysis modes (reference
        # averages.f90:150-204: mode 1/2 are the tables above; 3-17 are
        # the specialised budgets/diagnostics in stats.analysis)
        ini = getattr(sim.case, "ini", None)
        pvec = ini.get_floats("PostProcessing", "ParamAverages", ()) \
            if ini is not None else ()
        mode = int(pvec[0]) if pvec else 0
        if mode >= 3:
            from tlab_tpu.stats import analysis
            tab = analysis.run_mode(sim.P, st, sim.nsp.visc, mode,
                                    diff=[sim.nsp.diffusivity(i)
                                          for i in
                                          range(sim.nsp.n_scalars)])
            # reference file names per mode (averages.f90:561-959)
            ref_names = {3: "avgMom", 4: "avgMain", 5: "avgW2",
                         6: "avgS2", 7: "avgG2", 8: "avgInv", 9: "avgGi",
                         10: "avgEig", 11: "avgCos", 12: "avgDer",
                         13: "avgFluxY", 14: "avgP", 15: "avgEps",
                         16: "avgSiCov", 17: "avgPV"}
            name = ref_names.get(mode, analysis.MODES[mode][0])
            averages.write_table(
                os.path.join(outdir, f"{name}{it}"),
                sim.grid.y.nodes, tab, it, rtime)


def _snapshot_fields(sim, st):
    comps = {"u": st.u, "v": st.v, "w": st.w}
    for i in range(sim.nsp.n_scalars):
        comps[f"s{i + 1}"] = st.s[i]
    return comps


def run_spectra(sim: Simulation, outdir: str, iterations,
                cross: bool = False, correlations: bool = False,
                y_blocks: int = 0) -> None:
    """xsp/zsp/rsp auto-spectra of u,v,w,s in the REFERENCE binary format
    (spectra.f90:730-787 + IO_Write_Subarray: float32 (nk, ny) files named
    xsp<it>.E<ab>, holding HALF the folded spectrum, as
    scripts/python/PlotSpectra.py consumes); cross=True adds pair
    cross-spectra with pow/pha decomposition; correlations=True writes
    xcr/zcr two-point correlations (xcr<it>.C<ab>); y_blocks>0 writes the
    2-D (kx,kz) spectral density averaged in y blocks (opt_block)."""
    from tlab_tpu.io import reference_formats as rf

    def tag(name):
        # reference tag_var: scalars are numbered (spectra.f90:473)
        return name[1:] if name.startswith("s") else name

    nx = sim.grid.x.size
    nz = sim.grid.z.size
    for it in iterations:
        st, _ = load_snapshot(sim, outdir, it)
        comps = _snapshot_fields(sim, st)
        for name, a in comps.items():
            t2 = tag(name) + tag(name)
            ex = np.asarray(spectra.spectrum_x(a))
            rf.write_spectrum_file(outdir, "xsp", it, "E" + t2,
                                   0.5 * ex[: nx // 2])
            if nz > 1:
                ez = np.asarray(spectra.spectrum_z(a))
                rf.write_spectrum_file(outdir, "zsp", it, "E" + t2,
                                       0.5 * ez[: nz // 2])
                er = np.asarray(spectra.radial_spectrum(
                    a, sim.grid.x.scale, sim.grid.z.scale))
                nk = min(nx // 2, nz // 2)
                out = np.zeros((nk, er.shape[1]), er.dtype)
                out[: min(nk, er.shape[0])] = er[: nk]
                rf.write_spectrum_file(outdir, "rsp", it, "E" + t2, 0.5 * out)
            if correlations:
                cx = np.asarray(spectra.correlation_x(a))
                rf.write_spectrum_file(outdir, "xcr", it, "C" + t2,
                                       cx[: nx // 2])
                if nz > 1:
                    cz = np.asarray(spectra.correlation_z(a))
                    rf.write_spectrum_file(outdir, "zcr", it, "C" + t2,
                                           cz[: nz // 2])
            if y_blocks > 0:
                e2 = spectra.spectrum_2d(a, y_blocks=y_blocks)
                np.savez(os.path.join(outdir, f"sp2d{it}.{name}.npz"),
                         e=np.asarray(e2), itime=it)
        if cross:
            names = list(comps)
            pairs = [("u", "v"), ("u", "w"), ("v", "w")] + \
                [("v", n) for n in names if n.startswith("s")]
            for na, nb in pairs:
                tp = tag(na) + tag(nb)
                ex = np.asarray(spectra.spectrum_x(comps[na], comps[nb]))
                rf.write_spectrum_file(outdir, "xsp", it, "E" + tp,
                                       0.5 * ex[: nx // 2])
                power, phase = spectra.cross_phase_x(comps[na], comps[nb])
                rf.write_spectrum_file(outdir, "pow", it, "E" + tp,
                                       np.asarray(power)[: nx // 2])
                rf.write_spectrum_file(outdir, "pha", it, "E" + tp,
                                       np.asarray(phase)[: nx // 2])
                if correlations:
                    cx = np.asarray(spectra.correlation_x(comps[na],
                                                          comps[nb]))
                    rf.write_spectrum_file(outdir, "xcr", it, "C" + tp,
                                           cx[: nx // 2])


def run_apriori(sim: Simulation, outdir: str, iterations) -> None:
    """apriori.x equivalent: [PostProcessing] ParamStructure = 1 (subgrid
    stress statistics, avgEps<it>-style table) or 2 (filtered velocity
    derivatives, gradU<it>) using the [Filter] domain filter as the test
    filter (apriori.f90:156-340)."""
    from tlab_tpu.tools import apriori as ap
    ini = getattr(sim.case, "ini", None)
    pvec = ini.get_floats("PostProcessing", "ParamStructure", (1,)) \
        if ini is not None else (1,)
    mode = int(pvec[0]) if pvec else 1
    mats = sim.filter_matrices()
    if mats is None:
        from tlab_tpu.ops.filter import FilterSpec, build_filter_matrices
        spec = getattr(sim.case, "filter", None)
        if spec is None or spec.type == "none":
            # default test filter when no [Filter] block is active
            # (the reference apriori.x requires one; we fall back to the
            # compact cutoff filter)
            spec = FilterSpec(type="compact", parameters=(0.49,),
                              active=(True, True, True), step=0)
        mats = build_filter_matrices(sim.fdm, spec, sim.dtype)
    dx = sim.grid.x.scale / max(sim.grid.x.size, 1)
    for it in iterations:
        st, rtime = load_snapshot(sim, outdir, it)
        if mode == 2:
            tab = ap.filtered_gradients(sim.P, mats, st)
            name = f"gradU{it}"
        else:
            # reference tau<it> table: plane profiles of the six subgrid
            # stresses tagged Tauxx..Tauyz (apriori.f90:248-295 AVG_N_XZ)
            tau, _ = ap.subgrid_stress(mats, st.u, st.v, st.w)
            from tlab_tpu.stats.averages import _pavg
            tab = {"Tau" + a + b: _pavg(tau[k]) for k, (a, b) in
                   (("uu", "xx"), ("vv", "yy"), ("ww", "zz"),
                    ("uv", "xy"), ("uw", "xz"), ("vw", "yz"))}
            averages.write_table(os.path.join(outdir, f"tau{it}"),
                                 sim.grid.y.nodes, tab, it, float(rtime))
            # extra diagnostics (Smagorinsky-coefficient study) kept in a
            # side table
            tab = ap.apriori_statistics(sim.P, mats, st, delta=2.0 * dx)
            name = f"sgs{it}"
        averages.write_table(os.path.join(outdir, name),
                             sim.grid.y.nodes, tab, it, float(rtime))


def run_pdfs(sim: Simulation, outdir: str, iterations, nbins=32) -> None:
    """pdfs.x equivalent: [PostProcessing] ParamPdfs = mode, block,
    gate_level, nbins1[, nbins2] (pdfs.f90:130-173); default mode 1
    (main variables).  Outputs in the reference pdf binary layout."""
    ini = getattr(sim.case, "ini", None)
    pvec = ini.get_floats("PostProcessing", "ParamPdfs", ()) \
        if ini is not None else ()
    opt_main = int(pvec[0]) if pvec else 1
    gate_level = float(pvec[2]) if len(pvec) > 2 else 0.0
    nb = (int(pvec[3]) if len(pvec) > 3 else nbins,
          int(pvec[4]) if len(pvec) > 4 else
          (int(pvec[3]) if len(pvec) > 3 else nbins))
    for it in iterations:
        st, rtime = load_snapshot(sim, outdir, it)
        pres = None
        if getattr(sim, "comp", None) is None:
            from tlab_tpu.dycore.pressure import pressure_boussinesq
            pres = pressure_boussinesq(sim.P, st)
        pdfs.run_pdf_mode(sim, st, pres, outdir, it, float(rtime),
                          opt_main=opt_main, nbins=nb,
                          gate_level=gate_level)


_VISUAL_FIELDS = ("VelocityX", "VelocityY", "VelocityZ", "Scalar1",
                  "Vorticity", "Enstrophy", "Strain", "InvariantQ",
                  "InvariantR", "Dilatation", "Dissipation", "ScalarGradient",
                  "VelocityMagnitude", "Pressure", "HorizontalDivergence",
                  "Buoyancy", "LogEnstrophy", "ScalarGradientVector",
                  "EnstrophyProduction", "EnstrophyDiffusion",
                  "StrainProduction", "StrainDiffusion", "StrainPressure",
                  "ScalarGradientProduction", "Tke", "LogDissipation",
                  "Radiation", "RelativeHumidity", "StressTensor",
                  "ReynoldsTensor", "Fvb", "bPrime", "Cvb",
                  "LogBuoyancySource", "ParticleDensity", "LaplacianV",
                  "LaplacianB", "GradientRi", "PressureGradientY",
                  "PressureGradientPower", "PressureStrainX",
                  "PressureStrainY", "PressureStrainZ",
                  "PressureHydrostatic", "PressureHydrodynamic",
                  "PressureTotal", "PressureAdvection",
                  "PressureAdvDiff", "PressureDiffusion",
                  "PressureCoriolis", "PressureBuoyancy",
                  "VelocityVector", "VorticityVector", "StrainTensor",
                  "LogPotentialEnstrophy", "Supsat", "EpsSolid",
                  "LogStrain", "H2Ov", "Air", "H2Ol", "Chi", "Psi",
                  "Liquid")


def subdomain_slices(sim):
    """[PostProcessing] Subdomain=i0,i1,j0,j1,k0,k1 (1-based inclusive,
    reference REDUCE_BLOCK_INPLACE consumption, visuals.f90:274-292);
    None when absent/incomplete."""
    ini = getattr(sim.case, "ini", None)
    vec = ini.get_floats("PostProcessing", "Subdomain", ()) \
        if ini is not None else ()
    if len(vec) < 6:
        return None
    i = [int(v) for v in vec[:6]]
    return (slice(i[0] - 1, i[1]), slice(i[2] - 1, i[3]),
            slice(i[4] - 1, i[5]))


def _get_ane(sim, box: dict):
    """Anelastic background, built once per tool invocation (the
    hydrostatic integration is iteration-independent)."""
    if "ane" not in box:
        from tlab_tpu import runtime as rt
        box["ane"] = rt.make_anelastic(sim.case, sim.grid, sim.dtype)
    return box["ane"]


def _visual_buoyancy(sim, st, box: dict):
    """b(s)/Froude as visuals.f90 evaluates it (741-747): the anelastic
    Thermo_Anelastic_BUOYANCY for Type=explicit, Gravity_Buoyancy with a
    zero reference otherwise, zeros when no [BodyForce] is active."""
    from tlab_tpu.physics.gravity import buoyancy_field
    props = getattr(sim.case, "buoyancy", None)
    froude = getattr(sim.nsp, "froude", 1.0) or 1.0
    if props is None or props.type == "none":
        return jnp.zeros_like(st.u)
    if props.type == "explicit":
        from tlab_tpu.physics import thermo as th
        ane = _get_ane(sim, box)
        return th.buoyancy_explicit(ane["tp"], st.s, ane["bg"]) / froude
    ref = jnp.zeros(sim.grid.y.nodes.shape[0])
    return buoyancy_field(props, st.s, ref) / froude


def _anelastic_liquid(sim, st, box: dict):
    """The diagnostic liquid slot s(:, inb_scal+1) for the anelastic
    mixtures: prognostic when Damkohler>0 (3-scalar non-equilibrium),
    else airwater equilibrium / the airwaterlinear closure."""
    from tlab_tpu.physics import thermo as th
    tcfg = getattr(sim.case, "thermo", {}) or {}
    mix = tcfg.get("mixture", "")
    if mix == "airwaterlinear" and tcfg.get("parameters"):
        return th.airwater_linear(tuple(tcfg["parameters"]), st.s)
    if st.s.shape[0] > 2:
        return st.s[2]
    ane = _get_ane(sim, box)
    return th.diagnostic_fields(ane["tp"], st.s[:2], ane["bg"])["ql"]


def run_visuals(sim: Simulation, outdir: str, iterations,
                which=("Enstrophy",)) -> None:
    """Derived-field extraction in single precision
    (reference visuals.f90, 20+ quantities; core subset here), optionally
    restricted to [PostProcessing] Subdomain."""
    from tlab_tpu.dycore import incompressible as dyn
    sub = subdomain_slices(sim)
    ane_box = {}
    is_comp = getattr(sim, "comp", None) is not None
    # [PostProcessing] Format: 'single' (default) = raw f32 no header,
    # as the reference's IO_WRITE_VISUALS FORMAT_SINGLE (what the xdmf/
    # python readers mmap); 'general' = restart stream format
    ini_fmt = getattr(sim.case, "ini", None)
    vfmt = "single"
    if ini_fmt is not None:
        fv = ini_fmt.get("PostProcessing", "Format", "single").lower()
        vfmt = "general" if fv in ("general", "0") else "single"
    for it in iterations:
        comp_f = None
        if is_comp:
            from tlab_tpu.dycore.compressible import primitive_view
            U, rtime = _load_comp(sim, outdir, it)
            rho_f, T_f, p_f, ql_f = comp_fields(sim, U)
            comp_f = {"Density": rho_f, "Temperature": T_f,
                      "Pressure": p_f}
            if ql_f is not None:
                comp_f["Liquid"] = ql_f
            st = primitive_view(U)
        else:
            st, rtime = load_snapshot(sim, outdir, it)
        P = sim.P
        for name in which:
            if comp_f is not None and name in comp_f:
                arr = np.asarray(comp_f[name])
                if sub is not None:
                    arr = arr[sub]
                fields_io.write_visual(
                        os.path.join(outdir, f"vis{it}.{name}"),
                        arr, it, (rtime,), fmt=vfmt)
                continue
            if name == "Enstrophy":
                fld = mappings.vorticity_magnitude2(P, st.u, st.v, st.w)
            elif name == "Strain":
                # the reference's Strain file is 2 s_ij s_ij
                # (visuals.f90:786)
                fld = 2.0 * mappings.strain2(P, st.u, st.v, st.w)
            elif name == "LogStrain":
                # iscal_offset+8: log10(2 s_ij s_ij + small)
                fld = jnp.log10(
                    2.0 * mappings.strain2(P, st.u, st.v, st.w) + 1e-30)
            elif name in ("InvariantQ", "InvariantR", "InvariantP"):
                ip, iq, ir = mappings.invariants(P, st.u, st.v, st.w)
                fld = {"InvariantP": ip, "InvariantQ": iq,
                       "InvariantR": ir}[name]
            elif name == "Dilatation":
                fld = dyn.divergence(P, st.u, st.v, st.w)
            elif name == "Dissipation":
                fld = mappings.dissipation(P, st.u, st.v, st.w, sim.nsp.visc)
            elif name == "ScalarGradient":
                fld = mappings.gradient_magnitude2(P, st.s[0])
            elif name == "VelocityMagnitude":
                fld = st.u ** 2 + st.v ** 2 + st.w ** 2
            elif name == "Pressure":
                # [PostProcessing] PressureDecomposition selects which
                # tendency pieces feed the diagnostic Poisson
                # (visuals.f90:136-149 DCMP_* menu)
                from tlab_tpu.dycore.pressure import pressure_boussinesq
                ini_v = getattr(sim.case, "ini", None)
                dcmp = ini_v.get("PostProcessing",
                                 "PressureDecomposition", "total").lower() \
                    if ini_v is not None else "total"
                fld = pressure_boussinesq(P, st, decomposition=dcmp)
            elif name == "HorizontalDivergence":
                fld = dyn._d1(P, "x", 0, st.u) + dyn._d1(P, "z", 2, st.w)
            elif name in ("Buoyancy", "Fvb", "bPrime", "Cvb",
                          "LogBuoyancySource"):
                # buoyancy-analysis family (visuals.f90 iscal_offset+12):
                # b/Froude, its vertical flux, fluctuation, b'v'
                # covariance, and the evaporative source magnitude
                from tlab_tpu.physics.gravity import buoyancy_source
                props = getattr(sim.case, "buoyancy", None)
                if props is None or props.type == "none":
                    raise ValueError(f"{name} visual needs [BodyForce]")
                froude = getattr(sim.nsp, "froude", 1.0) or 1.0
                b = _visual_buoyancy(sim, st, ane_box)
                if name == "Buoyancy":
                    fld = b
                elif name == "Fvb":
                    fld = b * st.v
                elif name == "bPrime":
                    fld = b - jnp.mean(b, axis=(0, 2))[None, :, None]
                elif name == "Cvb":
                    bp = b - jnp.mean(b, axis=(0, 2))[None, :, None]
                    vp = st.v - jnp.mean(st.v, axis=(0, 2))[None, :, None]
                    fld = bp * vp
                else:                      # LogBuoyancySource
                    tcfg = getattr(sim.case, "thermo", {}) or {}
                    if tcfg.get("mixture", "") == "airwaterlinear" \
                            and tcfg.get("parameters"):
                        from tlab_tpu.physics import thermo as th
                        xi, _d1f, d2f = th.airwater_linear_source(
                            tuple(tcfg["parameters"]), st.s)
                        g2 = mappings.gradient_magnitude2(P, xi)
                        cl = props.parameters[st.s.shape[0]] \
                            if len(props.parameters) > st.s.shape[0] \
                            else 0.0
                        src = g2 * d2f * cl
                    else:
                        g2 = mappings.gradient_magnitude2(P, st.s[0])
                        src = buoyancy_source(props, g2)
                    src = src * sim.nsp.visc / sim.case.schmidt[0] / froude
                    fld = jnp.log10(jnp.abs(src) + 1e-30)
            elif name == "LogEnstrophy":
                fld = jnp.log10(jnp.maximum(
                    mappings.vorticity_magnitude2(P, st.u, st.v, st.w),
                    1e-30))
            elif name == "ScalarGradientVector":
                for tag, ax, ai in (("x", "x", 0), ("y", "y", 1),
                                    ("z", "z", 2)):
                    arr = np.asarray(dyn._d1(P, ax, ai, st.s[0]))
                    if sub is not None:
                        arr = arr[sub]
                    fields_io.write_visual(
                        os.path.join(outdir, f"vis{it}.G{tag}"),
                        arr, it, (rtime,), fmt=vfmt)
                continue
            elif name == "Vorticity":
                ox, oy, oz = mappings.curl(P, st.u, st.v, st.w)
                for tag, comp in (("x", ox), ("y", oy), ("z", oz)):
                    arr = np.asarray(comp)
                    if sub is not None:
                        arr = arr[sub]
                    fields_io.write_visual(
                        os.path.join(outdir, f"vis{it}.W{tag}"),
                        arr, it, (rtime,), fmt=vfmt)
                continue
            elif name == "VelocityVector":
                # three-component file set (visuals.f90:495-498,
                # IO_WRITE_VISUALS nfield=3 -> per-component subarrays)
                for i, comp in enumerate((st.u, st.v, st.w), 1):
                    arr = np.asarray(comp)
                    if sub is not None:
                        arr = arr[sub]
                    fields_io.write_visual(
                        os.path.join(outdir, f"vis{it}.VelocityVector{i}"),
                        arr, it, (rtime,), fmt=vfmt)
                continue
            elif name == "VorticityVector":
                # FI_CURL components (visuals.f90:725-727)
                for i, comp in enumerate(
                        mappings.curl(P, st.u, st.v, st.w), 1):
                    arr = np.asarray(comp)
                    if sub is not None:
                        arr = arr[sub]
                    fields_io.write_visual(
                        os.path.join(outdir, f"vis{it}.VorticityVector{i}"),
                        arr, it, (rtime,), fmt=vfmt)
                continue
            elif name == "StrainTensor":
                # FI_STRAIN_TENSOR order Sxx,Syy,Szz,Sxy,Sxz,Syz
                # (fi_strain.f90:29-63; visuals.f90:776-779)
                g = mappings.velocity_gradient(P, st.u, st.v, st.w)
                comps = (g["ux"], g["vy"], g["wz"],
                         0.5 * (g["uy"] + g["vx"]),
                         0.5 * (g["uz"] + g["wx"]),
                         0.5 * (g["vz"] + g["wy"]))
                for i, comp in enumerate(comps, 1):
                    arr = np.asarray(comp)
                    if sub is not None:
                        arr = arr[sub]
                    fields_io.write_visual(
                        os.path.join(outdir, f"vis{it}.StrainTensor{i}"),
                        arr, it, (rtime,), fmt=vfmt)
                continue
            elif name == "LogPotentialEnstrophy":
                # log10((omega . grad b)^2) with b the buoyancy/Froude;
                # the reference computes it for whatever buoyancy is
                # active, zeros included (visuals.f90:739-755)
                b = _visual_buoyancy(sim, st, ane_box)
                gb = (dyn._d1(P, "x", 0, b), dyn._d1(P, "y", 1, b),
                      dyn._d1(P, "z", 2, b))
                om = mappings.curl(P, st.u, st.v, st.w)
                pe = gb[0] * om[0] + gb[1] * om[1] + gb[2] * om[2]
                fld = jnp.log10(pe * pe + 1e-30)
            elif name == "Supsat":
                # supersaturated liquid (s_ql - ql_eq)/s_ql(1)
                # (visuals.f90:527-533; needs the non-equilibrium
                # airwater 3-scalar state, damkohler(1) > 0)
                if st.s.shape[0] < 3:
                    raise ValueError("Supsat needs the non-equilibrium "
                                     "airwater state (3 scalars)")
                from tlab_tpu.physics import thermo as th
                ane = _get_ane(sim, ane_box)
                diag = th.diagnostic_fields(ane["tp"], st.s[:2],
                                            ane["bg"])
                ql_eq = diag["ql"]
                norm = np.asarray(st.s[2]).reshape(-1)[0]
                fld = (st.s[2] - ql_eq) / norm
            elif name == "EpsSolid":
                # IBM solid mask (visuals.f90:1035-1039)
                ib = P.get("ibm")
                if not ib:
                    raise ValueError("EpsSolid visual needs [IBMParameter]")
                fld = jnp.asarray(ib["eps"])
            elif name == "EnstrophyProduction":
                fld = mappings.vorticity_production(P, st.u, st.v, st.w)
            elif name == "EnstrophyDiffusion":
                fld = sim.nsp.visc * mappings.vorticity_diffusion(
                    P, st.u, st.v, st.w)
            elif name == "StrainProduction":
                fld = 2.0 * mappings.strain_production(P, st.u, st.v, st.w)
            elif name == "StrainDiffusion":
                fld = 2.0 * sim.nsp.visc * mappings.strain_diffusion(
                    P, st.u, st.v, st.w)
            elif name == "StrainPressure":
                from tlab_tpu.dycore.pressure import pressure_boussinesq
                fld = 2.0 * mappings.strain_pressure(
                    P, st.u, st.v, st.w, pressure_boussinesq(P, st))
            elif name == "ScalarGradientProduction":
                fld = mappings.gradient_production(P, st.s[0], st.u,
                                                   st.v, st.w)
            elif name == "Tke":
                # fluctuation TKE about the (x,z)-plane means
                parts = []
                for comp in (st.u, st.v, st.w):
                    m = jnp.mean(comp, axis=(0, 2))[None, :, None]
                    parts.append((comp - m) ** 2)
                fld = 0.5 * (parts[0] + parts[1] + parts[2])
            elif name == "LogDissipation":
                fld = jnp.log10(jnp.maximum(
                    mappings.dissipation(P, st.u, st.v, st.w,
                                         sim.nsp.visc), 1e-30))
            elif name == "Radiation":
                bf = sim.P.get("bodyforce")
                ir = getattr(bf, "ir_field", None)
                if ir is None:
                    raise ValueError("Radiation visual needs an active "
                                     "[Infrared] term")
                fld = ir(st)
            elif name == "RelativeHumidity":
                # RH% = pv/psat with pv = p qv Rv/Rmix, the same formula
                # as the avg Stratification group (averages.py)
                from tlab_tpu.physics import thermo as th
                ane = _get_ane(sim, ane_box)
                tp = ane["tp"]
                diag = th.diagnostic_fields(tp, st.s, ane["bg"])
                T3, ql3 = diag["T"], diag["ql"]
                qt = st.s[1] if st.s.shape[0] > 1 else st.s[0]
                qv = qt - ql3
                p3 = jnp.asarray(ane["bg"]["p"])[None, :, None]
                Rmix = th.mixture_R(tp, qt, ql3)
                pv3 = p3 * qv * tp.Rv / Rmix
                fld = pv3 / tp.psat(T3) * 100.0
            elif name == "StressTensor":
                # 2 visc S_ij - p delta_ij, six components
                # (visuals.f90 Total stress tensor)
                from tlab_tpu.dycore.pressure import pressure_boussinesq
                g = mappings.velocity_gradient(P, st.u, st.v, st.w)
                pfield = pressure_boussinesq(P, st)
                visc_ = sim.nsp.visc
                comps = {
                    "xx": 2 * visc_ * g["ux"] - pfield,
                    "yy": 2 * visc_ * g["vy"] - pfield,
                    "zz": 2 * visc_ * g["wz"] - pfield,
                    "xy": visc_ * (g["uy"] + g["vx"]),
                    "xz": visc_ * (g["uz"] + g["wx"]),
                    "yz": visc_ * (g["vz"] + g["wy"])}
                for tag, comp in comps.items():
                    arr = np.asarray(comp)
                    if sub is not None:
                        arr = arr[sub]
                    fields_io.write_visual(
                        os.path.join(outdir, f"vis{it}.StressTensor{tag}"),
                        arr, it, (rtime,), fmt=vfmt)
                continue
            elif name == "ReynoldsTensor":
                # u_i' u_j' about the plane means
                flucts = {}
                for tag, comp in (("u", st.u), ("v", st.v), ("w", st.w)):
                    m = jnp.mean(comp, axis=(0, 2))[None, :, None]
                    flucts[tag] = comp - m
                for ta, tb in (("u", "u"), ("v", "v"), ("w", "w"),
                               ("u", "v"), ("u", "w"), ("v", "w")):
                    arr = np.asarray(flucts[ta] * flucts[tb])
                    if sub is not None:
                        arr = arr[sub]
                    fields_io.write_visual(
                        os.path.join(outdir,
                                     f"vis{it}.ReynoldsTensor{ta}{tb}"),
                        arr, it, (rtime,), fmt=vfmt)
                continue
            elif name == "PressureGradientPower":
                from tlab_tpu.dycore.pressure import pressure_boussinesq
                pf = pressure_boussinesq(P, st)
                fld = -(dyn._d1(P, "x", 0, pf) * st.u
                        + dyn._d1(P, "y", 1, pf) * st.v
                        + dyn._d1(P, "z", 2, pf) * st.w)
            elif name in ("PressureStrainX", "PressureStrainY",
                          "PressureStrainZ"):
                from tlab_tpu.dycore.pressure import pressure_boussinesq
                pf = pressure_boussinesq(P, st)
                pp = pf - jnp.mean(pf, axis=(0, 2))[None, :, None]
                comp, ax_name, ax = {
                    "PressureStrainX": (st.u, "x", 0),
                    "PressureStrainY": (st.v, "y", 1),
                    "PressureStrainZ": (st.w, "z", 2)}[name]
                cp = comp - jnp.mean(comp, axis=(0, 2))[None, :, None]
                fld = pp * dyn._d1(P, ax_name, ax, cp)
            elif name in ("PressureHydrostatic", "PressureHydrodynamic"):
                from tlab_tpu.dycore.pressure import pressure_boussinesq
                zero = jnp.zeros_like(st.u)
                p_sta = pressure_boussinesq(
                    P, st._replace(u=zero, v=zero, w=zero))
                if name == "PressureHydrostatic":
                    fld = p_sta
                else:
                    fld = pressure_boussinesq(P, st) - p_sta
            elif name.startswith("Pressure") and name[8:] in (
                    "Total", "Advection", "AdvDiff", "Diffusion",
                    "Coriolis", "Buoyancy"):
                from tlab_tpu.dycore.pressure import pressure_boussinesq
                fld = pressure_boussinesq(P, st,
                                          decomposition=name[8:].lower())
            elif name == "LaplacianV":
                fld = mappings.laplacian(P, st.v)
            elif name in ("LaplacianB", "GradientRi"):
                props = getattr(sim.case, "buoyancy", None)
                if props is None or props.type == "none":
                    raise ValueError(f"{name} visual needs [BodyForce]")
                b = _visual_buoyancy(sim, st, ane_box)
                if name == "LaplacianB":
                    fld = mappings.laplacian(P, b)
                else:
                    # gradient Richardson proxy |db/dy| / (du/dy)^2
                    # (visuals.f90 iscal_offset+19)
                    dbdy = dyn._d1(P, "y", 1, b)
                    dudy = dyn._d1(P, "y", 1, st.u)
                    fld = jnp.abs(dbdy) / (dudy ** 2 + 1e-30)
            elif name == "PressureGradientY":
                from tlab_tpu.dycore.pressure import pressure_boussinesq
                fld = dyn._d1(P, "y", 1, pressure_boussinesq(P, st))
            elif name == "ParticleDensity":
                # scatter unit weights from the part.<it> restart
                # (visuals.f90 iscal_offset+18, PARTICLE_TO_FIELD)
                from tlab_tpu.particles.io import read_particles
                from tlab_tpu.particles.core import (make_locator,
                                                     particles_to_field)
                ps, _pit = read_particles(
                    os.path.join(outdir, f"part.{it}"))
                loc = make_locator(sim.grid)(jnp.asarray(ps.x))
                fld = particles_to_field(
                    jnp.ones(ps.x.shape[0]), loc, sim.grid.shape)
            elif name in ("H2Ov", "Air", "H2Ol", "Liquid", "Chi", "Psi"):
                # mixture species mass fractions (visuals.f90:649-668):
                # airwater H2Ov = qt - ql, Air = 1 - qt, H2Ol = the
                # liquid slot; airwaterlinear Chi/Psi are the mixing
                # scalars and Liquid the diagnostic closure
                tcfg_v = getattr(sim.case, "thermo", {}) or {}
                mixv = tcfg_v.get("mixture", "")
                if name == "Chi":
                    fld = st.s[0]
                elif name == "Psi":
                    fld = st.s[1]
                else:
                    if comp_f is not None:
                        qt = st.s[0] if st.s.shape[0] \
                            else jnp.zeros_like(st.u)
                        ql = jnp.asarray(comp_f["Liquid"]) \
                            if "Liquid" in comp_f else jnp.zeros_like(qt)
                    else:
                        qt = st.s[1] if st.s.shape[0] > 1 else st.s[0]
                        ql = jnp.zeros_like(qt) if mixv == "airvapor" \
                            else _anelastic_liquid(sim, st, ane_box)
                    fld = {"H2Ov": qt - ql,
                           "Air": 1.0 - qt}.get(name, ql)
            elif name.startswith("Velocity"):
                fld = {"VelocityX": st.u, "VelocityY": st.v,
                       "VelocityZ": st.w}[name]
            elif name.startswith("Scalar"):
                fld = st.s[int(name[6:]) - 1]
            else:
                raise ValueError(name)
            arr = np.asarray(fld)
            if sub is not None:
                arr = arr[sub]
            fields_io.write_visual(
                        os.path.join(outdir, f"vis{it}.{name}"),
                        arr, it, (rtime,), fmt=vfmt)


def run_superlayer(sim: Simulation, outdir: str, iterations,
                   indicator: str = "vorticity", threshold: float = 0.01,
                   samples=("Enstrophy",), nbins: int = 64) -> None:
    """Superlayer extraction (reference sl_boundary.f90 + sl_normal/pdf
    tools): upper/lower interface heights of `indicator` (vorticity |
    scalargradient) at threshold*global-max, surface statistics, height
    PDFs, and fields sampled on both surfaces; written to sl{it}.npz."""
    from tlab_tpu.stats import superlayer as sl
    y = sim.grid.y.nodes
    for it in iterations:
        st, _ = load_snapshot(sim, outdir, it)
        if indicator == "vorticity":
            a = mappings.vorticity_magnitude2(sim.P, st.u, st.v, st.w)
        elif indicator == "scalargradient":
            a = mappings.gradient_magnitude2(sim.P, st.s[0])
        else:
            raise ValueError(indicator)
        amin = threshold * float(jnp.max(a))
        y_up = sl.upper_boundary(y, a, amin)
        y_lo = sl.lower_boundary(y, a, amin)
        out = {"y_upper": np.asarray(y_up), "y_lower": np.asarray(y_lo),
               "threshold": amin, "itime": it}
        for tag, ysl in (("up", y_up), ("lo", y_lo)):
            stats = sl.surface_statistics(ysl)
            for k, v in stats.items():
                out[f"{tag}_{k}"] = float(v)
            counts, edges = sl.height_pdf(ysl, nbins=nbins)
            out[f"{tag}_pdf"] = counts
            out[f"{tag}_pdf_edges"] = edges
            for name in samples:
                if name == "Enstrophy":
                    fld = a if indicator == "vorticity" else \
                        mappings.vorticity_magnitude2(sim.P, st.u, st.v, st.w)
                elif name.startswith("Scalar"):
                    fld = st.s[int(name[6:]) - 1]
                else:
                    fld = {"VelocityX": st.u, "VelocityY": st.v,
                           "VelocityZ": st.w}[name]
                out[f"{tag}_{name}"] = np.asarray(
                    sl.sample_at_surface(fld, y, ysl))[0]
                # samples along the LOCAL interface normal (reference
                # sl_normal_sample.f90): 3 distances into the outer side
                dists = (0.0, 0.05 * sim.grid.y.scale,
                         0.10 * sim.grid.y.scale)
                side = "upper" if tag == "up" else "lower"
                out[f"{tag}_{name}_normal"] = np.asarray(
                    sl.sample_along_normals(sim.grid, fld, ysl, dists,
                                            side=side))
                out[f"{tag}_normal_dists"] = np.asarray(dists)
        np.savez(os.path.join(outdir, f"sl{it}.npz"), **out)
