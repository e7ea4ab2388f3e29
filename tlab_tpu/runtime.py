"""Simulation context: assembles grid, plans, and device operators from a
CaseSetup (the library-level equivalent of the reference's initialization
prefix shared by dns.x and every pre/post-processing tool,
cf. dns_main.f90:69-139).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from tlab_tpu.config import CaseSetup, load_case
from tlab_tpu.constants import BC
from tlab_tpu.dycore import incompressible as dyn
from tlab_tpu.dycore.state import State
from tlab_tpu.dycore.timemarch import get_scheme
from tlab_tpu.fdm.plan import FdmPlan, build_fdm_plan
from tlab_tpu.grid import Grid, build_axis_from_segments
from tlab_tpu.ops import elliptic
from tlab_tpu.physics.params import NSParams


def make_anelastic(case: CaseSetup, grid: Grid, dtype):
    """Anelastic background state: hydrostatic profiles from the scalar mean
    profiles (reference TLab_Initialize_Background + Thermo_Anelastic)."""
    from tlab_tpu.physics import thermo

    tcfg = getattr(case, "thermo", {}) or {}
    mixture = tcfg.get("mixture", "airwater")
    if mixture in ("none", ""):
        mixture = "airwater" if len(case.scal_profiles) >= 2 else "air"
    sh = tcfg.get("scale_height", 0.0)
    tp = thermo.ThermoParams(mixture=mixture,
                             scale_height_inv=(1.0 / sh if sh > 0 else 0.0),
                             dsmooth=tcfg.get("smooth", 0.0),
                             thermo_param=tuple(tcfg.get("parameters", ())),
                             nondimensional=tcfg.get("nondimensional", True))
    y = grid.y.nodes
    h_prof = case.scal_profiles[0](y) if case.scal_profiles else np.ones_like(y)
    qt_prof = case.scal_profiles[1](y) if len(case.scal_profiles) > 1 \
        else np.zeros_like(y)
    # pressure anchor [Flow] Pressure / YMean(Relative)Pressure (reference
    # pbg read in TLab_Initialize_Background, tlab_background.f90:86-92)
    ini = getattr(case, "ini", None)
    p_ref, y_ref = 1.0, None
    if ini is not None:
        p_ref = ini.get_float("Flow", "Pressure", 1.0)
        ymean_abs = ini.get("Flow", "YMeanPressure", "")
        rel = ini.get("Flow", "YMeanRelativePressure", "")
        if ymean_abs:
            y_ref = float(ymean_abs)
        elif rel:
            y_ref = float(y[0]) + (float(y[-1]) - float(y[0])) * float(rel)
    # compact cumulative integral for the hydrostatic solve (the
    # reference integrates with FDM_Int1; trapezoid only as fallback)
    try:
        from tlab_tpu.fdm.plan import build_deriv_plan
        d1y = build_deriv_plan(grid.y, case.space_order1,
                               case.space_order2).d1[0]
    except Exception:
        d1y = None
    bg = thermo.hydrostatic_background(tp, y, h_prof, qt_prof,
                                       p_ref=p_ref, y_ref=y_ref, d1y=d1y)
    ntp = np.dtype(jnp.dtype(dtype))
    dev_bg = {k: np.asarray(v, ntp) for k, v in bg.items()}
    return {"tp": tp, "bg": dev_bg,
            "rho": np.asarray(bg["rho"], ntp),
            "rho_inv": np.asarray(bg["rho_inv"], ntp)}


def make_sources(case: CaseSetup, grid: Grid, dtype, anelastic=None):
    """Momentum source-term hook (buoyancy + Coriolis), the equivalent of the
    reference's TLab_Sources_Flow dispatcher (src/physics/tlab_sources.f90).
    Returns None when no source is active (keeps the RHS free of dead ops).
    """
    from tlab_tpu.physics import gravity as grav
    from tlab_tpu.physics import rotation as rot

    from tlab_tpu.physics import radiation as radmod
    from tlab_tpu.physics import microphysics as micmod
    from tlab_tpu.physics import chemistry as chemmod

    buo = getattr(case, "buoyancy", None)
    cor = getattr(case, "coriolis", None)
    buo_on = buo is not None and buo.type != "none" and any(buo.active)
    cor_on = cor is not None and cor.type != "none"
    explicit = buo_on and buo.type == "explicit" and anelastic is not None

    ini = case.ini
    # reference [Infrared] layout (radiation.f90:117-163):
    # BoundaryConditions = per-band downward top fluxes, LAST value is the
    # surface emissivity; AbsorptionComponent<c> = per-band kappas of the
    # c-th radiatively active component (1 liquid, 2 vapor, 3 constant);
    # BetaCoefficient<ic> = the ic-th polynomial coefficient across bands
    # 1..nbands-1 (coefficient-major; last band derived from sum beta = 1)
    rad_bcs = ini.get_floats("Infrared", "BoundaryConditions", ())
    rad_comps = []
    _c = 1
    while True:
        row = ini.get_floats("Infrared", f"AbsorptionComponent{_c}", ())
        if not row:
            break
        rad_comps.append(row)
        _c += 1
    rad_beta_rows = [ini.get_floats("Infrared", f"BetaCoefficient{i}", ())
                     for i in (1, 2, 3)]
    nbands, eps_sfc, bcs_top, kappa_table, beta_table = \
        radmod.derive_band_tables(rad_bcs or (1.0, 1.0), rad_comps,
                                  rad_beta_rows)
    ref_layout = bool(rad_bcs) or bool(rad_comps)
    # legacy scalar keys honoured when the reference keys are absent
    kap_l = kappa_table[0][0] if rad_comps else \
        ini.get_float("Infrared", "Kappa", 1.0)
    kap_v = kappa_table[1][0] if len(rad_comps) > 1 else \
        ini.get_float("Infrared", "KappaVapor", 0.0)
    kap_g = kappa_table[2][0] if len(rad_comps) > 2 else \
        ini.get_float("Infrared", "KappaGas", 0.0)
    rad = radmod.RadiationProps(
        type=ini.get("Infrared", "Type",
                     ini.get("Radiation", "Type", "none")).lower(),
        scalar=ini.get_int("Infrared", "Scalar", 1) - 1,
        kappa=kap_l, kappa_v=kap_v, kappa_g=kap_g,
        beta=ini.get_float("Infrared", "Beta", 1.0),
        emissivity=eps_sfc if ref_layout else
        ini.get_float("Infrared", "Emissivity", 1.0),
        flux_top=bcs_top[0] if rad_bcs else
        ini.get_float("Infrared", "FluxTop", 1.0),
        # grayliquid reads the SECOND BoundaryConditions value as the
        # upward bottom flux (radiation.f90:277-278, auxiliar(2))
        flux_bottom=rad_bcs[1] if len(rad_bcs) > 1 else
        ini.get_float("Infrared", "FluxBottom", 0.0),
        nbands=nbands, kappa_table=kappa_table, beta_table=beta_table,
        bcs_top=bcs_top)
    if rad.type == "bulk1dlocal":
        # backwards-compatible Bulk1dLocal -> grayliquid conversion
        # (radiation.f90:186-199): Parameters=(F0, delta[, Fb]) with
        # kappa = 1/delta, flux_top = F0*delta, flux_bottom = Fb*delta
        import dataclasses as _dc
        par = ini.get_floats("Infrared", "Parameters", (0.0, 1.0))
        par = tuple(par) + (0.0,) * (3 - len(par))
        rad = _dc.replace(rad, type="grayliquid",
                          kappa=1.0 / par[1],
                          flux_top=par[0] * par[1],
                          flux_bottom=par[2] * par[1])
    settling = ini.get_float("Parameters", "Settling", 0.0)
    mic_pars = ini.get_floats("Sedimentation", "Parameters", (1.0,))
    mic = micmod.MicrophysicsProps(
        type=ini.get("Sedimentation", "Type",
                     ini.get("Microphysics", "Type", "none")).lower(),
        # settling folded into the per-scalar parameters at read time
        # (microphysics.f90:96-101)
        parameters=tuple(p * settling for p in mic_pars),
        exponent=ini.get_float("Sedimentation", "Exponent", 0.0))
    from tlab_tpu.physics import forcing as forcmod
    sub = forcmod.SubsidenceProps(
        type=ini.get("Subsidence", "Type",
                     ini.get("Main", "TermSubsidence", "none")).lower(),
        divergence=(ini.get_floats("Subsidence", "Parameters", (0.0,))
                    or (0.0,))[0])
    sub_on = sub.type not in ("none", "") and sub.divergence != 0.0

    da_list = ini.get_floats("Parameters", "Damkohler", (1.0,))
    da_list = tuple(da_list) + (da_list[-1],) * max(
        0, len(case.schmidt) - len(da_list)) if hasattr(case, "schmidt") \
        else tuple(da_list)
    chem = chemmod.ChemistryProps(
        type=ini.get("Chemistry", "Type", "none").lower(),
        damkohler=da_list,
        parameters=ini.get_floats("Chemistry", "Parameters", (1.0, 1.0)),
        scalar=ini.get_int("Chemistry", "Scalar", 1) - 1,
        ymean=tuple(getattr(prof, "ymean", 0.0)
                    for prof in (case.scal_profiles or ())))
    rad_on = rad.type != "none"
    mic_on = mic.type != "none" and settling != 0.0
    chem_on = chem.type != "none"
    ntp = np.dtype(jnp.dtype(dtype))
    if rad_on or mic_on:
        # compact FDM_Int1 tau integrals with the case's y scheme (the
        # reference radiation integrates with fdm_Int0 = FDM_Int1 plans,
        # radiation.f90:414)
        from tlab_tpu.fdm.plan import build_deriv_plan
        plan_y_rad = build_deriv_plan(grid.y, case.space_order1,
                                      case.space_order2)
        Jt, Jb = radmod.int1_cumulative_matrices(plan_y_rad)
        Jt = np.asarray(Jt, ntp)
        Jb = np.asarray(Jb, ntp)
    y_dev = np.asarray(grid.y.nodes, ntp)

    wm = forcmod.wavemaker_from_ini(ini)
    wm_on = wm is not None and wm.amp_x
    if wm_on:
        wm_env, wm_phases = forcmod.wavemaker_fields(wm, grid)
        wm_env = np.asarray(wm_env, ntp)
        wm_phases = np.asarray(wm_phases, ntp)
    homog = forcmod.homogeneous_from_ini(ini)
    homog_on = homog is not None and any(abs(f) > 0 for f in homog)

    if not (buo_on or cor_on or rad_on or mic_on or chem_on or sub_on
            or wm_on or homog_on):
        return None

    # linearized stratocumulus mixture (MIXT_TYPE_AIRWATER_LINEAR): the
    # normalized liquid is a DIAGNOSTIC scalar appended to the stack for
    # buoyancy/radiation (reference thermo_airwater.f90:483-516; liquid is
    # scalar inb_scal_array)
    tcfg = getattr(case, "thermo", {}) or {}
    awl_params = tuple(tcfg.get("parameters", ()))
    awl_on = tcfg.get("mixture", "") == "airwaterlinear" and awl_params

    def augment(s):
        if not awl_on or s.shape[0] == 0:
            return s
        from tlab_tpu.physics import thermo
        liq = thermo.airwater_linear(awl_params, s)
        return jnp.concatenate([s, liq[None]], axis=0)

    if buo_on and not explicit:
        # bbackground sees a ZERO liquid column for the linear mixture: the
        # reference fills sbackground only for the prognostic scalars before
        # computing bbackground (tlab_background.f90:194-221; the diagnostic
        # column is a fresh allocation, never written in the non-anelastic
        # path), so c3*ql_bg must NOT enter the reference profile.  Appending
        # the equilibrium liquid here shifted Case18's step-1 buoyancy RHS by
        # 0.3% and its dilatation by 10-30x.  The zero column is kept in the
        # stack so the independent term stays at parameters(inb_scal_array+1)
        # (gravity.f90:253).
        profs = case.scal_profiles
        if awl_on and profs:
            profs = list(profs) + [lambda yv: np.zeros_like(yv)]
        bback = grav.background_profile(buo, profs, grid.y.nodes)
        bback = np.asarray(bback, ntp)

    def compute_ir(state, rad=None):
        """IR heating-rate field for the active scalar (also consumed by
        the bil_cloud droplet equations, reference rhs_part_1.f90:82).
        rad: optional props override (scaled fluxes for the iniscal
        NormalizeR accumulated-radiation IC, scal_main.f90:120-131)."""
        if rad is None:
            rad = compute_ir.props
        from tlab_tpu.physics import thermo
        if anelastic is not None:
            diag = thermo.diagnostic_fields(anelastic["tp"], state.s,
                                            anelastic["bg"])
            ql = diag["ql"]
            rho_b = anelastic["rho"]
        elif awl_on:
            diag = {}
            ql = thermo.airwater_linear(awl_params, state.s)
            rho_b = jnp.ones_like(y_dev)
        else:
            diag = {}
            ql = state.s[-1]
            rho_b = jnp.ones_like(y_dev)
        if rad.type == "gray" and anelastic is not None:
            qv = diag["qv"] if "qv" in diag else state.s[-1] - ql
            T_f = diag["T"]
            a_f = (rad.kappa * ql + rad.kappa_v * qv
                   + rad.kappa_g) * rho_b[None, :, None]
            # emission by the Stefan-Boltzmann law (radiation.f90:292);
            # beta is a unit-override knob (1 for reference cases)
            b_f = rad.beta * radmod.SIGMA * T_f ** 4
            return radmod.infrared_gray_source(
                rad, y_dev, a_f, b_f, emissivity=rad.emissivity)
        if rad.type == "band" and anelastic is not None:
            qv = diag["qv"] if "qv" in diag else state.s[-1] - ql
            T_f = diag["T"]
            nb = rad.nbands
            kt = rad.kappa_table or ((rad.kappa,) * nb,)
            k_l = kt[0]
            k_v = kt[1] if len(kt) > 1 else (0.0,) * nb
            k_c = kt[2] if len(kt) > 2 else (0.0,) * nb
            a_bands = [(k_l[b] * ql + k_v[b] * qv + k_c[b])
                       * rho_b[None, :, None] for b in range(nb)]
            return radmod.infrared_band_source(
                rad, y_dev, a_bands, T_f, rad.beta_table,
                emissivity=rad.emissivity, bcs_top=rad.bcs_top)
        return radmod.infrared_source(rad, Jt, Jb, ql, rho_b)

    def sources(P, state, h1, h2, h3, hs, aux=None):
        if homog_on:
            # constant body force (channel driving pressure gradient)
            if abs(homog[0]) > 0:
                h1 = h1 + homog[0]
            if abs(homog[1]) > 0:
                h2 = h2 + homog[1]
            if abs(homog[2]) > 0:
                h3 = h3 + homog[2]
        if wm_on:
            # wavemaker relaxation toward the plane-wave field, phase at
            # the START-of-step rtime exactly as the reference (the
            # dispatcher passes TLab_Time rtime, tlab_sources.f90:115);
            # on the pencil mesh the global envelope/phase tables are
            # sliced to this device's block
            t = (aux or {}).get("rtime", 0.0)
            env_l, ph_l = forcmod.localize_wavemaker(
                wm_env, wm_phases, P.get("comm"))
            h1 = h1 + forcmod.wavemaker_source(wm, env_l, ph_l, 0,
                                               state.u, t)
            h2 = h2 + forcmod.wavemaker_source(wm, env_l, ph_l, 1,
                                               state.v, t)
        if cor_on:
            r1, r2, r3 = rot.coriolis_tendency(cor, state.u, state.v, state.w)
            h1, h2, h3 = h1 + r1, h2 + r2, h3 + r3
        if buo_on:
            if explicit:
                from tlab_tpu.physics import thermo
                b = thermo.buoyancy_explicit(anelastic["tp"], state.s,
                                             anelastic["bg"])
            else:
                b = grav.buoyancy_field(buo, augment(state.s), bback)
            gx, gy, gz = buo.vector
            if abs(gx) > 0:
                h1 = h1 + gx * b
            if abs(gy) > 0:
                h2 = h2 + gy * b
            if abs(gz) > 0:
                h3 = h3 + gz * b
        if rad_on or mic_on:
            # liquid water: diagnostic (anelastic airwater) or a scalar
            from tlab_tpu.physics import thermo
            if anelastic is not None:
                diag = thermo.diagnostic_fields(anelastic["tp"], state.s,
                                                anelastic["bg"])
                ql = diag["ql"]
                rho_b = anelastic["rho"]
            elif awl_on:
                ql = thermo.airwater_linear(awl_params, state.s)
                rho_b = jnp.ones_like(y_dev)
            else:
                ql = state.s[-1]
                rho_b = jnp.ones_like(y_dev)
            if rad_on:
                src = compute_ir(state)
                hs = hs.at[rad.scalar].add(src)
            if mic_on:
                # driving field = diagnostic liquid (last array scalar),
                # rho-weighted in anelastic mode (microphysics.f90:133)
                if anelastic is not None:
                    s_active = ql * rho_b[None, :, None]
                else:
                    s_active = ql
                stat_l = None
                if mic.type == "airwater":
                    ep = jnp.asarray(anelastic["bg"]["ep"])[None, :, None]
                    stat_l = micmod.liquid_static_energy(
                        anelastic["tp"], state.s[0], diag["T"], ep)
                for isc in range(state.s.shape[0]):
                    if mic.type == "airwatersimplified":
                        sed = micmod.sedimentation_simplified(
                            mic, P, isc, s_active)
                    else:
                        sed = micmod.sedimentation_airwater(
                            mic, P, isc, state.s, s_active, stat_l)
                    if anelastic is not None:
                        # ribackground weighting of the tendency
                        # (tlab_sources.f90:176-177)
                        sed = sed / rho_b[None, :, None]
                    hs = hs.at[isc].add(sed)
        if chem_on:
            # every scalar with nonzero Damkohler receives its reaction
            # source (chemistry.f90:78-81,102-155)
            for isc in chemmod.active_scalars(chem, state.s.shape[0]):
                hs = hs.at[isc].add(
                    chemmod.source(chem, state.s, isc, y_dev))
        if sub_on:
            # ConstantDivergenceLocal is folded into OPR_Burgers_Y in the
            # reference (opr_burgers.f90:336-340), so it acts on EVERY
            # field advected in y: u, v, w and all scalars
            for isc in range(state.s.shape[0]):
                hs = hs.at[isc].add(
                    forcmod.subsidence_source(sub, P, y_dev, state.s[isc]))
            h1 = h1 + forcmod.subsidence_source(sub, P, y_dev, state.u)
            h2 = h2 + forcmod.subsidence_source(sub, P, y_dev, state.v)
            h3 = h3 + forcmod.subsidence_source(sub, P, y_dev, state.w)
        return h1, h2, h3, hs

    compute_ir.props = rad
    sources.ir_field = compute_ir if rad_on else None
    sources.rad_props = rad if rad_on else None
    sources.time_dependent = bool(wm_on)

    # isolated-term closures for the pressure-decomposition menu
    # (FI_PRESSURE_BOUSSINESQ DCMP_CORIOLIS/DCMP_BUOYANCY,
    # fi_pressure_boussinesq.f90:158-190)
    if cor_on:
        def coriolis_only(state):
            return rot.coriolis_tendency(cor, state.u, state.v, state.w)
        sources.coriolis_only = coriolis_only
    if buo_on:
        def buoyancy_only(state):
            from tlab_tpu.physics import thermo
            if explicit:
                b = thermo.buoyancy_explicit(anelastic["tp"], state.s,
                                             anelastic["bg"])
            else:
                b = grav.buoyancy_field(buo, augment(state.s), bback)
            gx, gy, gz = buo.vector
            z = jnp.zeros_like(state.u)
            return (gx * b if abs(gx) > 0 else z,
                    gy * b if abs(gy) > 0 else z,
                    gz * b if abs(gz) > 0 else z)
        sources.buoyancy_only = buoyancy_only
    return sources


def grid_from_case(case: CaseSetup) -> Grid:
    axes = []
    for i, d in enumerate("xyz"):
        spec = case.grid_segments[d]
        segs = spec["segments"] if isinstance(spec, dict) else spec
        mirrored = spec.get("mirrored", False) if isinstance(spec, dict) \
            else False
        fixed = spec.get("fixed_scale", -1.0) if isinstance(spec, dict) \
            else -1.0
        if segs and segs[0]["n"] > 1:
            axes.append(build_axis_from_segments(segs, case.periodic[i],
                                                 mirrored=mirrored,
                                                 fixed_scale=fixed))
        else:
            from tlab_tpu.grid import make_axis
            axes.append(make_axis(np.zeros(1), False))
    return Grid(*axes)


@dataclasses.dataclass
class Simulation:
    case: CaseSetup
    grid: Grid
    fdm: FdmPlan
    nsp: NSParams
    P: dict                      # dycore device plans
    ell_plans: dict              # BC -> device elliptic plan (for ICs etc.)
    dtype: object
    filter_sponge: object = None  # (amp, mats) for BufferZone Type=filter
    comp: dict = None             # compressible-mode parameters

    @classmethod
    def from_case(cls, case_or_path, dtype=None, grid: Optional[Grid] = None,
                  mesh=None) -> "Simulation":
        case = case_or_path if isinstance(case_or_path, CaseSetup) \
            else load_case(case_or_path)
        from tlab_tpu.config import consistency_check
        consistency_check(case)
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        if grid is None:
            grid = grid_from_case(case)
        from tlab_tpu.utils.trace import trace as _tr
        with _tr("FDM plan construction"):
            fdm = build_fdm_plan(grid, case.space_order1, case.space_order2)
        nsp = NSParams(reynolds=case.reynolds, schmidt=tuple(case.schmidt),
                       prandtl=case.prandtl, froude=case.froude,
                       rossby=case.rossby)
        scal_bcs = tuple(
            (b if b in ("dirichlet", "neumann") else "dirichlet",
             t if t in ("dirichlet", "neumann") else "dirichlet")
            for b, t in case.scalar_bc)
        bcs = dyn.WallBCs.from_velocity_kind(case.velocity_bc[0],
                                             case.velocity_bc[1],
                                             scalar_bcs=scal_bcs)
        # Dirichlet wall reference values = mean velocity profile at the
        # walls (reference BcsFlowJmin/Jmax%ref; IC-consistent, so e.g. a
        # moving-wall channel keeps its prescribed wall velocity)
        yw = np.asarray([grid.y.nodes[0], grid.y.nodes[-1]])
        wall_refs = {
            "u": tuple(float(v) for v in case.vel_profiles[0](yw)),
            "v": (0.0, 0.0),
            "w": tuple(float(v) for v in case.vel_profiles[2](yw)),
        }
        if case.equations in ("compressible", "total", "internal"):
            # compressible path: no pressure Poisson, acoustic integration
            # (reference DNS_EQNS_TOTAL/INTERNAL)
            from tlab_tpu.physics.eos import GasParams
            tcfg = getattr(case, "thermo", {}) or {}
            gas = GasParams(gamma=case.gamma, mach=case.mach,
                            transport=tcfg.get("transport", "none"))
            bodyforce = None
            P = dyn.build_device_plans(fdm, nsp, bcs,
                                       rk_name=case.time_order, dtype=dtype,
                                       with_elliptic=False,
                                       wall_refs=wall_refs)
            P["y_periodic"] = grid.y.periodic
            # [BoundaryConditions] ViscousI/J/K are ACCEPTED but inert,
            # exactly like the current reference: dns_read_local.f90
            # maps them into column 2 of bcs_inf/bcs_out, but
            # OPR_Partial only ever reads column 1 (opr_partial.f90:91,
            # ibc = bcs(1,1)+bcs(2,1)*2) and FDM_Der2_Solve takes no bc
            # flag at all -- a legacy no-op.  (Verified on Case02: row
            # zeroing on vs off is bit-identical through NSCBC.)
            nscbc = None
            vb = case.velocity_bc
            if any(k in ("outflow", "inflow") for k in vb):
                from tlab_tpu.dycore.nscbc import NSCBCSpec
                nscbc = NSCBCSpec(
                    ymin=vb[0] if vb[0] in ("outflow", "inflow") else "wall",
                    ymax=vb[1] if vb[1] in ("outflow", "inflow") else "wall",
                    p_inf=1.0 / (case.gamma * case.mach ** 2))
            # multi-species mixtures ([Main] Mixture=BS/PETERS1991/...):
            # caloric tables for the combustion families
            # (thermodynamics.f90:217-430); the RHS stays single-fluid
            # with these tables supplying cp(T)/h(T)/R(Y) diagnostics
            mixture_table = None
            mixname = tcfg.get("mixture", "none")
            from tlab_tpu.physics import mixtures as mixmod
            if mixname in mixmod.MIXTURES:
                mixture_table = mixmod.build_mixture(mixname)
            elif mixname == "chemkin" and tcfg.get("chemkin_file"):
                mixture_table = mixmod.read_chemkin(tcfg["chemkin_file"])
            # moist-air mixture with the compressible solver
            # (MIXT_TYPE_AIRWATER + Equations=internal, Case14 family):
            # ThermoParams in compressible units (RRATIO-scaled R/psat)
            aw = None
            gama = case.gamma
            if mixname == "airwater":
                from tlab_tpu.physics import thermo as _th
                aw = _th.compressible_airwater_params(
                    mach=case.mach, dsmooth=tcfg.get("smooth", 0.0))
                gama = aw.Cpd_dim / (aw.Cpd_dim - aw.Rd_dim)
                if case.equations != "internal":
                    raise NotImplementedError(
                        "Mixture=AirWater compressible: internal-energy "
                        "formulation only (reference RHS_FLOW_GLOBAL_2)")
                # the reference applies characteristic BCs at any
                # non-periodic y boundary (time.f90:792-796)
                if not grid.y.periodic and nscbc is None:
                    from tlab_tpu.dycore.nscbc import NSCBCSpec
                    ini_ = getattr(case, "ini", None)
                    nscbc = NSCBCSpec(
                        ymin="outflow", ymax="outflow",
                        sigma=max(ini_.get_float(
                            "BoundaryConditions", "SigmaOut", -1.0), 0.0)
                        if ini_ else 0.0,
                        cinf=max(ini_.get_float(
                            "BoundaryConditions", "SigmaInf", -1.0), 0.0)
                        if ini_ else 0.0,
                        ctan=max(ini_.get_float(
                            "BoundaryConditions", "BetaTransverse", -1.0),
                            0.0) if ini_ else 0.0)
            gvec = tuple(getattr(case, "buoyancy").vector) \
                if getattr(case, "buoyancy", None) is not None \
                else (0.0, 0.0, 0.0)
            schmidt0 = case.schmidt[0] if case.schmidt else 1.0
            sfactor = (1.0 / case.reynolds) * max(
                1.0, 1.0 / case.prandtl,
                1.0 / min(case.schmidt) if case.schmidt else 1.0)
            # compressible bounds control ([Control] FlowLimit; defaults
            # pbg/rbg mean * 1e-/+6, dns_main.f90:211-214)
            bounds = None
            ctrl_ = getattr(case, "control", None) or {}
            if ctrl_.get("flow_limit", True):
                ini_ = getattr(case, "ini", None)
                p_mean = ini_.get_float("Flow", "Pressure",
                                        1.0 / (gama * case.mach ** 2)) \
                    if ini_ is not None else 1.0 / (gama * case.mach ** 2)
                r_mean = ini_.get_float("Flow", "Density", 1.0) \
                    if ini_ is not None else 1.0
                pmin = ctrl_.get("min_pressure", -1.0)
                pmax = ctrl_.get("max_pressure", -1.0)
                rmin = ctrl_.get("min_density", -1.0)
                rmax = ctrl_.get("max_density", -1.0)
                bounds = {
                    "p": (pmin if pmin >= 0 else p_mean * 1e-6,
                          pmax if pmax >= 0 else p_mean * 1e6),
                    "r": (rmin if rmin >= 0 else r_mean * 1e-6,
                          rmax if rmax >= 0 else r_mean * 1e6)}
            ctrl_c = getattr(case, "control", None)
            if ctrl_c and ctrl_c.get("scal_limit") and nsp.n_scalars:
                # per-substep scalar clipping also applies to the
                # compressible transported scalars (DNS_BOUNDS_LIMIT)
                P["scal_bounds"] = (tuple(ctrl_c["min_scalar"]),
                                    tuple(ctrl_c["max_scalar"]))
            comp = {"gamma": gama, "mach": case.mach, "bounds": bounds,
                    "mixture": mixture_table, "aw": aw, "gvec": gvec,
                    "schmidt": schmidt0, "sfactor": sfactor,
                    "prandtl": case.prandtl, "gas": gas,
                    "form": ("skewsymmetric"
                             if case.term_advection == "skewsymmetric"
                             else "divergence"),
                    "energy": ("internal" if case.equations == "internal"
                               else "total"),
                    "nscbc": nscbc,
                    "ly": float(grid.y.nodes[-1] - grid.y.nodes[0]),
                    "lx": float(grid.x.scale)}
            return cls(case=case, grid=grid, fdm=fdm, nsp=nsp, P=P,
                       ell_plans={}, dtype=dtype, comp=comp)
        with _tr("OPR_Elliptic plan construction"):
            ell_nn = elliptic.build_elliptic_plan(fdm, ibc=BC.NN)
            ell_dd = elliptic.build_elliptic_plan(fdm, ibc=BC.DD)
            ell_plans = {BC.NN: elliptic.device_elliptic_plan(ell_nn, dtype),
                         BC.DD: elliptic.device_elliptic_plan(ell_dd, dtype)}
        # anelastic THERMODYNAMICS are independent of the momentum set:
        # [Thermodynamics] Type=anelastic with Equations=incompressible is
        # the reference's Boussinesq + moist-thermo combination (Case15/24,
        # imode_thermo vs nse_eqns); only Equations=anelastic additionally
        # weights the dycore by rho_bar (P["anelastic"] below)
        tcfg_ = getattr(case, "thermo", {}) or {}
        thermo_anelastic = (case.equations == "anelastic"
                            or tcfg_.get("type", "").lower() == "anelastic")
        anelastic = make_anelastic(case, grid, dtype) \
            if thermo_anelastic else None
        bodyforce = make_sources(case, grid, dtype, anelastic=anelastic)
        P = dyn.build_device_plans(fdm, nsp, bcs,
                                   rk_name=case.time_order, dtype=dtype,
                                   bodyforce=bodyforce, wall_refs=wall_refs)
        # [Main] TermAdvection selects the nonlinear formulation
        # (reference rhs_flow_global_incompressible_1/2/3.f90); the
        # anelastic set is combined-convective only, as the reference
        if case.term_advection in ("divergence", "skewsymmetric") \
                and case.equations != "anelastic":
            P["adv_form"] = case.term_advection
        # [IBMParameter]/[IBMGeometry]: solid mask + spline fills
        # (reference IBM_READ_INI + IBM_INITIALIZE_GEOMETRY,
        # ibm_read.f90:47-127)
        ini2 = case.ini
        # [Main] TermDivergence=none drops the q/dte residual-divergence
        # term from the projection forcing (dns_read_local.f90:79-83)
        if ini2 is not None and ini2.get("Main", "TermDivergence",
                                         "remove").lower() == "none":
            P["remove_divergence"] = False
        if ini2 is not None and ini2.get("IBMParameter", "Status",
                                         "off").lower() == "on":
            from tlab_tpu import ibm as ibmmod
            gtype = ini2.get("IBMGeometry", "Type", "xbars").lower()
            mirrored = ini2.get_bool("IBMGeometry", "Mirrored", False)
            if gtype in ("xbars", "bars"):
                eps = ibmmod.geometry_xbars(
                    grid, ini2.get_int("IBMGeometry", "Number", 1),
                    ini2.get_int("IBMGeometry", "Height", 4),
                    ini2.get_int("IBMGeometry", "Width", 4),
                    mirrored=mirrored)
            elif gtype == "hill":
                eps = ibmmod.geometry_hill(
                    grid, ini2.get_float("IBMGeometry", "Height", 0.1),
                    ini2.get_float("IBMGeometry", "Width", 0.2),
                    ini2.get_float("IBMGeometry", "Center",
                                   0.5 * grid.x.scale))
            elif gtype == "valley":
                eps = ibmmod.geometry_valley(
                    grid, ini2.get_int("IBMGeometry", "Height", 4),
                    ini2.get_int("IBMGeometry", "Alpha", 1))
            else:
                raise ValueError(f"[IBMGeometry] Type={gtype!r} unknown")
            ib = ibmmod.build_ibm(np.asarray(eps, float), dtype=dtype)
            ib["fills"] = ibmmod.build_ibm_spline(np.asarray(eps, float),
                                                  grid, dtype=dtype)
            P["ibm"] = ib
        P["ell_dd"] = ell_plans[BC.DD]
        pf = getattr(case, "pressure_filter", None)
        if pf is not None and pf.type != "none":
            if pf.type == "helmholtz":
                # marker dict: substep_rhs routes it through the eigen
                # Helmholtz solve -- single-device ops.elliptic.helmholtz
                # or the distributed pencil_helmholtz under P['comm']
                # (the reference applies any [PressureFilter] type at any
                # task count, opr_filter.f90:285)
                width = pf.parameters[0] if pf.parameters else 2.0
                P["pfilter"] = {
                    "helmholtz_alpha": -24.0 / max(width, 1e-30) ** 2}
            else:
                from tlab_tpu.ops.filter import build_filter_matrices
                P["pfilter"] = build_filter_matrices(fdm, pf, dtype)
        # EllipticOrder: the factorized formulation is the default (as the
        # reference): its D1-consistent integrals make the projection
        # remove the D1-measured divergence to round-off. The direct eigen
        # pencil (EllipticOrder=compactdirect4/6) is faster but leaves the
        # D1^2-vs-D2 truncation mismatch as residual divergence at grid
        # scales -- measured O(1) on noisy fields.
        if case.elliptic_order in ("", "factorize", "compactjacobian6") \
                and grid.y.size > 4 and grid.x.periodic:
            from tlab_tpu.ops import elliptic_factorize as fac
            fac_plan = fac.build_factorize_plan(fdm)
            P["ell_fac"] = fac.device_factorize_plan(fac_plan, dtype)
        if getattr(case, "stagger", False):
            # horizontally staggered pressure ([Staggering]
            # StaggerHorizontalPressure=yes; reference
            # tlab_initialize_parameters.f90:112-117)
            from tlab_tpu.fdm import stagger as stg
            if not grid.x.periodic:
                raise ValueError("staggered pressure needs periodic x")
            sd = {}
            ntp = np.dtype(jnp.dtype(dtype))
            nx = grid.x.size
            hx = grid.x.scale / nx
            for k, M in stg.build_stagger_ops(nx, hx).items():
                sd[f"{k}x"] = np.asarray(M, ntp)
            wx = stg.modified_wavenumber(nx, grid.x.scale)
            lam_x = wx ** 2
            if grid.z.size > 1:
                nz = grid.z.size
                hz = grid.z.scale / nz
                for k, M in stg.build_stagger_ops(nz, hz).items():
                    sd[f"{k}z"] = np.asarray(M, ntp)
                wz_half = stg.modified_wavenumber(nz, grid.z.scale)
                k = np.arange(nz)
                wz = wz_half[np.minimum(k, nz - k)]      # full-fft ordering
                lam_z = wz ** 2
            else:
                wz = None
                lam_z = None
            P["stag"] = sd
            if "ell_fac" in P:
                # rebuild the factorized plan with the STAGGERED derivative
                # wavenumbers (reference opr_elliptic.f90:144-147): the
                # staggered divergence/gradient operators define the modal
                # eigenvalues, and only the (0,0) mode is singular
                from tlab_tpu.ops import elliptic_factorize as fac
                fac_plan = fac.build_factorize_plan(fdm, mwn_x=wx, mwn_z=wz)
                P["ell_fac"] = fac.device_factorize_plan(fac_plan, dtype)
            else:
                # eigen-pencil fallback (EllipticOrder=compactdirect*);
                # accurate only on y grids with a well-conditioned pencil
                ell_st = elliptic.build_elliptic_plan(fdm, ibc=BC.NN,
                                                      lam_x=lam_x,
                                                      lam_z=lam_z)
                P["ell_stag"] = elliptic.device_elliptic_plan(ell_st, dtype)
        sfc = getattr(case, "surface_bc", ())
        if any(d["jmin"] == "linear" or d["jmax"] == "linear" for d in sfc):
            P["surface_bc"] = {
                "cpl_jmin": tuple(
                    d["cpl_jmin"] if d["jmin"] == "linear" else 0.0
                    for d in sfc),
                "cpl_jmax": tuple(
                    d["cpl_jmax"] if d["jmax"] == "linear" else 0.0
                    for d in sfc)}
        if anelastic is not None and case.equations == "anelastic":
            # rho_bar dycore weighting only for the anelastic momentum
            # set; thermo-anelastic + incompressible stays Boussinesq
            P["anelastic"] = {"rho": anelastic["rho"],
                              "rho_inv": anelastic["rho_inv"]}
        dea_spec = getattr(case, "dealias", None)
        if dea_spec is not None and dea_spec.type != "none":
            from tlab_tpu.ops.filter import build_filter_matrices
            P["dealias"] = build_filter_matrices(fdm, dea_spec, dtype)
        ctrl = getattr(case, "control", None)
        if ctrl and ctrl.get("scal_limit") and nsp.n_scalars:
            P["scal_bounds"] = (tuple(ctrl["min_scalar"]),
                                tuple(ctrl["max_scalar"]))
        if mesh is not None:
            from tlab_tpu.parallel import gspmd_shardings
            sh = gspmd_shardings(mesh)
            P["ell"]["shardings"] = sh
            for pl in ell_plans.values():
                pl["shardings"] = sh
        return cls(case=case, grid=grid, fdm=fdm, nsp=nsp, P=P,
                   ell_plans=ell_plans, dtype=dtype)

    # -- optional subsystems ------------------------------------------------
    def attach_buffer(self, state: State) -> None:
        """Build sponge-zone relaxation data with reference profiles taken
        from the given (initial) state, reference BOUNDARY_BUFFER_INITIALIZE."""
        from tlab_tpu.dycore import buffer as bufmod
        spec = getattr(self.case, "buffer", None)
        if spec is None or spec.type == "none":
            return
        refs = {"u": jnp.mean(state.u, axis=(0, 2)),
                "v": jnp.mean(state.v, axis=(0, 2)),
                "w": jnp.mean(state.w, axis=(0, 2))}
        for i in range(state.s.shape[0]):
            refs[f"s{i}"] = jnp.mean(state.s[i], axis=(0, 2))
        # spatial mode: Imin/Imax strips relax toward the inflow-plane state
        x = self.grid.x.nodes if self.case.flow_type == "spatial" else None
        ref_inflow = None
        if x is not None:
            ref_inflow = {"u": jnp.mean(state.u[0], axis=1),
                          "v": jnp.mean(state.v[0], axis=1),
                          "w": jnp.mean(state.w[0], axis=1)}
            for i in range(state.s.shape[0]):
                ref_inflow[f"s{i}"] = jnp.mean(state.s[i][0], axis=1)
        if spec.type in ("relaxation", "both"):
            self.P["buffer"] = bufmod.build_buffer(
                self.grid.y.nodes, spec, refs, self.dtype, x=x,
                ref_inflow=ref_inflow)
        if spec.type in ("filter", "both"):
            # filter-type sponge (reference BOUNDARY_BUFFER_FILTER — stubbed
            # there; working here): post-step blend toward the filtered state
            from tlab_tpu.ops.filter import FilterSpec, build_filter_matrices
            mats = self.filter_matrices() or build_filter_matrices(
                self.fdm, FilterSpec(type="explicit6"), self.dtype)
            amp = bufmod.filter_sponge_amp(
                self.grid.x.nodes, spec.points_imin, spec.points_imax,
                self.dtype)
            self.filter_sponge = (amp, mats)

    def attach_buffer_compressible(self, U) -> None:
        """Compressible buffer zones + characteristic-BC reference states
        (BOUNDARY_BUFFER_INITIALIZE with RELAX_BLOCK_CF semantics +
        boundary_bcs.f90:224-287): the buffer relaxes the CONSERVATIVE
        fields toward their plane-mean initial profiles, and the y
        NSCBC reference state is the buffer mean at the wall rows."""
        from tlab_tpu.dycore import buffer as bufmod
        spec = getattr(self.case, "buffer", None)
        if spec is None or spec.type not in ("relaxation", "both"):
            return
        if not (spec.points_jmin > 1 or spec.points_jmax > 1):
            return
        tau = bufmod.tau_profile(self.grid.y.nodes, spec)
        refs = {"rho": jnp.mean(U.rho, axis=(0, 2)),
                "rhou": jnp.mean(U.rhou, axis=(0, 2)),
                "rhov": jnp.mean(U.rhov, axis=(0, 2)),
                "rhow": jnp.mean(U.rhow, axis=(0, 2)),
                "rhoE": jnp.mean(U.rhoE, axis=(0, 2))}
        if U.rhos is not None:
            for i in range(U.rhos.shape[0]):
                refs[f"rs{i}"] = jnp.mean(U.rhos[i], axis=(0, 2))
        dt = self.dtype
        buf = {"tau": jnp.asarray(tau, dt)[None, :, None],
               "refs": {k: jnp.asarray(v, dt)[None, :, None]
                        for k, v in refs.items()}}
        self.comp["buffer"] = buf
        # NSCBC per-side reference states from the buffer wall rows
        nscbc = self.comp.get("nscbc")
        aw = self.comp.get("aw")
        if nscbc is not None and aw is not None:
            import dataclasses as _dc
            from tlab_tpu.physics import thermo as _th
            sides = {}
            for name, j in (("refs_ymin", 0), ("refs_ymax", -1)):
                r0 = float(refs["rho"][j])
                un0 = float(refs["rhov"][j]) / r0
                v10 = float(refs["rhou"][j]) / r0
                v20 = float(refs["rhow"][j]) / r0
                e0 = float(refs["rhoE"][j]) / r0
                qt0 = float(refs["rs0"][j]) / r0 if "rs0" in refs else 0.0
                T0, ql0, _ = _th.airwater_re(
                    aw, jnp.asarray(qt0), jnp.asarray(e0), jnp.asarray(r0))
                p0 = float(_th.thermal_pressure(aw, qt0, float(ql0), r0,
                                                float(T0)))
                sides[name] = (r0, un0, v10, v20, p0, qt0)
            self.comp["nscbc"] = _dc.replace(nscbc, **sides)

    def filter_matrices(self):
        from tlab_tpu.ops.filter import (build_filter_matrices,
                                         build_helmholtz_filter)
        spec = getattr(self.case, "filter", None)
        if spec is None or spec.type == "none":
            return None
        if spec.type == "helmholtz":
            width = spec.parameters[0] if spec.parameters else 2.0
            # zero-gradient walls preserve the field at the boundary
            return build_helmholtz_filter(self.P["ell"], width)
        return build_filter_matrices(self.fdm, spec, self.dtype)

    # -- convenience ops ----------------------------------------------------
    def zero_state(self) -> State:
        nx, ny, nz = self.grid.shape
        z = jnp.zeros((nx, ny, nz), self.dtype)
        return State(u=z, v=z, w=z,
                     s=jnp.zeros((self.nsp.n_scalars, nx, ny, nz), self.dtype))

    def ell(self, bc):
        """Elliptic plan for the given wall BC, built lazily -- the
        compressible Simulation skips plan construction (no pressure
        Poisson in the dycore) but the broadband ICs still need one."""
        if bc not in self.ell_plans:
            plan = elliptic.build_elliptic_plan(self.fdm, ibc=bc)
            self.ell_plans[bc] = elliptic.device_elliptic_plan(plan,
                                                               self.dtype)
        return self.ell_plans[bc]

    def curl(self, u, v, w):
        dy_w = dyn._d1(self.P, "y", 1, w)
        dz_v = dyn._d1(self.P, "z", 2, v)
        dz_u = dyn._d1(self.P, "z", 2, u)
        dx_w = dyn._d1(self.P, "x", 0, w)
        dx_v = dyn._d1(self.P, "x", 0, v)
        dy_u = dyn._d1(self.P, "y", 1, u)
        return dy_w - dz_v, dz_u - dx_w, dx_v - dy_u

    def poisson_ref(self, bc, f):
        """The Poisson solve the reference's OPR_Poisson pointer resolves
        to: the factorized formulation when active (the default), else
        the direct eigen pencil.  Used by the IC constructors, which in
        the reference share OPR_Poisson with the dycore
        (flow_local.f90:315-337, fi_vectorcalculus.f90:94)."""
        dev = self.P.get("ell_fac") or self.P.get("ell_fac_ic")
        eo = getattr(self.case, "elliptic_order", "")
        if dev is None and eo in ("", "factorize", "compactjacobian6") \
                and self.grid.y.size > 4 and self.grid.x.periodic:
            # compressible sims have no Poisson in the dycore, so the
            # plan is built lazily the first time an IC needs one
            from tlab_tpu.ops import elliptic_factorize as fac
            plan = fac.build_factorize_plan(self.fdm)
            dev = fac.device_factorize_plan(plan, self.dtype)
            self.P["ell_fac_ic"] = dev
        if dev is not None:
            from tlab_tpu.ops import elliptic_factorize as fac
            ibc = "nn" if bc == BC.NN else "dd"
            p, _ = fac.poisson_factorize(dev, f, ibc=ibc)
            return p
        return elliptic.poisson(self.ell(bc), f)

    def solenoidal(self, u, v, w):
        """Remove dilatation: u += grad(phi), lap(phi) = -div(u)
        (cf. reference FI_SOLENOIDAL, fi_vectorcalculus.f90:72-106);
        the y-correction uses OPR_Partial_Y (D1), not the stage dpdy."""
        div = dyn.divergence(self.P, u, v, w)
        phi = self.poisson_ref(BC.NN, -div)
        u = u + dyn._d1(self.P, "x", 0, phi)
        v = v + dyn._d1(self.P, "y", 1, phi)
        w = w + dyn._d1(self.P, "z", 2, phi)
        return u, v, w
