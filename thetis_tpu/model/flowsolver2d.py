"""FlowSolver2d — the user-facing 2D model object.

Mirrors the reference's ``thetis/solver2d.py`` lifecycle and API:
``__init__(mesh2d, bathymetry_2d)`` -> set ``.options`` ->
``assign_initial_conditions`` -> ``iterate(update_forcings, export_func)``,
with ``create_function_spaces/fields/equations/timestepper/exporters``
stages, ``bnd_functions`` weak-BC dicts, conservation/overshoot callbacks
and HDF5 checkpoint/restart (``load_state``).

TPU-native internals: the coupled advance (SWE -> tracer systems -> limiter,
ref ``coupled_timeintegrator_2d.py:93-113``) is a single jitted function of
``(t, state, field values, BC values)``; when no per-step python callback is
registered the export interval runs as one ``lax.scan``.
"""
import time as time_mod

import numpy as np
import jax
import jax.numpy as jnp

from ..config import physical_constants
from ..fem.assembly import DGAssembler
from ..fem.functionspace import FunctionSpace, Function
from ..equations.shallowwater_2d import ShallowWaterEquations
from ..equations.tracer_2d import TracerEquation2D
from ..equations.limiter import VertexBasedP1DGLimiter
from ..timeintegration.steppers import get_stepper
from ..solvers.newton import NewtonParameters
from ..utils.constant import Constant
from ..utils.log import print_output
from .options import ModelOptions2d
from .field_defs import FieldDict, field_metadata
from .callback import (
    CallbackManager,
    VolumeConservation2DCallback,
    TracerMassConservation2DCallback,
    TracerOvershootCallBack,
)
from .exporter import ExportManager

__all__ = ["FlowSolver2d"]


def _value(v):
    """Current array value of a Constant / Function / array / scalar."""
    if v is None:
        return None
    if isinstance(v, Constant):
        return v.value
    if isinstance(v, Function):
        return v.data
    if callable(v):
        raise TypeError("callable coefficients must be wrapped in Function")
    return jnp.asarray(v)


class FlowSolver2d:
    """ref ``solver2d.py:28-1144``."""

    def __init__(self, mesh2d, bathymetry_2d, options=None):
        self._initialized = False
        self.mesh2d = mesh2d
        self.bathymetry_dof = (
            bathymetry_2d.data if isinstance(bathymetry_2d, Function)
            else jnp.asarray(bathymetry_2d)
        )
        self._bathymetry_input = bathymetry_2d
        self.options = ModelOptions2d()
        if options is not None:
            self.options.update(options)
        self.dt = None
        self.simulation_time = 0.0
        self.iteration = 0
        self.i_export = 0
        self.next_export_t = 0.0
        self.callbacks = CallbackManager()
        self.bnd_functions = {"shallow_water": {}, "tracer": {}, "sediment": {}}
        self._isfrozen = False
        self._functions_created = False
        self._equations_created = False
        self._timestepper_created = False
        self._exporters_created = False
        self._initial_export_done = False
        self.export_initial_state = True

    # ------------------------------------------------------------------
    def create_function_spaces(self):
        """ref ``solver2d.py:307-352``; dg-dg and dg-cg families."""
        mesh = self.mesh2d
        family = self.options.element_family
        assert family in ("dg-dg", "dg-cg", "rt-dg", "bdm-dg"), (
            "element families implemented so far: dg-dg, dg-cg, rt-dg, "
            "bdm-dg"
        )
        manifold = getattr(mesh, "geometric_dimension", 2) == 3
        assert not manifold or family in ("rt-dg", "bdm-dg"), (
            "manifold (sphere) meshes require an H(div) element family "
            "(ref solver2d.py:314-318)"
        )
        p = self.options.polynomial_degree
        self.function_spaces = type("FS", (), {})()
        fs = self.function_spaces
        fs.P0_2d = FunctionSpace(mesh, "DG", 0)
        fs.P1_2d = FunctionSpace(mesh, "CG", 1)
        fs.P1DG_2d = FunctionSpace(mesh, "DG", 1)
        if family in ("rt-dg", "bdm-dg"):
            # H(div) pairs (ref solver2d.py:329-336 builds
            # U = RT/BDM(p+1), H = DG(p)): p = 0 gives the mimetic
            # RT1 x P0 / BDM1 x P0; p = 1 (the reference default) gives
            # RT2 x P1DG (planar meshes, rt-dg)
            if p == 1 and not manifold:
                # RT2/BDM2 basis products are quartic: degree-5 quadrature
                self.asm = DGAssembler(
                    mesh, FunctionSpace(mesh, "DG", 1, quad_degree=5))
                if family == "rt-dg":
                    from ..fem.rt2 import RT2Space

                    fs.U_2d = RT2Space(mesh, self.asm)
                else:
                    from ..fem.bdm2 import BDM2Space

                    fs.U_2d = BDM2Space(mesh, self.asm)
                fs.H_2d = FunctionSpace(mesh, "DG", 1, quad_degree=5)
                if self.options.tracer_element_family == "cg":
                    fs.Q_2d = FunctionSpace(mesh, "CG", 1)
                else:
                    fs.Q_2d = FunctionSpace(mesh, "DG", 1)
                self._functions_created = False
                return
            assert p == 0, (
                f"{family} implements p = 0 (H(div) x P0) and, on planar "
                "meshes, p = 1 (RT2/BDM2 x P1DG): set "
                "options.polynomial_degree accordingly"
            )
            if manifold:
                # embedded manifolds (SphereMesh) have no global planar
                # chart, so the planar DGAssembler cannot be built; the
                # H(div) spaces and the RTDG equations only consume the
                # quadrature tabulations of the assembly context
                from types import SimpleNamespace
                from ..fem.reference_element import ELEMENTS
                self.asm = SimpleNamespace(space=SimpleNamespace(
                    _tab_np=ELEMENTS[("DG", 1)].tabulate(3)))
            else:
                self.asm = DGAssembler(mesh, FunctionSpace(mesh, "DG", 1))
            if family == "rt-dg":
                from ..fem.rt import RTSpace

                fs.U_2d = RTSpace(mesh, self.asm)
            else:
                from ..fem.bdm import BDMSpace

                fs.U_2d = BDMSpace(mesh, self.asm)
            fs.H_2d = FunctionSpace(mesh, "DG", 0)
        else:
            fs.U_2d = FunctionSpace(mesh, "DG", p, dim=2)
            if family == "dg-cg":
                # P1DG velocity x P2 CG elevation (ref solver2d.py:318-321)
                fs.H_2d = FunctionSpace(mesh, "CG", p + 1)
            else:
                fs.H_2d = FunctionSpace(mesh, "DG", p)
            # the assembly context always runs on the degree-p DG space; a
            # CG elevation (dg-cg) gets its own tabulations in the equation
            self.asm = DGAssembler(mesh, FunctionSpace(mesh, "DG", p))
        if self.options.tracer_element_family == "cg":
            fs.Q_2d = FunctionSpace(mesh, "CG", 1)
        else:
            fs.Q_2d = FunctionSpace(mesh, "DG", 1)
        self._functions_created = False

    def create_fields(self):
        if not hasattr(self, "function_spaces"):
            self.create_function_spaces()
        fs = self.function_spaces
        self.fields = FieldDict()
        f = self.fields
        f.bathymetry_2d = Function(fs.P1_2d, name="Bathymetry")
        # accept CG1 / DG dof layouts
        b = self.bathymetry_dof
        if b.ndim == 0:
            f.bathymetry_2d.data = jnp.full((self.mesh2d.nv,), float(b))
        elif b.shape == (self.mesh2d.nv,):
            f.bathymetry_2d.data = b
        else:
            f.bathymetry_2d = Function(fs.H_2d, name="Bathymetry", data=b)
        f.elev_2d = Function(fs.H_2d, name="elev_2d")
        f.uv_2d = Function(fs.U_2d, name="uv_2d")
        self.tracer_labels = list(self.options.tracer.keys())
        for label in self.tracer_labels:
            if label not in field_metadata:
                meta = self.options.tracer[label]
                field_metadata[label] = dict(
                    name=meta.name, shortname=meta.shortname, unit=meta.unit,
                    filename=meta.filename,
                )
            f[label] = Function(fs.Q_2d, name=label)
        self.solve_tracer = len(self.tracer_labels) > 0
        nho = self.options.nh_model_options
        self.solve_nh = bool(
            nho and nho.solve_nonhydrostatic_pressure
        )
        if self.solve_nh:
            # NH pressure q (P1 CG) and depth-averaged vertical velocity w
            # (ref solver2d.py:443-449)
            f.q_2d = Function(fs.P1_2d, name="q_2d")
            f.w_2d = Function(fs.H_2d, name="w_2d")
        so = self.options.sediment_model_options
        self.solve_sediment = bool(so and so.solve_suspended_sediment)
        self.solve_exner = bool(so and so.use_exner)
        if self.solve_sediment:
            f.sediment_2d = Function(fs.Q_2d, name="sediment_2d")
        self._functions_created = True

    def set_wetting_and_drying_alpha(self):
        r"""Automatic wetting-drying alpha ~ |L_x grad(h)| capped to
        [alpha_min, alpha_max] (ref ``solver2d.py:251-303``)."""
        o = self.options
        if not o.use_wetting_and_drying:
            return
        if o.use_automatic_wetting_and_drying_alpha:
            mesh = self.mesh2d
            b = np.asarray(self.fields.bathymetry_2d.data)
            cells = mesh.cells_np
            if b.ndim == 0:
                bv = np.full((mesh.nc, 3), float(b))
            elif b.shape[:1] == (mesh.nv,):
                bv = b[cells]  # CG1 -> (nc, 3)
            elif b.shape[:2] == (mesh.nc, 3):
                # DG bathymetry (e.g. Exner-evolved): per-cell nodal values
                bv = b[:, :, 0] if b.ndim == 3 else b
            else:
                raise ValueError(
                    f"cannot derive automatic alpha from bathymetry of "
                    f"shape {b.shape}")
            # grad = Jinv^T @ dphi^T b, dphi rows [-1,-1],[1,0],[0,1]
            gref = np.stack([bv[:, 1] - bv[:, 0], bv[:, 2] - bv[:, 0]], axis=1)
            grad = np.einsum("cj,cji->ci", gref, mesh.Jinv_np)
            p = mesh.coords_np[cells]
            widths = p.max(axis=1) - p.min(axis=1)  # (nc, 2) x/y extents
            alpha_cell = (widths * np.abs(grad)).sum(axis=1)
            if o.wetting_and_drying_alpha_max is not None:
                alpha_cell = np.minimum(alpha_cell, float(o.wetting_and_drying_alpha_max))
            if o.wetting_and_drying_alpha_min is not None:
                alpha_cell = np.maximum(alpha_cell, float(o.wetting_and_drying_alpha_min))
            # P1 vertex values: max over adjacent cells (noise-free interp)
            alpha_v = np.zeros(mesh.nv)
            np.maximum.at(alpha_v, cells.ravel(), np.repeat(alpha_cell, 3))
            fn = Function(self.function_spaces.P1_2d, name="wd_alpha")
            fn.data = jnp.asarray(alpha_v)
            o.wetting_and_drying_alpha = fn
            print_output(
                "Using spatially varying wetting and drying parameter "
                f"(min {alpha_v.min():.2f} max {alpha_v.max():.2f})"
            )
        else:
            print_output(
                "Using constant wetting and drying parameter "
                f"(value {float(o.wetting_and_drying_alpha):.2f})"
            )

    def create_equations(self):
        if not self._functions_created:
            self.create_fields()
        o = self.options
        self.set_wetting_and_drying_alpha()
        bathy = self.fields.bathymetry_2d.data
        # tidal turbine farms (ref solver2d.py:462-485)
        from .turbines import TidalTurbineFarm, DiscreteTidalTurbineFarm

        self.tidal_farms = []
        for subdomain, farm_opts in (o.tidal_turbine_farms or {}).items():
            if not isinstance(farm_opts, (list, tuple)):
                farm_opts = [farm_opts]
            mask = self._subdomain_mask(subdomain)
            for fo in farm_opts:
                self.tidal_farms.append(
                    TidalTurbineFarm(
                        self.asm, _value(fo.turbine_density), fo,
                        cell_mask=mask,
                    )
                )
        for subdomain, farm_opts in (o.discrete_tidal_turbine_farms or {}).items():
            if not isinstance(farm_opts, (list, tuple)):
                farm_opts = [farm_opts]
            mask = self._subdomain_mask(subdomain)
            for fo in farm_opts:
                self.tidal_farms.append(
                    DiscreteTidalTurbineFarm(self.asm, fo, cell_mask=mask)
                )
        if o.element_family == "dg-cg":
            from ..equations.shallowwater_dgcg import (
                ShallowWaterEquationsDGCG,
            )
            self.eq_sw = ShallowWaterEquationsDGCG(
                self.mesh2d, self.asm, self.function_spaces.H_2d, o,
                bathymetry=bathy,
                bnd_conditions=self.bnd_functions["shallow_water"],
                tidal_farms=self.tidal_farms,
            )
        elif o.element_family in ("rt-dg", "bdm-dg"):
            from ..equations.shallowwater_rtdg import (
                ShallowWaterEquationsRTDG,
            )
            assert not self.tidal_farms, (
                "tidal farms are not implemented for the H(div) families"
            )
            assert not (self.solve_nh or self.solve_tracer
                        or self.solve_sediment or self.solve_exner), (
                "rt-dg/bdm-dg currently support the plain shallow-water "
                "system"
            )
            from ..fem.rt2 import RT2Space
            from ..fem.bdm2 import BDM2Space

            if isinstance(self.function_spaces.U_2d, (RT2Space, BDM2Space)):
                from ..equations.shallowwater_rt2 import (
                    ShallowWaterEquationsRT2DG,
                )

                self.eq_sw = ShallowWaterEquationsRT2DG(
                    self.mesh2d, self.asm, self.function_spaces.U_2d, o,
                    bathymetry=bathy,
                    bnd_conditions=self.bnd_functions["shallow_water"],
                )
            else:
                self.eq_sw = ShallowWaterEquationsRTDG(
                    self.mesh2d, self.asm, self.function_spaces.U_2d, o,
                    bathymetry=bathy,
                    bnd_conditions=self.bnd_functions["shallow_water"],
                )
        else:
            self.eq_sw = ShallowWaterEquations(
                self.mesh2d, self.asm, o, bathymetry=bathy,
                bnd_conditions=self.bnd_functions["shallow_water"],
                tidal_farms=self.tidal_farms,
            )
        self.depth = getattr(self.eq_sw, "depth", None)
        if self.solve_nh:
            from ..equations.nh import (
                DepthIntegratedPoissonSolver, FreeSurfaceEquation2D,
            )
            nho = o.nh_model_options
            assert bathy.ndim == 1, (
                "NH pressure solver requires CG1 bathymetry")
            self.poisson_solver = DepthIntegratedPoissonSolver(
                self.mesh2d, self.asm, self.depth,
                float(self.options.timestep),
                bnd_conditions=self.bnd_functions["shallow_water"],
                rtol=float(nho.q_solver_rtol),
                maxiter=int(nho.q_solver_maxiter),
                q_degree=int(nho.q_degree),
            )
            # q_2d dofs follow the Poisson space (P2 CG by default)
            self.fields.q_2d = Function(self.poisson_solver.q_space,
                                        name="q_2d")
            self.eq_free_surface = FreeSurfaceEquation2D(
                self.mesh2d, self.asm, self.depth, bathy,
                bnd_conditions=self.bnd_functions["shallow_water"],
            )
        if self.solve_tracer:
            bnd_tr = self.bnd_functions["tracer"]
            from ..equations.tracer_2d import TracerEquation2DCG
            tracer_cls = (TracerEquation2DCG
                          if o.tracer_element_family == "cg"
                          else TracerEquation2D)
            self.eq_tracer = tracer_cls(
                self.mesh2d, self.asm, o, bathymetry=bathy,
                labels=self.tracer_labels, bnd_conditions=bnd_tr,
                depth=self.depth,
            )
        if self.solve_tracer or self.solve_sediment:
            if o.use_limiter_for_tracers and o.tracer_element_family != "cg":
                self.tracer_limiter = VertexBasedP1DGLimiter(
                    self.function_spaces.Q_2d
                )
            else:
                self.tracer_limiter = None
        # sediment + Exner (ref solver2d.py:507-524)
        so = o.sediment_model_options
        if self.solve_sediment or self.solve_exner:
            from .sediment_model import SedimentModel
            from ..equations.sediment_2d import SedimentEquation2D
            from ..equations.exner import ExnerEquation

            cls = so.sediment_model_class or SedimentModel
            self.sediment_model = cls(o, self.mesh2d, depth=self.depth)
            if self.solve_sediment:
                self.eq_sediment = SedimentEquation2D(
                    self.mesh2d, self.asm, o, bathymetry=bathy,
                    sediment_model=self.sediment_model,
                    bnd_conditions=self.bnd_functions["sediment"],
                    depth=self.depth,
                    conservative=so.use_sediment_conservative_form,
                )
            if self.solve_exner:
                self.eq_exner = ExnerEquation(
                    self.mesh2d, self.asm, self.function_spaces.P1_2d,
                    self.depth, self.sediment_model, o,
                    bnd_conditions=self.bnd_functions["shallow_water"],
                    depth_integrated_sediment=so.use_sediment_conservative_form,
                )
        else:
            self.sediment_model = None
        self._equations_created = True

    def _assembled_eligible(self, choice):
        """The assembled-Jacobian KSP / assembled wave PC require P1DG
        cell blocks (dg-dg family) and a linear (no wetting-and-drying
        displacement) mass term."""
        o = self.options
        if choice is not None and choice != "assembled":
            return False
        return (
            o.element_family == "dg-dg"
            and not o.use_wetting_and_drying
            and getattr(self.asm, "ndofs", None) == 3
        )

    def _build_coarse(self, coeff):
        """Setup-time preconditioner for the assembled implicit-SWE KSP,
        chosen by the rest-state implicit wave CFL:

        * small CFL (< 4): no coarse PC at all — plain block-Jacobi
          FGMRES converges in ~20-30 iterations and beats every
          multi-kernel PC on dispatch cost (round-5 v5e sweep: 58 vs 84
          ms/step at 102k cells, PERF.md);
        * moderate CFL (< 8): Galerkin coarse correction
          (:class:`~thetis_tpu.solvers.assembled.CoarseCorrection`) used
          as a two-level V-cycle — few cheap kernels per iteration, and
          block-Jacobi+coarse converges quickly in this regime;
        * large CFL: the Schur fieldsplit PC (``solvers/fieldsplit.py``)
          — the analogue of the reference's fieldsplit/Schur KSP
          defaults (ref ``options.py:44-48``, ``assembledschur.py``).
          Costlier per application but keeps the iteration count O(10)
          where one-level methods stall outright (measured: block-Jacobi
          GMRES plateaus at 0.9 rel. residual at wave CFL 24)."""
        import numpy as np
        from ..config import physical_constants
        from ..solvers.assembled import (
            PackedState, assemble_affine_operator, get_coloring,
            CoarseCorrection,
        )
        from ..solvers.fieldsplit import SchurFieldsplitPC

        eq = self.eq_sw
        zero = {
            "uv": jnp.zeros_like(self.fields.uv_2d.data),
            "elev": jnp.zeros_like(self.fields.elev_2d.data),
        }
        ps = PackedState(zero)
        bnd_zero = {
            m: {k: 0.0 for k in keys}
            for m, keys in getattr(eq, "bnd_keys", {}).items()
        }

        def F(x):
            st = ps.unpack(x)
            r = eq.residual("all", st, zero, {}, {}, bnd_zero)
            m = eq.mass_term(st)
            return ps.pack({"uv": m["uv"] - coeff * r["uv"],
                            "elev": m["elev"] - coeff * r["elev"]})

        blocks, _ = jax.jit(
            lambda x0: assemble_affine_operator(F, x0, eq.mesh)
        )(ps.pack(zero))
        ring, _, _ = get_coloring(eq.mesh)
        g = float(physical_constants["g_grav"])
        h_max = float(np.asarray(self.bathymetry_dof).max())
        cfl = (np.sqrt(g * max(h_max, 0.05)) * coeff
               / float(np.asarray(self.mesh2d.cell_hmin_np).min()))
        if cfl < 4.0:
            # plain block-Jacobi FGMRES converges in ~O(CFL x diameter
            # of the wave stencil) ~ 20-30 iterations here and each
            # V-cycle costs ~2 ms of fixed kernel dispatch on the v5e
            # (round-5 sweep: 58 vs 84 ms/step on the 102k-cell bench)
            # — no coarse PC is fastest end-to-end
            return None
        if cfl < 8.0:
            return CoarseCorrection(blocks, np.asarray(ring), eq.mesh)
        return SchurFieldsplitPC(blocks, np.asarray(ring), eq.mesh)

    def _swe_preconditioner(self, choice, theta):
        """Resolve the implicit-SWE preconditioner choice.

        Auto (None) builds the setup-time assembled wave-Schur PC
        (the ``AssembledSchurPC`` analogue, ``solvers/assembled.py``) for
        the plain dg-dg family without wetting-and-drying — the
        configuration where the rest-state linearization is a uniformly
        strong preconditioner; otherwise the exact mass inverse."""
        if callable(choice):
            return choice
        if choice is None:
            choice = ("assembled_schur" if self._assembled_eligible(None)
                      else "mass")
        if choice in ("assembled_schur", "assembled"):
            import numpy as np
            import jax.numpy as jnp
            from ..config import physical_constants
            from ..solvers.assembled import AssembledWavePC

            zero = {
                "uv": jnp.zeros_like(self.fields.uv_2d.data),
                "elev": jnp.zeros_like(self.fields.elev_2d.data),
            }
            # inner-CG budget for the S solve scales with the implicit
            # wave CFL (block-Jacobi CG iteration count ~ sqrt(cond(S))
            # ~ CFL): cheap at small CFL, robust at large
            g = float(physical_constants["g_grav"])
            h_max = float(np.asarray(self.bathymetry_dof).max())
            cfl = (np.sqrt(g * max(h_max, 0.05)) * theta * self.dt
                   / float(np.asarray(self.mesh2d.cell_hmin_np).min()))
            n_inner = int(np.clip(2.0 * cfl, 10, 60))
            return AssembledWavePC(
                self.eq_sw, self.dt, theta, zero,
                inner_iterations=n_inner,
            )
        return str(choice)

    def create_timestepper(self):
        """ref ``solver2d.py:651-702``."""
        if not self._equations_created:
            self.create_equations()
        self.set_time_step()
        o = self.options
        sp = o.swe_timestepper_options
        kw = {}
        name = o.swe_timestepper_type
        if name in ("CrankNicolson", "BackwardEuler", "DIRK22", "DIRK33"):
            kw["semi_implicit"] = bool(
                getattr(sp, "use_semi_implicit_linearization", False)
            )
            spp = getattr(sp, "solver_parameters", None)
            if name == "CrankNicolson":
                kw["theta"] = float(getattr(sp, "implicitness_theta", 0.5))
            choice = getattr(sp, "preconditioner", None)
            if kw["semi_implicit"] and self._assembled_eligible(choice):
                # semi-implicit SWE systems are affine + 1-ring local:
                # assemble the exact per-step/stage Jacobian and run the
                # whole KSP on it (PETSc assembled-Jacobian analogue),
                # two-level preconditioned (coarse built once at setup)
                kw["assembled_solve"] = True
                if name == "CrankNicolson":
                    coeff = kw.get("theta", 0.5) * self.dt
                elif name == "BackwardEuler":
                    coeff = self.dt
                else:  # stiffly accurate DIRK: constant diagonal a_ii
                    from ..timeintegration.rungekutta import SCHEMES
                    coeff = float(SCHEMES[name]().a[-1][-1]) * self.dt
                kw["coarse"] = self._build_coarse(coeff)
            elif name in ("CrankNicolson", "BackwardEuler"):
                kw["preconditioner"] = self._swe_preconditioner(
                    choice, theta=kw.get("theta", 1.0),
                )
            if isinstance(spp, NewtonParameters):
                kw["solver_parameters"] = spp
            elif kw.get("assembled_solve"):
                # assembled matvecs are cheap: afford a long restart
                kw["solver_parameters"] = NewtonParameters(
                    ksp_rtol=1e-7, ksp_max_it=96, gmres_restart=24
                )
            elif callable(kw.get("preconditioner")):
                # strong (assembled wave) PC: few outer iterations, so a
                # short FGMRES restart avoids paying unused Arnoldi steps
                kw["solver_parameters"] = NewtonParameters(
                    ksp_max_it=24, gmres_restart=8
                )
            else:
                kw["solver_parameters"] = NewtonParameters()
        if name == "SteadyState":
            spp = getattr(sp, "solver_parameters", None)
            if isinstance(spp, NewtonParameters):
                kw["solver_parameters"] = spp
        if name == "PressureProjectionPicard":
            kw["theta"] = float(getattr(sp, "implicitness_theta", 0.5))
            kw["picard_iterations"] = int(getattr(sp, "picard_iterations", 2))
            spp = getattr(sp, "solver_parameters", None)
            if isinstance(spp, NewtonParameters):
                kw["solver_parameters"] = spp
        self.timestepper = get_stepper(name, self.eq_sw, self.dt, o, **kw)
        if self.solve_tracer:
            tname = o.tracer_timestepper_type
            tkw = {}
            if tname in ("CrankNicolson", "BackwardEuler", "DIRK22", "DIRK33"):
                tkw["semi_implicit"] = bool(
                    getattr(o.tracer_timestepper_options,
                            "use_semi_implicit_linearization", False)
                )
                if tname == "CrankNicolson":
                    tkw["theta"] = float(getattr(
                        o.tracer_timestepper_options, "implicitness_theta", 0.5
                    ))
            self.tracer_stepper = get_stepper(
                tname, self.eq_tracer, self.dt, o, **tkw
            )
        so = o.sediment_model_options
        if self.solve_sediment:
            self.sediment_stepper = get_stepper(
                so.sediment_timestepper_type, self.eq_sediment, self.dt, o,
                **(dict(semi_implicit=True)
                   if so.sediment_timestepper_type in
                   ("CrankNicolson", "BackwardEuler") else {}),
            )
        if self.solve_exner:
            self.exner_stepper = get_stepper(
                so.exner_timestepper_type, self.eq_exner, self.dt, o,
                **(dict(semi_implicit=True)
                   if so.exner_timestepper_type in
                   ("CrankNicolson", "BackwardEuler") else {}),
            )
        if getattr(self, "solve_nh", False):
            nho = o.nh_model_options
            self.fs_stepper = get_stepper(
                nho.free_surface_timestepper_type, self.eq_free_surface,
                self.dt, o, semi_implicit=True,
            ) if nho.update_free_surface else None
        self._build_advance()
        self._timestepper_created = True

    def _checkpoint_field_keys(self):
        """Every prognostic field needed for a bit-exact restart
        (ref state list ``solver2d.py:874-921``)."""
        keys = ["elev_2d", "uv_2d"] + list(self.tracer_labels)
        if self.solve_sediment:
            keys.append("sediment_2d")
        if self.solve_exner:
            keys.append("bathymetry_2d")
        if getattr(self, "solve_nh", False):
            keys += ["q_2d", "w_2d"]
        return keys

    def create_exporters(self):
        """ref ``solver2d.py:704-730``."""
        o = self.options
        self.exporters = {}
        if not o.no_exports:
            self.exporters["vtk"] = ExportManager(
                o.output_directory, o.fields_to_export, self.fields,
                # ParaView .vtu/.pvd series like the reference; NPZ
                # available via options.export_format='npz'
                export_type=str(getattr(o, "export_format", "vtk")),
            )
            self.exporters["hdf5"] = ExportManager(
                o.output_directory,
                o.fields_to_export_hdf5 or self._checkpoint_field_keys(),
                self.fields, export_type="hdf5",
            )
        self._exporters_created = True

    def initialize(self):
        if not self._functions_created:
            self.create_fields()
        if not self._equations_created:
            self.create_equations()
        if not self._timestepper_created:
            self.create_timestepper()
        if not self._exporters_created:
            self.create_exporters()
        self._initialized = True

    # ------------------------------------------------------------------
    def compute_time_step(self, u_scale=0.0):
        """Max explicit dt from CFL: dt = dx / (sqrt(g H) + U)
        (ref ``solver2d.py:149-176``)."""
        g = physical_constants["g_grav"]
        mesh = self.mesh2d
        b = np.asarray(self.fields.bathymetry_2d.data)
        if b.shape[:1] == (mesh.nv,):
            H_cell = b[mesh.cells_np].mean(axis=1)
        elif b.ndim >= 2:
            H_cell = b.mean(axis=1)
        else:
            H_cell = np.full(mesh.nc, float(b))
        H_cell = np.maximum(H_cell, 0.05)
        u = np.sqrt(g * H_cell) + float(u_scale)
        return mesh.cell_hmin_np / u

    def set_time_step(self, alpha=0.05):
        """ref ``solver2d.py:215-248``."""
        o = self.options
        automatic = getattr(o.swe_timestepper_options, "use_automatic_timestep",
                            False)
        if automatic:
            dts = self.compute_time_step(u_scale=float(o.horizontal_velocity_scale))
            self.dt = float(o.cfl_2d * alpha * dts.min())
        else:
            assert o.timestep is not None and o.timestep > 0
            self.dt = float(o.timestep)
        print_output(f"dt = {self.dt}")

    # ------------------------------------------------------------------
    def _gather_swe_fields(self):
        o = self.options
        f = {}
        pairs = [
            ("coriolis_frequency", "coriolis"),
            ("horizontal_viscosity", "viscosity_h"),
            ("wind_stress", "wind_stress"),
            ("atmospheric_pressure", "atmospheric_pressure"),
            ("quadratic_drag_coefficient", "quadratic_drag_coefficient"),
            ("manning_drag_coefficient", "manning_drag_coefficient"),
            ("nikuradse_bed_roughness", "nikuradse_bed_roughness"),
            ("linear_drag_coefficient", "linear_drag_coefficient"),
            ("momentum_source_2d", "momentum_source"),
            ("volume_source_2d", "volume_source"),
        ]
        for opt_key, eq_key in pairs:
            v = getattr(o, opt_key)
            if v is not None:
                f[eq_key] = _value(v)
        f["lax_friedrichs_velocity_scaling_factor"] = _value(
            o.lax_friedrichs_velocity_scaling_factor
        )
        return f

    def _gather_tracer_fields(self, state):
        o = self.options
        f = {
            "uv_2d": state["uv"],
            "elev_2d": state["elev"],
            "lax_friedrichs_tracer_scaling_factor": _value(
                o.lax_friedrichs_tracer_scaling_factor
            ),
            "tracer_advective_velocity_factor": _value(
                o.tracer_advective_velocity_factor
            ),
        }
        for label, topt in o.tracer.items():
            if topt.diffusivity is not None:
                f[f"diffusivity_h-{label}"] = _value(topt.diffusivity)
            elif o.horizontal_diffusivity is not None:
                f[f"diffusivity_h-{label}"] = _value(o.horizontal_diffusivity)
            if topt.source is not None and not callable(topt.source):
                # callable (state-dependent reaction) sources are
                # evaluated inside the jitted advance at the current
                # Picard iterate (see _build_advance)
                f[f"source-{label}"] = _value(topt.source)
        return f

    def _gather_bnd(self, which):
        out = {}
        for marker, spec in self.bnd_functions[which].items():
            out[int(marker)] = {k: _value(v) for k, v in spec.items()}
        return out

    # ------------------------------------------------------------------
    def _build_advance(self):
        """Construct the jitted coupled advance function."""
        solve_tracer = self.solve_tracer
        swe_stepper = self.timestepper
        tracer_stepper = getattr(self, "tracer_stepper", None)
        limiter = getattr(self, "tracer_limiter", None)
        labels = self.tracer_labels
        tracer_only = self.options.tracer_only
        tracer_picard = int(getattr(self.options,
                                    "tracer_picard_iterations", 1) or 1)
        callable_sources = {
            l: topt.source for l, topt in self.options.tracer.items()
            if callable(topt.source)
        }
        if tracer_picard > 1 and solve_tracer:
            from ..timeintegration.steppers import CrankNicolson as _CN
            if not isinstance(tracer_stepper, _CN):
                raise NotImplementedError(
                    "tracer_picard_iterations > 1 requires a CrankNicolson"
                    "-family tracer timestepper (ref "
                    "coupled_timeintegrator_2d.py:115-135)"
                )

        def gather_tracer_fields_traced(state, extra):
            f = dict(extra)
            f["uv_2d"] = state["uv"]
            f["elev_2d"] = state["elev"]
            return f

        solve_sediment = self.solve_sediment
        solve_exner = self.solve_exner
        sediment_stepper = getattr(self, "sediment_stepper", None)
        exner_stepper = getattr(self, "exner_stepper", None)
        sediment_model = getattr(self, "sediment_model", None)
        asm = self.asm
        depth = self.depth
        eq_sw = self.eq_sw
        bnd_sed = self._gather_bnd("sediment") if solve_sediment else {}

        solve_nh = getattr(self, "solve_nh", False)
        poisson = getattr(self, "poisson_solver", None)
        fs_stepper = getattr(self, "fs_stepper", None)
        bathy_v = (self.fields.bathymetry_2d.data
                   if solve_nh else None)

        def advance(t, state, swe_fields, tracer_extra, bnd_sw, bnd_tr):
            # lock-step coupled advance (ref coupled_timeintegrator_2d.py:
            # 93-113): SWE -> (NH pressure + fs corrector) ->
            # tracers(+limiter) -> sediment(+limiter) -> Exner
            sw = {"uv": state["uv"], "elev": state["elev"]}
            if solve_exner:
                swe_fields = dict(swe_fields)
                swe_fields["bathymetry_2d"] = state["bathymetry"]
            if not tracer_only:
                sw = swe_stepper.advance(t, sw, swe_fields, swe_fields, bnd_sw)
            new_state = dict(state)
            new_state["uv"] = sw["uv"]
            new_state["elev"] = sw["elev"]
            if solve_nh:
                # serial NH advance (ref coupled_timeintegrator_2d.py:
                # 205-219): Poisson solve -> velocity update -> free
                # surface corrector from the pre-step elevation
                q, uv_c, w_c = poisson.solve(
                    sw["uv"], state["w"], sw["elev"], bathy_v,
                    q0=state["q"],
                )
                new_state["q"] = q
                new_state["w"] = w_c
                new_state["uv"] = uv_c
                if fs_stepper is not None:
                    # midpoint velocity centres the eta update in time
                    # (2nd-order splitting; frozen end-of-step velocity
                    # costs one order, measured)
                    ff = {"uv_2d": 0.5 * (state["uv"] + uv_c)}
                    fs = fs_stepper.advance(
                        t, {"elev": state["elev"]}, ff, ff, bnd_sw
                    )
                    new_state["elev"] = fs["elev"]
            if solve_tracer:
                tf = gather_tracer_fields_traced(new_state, tracer_extra)
                tr0 = {l: state[l] for l in labels}
                tr = tr0
                # tracer Picard sweeps re-linearize the semi-implicit
                # solve at the previous iterate and re-evaluate any
                # state-dependent (reaction) sources with it
                # (ref ``coupled_timeintegrator_2d.py:115-135``; the
                # gray_scott example is the use case)
                for i in range(tracer_picard):
                    tf_i = tf
                    if callable_sources:
                        tf_i = dict(tf)
                        for l, fn in callable_sources.items():
                            tf_i[f"source-{l}"] = fn(tr)
                    tr = tracer_stepper.advance(
                        t, tr0, tf_i, tf_i, bnd_tr,
                        **({"linearization_state": tr} if i > 0 else {}),
                    )
                    if limiter is not None:
                        tr = {l: limiter.apply(cl) for l, cl in tr.items()}
                for l in labels:
                    new_state[l] = tr[l]
            if solve_sediment:
                sf = {
                    "uv_2d": new_state["uv"],
                    "elev_2d": new_state["elev"],
                    "lax_friedrichs_tracer_scaling_factor":
                        tracer_extra.get(
                            "lax_friedrichs_tracer_scaling_factor", 1.0
                        ) if tracer_extra else 1.0,
                }
                if solve_exner:
                    sf["bathymetry_2d"] = state["bathymetry"]
                diff = tracer_extra.get("diffusivity_h-sediment_2d")
                if diff is not None:
                    sf["diffusivity_h-sediment_2d"] = diff
                if sediment_model.use_advective_velocity_correction:
                    # factor at P1DG dof points (Function product analogue)
                    b = (
                        state["bathymetry"] if solve_exner
                        else self.fields.bathymetry_2d.data
                    )
                    b_dof = (
                        b[self.mesh2d.cells] if b.ndim == 1 and
                        b.shape[0] == self.mesh2d.nv else b
                    )
                    H_dof = depth.total_depth(b_dof, new_state["elev"])
                    sf["tracer_advective_velocity_factor"] = (
                        sediment_model
                        .get_advective_velocity_correction_factor(
                            new_state["uv"], H_dof
                        )
                    )
                sed = {"sediment_2d": state["sediment_2d"]}
                sed = sediment_stepper.advance(t, sed, sf, sf, bnd_sed)
                cl = sed["sediment_2d"]
                if limiter is not None:
                    cl = limiter.apply(cl)
                new_state["sediment_2d"] = cl
            if solve_exner:
                ef = {
                    "uv_2d": new_state["uv"],
                    "elev_2d": new_state["elev"],
                    "sediment": new_state.get("sediment_2d"),
                }
                zb = {"bathymetry": state["bathymetry"]}
                zb = exner_stepper.advance(t, zb, ef, ef, {})
                new_state["bathymetry"] = zb["bathymetry"]
            return new_state

        self._advance = advance
        self._advance_jit = jax.jit(advance)

        def advance_n(state, t0, dt, n, swe_fields, tracer_extra, bnd_sw, bnd_tr):
            def body(carry, i):
                s, t = carry
                s = advance(t, s, swe_fields, tracer_extra, bnd_sw, bnd_tr)
                return (s, t + dt), None

            (s, _), _ = jax.lax.scan(body, (state, t0), jnp.arange(n))
            return s

        self._advance_n_jit = jax.jit(advance_n, static_argnames=("n",))

    def _get_state(self):
        s = {"uv": self.fields.uv_2d.data, "elev": self.fields.elev_2d.data}
        for l in self.tracer_labels:
            s[l] = self.fields[l].data
        if self.solve_sediment:
            s["sediment_2d"] = self.fields.sediment_2d.data
        if self.solve_exner:
            s["bathymetry"] = self.fields.bathymetry_2d.data
        if getattr(self, "solve_nh", False):
            s["q"] = self.fields.q_2d.data
            s["w"] = self.fields.w_2d.data
        return s

    def _set_state(self, s):
        self.fields.uv_2d.data = s["uv"]
        self.fields.elev_2d.data = s["elev"]
        for l in self.tracer_labels:
            self.fields[l].data = s[l]
        if self.solve_sediment:
            self.fields.sediment_2d.data = s["sediment_2d"]
        if self.solve_exner:
            self.fields.bathymetry_2d.data = s["bathymetry"]
        if getattr(self, "solve_nh", False):
            self.fields.q_2d.data = s["q"]
            self.fields.w_2d.data = s["w"]

    # ------------------------------------------------------------------
    def differentiable_forward(self, controls, terminal_functional=None,
                               step_functional=None, n_steps=None,
                               checkpoint=None):
        """Build a pure, differentiable forward model ``fn(*control_arrays)
        -> scalar J`` for use with :mod:`thetis_tpu.adjoint` (the analogue
        of a pyadjoint-taped ``iterate`` run, SURVEY.md section 3.5).

        :arg controls: list of control names — any SWE coefficient option
            ('quadratic_drag_coefficient', 'manning_drag_coefficient',
            'linear_drag_coefficient', 'horizontal_viscosity',
            'coriolis_frequency', 'wind_stress', 'momentum_source_2d', ...),
            'turbine_density_{i}', 'initial_elev' or 'initial_uv'.
        :arg terminal_functional: callable ``f(state) -> scalar`` on the
            final state pytree
        :arg step_functional: callable ``f(state, fields, t) -> scalar``
            accumulated as ``sum_i f(...) * dt``
        :kwarg checkpoint: adjoint memory checkpointing (the analogue of
            the reference's pyadjoint tape checkpointing, ref
            ``solver2d.py:987-989``).  ``False`` stores every step's
            activations (cheapest gradients, O(n) memory); ``True`` or an
            int chunk size runs the sqrt-N remat schedule
            (:func:`~thetis_tpu.adjoint.checkpointing.checkpointed_scan`,
            one extra forward per backward at O(sqrt n) memory).  The
            default ``None`` enables it for runs longer than 128 steps.
        """
        if not self._initialized:
            self.initialize()
        o = self.options
        n = n_steps or int(round(o.simulation_end_time / self.dt))
        state0 = {k: v for k, v in self._get_state().items()}
        base_fields = self._gather_swe_fields()
        tracer_extra = (
            {k: v for k, v in self._gather_tracer_fields(state0).items()
             if k not in ("uv_2d", "elev_2d")}
            if self.solve_tracer else {}
        )
        bnd_sw = self._gather_bnd("shallow_water")
        bnd_tr = self._gather_bnd("tracer")
        name_map = {
            "bathymetry_2d": "bathymetry_2d",
            "coriolis_frequency": "coriolis",
            "horizontal_viscosity": "viscosity_h",
            "wind_stress": "wind_stress",
            "atmospheric_pressure": "atmospheric_pressure",
            "quadratic_drag_coefficient": "quadratic_drag_coefficient",
            "manning_drag_coefficient": "manning_drag_coefficient",
            "nikuradse_bed_roughness": "nikuradse_bed_roughness",
            "linear_drag_coefficient": "linear_drag_coefficient",
            "momentum_source_2d": "momentum_source",
            "volume_source_2d": "volume_source",
        }
        dt = self.dt
        advance = self._advance

        def forward(*vals):
            fields = dict(base_fields)
            st = dict(state0)
            for name, v in zip(controls, vals):
                if name == "initial_elev":
                    st["elev"] = v
                elif name == "initial_uv":
                    st["uv"] = v
                elif name.startswith("turbine_density"):
                    fields[name] = self.eq_sw._any_cell_q(v)
                else:
                    fields[name_map[name]] = v

            def body(carry):
                s, t, acc = carry
                s = advance(t, s, fields, tracer_extra, bnd_sw, bnd_tr)
                if step_functional is not None:
                    acc = acc + step_functional(s, fields, t) * dt
                return (s, t + dt, acc)

            carry0 = (st, 0.0, jnp.asarray(0.0, dtype=st["elev"].dtype))
            use_ckpt = checkpoint if checkpoint is not None else (n > 128)
            if use_ckpt:
                from ..adjoint.checkpointing import checkpointed_scan
                chunk = checkpoint if isinstance(checkpoint, int) and \
                    not isinstance(checkpoint, bool) else None
                s, _, acc = checkpointed_scan(body, carry0, n, chunk=chunk)
            else:
                (s, _, acc), _ = jax.lax.scan(
                    lambda c, _: (body(c), None), carry0, None, length=n,
                )
            J = acc
            if terminal_functional is not None:
                J = J + terminal_functional(s)
            return J

        return forward

    # ------------------------------------------------------------------
    def assign_initial_conditions(self, elev=None, uv=None, **tracers):
        """ref ``solver2d.py:747-783``."""
        if not self._initialized:
            self.initialize()
        if elev is not None:
            self.fields.elev_2d.data = self._interp_to(
                self.function_spaces.H_2d, elev
            )
        if uv is not None:
            self.fields.uv_2d.data = self._interp_to(
                self.function_spaces.U_2d, uv
            )
        for label, value in tracers.items():
            if label == "tracer" and "tracer_2d" in self.tracer_labels:
                # reference alias: assign_initial_conditions(tracer=...)
                label = "tracer_2d"
            if label in self.tracer_labels or (
                label == "sediment_2d" and self.solve_sediment
            ):
                self.fields[label].data = self._interp_to(
                    self.function_spaces.Q_2d, value
                )
            elif label == "sediment" and self.solve_sediment:
                self.fields.sediment_2d.data = self._interp_to(
                    self.function_spaces.Q_2d, value
                )

    def _interp_to(self, space, value):
        if getattr(space, "family", "") in ("RT", "BDM"):
            v = value.data if isinstance(value, Function) else value
            if isinstance(v, Constant):
                v = v.value
            return space.project_vector(v)
        if isinstance(value, Function):
            src = value
            if src.function_space is space:
                return src.data
            # interpolate between spaces on the same mesh via dof coords
            if src.function_space.family == "CG" and space.family == "DG":
                # gather CG values at DG nodes (vertex-collocated for P1)
                cd = src.function_space.cell_dofs(src.data)
                if space.dim > 1 and cd.ndim == 2:
                    cd = jnp.stack([cd] * space.dim, axis=-1)
                return cd
            return jnp.broadcast_to(src.data, space.dof_shape())
        if isinstance(value, Constant):
            value = value.value
        value = jnp.asarray(value)
        if value.shape == space.dof_shape():
            return value
        # CG1 vertex data (scalar or vector) -> DG nodes via the cell map
        if value.shape[:1] == (self.mesh2d.nv,):
            return value[self.mesh2d.cells].astype(space.zero_dofs().dtype)
        return jnp.broadcast_to(value, space.dof_shape()).astype(
            space.zero_dofs().dtype
        )

    # ------------------------------------------------------------------
    def _subdomain_mask(self, subdomain):
        """Cell mask for a subdomain id; 'everywhere' -> None.  Meshes may
        carry per-cell region markers in ``mesh.cell_markers_np``."""
        if subdomain in ("everywhere", None):
            return None
        markers = getattr(self.mesh2d, "cell_markers_np", None)
        if markers is None:
            raise ValueError(
                f"mesh has no cell markers; cannot restrict to subdomain "
                f"{subdomain}"
            )
        return (np.asarray(markers) == int(subdomain)).astype(float)

    def add_callback(self, callback, eval_interval="export"):
        self.callbacks.add(callback, eval_interval)

    def compute_volume_2d(self):
        eta = self.fields.elev_2d.data
        if self.options.element_family in ("rt-dg", "bdm-dg"):
            area = np.asarray(self.mesh2d.cell_area_np)
            return float((area * np.asarray(eta[:, 0])).sum()
                         + (area * np.asarray(self.eq_sw.bathy_c)).sum())
        if eta.ndim == 1:  # CG elevation (dg-cg family)
            eta_int = float(self.asm.integrate_cellq(
                self.eq_sw.eta_cell_values(eta)))
        else:
            eta_int = float(self.asm.integrate(eta))
        return eta_int + float(self.asm.integrate_cellq(self.eq_sw.bathy_q))

    def compute_tracer_mass(self, label):
        eta_q = self.asm.cell_values(self.fields.elev_2d.data)
        H_q = self.depth.total_depth(self.eq_sw.bathy_q, eta_q)
        c_q = self.asm.cell_values(self.fields[label].data)
        return float(self.asm.integrate_cellq(H_q * c_q))

    def create_iterator(self, update_forcings=None, export_func=None):
        """Generator stepping the model one time step per ``next()``,
        yielding the simulation time after each step and handling exports
        — for user code that needs per-step control of the loop
        (ref ``solver2d.py:997-1076``):

        .. code-block:: python

            for t in solver_obj.create_iterator():
                ...  # user code runs between steps
        """
        if not self._initialized:
            self.initialize()
        o = self.options
        state = self._get_state()
        self.next_export_t = self.simulation_time + o.simulation_export_time
        if not self._initial_export_done:
            self._initial_export_done = True
            self.print_state(0.0)
            if not o.no_exports:
                self.export()
            if export_func is not None:
                export_func()
        t_epsilon = 1e-5
        while self.simulation_time <= o.simulation_end_time - t_epsilon:
            if update_forcings is not None:
                update_forcings(self.simulation_time + self.dt)
            swe_fields = self._gather_swe_fields()
            tracer_extra = (
                self._gather_tracer_fields(state) if self.solve_tracer
                else {}
            )
            for k in ("uv_2d", "elev_2d"):
                tracer_extra.pop(k, None)
            bnd_sw = self._gather_bnd("shallow_water")
            bnd_tr = self._gather_bnd("tracer")
            state = self._advance_jit(
                self.simulation_time, state, swe_fields, tracer_extra,
                bnd_sw, bnd_tr,
            )
            self.iteration += 1
            self.simulation_time += self.dt
            self._set_state(state)
            self.callbacks.evaluate(mode="timestep")
            if self.simulation_time >= self.next_export_t - t_epsilon:
                self.i_export += 1
                self.next_export_t += o.simulation_export_time
                self.print_state(0.0)
                if not o.no_exports:
                    self.export()
                if export_func is not None:
                    export_func()
            yield self.simulation_time

    def print_state_debug(self):
        """Min/max dump of every registered field (ref
        ``solver.py:1193-1214`` ``print_state_debug``)."""
        for key in sorted(self.fields.keys()):
            d = np.asarray(self.fields[key].data)
            print_output(
                f"{key:16s} {d.min():14.6e} .. {d.max():14.6e}"
            )

    def print_state(self, cputime, print_header=False):
        """ref ``solver2d.py:923-971``."""
        eta = self.fields.elev_2d.data
        if self.options.element_family in ("rt-dg", "bdm-dg"):
            norm_eta = float(self.eq_sw.norm_elev(eta))
            norm_uv = float(self.eq_sw.norm_uv(self.fields.uv_2d.data))
        elif eta.ndim == 1:  # CG elevation (dg-cg family)
            norm_eta = float(self.eq_sw.norm_elev(eta))
            norm_uv = float(self.asm.norm_l2(self.fields.uv_2d.data))
        else:
            norm_eta = float(self.asm.norm_l2(eta))
            norm_uv = float(self.asm.norm_l2(self.fields.uv_2d.data))
        line = (
            "{iexp:5d} {i:5d} T={t:10.2f} eta norm: {e:10.4f} "
            "u norm: {u:10.4f} {cpu:5.2f}"
        )
        print_output(
            line.format(
                iexp=self.i_export, i=self.iteration,
                t=self.simulation_time, e=norm_eta, u=norm_uv, cpu=cputime,
            )
        )

    # ------------------------------------------------------------------
    def export(self):
        self.callbacks.evaluate(mode="export")
        for e in self.exporters.values():
            e.export(time=self.simulation_time, iteration=self.iteration)

    def load_state(self, i_export, outputdir=None, t=None, iteration=None):
        """Restart from HDF5 checkpoints: every prognostic field (tracers,
        sediment, Exner bathymetry, NH q/w included) is restored so the
        continued trajectory is bit-exact (ref ``solver2d.py:820-921``)."""
        if not self._initialized:
            self.initialize()
        outputdir = outputdir or self.options.output_directory
        from .exporter import HDF5Exporter

        keys = (self.options.fields_to_export_hdf5
                or self._checkpoint_field_keys())
        for key in keys:
            meta = field_metadata.get(key, {"filename": key})
            e = HDF5Exporter(
                self.fields[key].function_space, outputdir + "/hdf5",
                meta["filename"],
            )
            tload = e.load(i_export, self.fields[key])
        self.i_export = i_export
        self.simulation_time = (
            t if t is not None
            else (tload if tload is not None
                  else i_export * self.options.simulation_export_time)
        )
        self.iteration = (
            iteration if iteration is not None
            else int(np.ceil(self.simulation_time / self.dt))
        )
        self.next_export_t = self.simulation_time + self.options.simulation_export_time
        self.i_export += 1
        for e in self.exporters.values():
            e.set_next_export_ix(self.i_export)

    # ------------------------------------------------------------------
    def _resolve_end_date(self):
        """``simulation_end_date`` (+ ``simulation_initial_date``) wins
        over ``simulation_end_time`` (ref ``solver2d.py:1086-1103``)."""
        o = self.options
        init_date, end_date = o.simulation_initial_date, o.simulation_end_date
        if init_date is None or end_date is None:
            return
        import datetime

        now = init_date + datetime.timedelta(seconds=self.simulation_time)
        assert end_date > now, (
            f"simulation end date must be greater than initial time {now}"
        )
        if o.simulation_end_time is not None:
            print_output(
                "WARNING: both simulation_end_date and simulation_end_time "
                "set; ignoring simulation_end_time"
            )
        o.simulation_end_time = (
            (end_date - now).total_seconds() + self.simulation_time
        )

    def iterate(self, update_forcings=None, export_func=None):
        """Main time loop (ref ``solver2d.py:974-1144``)."""
        if not self._initialized:
            self.initialize()
        o = self.options
        self._resolve_end_date()
        if o.log_output and not o.no_exports:
            from ..utils.log import set_log_directory

            set_log_directory(o.output_directory)

        # auto-attach conservation/overshoot callbacks (ref L1040-1085);
        # their time series go to HDF5 when export_diagnostics is on
        # (ref ``solver2d.py:1040``)
        dump_hdf5 = o.export_diagnostics and not o.no_exports
        if o.check_volume_conservation_2d:
            self.add_callback(
                VolumeConservation2DCallback(self, export_to_hdf5=dump_hdf5))
        if o.check_tracer_conservation:
            for label in self.tracer_labels:
                self.add_callback(
                    TracerMassConservation2DCallback(
                        label, self, export_to_hdf5=dump_hdf5)
                )
        if o.check_tracer_overshoot:
            for label in self.tracer_labels:
                self.add_callback(TracerOvershootCallBack(
                    label, self, export_to_hdf5=dump_hdf5))

        t_epsilon = 1e-5
        self.next_export_t = self.simulation_time + o.simulation_export_time
        state = self._get_state()

        if not self._initial_export_done:
            self.print_state(0.0)
            if not o.no_exports:
                self.export()
            self._initial_export_done = True

        has_timestep_callbacks = len(self.callbacks.get("timestep", {})) > 0
        use_scan = update_forcings is None and not has_timestep_callbacks
        cpu_t0 = time_mod.perf_counter()

        while self.simulation_time <= o.simulation_end_time - t_epsilon:
            swe_fields = self._gather_swe_fields()
            tracer_extra = (
                self._gather_tracer_fields(state) if self.solve_tracer else {}
            )
            if self.solve_sediment:
                # sediment-specific diffusivity wins over the global one
                # (ref SedimentModelOptions.horizontal_diffusivity)
                sed_diff = (self.options.sediment_model_options
                            .horizontal_diffusivity
                            or self.options.horizontal_diffusivity)
                if sed_diff is not None:
                    tracer_extra["diffusivity_h-sediment_2d"] = _value(
                        sed_diff)
            for k in ("uv_2d", "elev_2d"):
                tracer_extra.pop(k, None)
            bnd_sw = self._gather_bnd("shallow_water")
            bnd_tr = self._gather_bnd("tracer")

            from ..utils.profiling import timed_stage

            if use_scan:
                t_target = min(self.next_export_t, o.simulation_end_time)
                n = max(
                    1, int(round((t_target - self.simulation_time) / self.dt))
                )
                with timed_stage("coupled_advance"):
                    state = self._advance_n_jit(
                        state, self.simulation_time, self.dt, n, swe_fields,
                        tracer_extra, bnd_sw, bnd_tr,
                    )
                self.iteration += n
                self.simulation_time += n * self.dt
            else:
                if update_forcings is not None:
                    update_forcings(self.simulation_time + self.dt)
                    swe_fields = self._gather_swe_fields()
                    bnd_sw = self._gather_bnd("shallow_water")
                    bnd_tr = self._gather_bnd("tracer")
                with timed_stage("coupled_advance"):
                    state = self._advance_jit(
                        self.simulation_time, state, swe_fields, tracer_extra,
                        bnd_sw, bnd_tr,
                    )
                self.iteration += 1
                self.simulation_time += self.dt
                self._set_state(state)
                self.callbacks.evaluate(mode="timestep")

            if self.simulation_time >= self.next_export_t - t_epsilon:
                self._set_state(state)
                self.i_export += 1
                self.next_export_t += o.simulation_export_time
                cpu = time_mod.perf_counter() - cpu_t0
                cpu_t0 = time_mod.perf_counter()
                self.print_state(cpu)
                if not o.no_exports:
                    self.export()
                if export_func is not None:
                    export_func()
        self._set_state(state)
