"""Diagnostic calculators for the baroclinic eddies / lock exchange
tests (port of ref ``examples/baroclinic_eddies/diagnostics.py``).

``RPECalculator`` computes the reference potential energy (RPE) from the
density field: the potential energy of the adiabatically re-sorted
(heaviest-at-bottom) state,

    RPE = g * sum(rho_sorted * V_nodal * z_sorted)

a standard metric of spurious dianeutral mixing (Ilicak et al. 2012).
Relative RPE, (RPE(t) - RPE(0)) / RPE(0), measures the fraction of the
initial potential energy lost to mixing.
"""
import numpy as np

from thetis_tpu.model.callback import DiagnosticCallback
from thetis_tpu.config import physical_constants

__all__ = ["RPECalculator"]


class RPECalculator(DiagnosticCallback):
    """Reference potential energy from the sorted density field
    (ref ``diagnostics.py:7-68``).

    The nodal volumes use the lumped prism mass (cell_area/3 per
    horizontal node x half layer thickness per vertical node) on the
    CURRENT mesh geometry, so free-surface motion is accounted for.
    """

    name = "rpe"
    variable_names = ["rpe", "rel_rpe"]

    def __init__(self, solver_obj, **kw):
        super().__init__(solver_obj, array_dim=2, **kw)
        s = solver_obj
        self.area_2d = float(np.asarray(s.mesh2d.cell_area_np).sum())
        self.initial_rpe = None

    def _nodal_volumes(self):
        s = self.solver_obj
        import jax.numpy as jnp
        z_if = np.asarray(s.extruded.z_interfaces(
            s.bathy_cell, jnp.asarray(s.fields.elev_2d.data)))
        dz = z_if[:, :, 1:] - z_if[:, :, :-1]          # (nc, 3, nz)
        area = np.asarray(s.mesh2d.cell_area_np)       # (nc,)
        vol = (area[:, None, None] / 3.0) * dz / 2.0   # per (c, d, l)
        return np.stack([vol, vol], axis=-1)           # (nc, 3, nz, 2)

    def __call__(self):
        s = self.solver_obj
        rho0 = float(physical_constants["rho0"])
        g = float(physical_constants["g_grav"])
        # density anomaly from the current T/S state
        rho = np.asarray(s.density_solver.solve(
            s.fields.salt_3d.data, s.fields.temp_3d.data))
        vol = self._nodal_volumes()
        rho_flat = rho.ravel() + rho0
        vol_flat = vol.ravel()
        order = np.argsort(rho_flat)[::-1]  # heaviest first (bottom)
        rho_s = rho_flat[order]
        vol_s = vol_flat[order]
        z = (np.cumsum(vol_s) - 0.5 * vol_s) / self.area_2d
        rpe = float(g * np.sum(rho_s * vol_s * z))
        if self.initial_rpe is None:
            self.initial_rpe = rpe
        rel_rpe = (rpe - self.initial_rpe) / self.initial_rpe
        return rpe, rel_rpe

    def message_str(self, *args):
        return f"rpe {args[0]:.6e}, rel. rpe {args[1]:11.4e}"
