"""Diagnostic callback framework.

Mirrors the reference's ``thetis/callback.py``: a ``CallbackManager`` with
'export'/'timestep' evaluation modes (ref L14-59), a ``DiagnosticCallback``
ABC (name, variable_names, ``__call__``, ``message_str``; ref L162-302),
appendable HDF5 time-series output (``DiagnosticHDF5``, ref L62-159), and
the stock conservation / overshoot / detector callbacks (ref L335-587).
"""
import os
from collections import OrderedDict

import numpy as np

from ..utils.log import print_output

__all__ = [
    "CallbackManager",
    "DiagnosticCallback",
    "DiagnosticHDF5",
    "VolumeConservation2DCallback",
    "TracerMassConservation2DCallback",
    "TracerOvershootCallBack",
    "MinMaxConservationCallback",
    "DetectorsCallback",
    "TimeSeriesCallback2D",
    "TimeSeriesCallback3D",
    "VerticalProfileCallback",
    "TransectCallback",
]


class CallbackManager(OrderedDict):
    """dict of dicts: mode -> {name: callback} (ref ``callback.py:14-59``)."""

    def add(self, callback, mode):
        key = callback.name
        self.setdefault(mode, OrderedDict())[key] = callback

    def evaluate(self, mode, index=None):
        for callback in self.get(mode, {}).values():
            callback.evaluate(index=index)


class DiagnosticHDF5:
    """Appendable HDF5 time series (ref ``callback.py:62-159``)."""

    def __init__(self, filename, varnames, array_dim=1, attrs=None):
        import h5py

        self.filename = filename
        self.varnames = varnames
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        with h5py.File(filename, "w") as f:
            f.create_dataset("time", (0, 1), maxshape=(None, 1))
            for v in varnames:
                f.create_dataset(v, (0, array_dim), maxshape=(None, array_dim))
            for k, val in (attrs or {}).items():
                f.attrs[k] = val

    def export(self, time, variables):
        import h5py

        with h5py.File(self.filename, "a") as f:
            ix = f["time"].shape[0]
            f["time"].resize((ix + 1, 1))
            f["time"][ix] = time
            for name, val in zip(self.varnames, variables):
                ds = f[name]
                ds.resize((ix + 1, ds.shape[1]))
                ds[ix, :] = np.atleast_1d(np.asarray(val))


class DiagnosticCallback:
    """ABC (ref ``callback.py:162-302``)."""

    name = None
    variable_names = None

    def __init__(self, solver_obj, array_dim=1, append_to_log=True,
                 export_to_hdf5=False, start_time=None, end_time=None):
        self.solver_obj = solver_obj
        self.append_to_log = append_to_log
        self.export_to_hdf5 = export_to_hdf5
        self.start_time = start_time
        self.end_time = end_time
        self._hdf5 = None
        self.array_dim = array_dim

    def set_write_mode(self, mode):
        pass

    def _create_hdf5(self):
        fn = os.path.join(
            self.solver_obj.options.output_directory,
            "diagnostic_" + self.name.replace(" ", "_") + ".hdf5",
        )
        self._hdf5 = DiagnosticHDF5(fn, self.variable_names, self.array_dim)

    def __call__(self):
        raise NotImplementedError

    def message_str(self, *args):
        return f"{self.name}: " + " ".join(str(a) for a in args)

    def push_to_log(self, time, args):
        if self.append_to_log:
            print_output(self.message_str(*args))

    def evaluate(self, index=None):
        t = self.solver_obj.simulation_time
        if self.start_time is not None and t < self.start_time:
            return
        if self.end_time is not None and t > self.end_time:
            return
        values = self.__call__()
        self.push_to_log(t, values)
        if self.export_to_hdf5:
            if self._hdf5 is None:
                self._create_hdf5()
            self._hdf5.export(t, values)


class ScalarConservationCallback(DiagnosticCallback):
    """Tracks relative deviation of a scalar quantity
    (ref ``callback.py:305-332``)."""

    def __init__(self, scalar_callback, solver_obj, **kwargs):
        self.scalar_callback = scalar_callback
        self.initial_value = None
        super().__init__(solver_obj, **kwargs)

    def __call__(self):
        value = float(self.scalar_callback())
        if self.initial_value is None:
            self.initial_value = value
        rel_diff = (value - self.initial_value) / max(abs(self.initial_value), 1e-300)
        return value, rel_diff

    def message_str(self, *args):
        return f"{self.name} rel. error {args[1]:11.4e}"


class VolumeConservation2DCallback(ScalarConservationCallback):
    """integral of elevation (ref ``callback.py:335-350``)."""

    name = "volume2d"
    variable_names = ["integral", "relative_difference"]

    def __init__(self, solver_obj, **kwargs):
        def vol():
            return solver_obj.compute_volume_2d()

        super().__init__(vol, solver_obj, **kwargs)


class VolumeConservation3DCallback(ScalarConservationCallback):
    """total 3D water volume (ref ``callback.py:353-364``)."""

    name = "volume3d"
    variable_names = ["integral", "relative_difference"]

    def __init__(self, solver_obj, **kwargs):
        def vol():
            return solver_obj.compute_volume_3d()

        super().__init__(vol, solver_obj, **kwargs)


class TracerMassConservation3DCallback(ScalarConservationCallback):
    """3D tracer mass (ref ``callback.py:367-382``)."""

    def __init__(self, tracer_name, solver_obj, **kwargs):
        self.name = tracer_name + " mass"
        self.variable_names = ["integral", "relative_difference"]

        def mass():
            return solver_obj.compute_tracer_mass_3d(tracer_name)

        super().__init__(mass, solver_obj, **kwargs)


class TracerMassConservation2DCallback(ScalarConservationCallback):
    """depth-integrated tracer mass (ref ``callback.py:385-409``)."""

    def __init__(self, tracer_name, solver_obj, **kwargs):
        self.name = tracer_name + " mass"
        self.variable_names = ["integral", "relative_difference"]

        def mass():
            return solver_obj.compute_tracer_mass(tracer_name)

        super().__init__(mass, solver_obj, **kwargs)


class MinMaxConservationCallback(DiagnosticCallback):
    """overshoot tracking (ref ``callback.py:434-463``)."""

    variable_names = ["min_value", "max_value", "undershoot", "overshoot"]

    def __init__(self, minmax_callback, solver_obj, **kwargs):
        self.minmax_callback = minmax_callback
        self.initial_value = None
        super().__init__(solver_obj, array_dim=1, **kwargs)

    def __call__(self):
        value = self.minmax_callback()
        if self.initial_value is None:
            self.initial_value = value
        overshoot = max(value[1] - self.initial_value[1], 0.0)
        undershoot = min(value[0] - self.initial_value[0], 0.0)
        return value[0], value[1], undershoot, overshoot

    def message_str(self, *args):
        return f"{self.name} overshoots {args[2]:g} {args[3]:g}"


class TracerOvershootCallBack(MinMaxConservationCallback):
    """tracer overshoot (ref ``callback.py:466-484``)."""

    def __init__(self, tracer_name, solver_obj, **kwargs):
        self.name = tracer_name + " overshoot"

        def minmax():
            d = np.asarray(solver_obj.fields[tracer_name].data)
            return float(d.min()), float(d.max())

        super().__init__(minmax, solver_obj, **kwargs)


class DetectorsCallback(DiagnosticCallback):
    """Point-sample fields at detector locations
    (ref ``callback.py:486-587``; point evaluation replaces VertexOnlyMesh
    with barycentric interpolation in the owner cell)."""

    def __init__(self, solver_obj, detector_locations, field_names, name,
                 detector_names=None, **kwargs):
        self.name = name
        self.field_names = field_names
        self.detector_names = detector_names or [
            f"detector{i}" for i in range(len(detector_locations))
        ]
        self.variable_names = self.detector_names
        ncomp = 0
        for f in field_names:
            ncomp += 2 if f.startswith("uv") else 1
        super().__init__(solver_obj, array_dim=ncomp, **kwargs)
        self._locate(np.asarray(detector_locations, dtype=float))

    def _locate(self, pts):
        """Find owner cell + barycentric weights for each point."""
        mesh = self.solver_obj.mesh2d
        coords = mesh.coords_np
        cells = mesh.cells_np
        p0, p1, p2 = (coords[cells[:, i]] for i in range(3))
        self.cell_ids = np.zeros(len(pts), dtype=np.int32)
        self.bary = np.zeros((len(pts), 3))
        for i, p in enumerate(pts):
            v0 = p1 - p0
            v1 = p2 - p0
            v2 = p[None, :] - p0
            d00 = (v0 * v0).sum(1)
            d01 = (v0 * v1).sum(1)
            d11 = (v1 * v1).sum(1)
            d20 = (v2 * v0).sum(1)
            d21 = (v2 * v1).sum(1)
            denom = d00 * d11 - d01 * d01
            v = (d11 * d20 - d01 * d21) / denom
            w = (d00 * d21 - d01 * d20) / denom
            u = 1.0 - v - w
            inside = (u >= -1e-10) & (v >= -1e-10) & (w >= -1e-10)
            cand = np.nonzero(inside)[0]
            if len(cand) == 0:
                # nearest cell centroid
                mids = coords[cells].mean(axis=1)
                cand = [np.argmin(((mids - p) ** 2).sum(1))]
            c = int(cand[0])
            self.cell_ids[i] = c
            self.bary[i] = [u[c], v[c], w[c]]

    def _sample(self, field):
        data = np.asarray(field.data)
        cd = data[self.cell_ids]  # (np, 3[, k])
        if cd.ndim == 3:
            return np.einsum("pd,pdk->pk", self.bary, cd)
        return np.einsum("pd,pd->p", self.bary, cd)

    def __call__(self):
        out = []
        for i in range(len(self.cell_ids)):
            vals = []
            for fname in self.field_names:
                v = self._sample(self.solver_obj.fields[fname])
                vals.append(np.atleast_1d(np.atleast_2d(v)[i] if np.ndim(v) > 1 else v[i:i+1]))
            out.append(np.concatenate(vals))
        return out

    def message_str(self, *args):
        return f"{self.name}: sampled {len(args)} detectors"


class TimeSeriesCallback2D(DetectorsCallback):
    """Station time series (ref ``callback.py:629-748``)."""

    def __init__(self, solver_obj, fieldnames, x, y, location_name, **kwargs):
        super().__init__(
            solver_obj, [[x, y]], fieldnames,
            name=f"timeseries_{location_name}", detector_names=[location_name],
            **kwargs,
        )


class AccumulatorCallback(DiagnosticCallback):
    """Time-integral of a scalar spatial functional (trapezium rule),
    e.g. time-dependent objective functionals for adjoint runs
    (ref ``callback.py:588-627``)."""

    variable_names = ["spatial integral at current timestep"]

    def __init__(self, scalar_callback, solver_obj, name="accumulator",
                 **kwargs):
        kwargs.setdefault("export_to_hdf5", False)
        kwargs.setdefault("append_to_log", False)
        self.name = name
        super().__init__(solver_obj, **kwargs)
        self.scalar_callback = scalar_callback
        self.dt = float(solver_obj.options.timestep)
        self.integrant = 0.0
        self.old_value = None

    def __call__(self):
        value = float(self.scalar_callback())
        if self.old_value is not None:
            self.integrant += 0.5 * (self.old_value + value) * self.dt
        self.old_value = value
        return [value]

    def get_val(self):
        return self.integrant

    def message_str(self, *args):
        return f"{self.name} value {args[0]:11.4e}"


def _profile_at_point(solver_obj, field_data, cell, bary):
    """Vertical interface profile of a dense 3D field (nc, 3, nz, 2[, k])
    at one horizontal point: (nz+1[, k]) values (DG layers averaged at
    interior interfaces) and the interface z coordinates."""
    import jax.numpy as jnp

    d = np.asarray(field_data[cell])  # (3, nz, 2[, k])
    prof_bot = d[:, :, 0]             # (3, nz[, k]) bottom values
    prof_top = d[:, :, 1]
    interior = 0.5 * (prof_top[:, :-1] + prof_bot[:, 1:])
    prof = np.concatenate(
        [prof_bot[:, :1], interior, prof_top[:, -1:]], axis=1
    )  # (3, nz+1[, k])
    prof_p = np.einsum("d,dz...->z...", bary, prof)
    z_if = np.asarray(solver_obj.extruded.z_interfaces(
        solver_obj.bathy_cell,
        jnp.asarray(np.asarray(solver_obj.fields.elev_2d.data)),
    ))[cell]  # (3, nz+1)
    z_p = np.einsum("d,dz->z", bary, z_if)
    return prof_p, z_p


class VerticalProfileCallback(DiagnosticCallback):
    """Extract vertical profiles of 3D fields at an (x, y) location
    (ref ``callback.py:860-1000`` ``VerticalProfileCallback``): values at
    the layer interfaces of the column containing the point, plus the
    interface z coordinates (first variable)."""

    def __init__(self, solver_obj, fieldnames, x, y, location_name,
                 **kwargs):
        self.fieldnames = list(fieldnames)
        self.location_name = location_name
        short = "-".join(f.split("_")[0] for f in self.fieldnames)
        self.name = f"vertprofile_{location_name}_{short}"
        self.variable_names = ["z_coord"] + list(self.fieldnames)
        nz1 = solver_obj.n_layers + 1
        super().__init__(solver_obj, array_dim=nz1, **kwargs)
        det = DetectorsCallback.__new__(DetectorsCallback)
        det.solver_obj = solver_obj
        det._locate(np.asarray([[x, y]], dtype=float))
        self.cell = int(det.cell_ids[0])
        self.bary = det.bary[0]

    def __call__(self):
        out = None
        vals = []
        for fname in self.fieldnames:
            data = np.asarray(self.solver_obj.fields[fname].data)
            prof, z = _profile_at_point(
                self.solver_obj, data, self.cell, self.bary
            )
            if out is None:
                out = [z]
            if prof.ndim > 1:  # vector: magnitude (ref stores components
                # separately; magnitude keeps array_dim uniform)
                prof = np.linalg.norm(prof, axis=-1)
            vals.append(prof)
        return out + vals

    def message_str(self, *args):
        return (f"{self.name}: profile range "
                + " ".join(f"{v.min():.3g}..{v.max():.3g}"
                           for v in args[1:]))


class TimeSeriesCallback3D(DiagnosticCallback):
    """Station time series of 3D fields at an (x, y, z) point
    (ref ``callback.py:728-850`` ``TimeSeriesCallback3D``): the vertical
    profile of the containing column is interpolated to the requested z
    (clamped into the instantaneous water column, like the reference's
    z-clamping against elevation/bathymetry)."""

    def __init__(self, solver_obj, fieldnames, x, y, z, location_name,
                 **kwargs):
        self.fieldnames = list(fieldnames)
        self.location_name = location_name
        self.z = float(z)
        short = "-".join(f.split("_")[0] for f in self.fieldnames)
        self.name = f"timeseries_{location_name}_{short}"
        self.variable_names = list(self.fieldnames)
        super().__init__(solver_obj, array_dim=1, **kwargs)
        det = DetectorsCallback.__new__(DetectorsCallback)
        det.solver_obj = solver_obj
        det._locate(np.asarray([[x, y]], dtype=float))
        self.cell = int(det.cell_ids[0])
        self.bary = det.bary[0]

    def __call__(self):
        vals = []
        for fname in self.fieldnames:
            data = np.asarray(self.solver_obj.fields[fname].data)
            prof, z_if = _profile_at_point(
                self.solver_obj, data, self.cell, self.bary
            )
            if prof.ndim > 1:
                prof = np.linalg.norm(prof, axis=-1)
            z_pt = np.clip(self.z, z_if.min(), z_if.max())
            vals.append(np.interp(z_pt, z_if, prof))
        return [np.atleast_1d(v) for v in vals]

    def message_str(self, *args):
        return (f"{self.name}: "
                + " ".join(f"{float(np.ravel(v)[0]):.4g}" for v in args))


class TransectCallback(DiagnosticCallback):
    """Extract fields on a vertical transect along a horizontal polyline
    (ref ``callback.py:1000-1107`` ``TransectCallback``): one flattened
    (n_points * (nz+1)) array per field, plus the z coordinates."""

    def __init__(self, solver_obj, fieldnames, x, y, location_name,
                 n_points=None, **kwargs):
        self.fieldnames = list(fieldnames)
        x = np.atleast_1d(np.asarray(x, dtype=float))
        y = np.atleast_1d(np.asarray(y, dtype=float))
        assert x.shape == y.shape
        pts = np.stack([x, y], axis=-1)
        short = "-".join(f.split("_")[0] for f in self.fieldnames)
        self.name = f"transect_{location_name}_{short}"
        self.variable_names = ["z_coord"] + list(self.fieldnames)
        nz1 = solver_obj.n_layers + 1
        super().__init__(solver_obj, array_dim=len(pts) * nz1, **kwargs)
        det = DetectorsCallback.__new__(DetectorsCallback)
        det.solver_obj = solver_obj
        det._locate(pts)
        self.cells = det.cell_ids
        self.barys = det.bary

    def __call__(self):
        zs = []
        profs = {f: [] for f in self.fieldnames}
        for c, b in zip(self.cells, self.barys):
            for fname in self.fieldnames:
                data = np.asarray(self.solver_obj.fields[fname].data)
                prof, z = _profile_at_point(self.solver_obj, data, int(c), b)
                if prof.ndim > 1:
                    prof = np.linalg.norm(prof, axis=-1)
                profs[fname].append(prof)
            zs.append(z)
        out = [np.concatenate(zs)]
        for fname in self.fieldnames:
            out.append(np.concatenate(profs[fname]))
        return out

    def message_str(self, *args):
        return (f"{self.name}: transect range "
                + " ".join(f"{v.min():.3g}..{v.max():.3g}"
                           for v in args[1:]))
