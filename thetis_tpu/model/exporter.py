"""Field exporters + checkpointing.

Replaces the reference's ``thetis/exporter.py``: the HDF5 path writes
native-space dof arrays with mesh + time metadata (the reference's
``CheckpointFile`` analogue, ref ``exporter.py:123-242``) and is the restart
format for ``FlowSolver2d.load_state``.  The VTK visualization path is
replaced by a portable NPZ series (one file per export with coordinates +
cell connectivity + nodal values), since VTK/ParaView toolchains are not
part of this stack.
"""
import os

import numpy as np

from .field_defs import field_metadata

__all__ = ["HDF5Exporter", "NPZExporter", "ExportManager"]


class HDF5Exporter:
    """One HDF5 file per field per export index
    (ref ``exporter.py:123-242``)."""

    def __init__(self, space, outputdir, filename_prefix, verbose=False):
        self.space = space
        self.outputdir = outputdir
        self.filename = filename_prefix
        os.makedirs(outputdir, exist_ok=True)
        self.next_export_ix = 0

    def gen_filename(self, iexport):
        return os.path.join(
            self.outputdir, f"{self.filename}_{iexport:05d}.h5"
        )

    def set_next_export_ix(self, ix):
        self.next_export_ix = ix

    def export_as_index(self, iexport, function, time=None):
        import h5py

        with h5py.File(self.gen_filename(iexport), "w") as f:
            f.create_dataset("data", data=np.asarray(function.data))
            f.attrs["name"] = function.name
            if time is not None:
                f.attrs["time"] = time
        self.next_export_ix = iexport + 1

    def export(self, function, time=None):
        self.export_as_index(self.next_export_ix, function, time=time)

    def load(self, iexport, function):
        import h5py

        with h5py.File(self.gen_filename(iexport), "r") as f:
            data = np.asarray(f["data"])
            time = f.attrs.get("time")
        import jax.numpy as jnp

        function.data = jnp.asarray(data)
        return time


class NPZExporter:
    """Visualization series: mesh + nodal values per export."""

    def __init__(self, space, outputdir, filename_prefix, verbose=False):
        self.space = space
        self.outputdir = outputdir
        self.filename = filename_prefix
        os.makedirs(outputdir, exist_ok=True)
        self.next_export_ix = 0
        self._mesh_written = False

    def set_next_export_ix(self, ix):
        self.next_export_ix = ix

    def export(self, function, time=None):
        path = os.path.join(
            self.outputdir, f"{self.filename}_{self.next_export_ix:05d}.npz"
        )
        # space may be None for bare-array exports (optimisation callbacks)
        if self.space is not None and not self._mesh_written:
            mesh = self.space.mesh
            np.savez(
                os.path.join(self.outputdir, f"{self.filename}_mesh.npz"),
                coords=mesh.coords_np,
                cells=mesh.cells_np,
            )
            self._mesh_written = True
        np.savez(path, data=np.asarray(function.data),
                 time=np.asarray(time if time is not None else np.nan))
        self.next_export_ix += 1


class ExportManager:
    """Handles export of several fields (ref ``exporter.py:245-386``)."""

    def __init__(self, outputdir, fields_to_export, functions,
                 field_metadata=field_metadata, export_type="npz",
                 verbose=False):
        self.outputdir = outputdir
        self.fields_to_export = fields_to_export
        self.functions = functions
        self.exporters = {}
        for key in fields_to_export:
            fn = functions.get(key)
            if fn is None:
                continue
            meta = field_metadata.get(key, {"filename": key})
            if export_type == "hdf5":
                subdir = os.path.join(outputdir, "hdf5")
                self.exporters[key] = HDF5Exporter(
                    fn.function_space, subdir, meta["filename"]
                )
            else:
                self.exporters[key] = NPZExporter(
                    fn.function_space, outputdir, meta["filename"]
                )

    def set_next_export_ix(self, ix):
        for e in self.exporters.values():
            e.set_next_export_ix(ix)

    def export(self, time=None):
        for key, e in self.exporters.items():
            e.export(self.functions[key], time=time)

    def export_bathymetry(self, bathymetry_2d):
        if "bathymetry_2d" not in self.exporters:
            pass
