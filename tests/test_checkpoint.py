"""Checkpoint/restart roundtrip (SURVEY.md section 5.4): run, export HDF5
state, load into a fresh solver with load_state, continue, and compare with
an uninterrupted run."""
import numpy as np
import pytest

from thetis_tpu import RectangleMesh, FunctionSpace, Function, solver2d, exp


def make_solver(tmpdir, t_end):
    lx, ly = 40e3, 2e3
    mesh2d = RectangleMesh(10, 2, lx, ly)
    P1 = FunctionSpace(mesh2d, "CG", 1)
    bath = Function(P1).assign(20.0)
    so = solver2d.FlowSolver2d(mesh2d, bath)
    o = so.options
    o.timestep = 50.0
    o.simulation_export_time = 200.0
    o.simulation_end_time = t_end
    o.swe_timestepper_type = "CrankNicolson"
    o.output_directory = str(tmpdir)
    o.fields_to_export = []
    o.fields_to_export_hdf5 = ["elev_2d", "uv_2d"]
    xy = so.function_spaces.P1_2d.dof_coords() if False else None
    elev0 = Function(P1).interpolate(
        lambda x, y: 1.0 * np.exp(-(((x - lx / 2) / 6000.0) ** 2))
    )
    so.assign_initial_conditions(elev=elev0)
    return so


def test_checkpoint_restart(tmp_path):
    # uninterrupted run to T=800
    so_full = make_solver(tmp_path / "full", 800.0)
    so_full.iterate()

    # run to T=400, then restart from export 2 and continue to T=800
    so_a = make_solver(tmp_path / "restart", 400.0)
    so_a.iterate()

    so_b = make_solver(tmp_path / "restart", 800.0)
    so_b.load_state(2)  # T=400 checkpoint
    assert so_b.simulation_time == pytest.approx(400.0)
    so_b.iterate()

    for key in ("elev_2d", "uv_2d"):
        a = np.asarray(so_full.fields[key].data)
        b = np.asarray(so_b.fields[key].data)
        assert np.allclose(a, b, atol=1e-10), (
            f"{key} differs after restart: {np.abs(a - b).max()}"
        )


def make_solver3d(tmpdir, t_end):
    from thetis_tpu.model.flowsolver3d import FlowSolver

    lx = 20e3
    mesh2d = RectangleMesh(8, 2, lx, 4e3)
    P1 = FunctionSpace(mesh2d, "CG", 1)
    bath = Function(P1).assign(20.0)
    so = FlowSolver(mesh2d, bath, 4)
    o = so.options
    o.timestep = 30.0
    o.simulation_export_time = 300.0
    o.simulation_end_time = t_end
    o.output_directory = str(tmpdir)
    o.fields_to_export = []
    elev0 = Function(P1).interpolate(
        lambda x, y: 0.4 * np.exp(-(((x - lx / 2) / 3e3) ** 2))
    )
    V = FunctionSpace(mesh2d, "DG", 1)
    t0 = Function(V).interpolate(lambda x, y: 10.0 + 2.0 * x / lx)
    so.assign_initial_conditions(elev=elev0, temp=t0.data, salt=35.0)
    return so


@pytest.mark.slow
def test_checkpoint_restart_3d(tmp_path):
    """3D kill-and-restart: the restarted trajectory is bit-identical
    (ref ``solver.py:1006-1073`` load_state)."""
    so_full = make_solver3d(tmp_path / "full", 1200.0)
    so_full.iterate()

    so_a = make_solver3d(tmp_path / "restart", 600.0)
    so_a.iterate()

    so_b = make_solver3d(tmp_path / "restart", 1200.0)
    so_b.load_state(2)  # T=600 checkpoint
    assert so_b.simulation_time == pytest.approx(600.0)
    so_b.iterate()

    for key in ("elev_2d", "uv_2d", "uv_3d", "salt_3d", "temp_3d",
                "split_residual_2d"):
        a = np.asarray(so_full.fields[key].data)
        b = np.asarray(so_b.fields[key].data)
        assert np.array_equal(a, b), (
            f"{key} differs after 3D restart: {np.abs(a - b).max()}"
        )


def test_vtk_exporter(tmp_path):
    """VTU/PVD visualization series (ref exporter.py VTK path): files are
    valid XML and contain the nodal values."""
    import xml.etree.ElementTree as ET
    from thetis_tpu import RectangleMesh, FunctionSpace, Function
    from thetis_tpu.model.exporter import VTKExporter

    mesh = RectangleMesh(4, 3, 2.0, 1.0)
    V = FunctionSpace(mesh, "DG", 1)
    f = Function(V, name="elev_2d").interpolate(lambda x, y: x + y)
    exp = VTKExporter(V, str(tmp_path), "Elevation2d")
    exp.export(f, time=0.0)
    exp.export(f, time=10.0)
    base = tmp_path / "Elevation2d"
    vtu = base / "Elevation2d_00000.vtu"
    pvd = base / "Elevation2d.pvd"
    assert vtu.exists() and pvd.exists()
    root = ET.parse(vtu).getroot()
    piece = root.find(".//Piece")
    assert int(piece.get("NumberOfPoints")) == 3 * mesh.nc
    assert int(piece.get("NumberOfCells")) == mesh.nc
    assert len(ET.parse(pvd).getroot().findall(".//DataSet")) == 2

    # vector field: padded to 3 components
    U = FunctionSpace(mesh, "DG", 1, dim=2)
    u = Function(U, name="uv_2d")
    import numpy as np
    xy = np.asarray(U.dof_coords())
    u.data = xy  # (nc, 3, 2): uv = (x, y)
    exp2 = VTKExporter(U, str(tmp_path), "Velocity2d")
    exp2.export(u, time=0.0)
    root = ET.parse(tmp_path / "Velocity2d" / "Velocity2d_00000.vtu").getroot()
    arr = root.find(".//PointData/DataArray")
    assert arr.get("NumberOfComponents") == "3"
