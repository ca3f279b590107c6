"""Distributed-execution tests on the 8-device virtual CPU mesh
(standing in for the reference's 2-rank MPI tests, SURVEY.md section 4 item
10): the shard_map halo-exchange tracer operator must match the serial
operator to machine precision, and the GSPMD-sharded SWE step must match
the single-device step."""
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thetis_tpu import RectangleMesh, FunctionSpace, Function, DGAssembler
from thetis_tpu.equations.tracer_2d import TracerEquation2D
from thetis_tpu.parallel.partition import StripePartition
from thetis_tpu.parallel.shard import (
    make_device_mesh,
    sharded_tracer_advection,
)

N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= N_DEV
    mesh = RectangleMesh(16, 4, 8e3, 2e3)  # 128 cells = 16 per device
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    return mesh, V, asm


def test_partition_roundtrip(setup):
    mesh, V, asm = setup
    part = StripePartition(mesh, N_DEV)
    u = np.random.RandomState(0).rand(mesh.nc, 3)
    u2 = part.gather_cells(part.scatter_cells(u))
    assert np.allclose(u2, u)


def test_sharded_tracer_advection_matches_serial(setup):
    mesh, V, asm = setup
    part = StripePartition(mesh, N_DEV)
    dmesh = make_device_mesh(N_DEV)
    rhs = sharded_tracer_advection(part, V, dmesh)

    rng = np.random.RandomState(1)
    c = rng.rand(mesh.nc, 3)
    uv = 0.5 * rng.rand(mesh.nc, 3, 2)

    # serial reference: advection + LF (no diffusivity field -> no SIPG)
    opts = SimpleNamespace(use_lax_friedrichs_tracer=True,
                           sipg_factor_tracer=1.0, tracer={})
    eq = TracerEquation2D(mesh, asm, opts, bathymetry=1.0,
                          labels=["tracer_2d"], bnd_conditions={})
    fields = {"uv_2d": jnp.asarray(uv), "elev_2d": 0.0,
              "lax_friedrichs_tracer_scaling_factor": 1.0}
    r_serial = np.asarray(
        eq.residual("all", {"tracer_2d": jnp.asarray(c)},
                    {"tracer_2d": jnp.asarray(c)}, fields, fields, {})
        ["tracer_2d"]
    )

    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(dmesh, P("cells"))
    c_sh = jax.device_put(jnp.asarray(part.scatter_cells(c)), sh)
    uv_sh = jax.device_put(jnp.asarray(part.scatter_cells(uv)), sh)
    r_sh = rhs(c_sh, uv_sh)
    r_dist = part.gather_cells(np.asarray(r_sh))
    assert np.allclose(r_dist, r_serial, atol=1e-11), (
        np.abs(r_dist - r_serial).max()
    )
    # and it really ran on 8 devices
    assert len(r_sh.sharding.device_set) == N_DEV


def test_gspmd_swe_step_matches_serial(setup):
    """GSPMD-sharded CN SWE step equals the single-device step."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft", "/root/repo/__graft_entry__.py"
    )
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    mesh2d, step, sol = g._build(8, 8, "CrankNicolson", dt=30.0)
    ref = jax.jit(step)(sol)

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    dmesh = Mesh(np.array(jax.devices()[:N_DEV]), axis_names=("cells",))
    sh = NamedSharding(dmesh, P("cells"))
    sol_sh = {k: jax.device_put(v, sh) for k, v in sol.items()}
    out = jax.jit(step, in_shardings=({"uv": sh, "elev": sh},),
                  out_shardings={"uv": sh, "elev": sh})(sol_sh)
    for k in ("uv", "elev"):
        assert np.allclose(np.asarray(out[k]), np.asarray(ref[k]),
                           atol=1e-10)
