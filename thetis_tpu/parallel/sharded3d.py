r"""Distributed 3D baroclinic step over a device mesh.

Mirrors the reference's parallel execution model exactly (SURVEY.md
section 2.10): the horizontal mesh is domain-decomposed, every vertical
column stays device-local, and one halo refresh precedes each RHS
evaluation.  The mode-split structure maps onto two execution levels:

* **cell/column-local phases** (baroclinicity, ALE geometry, 3D
  advection, vertical-implicit mixing, turbulence, 2D<->3D coupling) run
  inside ``shard_map`` on per-device SubMesh clones of the serial
  ``FlowSolver`` (see ``parallel.sharded.clone_graph``),
* the **implicit barotropic solve** runs at the global level through a
  :class:`~thetis_tpu.parallel.sharded.ShardedEquation`-backed
  CrankNicolson step, whose Krylov dot products reduce over the whole
  device mesh (the PETSc-allreduce analogue) while its residuals
  halo-exchange inside shard_map.
"""
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .sharded import (
    ShardedEquation,
    clone_graph,
    harvest_graph,
    make_device_mesh,
    _halo_extend,
)

__all__ = ["ShardedFlowSolver3d"]

#: attributes of FlowSolver that hold (re-derivable) closures or unused
#: state; reset to None on clones and regenerated via ``_build_step``
_SOLVER_SKIP = (
    "fields", "_step", "_step_jit", "_advance_n_jit", "_pre_fn", "_post_fn",
)


class ShardedFlowSolver3d:
    """Distributed adapter around per-device serial ``FlowSolver``s.

    :arg partition: :class:`HaloPartition` of the 2D mesh
    :arg build_solver: ``(submesh, device_index) -> FlowSolver`` — must
        construct AND ``initialize()`` a serial 3D solver on the SubMesh,
        slicing bathymetry with ``partition.local_vertex_values`` /
        ``local_cell_values``.

    ``step(state, swe_fields, bnd_sw)`` advances one mode-split step on
    striped-global sharded state arrays (``partition.perm`` order).
    ``swe_fields`` / BC values must be scalars or 0-d arrays.
    """

    def __init__(self, partition, build_solver, device_mesh=None,
                 axis="cells"):
        self.partition = partition
        self.axis = axis
        D = partition.n_devices
        self.device_mesh = device_mesh or make_device_mesh(D, axis)
        solvers = [build_solver(sm, d)
                   for d, sm in enumerate(partition.submeshes)]
        self.template = solvers[0]
        harvested = [harvest_graph(s, skip_attrs=_SOLVER_SKIP)
                     for s in solvers]
        keys = set(harvested[0])
        for h in harvested[1:]:
            assert set(h) == keys, (
                f"per-device solver structure mismatch: {set(h) ^ keys}"
            )
        from jax.sharding import NamedSharding
        sh = NamedSharding(self.device_mesh, P(axis))
        self._tables = {
            k: jax.device_put(jnp.stack([h[k] for h in harvested]), sh)
            for k in keys
        }
        self._spec_tables = {k: P(axis) for k in self._tables}
        self._send = (
            jax.device_put(jnp.asarray(partition.send_left), sh),
            jax.device_put(jnp.asarray(partition.send_right), sh),
        )
        self.sharding = sh

        # global-level distributed 2D SWE stepper sharing the per-device
        # eq_sw instances (the serial swe_stepper settings are reused)
        sharded_swe = ShardedEquation(
            partition, lambda sm, d: solvers[d].eq_sw,
            device_mesh=self.device_mesh, axis=axis,
        )
        ser = self.template.swe_stepper
        from ..timeintegration.steppers import CrankNicolson
        if int(getattr(self.template, "M_modesplit", 1) or 1) > 1:
            raise NotImplementedError(
                "dt_mode='split' subcycling is serial-only; use the "
                "implicit 2D mode (dt_mode='3d') for distributed runs"
            )
        if getattr(ser, "assembled_solve", False):
            # the fast path: distributed assembled-Jacobian KSP (analytic
            # per-device block assembly + halo-refresh matvecs + psum
            # reductions in ONE shard_map region) — keeps the serial
            # path's per-chip solve cost on the device mesh
            from .assembled_sharded import ShardedAssembledCN
            self.swe_stepper = ShardedAssembledCN(
                sharded_swe, ser.dt, theta=ser.theta,
                solver_parameters=ser.params, coarse=ser.coarse,
            )
        else:
            self.swe_stepper = CrankNicolson(
                sharded_swe, ser.dt, theta=ser.theta,
                semi_implicit=ser.semi_implicit,
                solver_parameters=ser.params,
            )
        self.sharded_swe = sharded_swe

    def device_put(self, tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.sharding), tree
        )

    def _local_solver(self, tabs):
        solver = clone_graph(self.template, tabs, skip_attrs=_SOLVER_SKIP)
        solver._build_step()
        return solver

    # ------------------------------------------------------------------
    def step(self, state, swe_fields, bnd_sw):
        """One distributed mode-split step (matches the serial
        ``FlowSolver._step`` bit-for-bit up to Krylov reduction order)."""
        part = self.partition
        n_loc = part.n_loc
        axis = self.axis

        def pre_local(state, send, tabs):
            sl, sr = send[0][0], send[1][0]
            tabs = jax.tree_util.tree_map(lambda x: x[0], tabs)
            solver = self._local_solver(tabs)
            ext = lambda u: _halo_extend(u, sl, sr, axis)  # noqa: E731
            state_e = jax.tree_util.tree_map(ext, state)
            int_pg, src_2d = solver._pre_fn(state_e)
            out = (int_pg, src_2d)
            return jax.tree_util.tree_map(lambda u: u[:n_loc], out)

        int_pg, src_2d = jax.shard_map(
            pre_local, mesh=self.device_mesh,
            in_specs=(P(axis), P(axis), self._spec_tables),
            out_specs=P(axis), check_vma=False,
        )(state, self._send, self._tables)

        sf = dict(swe_fields)
        if src_2d is not None:
            sf["momentum_source"] = src_2d
        sw = self.swe_stepper.advance(
            0.0, {"uv": state["uv"], "elev": state["elev"]}, sf, sf, bnd_sw
        )

        def post_local(state, sw, int_pg, repls, send, tabs):
            sl, sr = send[0][0], send[1][0]
            tabs = jax.tree_util.tree_map(lambda x: x[0], tabs)
            solver = self._local_solver(tabs)
            ext = lambda u: _halo_extend(u, sl, sr, axis)  # noqa: E731
            state_e = jax.tree_util.tree_map(ext, state)
            sw_e = jax.tree_util.tree_map(ext, sw)
            int_pg_e = jax.tree_util.tree_map(ext, int_pg)
            new = solver._post_fn(state_e, sw_e, int_pg_e, repls)
            return jax.tree_util.tree_map(lambda u: u[:n_loc], new)

        return jax.shard_map(
            post_local, mesh=self.device_mesh,
            in_specs=(P(axis), P(axis), P(axis), P(), P(axis),
                      self._spec_tables),
            out_specs=P(axis), check_vma=False,
        )(state, sw, int_pg, swe_fields, self._send, self._tables)
