r"""Distributed assembled-Jacobian KSP (the fast implicit-SWE path,
sharded).

The reference's scalable implicit story is PETSc KSP on the assembled
Jacobian over the decomposed mesh: each rank assembles its owned rows,
every Krylov matvec does one halo refresh, block-Jacobi preconditioning
is per-rank, and dot products allreduce (ref ``options.py:44-48``
``'snes_type': 'ksponly', 'pc_type': 'bjacobi'``).  The serial TPU
analogue (``solvers/assembled.py`` + the analytic value-space assembly
of ``equations/swe_blocks.py``) is the source of the round-3/4 CN and
barotropic throughput; this module is its shard_map port:

* the ENTIRE theta-step — analytic block assembly, warm-started FGMRES,
  block-Jacobi (+ optional distributed Galerkin coarse correction) —
  runs inside ONE ``jax.shard_map`` region;
* the per-iteration matvec halo-refreshes the Krylov vector with one
  ``ppermute`` pair and applies the per-device owned-row ring blocks
  (ghost-row block values are never used);
* all dot products / norms go through ``lax.psum`` via the
  ``allreduce`` hook of :func:`thetis_tpu.solvers.newton._fgmres_flat`
  — the identical Krylov core the serial path runs.

The assembled blocks per device cover owned + ghost rows (the analytic
assembly evaluates on the halo-extended state); only owned rows enter
the solve.  The depth-2 vertex-closure halos guarantee owned-row blocks
see exact 1-ring data.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .sharded import _clone_with_tables, _halo_extend
from ..solvers.assembled import PackedState, batched_inv_small, cell_ring
from ..solvers.newton import _fgmres_flat
from ..timeintegration.steppers import _tree_lc

__all__ = ["ShardedAssembledCN", "DistributedCoarseCorrection"]


class DistributedCoarseCorrection:
    """Galerkin coarse correction applied inside shard_map.

    The coarse space is global (piecewise-constant per cell aggregate,
    exactly :class:`~thetis_tpu.solvers.assembled.CoarseCorrection`); the
    restriction is a per-device ``segment_sum`` over owned cells followed
    by one ``psum`` of the (small, replicated) coarse residual, the
    coarse solve is a replicated dense matmul, and the prolongation is a
    per-device gather.  Setup reuses the SERIAL coarse operator built
    from the global blocks, so the distributed correction is numerically
    identical to the serial one.
    """

    def __init__(self, serial_coarse, partition):
        self.n_agg = serial_coarse.n_agg
        self.d = serial_coarse.d
        self.Ac_inv = serial_coarse.Ac_inv  # replicated (small)
        # per-device aggregate ids of OWNED cells, striped-global order
        agg_global = np.asarray(serial_coarse.agg)[partition.perm]
        self.agg_striped = jnp.asarray(agg_global.astype(np.int32))

    def local_apply(self, r_owned, agg_owned, axis):
        """r_owned (n_loc, d) -> coarse-corrected increment (n_loc, d);
        call inside shard_map."""
        r_c = jax.ops.segment_sum(r_owned, agg_owned,
                                  num_segments=self.n_agg)
        r_c = jax.lax.psum(r_c, axis)
        z_c = (self.Ac_inv @ r_c.reshape(-1)).reshape(self.n_agg, self.d)
        return z_c[agg_owned]


class ShardedAssembledCN:
    """Distributed semi-implicit CrankNicolson over an assembled-KSP
    solve (drop-in for the ``steppers.CrankNicolson`` the sharded
    barotropic mode otherwise uses matrix-free).

    :arg sharded_eq: a :class:`~thetis_tpu.parallel.sharded.ShardedEquation`
        whose template supports ``assemble_operator_blocks``
        (``ShallowWaterEquations`` / ``ModeSplit2DEquations``)
    :arg dt: time step
    :kwarg theta: implicitness parameter
    :kwarg solver_parameters: NewtonParameters (ksp_rtol / restart /
        ksp_max_it are honoured)
    :kwarg coarse: optional serial
        :class:`~thetis_tpu.solvers.assembled.CoarseCorrection` built
        from the GLOBAL rest-state blocks; applied distributed in a
        two-level multiplicative V-cycle exactly as the serial solve
        applies it
    """

    def __init__(self, sharded_eq, dt, theta=0.5, solver_parameters=None,
                 coarse=None):
        from ..solvers.newton import NewtonParameters

        self.eq_sh = sharded_eq
        self.dt = float(dt)
        self.theta = float(theta)
        self.semi_implicit = True
        self.params = solver_parameters or NewtonParameters()
        part = sharded_eq.partition
        self.partition = part
        self.axis = sharded_eq.axis
        self.device_mesh = sharded_eq.device_mesh
        # per-device closed 1-ring tables of the SubMeshes (local
        # indices over [owned | ghosts]); harvested like the eq tables
        from ..solvers.assembled import CoarseCorrection
        if coarse is not None and not isinstance(coarse, CoarseCorrection):
            # only the Galerkin aggregate coarse distributes for now;
            # other PCs (Schur fieldsplit) fall back to block-Jacobi
            coarse = None
        rings = []
        for sm in part.submeshes:
            ring, _ = cell_ring(sm)
            rings.append(jnp.asarray(ring))
        sh = sharded_eq.sharding
        self._ring = jax.device_put(jnp.stack(rings), sh)
        self._tables = sharded_eq._tables
        self._spec_tables = sharded_eq._spec_tables
        if coarse is not None:
            self.coarse = DistributedCoarseCorrection(coarse, part)
            self._agg = jax.device_put(
                self.coarse.agg_striped.reshape(part.n_devices, part.n_loc),
                sh)
        else:
            self.coarse = None
            self._agg = jax.device_put(
                jnp.zeros((part.n_devices, part.n_loc), jnp.int32), sh)

    # ------------------------------------------------------------------
    def advance(self, t, solution, fields, fields_old, bnd_values,
                linearization_state=None):
        eq_sh = self.eq_sh
        part = self.partition
        n_loc = part.n_loc
        axis = self.axis
        template = eq_sh.template
        dt, th = self.dt, self.theta
        params = self.params
        rtol = params.ksp_rtol
        restart = params.gmres_restart
        max_cycles = max(1, params.ksp_max_it // params.gmres_restart)
        coarse = self.coarse
        same_fields = fields is fields_old
        f_sh, f_rep = eq_sh._split_fields(fields)
        fo_sh, fo_rep = eq_sh._split_fields(fields_old)

        def local(sol, f_sh, fo_sh, repls, ring2, agg, tabs):
            tabs = jax.tree_util.tree_map(lambda x: x[0], tabs)
            ring = ring2[0]
            agg_owned = agg[0]
            sl = tabs[("part", "send_left")]
            sr = tabs[("part", "send_right")]
            eq = _clone_with_tables(template, tabs)
            ext = lambda u: _halo_extend(u, sl, sr, axis)  # noqa: E731
            sol_e = jax.tree_util.tree_map(ext, sol)
            f_rep_l, fo_rep_l, bnd = repls
            f_all = dict(f_rep_l, **jax.tree_util.tree_map(ext, f_sh))
            ps = PackedState(sol_e)
            nc_ext = ps.nc
            d = ps.d

            # --- analytic assembly on the halo-extended lagged state
            # (owned + ghost rows; ghost rows are never read)
            if same_fields and linearization_state is None:
                blocks, r_lag = eq.assemble_operator_blocks(
                    sol_e, f_all, bnd, th * dt, return_residual=True,
                    layout="cell")
                f_old = ps.pack(_tree_lc([(-dt, r_lag)]))
            else:
                fo_all = dict(fo_rep_l,
                              **jax.tree_util.tree_map(ext, fo_sh))
                lag = (jax.tree_util.tree_map(ext, linearization_state)
                       if linearization_state is not None else sol_e)
                blocks = eq.assemble_operator_blocks(
                    lag, f_all, bnd, th * dt, layout="cell")
                m_old = eq.mass_term(sol_e)
                r_expl = eq.residual("all", sol_e, sol_e, fo_all, fo_all,
                                     bnd)
                r_impl = eq.residual("all", sol_e, lag, f_all, f_all, bnd)
                f_old = ps.pack(_tree_lc([
                    (1.0, eq.mass_term(sol_e)), (-th * dt, r_impl),
                    (-1.0, m_old), (-(1 - th) * dt, r_expl)]))

            diag_inv = batched_inv_small(blocks[:n_loc, 0])

            def ext_rows(x_owned):
                """(n_loc, d) -> halo-extended (nc_ext, d)."""
                return _halo_extend(x_owned, sl, sr, axis)

            def mv_flat(v):
                x_e = ext_rows(v.reshape(n_loc, d))
                xg = x_e[ring]                      # (nc_ext, 4, d)
                y = jnp.einsum("csoj,csj->co", blocks, xg)
                return y[:n_loc].reshape(-1)

            def bjac(r):
                return jnp.einsum("cij,cj->ci", diag_inv, r)

            if coarse is None:
                def M(v):
                    return bjac(v.reshape(n_loc, d)).reshape(-1)
            else:
                def M(v):
                    r = v.reshape(n_loc, d)
                    z = bjac(r)
                    r2 = r - mv_flat(z.reshape(-1)).reshape(n_loc, d)
                    z = z + coarse.local_apply(r2, agg_owned, axis)
                    r3 = r - mv_flat(z.reshape(-1)).reshape(n_loc, d)
                    z = z + bjac(r3)
                    return z.reshape(-1)

            def allreduce(x):
                return jax.lax.psum(x, axis)

            # warm start from the lagged state: solve the residual
            # system A dx = -F(u_old), anchored to ||b||
            r0 = -f_old[:n_loc].reshape(-1)
            x_old = ps.pack(sol_e)[:n_loc]
            b_flat = mv_flat(x_old.reshape(-1)) + r0
            bscale = jnp.sqrt(allreduce(jnp.vdot(b_flat, b_flat).real))
            rtol_eff = rtol * bscale / jnp.maximum(
                jnp.sqrt(allreduce(jnp.vdot(r0, r0).real)),
                jnp.finfo(b_flat.dtype).tiny)
            dx, rnorm, _ = _fgmres_flat(
                mv_flat, r0, M, rtol_eff, restart, max_cycles,
                allreduce=allreduce)
            x = x_old + dx.reshape(n_loc, d)
            diverged = rnorm > 1e4 * jnp.maximum(
                bscale, jnp.finfo(rnorm.dtype).tiny)
            x = jnp.where(diverged, jnp.nan, x)
            # unpack owned rows through a PackedState shaped on owned
            ps_loc = PackedState(
                jax.tree_util.tree_map(lambda u: u[:n_loc], sol_e))
            return ps_loc.unpack(x)

        fn = jax.shard_map(
            local, mesh=self.device_mesh,
            in_specs=(P(axis), P(axis), P(axis), P(), P(axis), P(axis),
                      self._spec_tables),
            out_specs=P(axis), check_vma=False,
        )
        return fn(solution, f_sh, fo_sh, (f_rep, fo_rep, bnd_values),
                  self._ring, self._agg, self._tables)
