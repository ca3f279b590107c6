r"""Run *serial* equations distributed over a device mesh via shard_map.

The mechanism (PyOP2-halo analogue, SURVEY.md sections 2.10 / 5.8):

1. :class:`~thetis_tpu.parallel.submesh.HaloPartition` builds one genuine
   SubMesh per device; the caller instantiates the ordinary serial
   assembler + equation classes on each SubMesh (``build_eq``).
2. All per-device jax arrays cached on those instances (mesh tables,
   assembler tabulations, BC masks, coefficient tabulations) are
   *harvested* into a single table pytree stacked over the leading device
   axis and placed with a ``P('cells')`` sharding.
3. Each residual/mass evaluation runs inside ``jax.shard_map``: ghost-cell
   dofs are refreshed with one ``ppermute`` pair over the ICI ring, a
   lightweight clone of the template equation is rebound to the traced
   per-device tables, and the *unchanged serial* ``residual`` method
   executes on device-local data.  Owned rows are returned; ghost rows are
   discarded.

The resulting :class:`ShardedEquation` exposes the standard equation
interface (``residual`` / ``mass_term`` / ``mass_inverse``) over
striped-global sharded arrays, so every serial time integrator
(``timeintegration.steppers``) runs distributed without modification —
Krylov dot products reduce over the mesh via GSPMD-inserted psums,
exactly the reference's PETSc allreduce pattern.
"""
import copy
import types

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ShardedEquation", "make_device_mesh", "harvest_graph",
           "clone_graph"]


def make_device_mesh(n_devices, axis="cells"):
    devs = np.array(jax.devices()[:n_devices])
    return Mesh(devs, axis_names=(axis,))


def _is_array(x):
    return isinstance(x, jax.Array)


# ===================== generic object-graph rebinding =====================
# Serial solver components cache jax arrays on themselves (mesh tables,
# tabulations, BC masks, coefficient fields).  ``harvest_graph`` collects
# every reachable array keyed by a deterministic dotted path;
# ``clone_graph`` shallow-clones the object graph with those arrays
# replaced by (traced, per-device) substitutes.  Bound methods stored on
# instances (e.g. an Equation's ``terms`` registry) are rebound to their
# cloned holders.  Memoisation preserves object sharing (an assembler
# referenced by several equations is cloned once).

def _is_thetis_obj(v):
    return hasattr(v, "__dict__") and type(v).__module__.startswith(
        "thetis_tpu"
    )


def harvest_graph(root, skip_attrs=()):
    """Collect all jax arrays reachable from ``root``: {path_str: array}."""
    out = {}
    memo = set()

    def walk_obj(obj, path):
        if id(obj) in memo:
            return
        memo.add(id(obj))
        for k in sorted(vars(obj)):
            if k in skip_attrs:
                continue
            visit(vars(obj)[k], f"{path}.{k}")

    def visit(v, path):
        if _is_array(v):
            out[path] = v
        elif isinstance(v, dict):
            for kk in sorted(v.keys(), key=repr):
                visit(v[kk], f"{path}[{kk!r}]")
        elif isinstance(v, (list, tuple)):
            for i, x in enumerate(v):
                visit(x, f"{path}[{i}]")
        elif isinstance(v, types.MethodType):
            pass  # rebound at clone time
        elif _is_thetis_obj(v):
            walk_obj(v, path)

    walk_obj(root, "")
    return out


def clone_graph(root, tables, skip_attrs=()):
    """Clone the object graph with arrays substituted from ``tables``
    (missing paths keep the template's array).  Attributes named in
    ``skip_attrs`` are reset to None on the clones (re-derive them after
    cloning, e.g. by re-running a ``_build_step``)."""
    memo = {}

    def clone_obj(obj, path):
        if id(obj) in memo:
            return memo[id(obj)]
        new = copy.copy(obj)
        memo[id(obj)] = new
        for k in sorted(vars(obj)):
            # object.__setattr__: clones of frozen option objects must not
            # trip their setattr guards
            if k in skip_attrs:
                object.__setattr__(new, k, None)
                continue
            object.__setattr__(new, k, sub(vars(obj)[k], f"{path}.{k}"))
        return new

    def sub(v, path):
        if _is_array(v):
            return tables.get(path, v)
        if isinstance(v, dict):
            new_d = copy.copy(v)
            for kk in list(v.keys()):
                new_d[kk] = sub(v[kk], f"{path}[{kk!r}]")
            return new_d
        if isinstance(v, tuple):
            return tuple(sub(x, f"{path}[{i}]") for i, x in enumerate(v))
        if isinstance(v, list):
            return [sub(x, f"{path}[{i}]") for i, x in enumerate(v)]
        if isinstance(v, types.MethodType):
            holder = v.__self__
            if _is_thetis_obj(holder):
                return types.MethodType(v.__func__, clone_obj(holder, path))
            return v
        if _is_thetis_obj(v):
            return clone_obj(v, path)
        return v

    return clone_obj(root, "")


def _harvest_one(eq):
    """Collect every jax array cached on (eq, eq.asm, eq.mesh) keyed by a
    stable path."""
    out = {}
    for scope, obj in (("eq", eq), ("asm", eq.asm)):
        for k, v in vars(obj).items():
            if k in ("mesh", "asm", "space"):
                continue
            if _is_array(v):
                out[(scope, k)] = v
            elif isinstance(v, dict):
                for kk, vv in v.items():
                    if _is_array(vv):
                        out[(scope, k, kk)] = vv
    for k, v in eq.mesh._device_cache.items():
        if _is_array(v):
            out[("meshcache", k)] = v
    return out


def _clone_with_tables(template, t):
    """Shallow-clone the template equation with its cached arrays replaced
    by the (traced) per-device tables ``t``."""
    eq = copy.copy(template)
    asm = copy.copy(template.asm)
    mesh = copy.copy(template.mesh)
    mesh._device_cache = dict(template.mesh._device_cache)
    copied_dicts = set()
    for path, arr in t.items():
        scope = path[0]
        if scope == "part":
            continue
        if scope == "meshcache":
            mesh._device_cache[path[1]] = arr
            continue
        holder = eq if scope == "eq" else asm
        if len(path) == 2:
            setattr(holder, path[1], arr)
        else:
            key = (scope, path[1])
            if key not in copied_dicts:
                setattr(holder, path[1], dict(getattr(holder, path[1])))
                copied_dicts.add(key)
            getattr(holder, path[1])[path[2]] = arr
    asm.mesh = mesh
    eq.mesh = mesh
    eq.asm = asm
    # term methods are bound to the template; rebind them to the clone so
    # they read the per-device tables
    eq.terms = [
        (n, l, getattr(eq, m.__func__.__name__)) for (n, l, m) in template.terms
    ]
    return eq


def _halo_extend(u, send_left, send_right, axis):
    """[owned] -> [owned | ghosts from left nbr | ghosts from right nbr]
    with one ppermute pair over the device ring."""
    n_dev = jax.lax.axis_size(axis)
    sl = u[send_left]
    sr = u[send_right]
    right_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    ghost_left = jax.lax.ppermute(sr, axis, right_perm)
    ghost_right = jax.lax.ppermute(sl, axis, left_perm)
    return jnp.concatenate([u, ghost_left, ghost_right], axis=0)


class ShardedEquation:
    """Distributed adapter around serial equation instances.

    :arg partition: a :class:`HaloPartition`
    :arg build_eq: callable ``(submesh, device_index) -> equation``; must
        construct the full serial stack (FunctionSpace/assembler/equation)
        on the given SubMesh, slicing any per-cell/per-vertex coefficient
        data with ``partition.local_cell_values`` /
        ``partition.local_vertex_values``.
    :arg device_mesh: a 1-axis ``jax.sharding.Mesh``; defaults to all
        local devices.

    State and residuals are striped-global cell arrays ``(nc, nd, ...)``
    in ``partition.perm`` order (use ``partition.scatter_cells`` /
    ``gather_cells`` to convert).  ``fields`` values may be scalars /
    0-d arrays (replicated) or striped-global per-cell arrays with
    leading dim nc (halo-exchanged like the state).  BC values must be
    scalars/0-d for now.
    """

    def __init__(self, partition, build_eq, device_mesh=None, axis="cells"):
        self.partition = partition
        self.axis = axis
        D = partition.n_devices
        self.device_mesh = device_mesh or make_device_mesh(D, axis)
        eqs = [build_eq(sm, d) for d, sm in enumerate(partition.submeshes)]
        self.template = eqs[0]
        harvested = [_harvest_one(e) for e in eqs]
        keys = set(harvested[0])
        for h in harvested[1:]:
            assert set(h) == keys, (
                "per-device equation structure mismatch: "
                f"{set(h) ^ keys}"
            )
        tables = {k: jnp.stack([h[k] for h in harvested]) for k in keys}
        tables[("part", "send_left")] = jnp.asarray(partition.send_left)
        tables[("part", "send_right")] = jnp.asarray(partition.send_right)
        sh = NamedSharding(self.device_mesh, P(axis))
        self._tables = {k: jax.device_put(v, sh) for k, v in tables.items()}
        self._spec_tables = {k: P(axis) for k in self._tables}
        self.sharding = sh

    # -- helpers ---------------------------------------------------------
    def device_put(self, tree):
        """Place a striped-global pytree with the partition's sharding."""
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.sharding), tree
        )

    def _is_cell_field(self, x):
        nc = self.partition.mesh.nc
        return hasattr(x, "ndim") and getattr(x, "ndim", 0) >= 1 and \
            x.shape[0] == nc

    def _split_fields(self, fields):
        """Split a fields dict into (sharded per-cell, replicated) parts."""
        sharded = {k: v for k, v in (fields or {}).items()
                   if self._is_cell_field(v)}
        repl = {k: v for k, v in (fields or {}).items() if k not in sharded}
        return sharded, repl

    # -- distributed evaluation ------------------------------------------
    def residual(self, label, solution, solution_old, fields, fields_old,
                 bnd_values):
        part = self.partition
        n_loc = part.n_loc
        axis = self.axis
        template = self.template
        f_sh, f_rep = self._split_fields(fields)
        fo_sh, fo_rep = self._split_fields(fields_old)

        def local(sol, sol_old, f_sh, fo_sh, repls, tabs):
            tabs = jax.tree_util.tree_map(lambda x: x[0], tabs)
            sl = tabs[("part", "send_left")]
            sr = tabs[("part", "send_right")]
            eq = _clone_with_tables(template, tabs)
            ext = lambda u: _halo_extend(u, sl, sr, axis)  # noqa: E731
            sol_e = jax.tree_util.tree_map(ext, sol)
            sol_old_e = jax.tree_util.tree_map(ext, sol_old)
            f_rep_l, fo_rep_l, bnd = repls
            f_all = dict(f_rep_l, **jax.tree_util.tree_map(ext, f_sh))
            fo_all = dict(fo_rep_l, **jax.tree_util.tree_map(ext, fo_sh))
            r = eq.residual(label, sol_e, sol_old_e, f_all, fo_all, bnd)
            return jax.tree_util.tree_map(lambda u: u[:n_loc], r)

        fn = jax.shard_map(
            local,
            mesh=self.device_mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(),
                      self._spec_tables),
            out_specs=P(axis),
        )
        return fn(solution, solution_old, f_sh, fo_sh,
                  (f_rep, fo_rep, bnd_values), self._tables)

    def _cellwise(self, method, solution):
        """Mass-type operators are cell-local: no halo needed, the clone's
        owned-table slices suffice."""
        part = self.partition
        n_loc = part.n_loc
        axis = self.axis
        template = self.template

        def local(sol, tabs):
            tabs = jax.tree_util.tree_map(lambda x: x[0], tabs)
            sl = tabs[("part", "send_left")]
            sr = tabs[("part", "send_right")]
            eq = _clone_with_tables(template, tabs)
            ext = lambda u: _halo_extend(u, sl, sr, axis)  # noqa: E731
            sol_e = jax.tree_util.tree_map(ext, sol)
            out = getattr(eq, method)(sol_e)
            return jax.tree_util.tree_map(lambda u: u[:n_loc], out)

        fn = jax.shard_map(
            local,
            mesh=self.device_mesh,
            in_specs=(P(axis), self._spec_tables),
            out_specs=P(axis),
        )
        return fn(solution, self._tables)

    def mass_term(self, solution):
        return self._cellwise("mass_term", solution)

    def mass_inverse(self, r):
        return self._cellwise("mass_inverse", r)
