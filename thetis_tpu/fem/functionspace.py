"""Function spaces and Function containers.

Replaces Firedrake ``FunctionSpace``/``Function`` (reference:
``thetis/utility.py:163-225`` ``get_functionspace``).  DG dofs live in dense
per-cell arrays ``(nc, ndofs)`` (scalars) or ``(nc, ndofs, dim)`` (vectors);
CG dofs live in per-vertex arrays with the cell->vertex map used as the cell
node map.  All data are jnp arrays — Functions are thin pytree-friendly
wrappers whose arithmetic operates on dof arrays directly.
"""
import numpy as np
import jax.numpy as jnp

from .reference_element import ELEMENTS

__all__ = [
    "FunctionSpace",
    "VectorFunctionSpace",
    "Function",
    "SpatialCoordinate",
    "get_functionspace",
]


class FunctionSpace:
    """Scalar or vector function space on a :class:`Mesh2d`.

    :arg mesh: Mesh2d
    :arg family: 'DG' or 'CG'
    :arg degree: polynomial degree
    :arg dim: value dimension (1 = scalar, 2 = vector)
    """

    def __init__(self, mesh, family, degree, dim=1, quad_degree=None):
        family = {"Discontinuous Lagrange": "DG", "Lagrange": "CG", "P": "CG"}.get(
            family, family
        )
        if family == "CG" and degree == 0:
            raise ValueError("CG0 does not exist")
        self.mesh = mesh
        self.family = family
        self.degree = degree
        self.dim = dim
        self.element = ELEMENTS[(family, degree)]
        self.ndofs = self.element.ndofs
        # quadrature degree: 2p+1 like the reference (tracer_eq_2d.py:73),
        # bumped to the nearest implemented rule
        self.quad_degree = quad_degree or max(2 * degree + 1, 2)
        self._tab_np = self.element.tabulate(self.quad_degree)
        # materialize device tabulations eagerly: creating them lazily inside
        # a jit trace would cache tracers (leak)
        self._tab_dev = {k: jnp.asarray(v) for k, v in self._tab_np.items()}
        self.is_dg = family == "DG"

        if self.is_dg:
            self.node_count = mesh.nc * self.ndofs
            self.cell_node_map_np = None  # implicit: (c, d) -> c*ndofs + d
        else:
            if degree == 1:
                self.node_count = mesh.nv
                self.cell_node_map_np = mesh.cells_np
            elif degree == 2:
                # vertex dofs then one dof per facet (edge midpoint)
                self.node_count = mesh.nv + mesh.nf
                cn = np.concatenate(
                    [mesh.cells_np, mesh.nv + mesh.cell_facets_np], axis=1
                ).astype(np.int32)
                self.cell_node_map_np = cn
            else:
                raise NotImplementedError

    # -- tabulations on device -----------------------------------------
    def tab(self, name):
        return self._tab_dev[name]

    phi = property(lambda s: s.tab("phi"))          # (nq, nd)
    dphi = property(lambda s: s.tab("dphi"))        # (nq, nd, 2)
    qw = property(lambda s: s.tab("qw"))            # (nq,)
    qwf = property(lambda s: s.tab("qwf"))          # (nqf,)
    phi_f = property(lambda s: s.tab("phi_f"))      # (6, nqf, nd)
    dphi_f = property(lambda s: s.tab("dphi_f"))    # (6, nqf, nd, 2)

    @property
    def cell_node_map(self):
        if "cnm" not in self._tab_dev:
            self._tab_dev["cnm"] = jnp.asarray(
                self.cell_node_map_np, dtype=jnp.int32
            )
        return self._tab_dev["cnm"]

    def _materialize(self):
        if not self.is_dg:
            _ = self.cell_node_map

    # -- dof layout ------------------------------------------------------
    def zero_dofs(self):
        if self.is_dg:
            shape = (self.mesh.nc, self.ndofs)
        else:
            shape = (self.node_count,)
        if self.dim > 1:
            shape = shape + (self.dim,)
        return jnp.zeros(shape)

    def dof_shape(self):
        return self.zero_dofs().shape

    def cell_dofs(self, u):
        """Return per-cell dof values (nc, nd[, dim]) for any space."""
        if self.is_dg:
            return u
        return u[self.cell_node_map]

    def dof_coords(self):
        """Physical coordinates of dofs, shaped like a scalar dof array
        (+ trailing coordinate axis)."""
        mesh = self.mesh
        if self.is_dg:
            # x = p0 + J @ xi for each nodal point; edge vectors are
            # period-unwrapped so seam cells of periodic meshes place
            # their interior (e.g. P2 edge-midpoint) nodes at the true
            # physical points (vertex nodes are unaffected: xi in {0,1})
            ref = self.element.dof_coords  # (nd, 2)
            p = mesh.coords_np[mesh.cells_np]  # (nc,3,2)
            wrap = getattr(mesh, "_wrap_dx", lambda d: d)
            J = np.stack([wrap(p[:, 1] - p[:, 0]),
                          wrap(p[:, 2] - p[:, 0])], axis=2)
            x = p[:, 0][:, None, :] + np.einsum("cij,dj->cdi", J, ref)
            return jnp.asarray(x)  # (nc, nd, 2)
        if self.degree == 1:
            return jnp.asarray(mesh.coords_np)
        # CG2: vertices then facet midpoints (facet edge vector unwrapped
        # as above)
        fv = mesh.facet_verts_np
        a = mesh.coords_np[fv[:, 0]]
        wrap = getattr(mesh, "_wrap_dx", lambda d: d)
        mids = a + 0.5 * wrap(mesh.coords_np[fv[:, 1]] - a)
        return jnp.asarray(np.concatenate([mesh.coords_np, mids], axis=0))

    def __eq__(self, other):
        return (
            isinstance(other, FunctionSpace)
            and self.mesh is other.mesh
            and self.family == other.family
            and self.degree == other.degree
            and self.dim == other.dim
        )

    def __hash__(self):
        return hash((id(self.mesh), self.family, self.degree, self.dim))

    def __repr__(self):
        kind = f"Vector({self.dim})" if self.dim > 1 else ""
        return f"{kind}{self.family}{self.degree} on {self.mesh.name}"


def VectorFunctionSpace(mesh, family, degree, dim=2):
    return FunctionSpace(mesh, family, degree, dim=dim)


def get_functionspace(mesh, h_family, h_degree, vector=False, dim=2, **kwargs):
    """Analogue of the reference helper (``thetis/utility.py:163``)."""
    return FunctionSpace(mesh, h_family, h_degree, dim=dim if vector else 1)


class Function:
    """A field: dof array + space. Mirrors firedrake.Function usage in user
    scripts (assign / interpolate / arithmetic on .data)."""

    def __init__(self, function_space, name=None, data=None):
        self.function_space = function_space
        self.name = name or "function"
        self.data = (
            function_space.zero_dofs() if data is None else jnp.asarray(data)
        )

    # -- mutation-style API used by demo scripts -------------------------
    def assign(self, value):
        if isinstance(value, Function):
            value = value.data
        self.data = jnp.broadcast_to(
            jnp.asarray(value, dtype=self.data.dtype), self.data.shape
        ).copy() if not hasattr(value, "shape") or value.shape != self.data.shape else jnp.asarray(value)
        return self

    def interpolate(self, expr):
        """Interpolate an expression.

        ``expr`` may be a callable ``f(x, y) -> array`` evaluated at dof
        coordinates, or an array already shaped like the dof array (e.g.
        built from ``SpatialCoordinate``), or a scalar.
        """
        xy = self.function_space.dof_coords()
        if callable(expr):
            vals = expr(xy[..., 0], xy[..., 1])
        else:
            vals = expr
        vals = jnp.asarray(vals)
        self.data = jnp.broadcast_to(vals, self.data.shape).astype(self.data.dtype).copy() \
            if vals.shape != self.data.shape else vals.astype(self.data.dtype)
        return self

    def project(self, expr):
        # for the supported nodal spaces interpolation == projection of
        # nodal data; true L2 projection comes with the operator layer
        return self.interpolate(expr)

    def copy(self, deepcopy=True):
        return Function(self.function_space, name=self.name, data=self.data)

    @property
    def dat(self):  # minimal compatibility shim
        return self

    # -- arithmetic ------------------------------------------------------
    def __add__(self, o):
        return self.data + (o.data if isinstance(o, Function) else o)

    __radd__ = __add__

    def __sub__(self, o):
        return self.data - (o.data if isinstance(o, Function) else o)

    def __rsub__(self, o):
        return (o.data if isinstance(o, Function) else o) - self.data

    def __mul__(self, o):
        return self.data * (o.data if isinstance(o, Function) else o)

    __rmul__ = __mul__

    def __getitem__(self, idx):
        return self.data[..., idx] if self.function_space.dim > 1 else self.data[idx]

    def __repr__(self):
        return f"Function({self.name}, {self.function_space})"


def SpatialCoordinate(mesh_or_space):
    """Return dof-coordinate arrays (x, y).

    With a mesh argument, returns vertex coordinates (matching P1CG layout,
    the common use in demo scripts); with a FunctionSpace, returns that
    space's dof coordinates.
    """
    if isinstance(mesh_or_space, FunctionSpace):
        xy = mesh_or_space.dof_coords()
    else:
        xy = jnp.asarray(mesh_or_space.coords_np)
    return xy[..., 0], xy[..., 1]
