"""Equation/Term infrastructure.

Mirrors the reference's ``thetis/equation.py`` (Term/Equation with labels
``source|explicit|implicit|nonlinear`` and sign convention d(u)/dt = term)
but evaluates residuals as fused quadrature-point accumulation passes instead
of UFL forms:

  * every term adds its integrand into shared accumulator *buckets*
    (cell / grad / facet / facet-grad, see ``fem.assembly``),
  * a single projection step turns buckets into dof-space residuals.

Boundary conditions follow the reference's vocabulary
(``shallowwater_eq.py:232-296``): per-marker dicts with keys
``elev``, ``uv``, ``un``, ``flux`` (open sea) and ``drag``; unspecified
markers are impermeable land.  The *structure* (which markers/keys exist) is
static and baked in at equation construction; the *values* are traced arrays
so time-dependent forcing works under jit.
"""
import numpy as np
import jax.numpy as jnp

__all__ = ["Bucket", "EquationBase", "SUPPORTED_LABELS", "facet_quad_value",
           "facet_quad_value_2s"]

SUPPORTED_LABELS = frozenset(["source", "explicit", "implicit", "nonlinear"])


class Bucket:
    """Lazily-allocated accumulator; avoids materialising zero arrays for
    disabled terms."""

    __slots__ = ("val",)

    def __init__(self):
        self.val = None

    def add(self, x):
        self.val = x if self.val is None else self.val + x

    def __bool__(self):
        return self.val is not None


def facet_quad_value(asm, val, vector=False):
    """Convert a BC value / coefficient into per-facet-quad arrays.

    Supported: python scalars, 0-d arrays, per-vertex CG1 arrays (nv,),
    per-cell-dof DG arrays (nc, nd), or ready (nf, nqf) arrays.  Vector
    variants carry a trailing component axis.
    """
    mesh = asm.mesh
    nqf = len(asm.space._tab_np["qwf"])
    tail = (2,) if vector else ()
    if np.isscalar(val) or (hasattr(val, "ndim") and val.ndim == len(tail)):
        return jnp.broadcast_to(jnp.asarray(val), (mesh.nf, nqf) + tail)
    val = jnp.asarray(val)
    if val.shape[: 1] == (mesh.nv,):
        # CG1 vertex data: linear interpolation along the facet
        fv = mesh.facet_verts
        a, b = val[fv[:, 0]], val[fv[:, 1]]
        t = jnp.asarray(asm.space._tab_np["qt"])
        t = t.reshape((1, nqf) + (1,) * len(tail))
        return a[:, None] + (b[:, None] - a[:, None]) * t
    if val.shape[:2] == (mesh.nc, asm.ndofs):
        return asm.facet_traces(val)[:, 0]
    if val.shape[:2] == (mesh.nf, nqf):
        return val
    raise ValueError(f"cannot map BC value of shape {val.shape} to facets")


def facet_quad_value_2s(asm, val, vector=False):
    """Both-side facet traces (nf, 2, nqf[, k]).  Sides are identical unless
    ``val`` is a DG dof array."""
    mesh = asm.mesh
    if (
        not np.isscalar(val)
        and hasattr(val, "shape")
        and val.shape[:2] == (mesh.nc, asm.ndofs)
    ):
        return asm.facet_traces(jnp.asarray(val))
    tr0 = facet_quad_value(asm, val, vector=vector)
    return jnp.stack([tr0, tr0], axis=1)


class EquationBase:
    """Common helpers: term registry + boundary masks."""

    def __init__(self, mesh, asm, bnd_conditions=None):
        self.mesh = mesh
        self.asm = asm
        self.terms = []  # list of (name, label, method)
        bnd_conditions = bnd_conditions or {}
        self.bnd_keys = {
            int(m): frozenset(spec.keys()) for m, spec in bnd_conditions.items()
        }
        self._build_masks()

    def add_term(self, name, label, method):
        assert label in SUPPORTED_LABELS, label
        self.terms.append((name, label, method))

    def select_terms(self, label):
        """Select by label ('implicit', frozenset of labels, 'all') or by
        exact term *names* (any entry matching a registered term name
        switches to name-based selection — used by block preconditioners
        that need individual operators, cf. AssembledSchurPC)."""
        if label == "all":
            labels = SUPPORTED_LABELS
        elif isinstance(label, str):
            labels = frozenset([label])
        else:
            labels = frozenset(label)
        names = {n for (n, _, _) in self.terms}
        if labels & names:
            return [(n, m) for (n, l, m) in self.terms if n in labels]
        return [(n, m) for (n, l, m) in self.terms if l in labels]

    # -- boundary classification (static, host side) --------------------
    def _build_masks(self):
        mesh = self.mesh
        marker = mesh.facet_marker_np
        is_bnd = mesh.facet_is_boundary_np
        open_keys = ("elev", "uv", "un", "flux", "value", "equilibrium",
                     "symm")
        self.open_markers = [
            m
            for m, keys in sorted(self.bnd_keys.items())
            if any(k in keys for k in open_keys)
        ]
        mask_open = np.zeros(mesh.nf, dtype=bool)
        for m in self.open_markers:
            mask_open |= is_bnd & (marker == m)
        self.mask_open = jnp.asarray(mask_open)
        self.mask_land = jnp.asarray(is_bnd & ~mask_open)
        self.mask_bnd = jnp.asarray(is_bnd)
        self.mask_int = jnp.asarray(~is_bnd)
        # Partition sub-meshes keep a (possibly all-False) mask for every
        # marker so the traced structure is identical across devices
        # (shard_map traces one function for the whole device mesh).
        keep_all = getattr(mesh, "keep_all_marker_masks", False)
        self.marker_masks = {
            m: jnp.asarray(is_bnd & (marker == m))
            for m in sorted(self.bnd_keys)
            if keep_all or (is_bnd & (marker == m)).any()
        }
        # drop BC specs on markers absent from this mesh partition
        self.bnd_keys = {m: k for m, k in self.bnd_keys.items() if m in self.marker_masks}

    def _mask_q(self, mask, tail=0):
        """Expand an (nf,) mask to broadcast over (nf, nqf, ...)."""
        return mask.reshape((self.mesh.nf, 1) + (1,) * tail)
