"""Vertex-based P1DG slope limiter (Kuzmin 2010).

Replaces the reference's ``VertexBasedP1DGLimiter`` (``thetis/limiter.py:48-198``,
itself built on Firedrake's VertexBasedLimiter + two op2 C kernels):

1. per-cell centroid means (for affine P1 triangles the centroid value is
   the mean of the three nodal values),
2. per-vertex bounds = min/max over adjacent cell centroids
   (scatter-min/max over the cell->vertex map),
3. boundary correction: on exterior facets the *facet-mean* also enters the
   bounds of the facet's vertices (ref ``limiter.py:123-145`` C kernel) so
   boundary extrema are not clipped,
4. per-cell limiting factor alpha applied to the deviation from the mean.

Vector fields are limited component-wise (ref ``limiter.py:188-196``).
"""
import numpy as np
import jax.numpy as jnp

__all__ = ["VertexBasedP1DGLimiter"]


class VertexBasedP1DGLimiter:
    def __init__(self, space):
        assert space.family == "DG" and space.degree == 1, \
            "vertex-based limiter requires P1DG"
        self.space = space
        self.mesh = space.mesh
        mesh = self.mesh
        self.cells = mesh.cells  # (nc, 3) vertex ids; nodal dof d sits at
        # local vertex d for P1
        # boundary facets: owner cell + the two local dof indices on the facet
        bnd = np.nonzero(mesh.facet_is_boundary_np)[0]
        self._has_bnd = len(bnd) > 0
        if self._has_bnd:
            own = mesh.facet_cells_np[bnd, 0]
            lf = mesh.facet_local_np[bnd, 0]
            # local facet i is opposite vertex i -> nodes (i+1)%3, (i+2)%3
            n1 = (lf + 1) % 3
            n2 = (lf + 2) % 3
            self.bnd_cell = jnp.asarray(own, dtype=jnp.int32)
            self.bnd_n1 = jnp.asarray(n1, dtype=jnp.int32)
            self.bnd_n2 = jnp.asarray(n2, dtype=jnp.int32)
            cells_np = mesh.cells_np
            self.bnd_v1 = jnp.asarray(
                cells_np[own, n1], dtype=jnp.int32
            )
            self.bnd_v2 = jnp.asarray(cells_np[own, n2], dtype=jnp.int32)

    def _apply_scalar(self, u):
        mesh = self.mesh
        nv = mesh.nv
        centroid = u.mean(axis=1)  # (nc,)
        big = jnp.asarray(jnp.finfo(u.dtype).max, dtype=u.dtype)
        qmax = jnp.full((nv,), -big).at[self.cells].max(
            centroid[:, None], mode="drop"
        )
        qmin = jnp.full((nv,), big).at[self.cells].min(
            centroid[:, None], mode="drop"
        )
        if self._has_bnd:
            fmean = 0.5 * (
                u[self.bnd_cell, self.bnd_n1] + u[self.bnd_cell, self.bnd_n2]
            )
            qmax = qmax.at[self.bnd_v1].max(fmean).at[self.bnd_v2].max(fmean)
            qmin = qmin.at[self.bnd_v1].min(fmean).at[self.bnd_v2].min(fmean)
        vmax = qmax[self.cells]  # (nc, 3)
        vmin = qmin[self.cells]
        dev = u - centroid[:, None]
        eps = jnp.asarray(1e-14, dtype=u.dtype)
        up = jnp.where(dev > eps, (vmax - centroid[:, None]) / jnp.maximum(dev, eps), 1.0)
        dn = jnp.where(dev < -eps, (vmin - centroid[:, None]) / jnp.minimum(dev, -eps), 1.0)
        alpha = jnp.clip(jnp.minimum(up, dn), 0.0, 1.0).min(axis=1)
        return centroid[:, None] + alpha[:, None] * dev

    def apply(self, u):
        """Limit a (nc,3) or (nc,3,k) dof array; returns the limited array."""
        if u.ndim == 3:
            comps = [self._apply_scalar(u[..., k]) for k in range(u.shape[-1])]
            return jnp.stack(comps, axis=-1)
        return self._apply_scalar(u)
