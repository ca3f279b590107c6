r"""Extruded 3D mesh: 2D triangles x vertical layers (sigma coordinates).

Replaces the reference's Firedrake ``ExtrudedMesh`` + sigma-extrusion kernel
(``thetis/utility.py:349-420`` ``extrude_mesh_sigma``).  The TPU-native
representation keeps the reference's crucial property — *columns are local*
(SURVEY.md section 2.10): every 3D field is a dense array over
``(cell, horizontal_node, layer, vertical_node)`` so all vertical operations
(integrals, implicit diffusion, 2D<->3D copies) are contiguous tensor ops
with no indirection, and horizontal DG operations reuse the 2D facet
tables layer-by-layer.

z-coordinates are *state*: ``z_interfaces`` (nc, 3, nz+1) holds the
interface z at each horizontal P1 node, recomputed from (bathymetry,
elevation) each ALE mesh update (ref ``ALEMeshUpdater``,
``utility3d.py:711-876``).
"""
import numpy as np
import jax.numpy as jnp

__all__ = ["ExtrudedMesh", "compute_z_interfaces"]


class ExtrudedMesh:
    """2D mesh x nz layers with sigma-distributed interfaces."""

    def __init__(self, mesh2d, n_layers, sigma=None):
        """
        :arg mesh2d: Mesh2d
        :arg n_layers: number of vertical layers
        :arg sigma: optional (nz+1,) monotone array in [0, 1] (0 = bottom,
            1 = surface); default uniform
        """
        self.mesh2d = mesh2d
        self.nz = int(n_layers)
        if sigma is None:
            sigma = np.linspace(0.0, 1.0, self.nz + 1)
        sigma = np.asarray(sigma, dtype=np.float64)
        assert sigma.shape == (self.nz + 1,)
        assert sigma[0] == 0.0 and sigma[-1] == 1.0
        self.sigma_np = sigma
        self.sigma = jnp.asarray(sigma)

    def z_interfaces(self, bathy_cell, elev_cell):
        """Interface z-coordinates (nc, 3, nz+1) for current (h, eta) given
        per-cell-node values (nc, 3): z = -h + sigma*(h + eta)
        (ref ``utility.py:387-405`` sigma kernel)."""
        return compute_z_interfaces(self.sigma, bathy_cell, elev_cell)

    def __repr__(self):
        return f"ExtrudedMesh({self.mesh2d.name} x {self.nz} layers)"


def compute_z_interfaces(sigma, bathy_cell, elev_cell):
    h = bathy_cell + elev_cell  # total depth at nodes (nc, 3)
    return -bathy_cell[..., None] + sigma[None, None, :] * h[..., None]
