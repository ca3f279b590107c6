r"""Field diagnostics.

Re-implementation of ``thetis/diagnostics.py``:

  VorticityCalculator2D  (ref L27-79): curl(uv) by L2 projection into P1
  GradientRecoverer2D    (ref L81-101): L2 gradient recovery into P1 vector
  HessianRecoverer2D     (ref L103-206): double L2 projection (used by the
      Hessian regularisation in the inversion toolkit)
  KineticEnergyCalculator (ref L209-248)

CG1 projections assemble per-cell moments, scatter to vertices, and solve
the consistent CG mass with lumped-preconditioned iterations.
"""
import numpy as np
import jax.numpy as jnp

from ..config import physical_constants

__all__ = [
    "P1Projector",
    "VorticityCalculator2D",
    "GradientRecoverer2D",
    "HessianRecoverer2D",
    "KineticEnergyCalculator",
]


class P1Projector:
    """L2 projection of cell-quad values into CG1."""

    def __init__(self, asm):
        self.asm = asm
        mesh = asm.mesh
        self.mesh = mesh
        ml_cell = np.einsum("q,qd->d", asm.space._tab_np["qw"],
                            asm.space._tab_np["phi"])
        lumped = np.zeros(mesh.nv)
        np.add.at(lumped, mesh.cells_np.ravel(),
                  (ml_cell[None, :] * mesh.detJ_np[:, None]).ravel())
        self._lumped_inv = jnp.asarray(1.0 / lumped)

    def _scatter(self, local):
        shape = (self.mesh.nv,) + local.shape[2:]
        return jnp.zeros(shape, local.dtype).at[self.mesh.cells].add(local)

    def _mass_mv(self, x):
        return self._scatter(self.asm.mass_apply(x[self.mesh.cells]))

    def project(self, fq, iterations=6):
        """(nc, nq[, k]) quad values -> (nv[, k]) CG1 dof values."""
        b = self._scatter(self.asm.cell_to_dofs(fq))
        Ml = self._lumped_inv.reshape((-1,) + (1,) * (b.ndim - 1))
        x = Ml * b
        for _ in range(iterations):
            x = x + Ml * (b - self._mass_mv(x))
        return x


class VorticityCalculator2D:
    r"""omega = dv/dx - du/dy projected into P1 (ref L27-79)."""

    def __init__(self, asm):
        self.asm = asm
        self.proj = P1Projector(asm)

    def solve(self, uv_dofs):
        g = self.asm.cell_grads(uv_dofs)  # (nc,nq,2,2) [k,i]=du_k/dx_i
        omega = g[..., 1, 0] - g[..., 0, 1]
        return self.proj.project(omega)


class GradientRecoverer2D:
    """L2 gradient recovery into P1 vector (ref L81-101)."""

    def __init__(self, asm):
        self.asm = asm
        self.proj = P1Projector(asm)

    def solve(self, field_dofs):
        if field_dofs.shape[:1] == (self.asm.mesh.nv,):
            field_dofs = field_dofs[self.asm.mesh.cells]
        g = self.asm.cell_grads(field_dofs)  # (nc, nq, 2)
        return self.proj.project(g)


class HessianRecoverer2D:
    """Double L2 projection Hessian recovery (ref L103-206): grad then
    grad-of-recovered-gradient; returns (nv, 2, 2)."""

    def __init__(self, asm):
        self.asm = asm
        self.grad = GradientRecoverer2D(asm)

    def solve(self, field_dofs):
        g1 = self.grad.solve(field_dofs)  # (nv, 2)
        mesh = self.asm.mesh
        gc = g1[mesh.cells]  # (nc, 3, 2)
        H = self.asm.cell_grads(gc)  # (nc, nq, 2, 2)
        Hsym = 0.5 * (H + jnp.swapaxes(H, -1, -2))
        return self.grad.proj.project(Hsym)


class KineticEnergyCalculator:
    r"""E_kin = 0.5 rho int H |u|^2 (ref L209-248)."""

    def __init__(self, asm, depth, bathy_q, density=None):
        self.asm = asm
        self.depth = depth
        self.bathy_q = bathy_q
        self.density = density or physical_constants["rho0"]

    def compute(self, uv_dofs, elev_dofs):
        uv_q = self.asm.cell_values(uv_dofs)
        eta_q = self.asm.cell_values(elev_dofs)
        H_q = self.depth.total_depth(self.bathy_q, eta_q)
        e = 0.5 * self.density * H_q * (uv_q**2).sum(-1)
        return self.asm.integrate_cellq(e)


def form2indicator(asm, integrand_q):
    """Cell-wise contributions of a 0-form (ref ``utility.py:1110-1135``
    ``form2indicator``): multiply the integrand by a P0 test function and
    assemble, i.e. integrate per cell.

    :arg integrand_q: (nc, nq) quad-point values of the integrand
    :returns: (nc,) per-cell indicator (P0 field)
    """
    return (integrand_q * asm.wdetJ).sum(axis=1)


class DWRErrorEstimator:
    """Dual-weighted-residual error indicator for the 2D SWE (the
    reference exposes DWR-style indicators through ``form2indicator`` on
    the residual weighted by an adjoint solution): eta_K = | <R(u), z> |_K
    where R is the strong-form-weighted weak residual restricted to cell
    K and z an adjoint (weight) state."""

    def __init__(self, solver_obj):
        self.solver = solver_obj
        self.asm = solver_obj.asm
        self.eq = solver_obj.eq_sw

    def compute(self, state, adjoint_state, fields=None, bnd_values=None):
        """(state dict, adjoint dict with 'uv'/'elev') -> (nc,) indicator.

        The residual is evaluated in dof space (mass-normalized), paired
        with the adjoint dofs cell-wise, and the absolute per-cell pairing
        is returned as the indicator."""
        import jax.numpy as jnp

        fields = fields or {}
        r = self.eq.residual("all", state, state, fields, fields,
                             bnd_values or {})
        pair_uv = (r["uv"] * adjoint_state["uv"]).sum(axis=(1, 2))
        pair_eta = (r["elev"] * adjoint_state["elev"]).sum(axis=1)
        return jnp.abs(pair_uv + pair_eta)
