r"""Depth-integrated non-hydrostatic (NH) pressure model.

TPU-native analogue of the reference's NH extension:

* :class:`DepthIntegratedPoissonSolver` — the elliptic solve for the NH
  pressure ``q`` and the velocity updates (ref ``utility.py:999-1105``):

  .. math::
     \nabla\cdot\nabla q + A\cdot\nabla q + B q + C = 0,\qquad
     A = \frac{\nabla(\eta - d)}{H},\quad
     C = -\frac{2\rho_0}{\Delta t}\Big(\nabla\cdot\bar u
         + 2\frac{\bar w - w_b}{H}\Big)

  assembled matrix-free on P1 CG (vertex dofs, scatter-add like the
  Exner solve) and solved with diagonally-preconditioned BiCGStab.

* :class:`FreeSurfaceEquation2D` — the :math:`\eta`-only continuity
  equation used by the free-surface corrector
  (ref ``shallowwater_eq.py:969-997``), with the same Riemann interface
  flux as the coupled continuity term but frozen velocity.

The serial NH time integrator (ref
``coupled_timeintegrator_2d.py:161-236``) advances: SWE step -> Poisson
solve for q -> uv/w update -> free-surface corrector re-advancing
``elev`` from the pre-step value with the corrected velocity.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..config import physical_constants
from .base import EquationBase, facet_quad_value

__all__ = ["DepthIntegratedPoissonSolver", "FreeSurfaceEquation2D"]


class DepthIntegratedPoissonSolver:
    """Matrix-free CG Poisson solve for the NH pressure q and the
    associated velocity updates (ref ``utility.py:999-1105``).

    q lives in P2 CG by default (ref ``test_standing_wave_nh.py`` sets
    ``q_degree = 2``): the P1DG-velocity / P2-pressure pairing is the
    compatible one — equal-order q is weakly unstable."""

    def __init__(self, mesh, asm, depth, dt, bnd_conditions=None,
                 rtol=1e-8, maxiter=200, q_degree=2):
        from ..fem.functionspace import FunctionSpace

        self.mesh = mesh
        self.asm = asm
        self.depth = depth
        self.dt = float(dt)
        self.rtol = rtol
        self.maxiter = maxiter
        self.rho0 = float(physical_constants["rho0"])

        self.q_space = FunctionSpace(mesh, "CG", q_degree,
                                     quad_degree=2 * q_degree + 1)
        qs = self.q_space
        tab = qs._tab_np
        qp = np.asarray(tab["qp"])                  # (nq, 2)
        self.phi = jnp.asarray(tab["phi"])          # (nq, ndq)
        Jinv_np = np.asarray(mesh.Jinv)
        # physical test/trial gradients: (nc, nq, ndq, 2)
        self.gphi = jnp.asarray(np.einsum(
            "qdj,cji->cqdi", np.asarray(tab["dphi"]), Jinv_np))
        self.wdetJ = jnp.asarray(
            np.asarray(tab["qw"])[None, :] * np.asarray(mesh.detJ_np)[:, None]
        )
        self.cnm = qs.cell_node_map                  # (nc, ndq)
        self.nq_nodes = qs.node_count
        # P1 (barycentric) tabulation at the q-space quad points, used to
        # evaluate DG1/CG1 coefficient fields (eta, uv, bathymetry)
        p1 = np.stack([1.0 - qp[:, 0] - qp[:, 1], qp[:, 0], qp[:, 1]], axis=1)
        self.p1tab = jnp.asarray(p1)                 # (nq, 3)
        gp1 = np.asarray([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])  # (3, 2)
        self.gp1 = jnp.asarray(np.einsum("dj,cji->cdi", gp1, Jinv_np))
        self.cells = mesh.cells

        # Dirichlet (q = 0) on open boundaries that carry BC data
        # (ref utility.py:1060-1070): vertex dofs + edge-midpoint dofs
        bnd_conditions = bnd_conditions or {}
        marker = mesh.facet_marker_np
        is_bnd = mesh.facet_is_boundary_np
        dmask = np.zeros(qs.node_count, dtype=bool)
        fverts = np.asarray(mesh.facet_verts_np)
        for m in bnd_conditions:
            sel = is_bnd & (marker == int(m))
            dmask[fverts[sel].ravel()] = True
            if q_degree == 2:
                dmask[mesh.nv + np.nonzero(sel)[0]] = True
        self.dirichlet = jnp.asarray(dmask)

        # Jacobi preconditioner: exact stiffness diagonal
        gph = np.einsum("qdj,cji->cqdi", np.asarray(tab["dphi"]), Jinv_np)
        kdiag = np.einsum("cqdi,cqdi,cq->cd", gph, gph,
                          np.asarray(self.wdetJ))
        diag = np.zeros(qs.node_count)
        np.add.at(diag, np.asarray(qs.cell_node_map_np).ravel(),
                  kdiag.ravel())
        self._diag = jnp.asarray(np.maximum(diag, 1e-30))

    # -- helpers ----------------------------------------------------------
    def _q_values(self, v):
        """q-space dofs -> (nc, nq) quad values."""
        return jnp.einsum("qd,cd->cq", self.phi, v[self.cnm])

    def _q_grads(self, v):
        """q-space dofs -> (nc, nq, 2) quad-point gradients."""
        return jnp.einsum("cqdi,cd->cqi", self.gphi, v[self.cnm])

    def _p1_values(self, v_cellnodes):
        """(nc, 3[, k]) P1 cell-node values -> (nc, nq[, k])."""
        return jnp.einsum("qd,cd...->cq...", self.p1tab, v_cellnodes)

    def _p1_grad(self, v_cellnodes):
        """(nc, 3) P1 cell-node values -> (nc, 2) cell-constant grads."""
        return jnp.einsum("cdi,cd->ci", self.gp1, v_cellnodes)

    def _scatter(self, cell_acc, grad_acc_q):
        """Project quad accumulators against the q-space test functions:
        cell_acc (nc, nq), grad_acc_q (nc, nq, 2) -> (n_nodes,)."""
        local = jnp.einsum("cq,qd->cd", cell_acc * self.wdetJ, self.phi)
        if grad_acc_q is not None:
            local = local + jnp.einsum(
                "cqi,cq,cqdi->cd", grad_acc_q, self.wdetJ, self.gphi)
        return jnp.zeros(self.nq_nodes).at[self.cnm].add(local)

    def _operator_parts(self, elev_dofs, bathy_v):
        """q-independent coefficients at the q-space quad points."""
        eta_q = self._p1_values(elev_dofs)            # (nc, nq)
        bathy_cn = bathy_v[self.cells]                # (nc, 3)
        bathy_q = self._p1_values(bathy_cn)
        H_q = jnp.maximum(eta_q + bathy_q, 0.05)
        geta = self._p1_grad(elev_dofs.reshape(elev_dofs.shape[0], 3))
        gbath = self._p1_grad(bathy_cn)
        ghori = geta - gbath                          # grad(eta - d), (nc,2)
        gH = geta + gbath                             # grad(eta + d)
        return dict(H_q=H_q, ghori=ghori, gH=gH)

    def _apply_A(self, q, parts):
        """Weak operator action (sign-flipped so the Laplacian is
        positive-definite), with Dirichlet rows replaced by identity."""
        qf = jnp.where(self.dirichlet, 0.0, q)
        gq = self._q_grads(qf)                        # (nc, nq, 2)
        q_q = self._q_values(qf)                      # (nc, nq)
        H_q = parts["H_q"]
        ghori, gH = parts["ghori"], parts["gH"]
        gh = ghori[:, None, :]

        # f = -grad q . grad t
        grad_acc = -gq
        # f += (ghori/H . grad q) t
        cell_acc = (gh * gq).sum(-1) / H_q
        # f += -grad(q t / H) . ghori
        #    = -(t/H) grad q . ghori - (q/H) grad t . ghori
        #      + (q t / H^2) grad H . ghori
        cell_acc = cell_acc - (gq * gh).sum(-1) / H_q
        grad_acc = grad_acc - gh * (q_q / H_q)[..., None]
        cell_acc = cell_acc + q_q * (ghori * gH).sum(-1)[:, None] / H_q**2
        # f += -(ghori . grad H + 4)/H^2 q t
        cell_acc = cell_acc - (
            ((ghori * gH).sum(-1)[:, None] + 4.0) / H_q**2
        ) * q_q
        r = self._scatter(cell_acc, grad_acc)
        # flip sign (positive-definite leading block) + Dirichlet identity
        return jnp.where(self.dirichlet, q, -r)

    def _rhs(self, uv_dofs, w_dofs, parts, bathy_v):
        """C projected onto the test space (sign matching _apply_A)."""
        const = 2.0 * self.rho0 / self.dt
        uv_q = self._p1_values(uv_dofs)               # (nc, nq, 2)
        w_q = self._p1_values(w_dofs)                 # (nc, nq)
        gbath = self._p1_grad(bathy_v[self.cells])    # (nc, 2)
        w_b = -(uv_q * gbath[:, None, :]).sum(-1)     # -uv . grad d
        # C-part of f: const*(grad t . uv - 2 (w - w_b)/H t)
        cell_acc = -const * 2.0 * (w_q - w_b) / parts["H_q"]
        grad_acc = const * uv_q
        c_vec = self._scatter(cell_acc, grad_acc)
        # f(q) + C = 0 and _apply_A = -f  =>  A q = +C-part
        return jnp.where(self.dirichlet, 0.0, c_vec)

    def solve(self, uv_dofs, w_dofs, elev_dofs, bathy_v, q0=None):
        """Solve for q (n_nodes,) and return (q, uv_new, w_new)."""
        parts = self._operator_parts(elev_dofs, bathy_v)
        b = self._rhs(uv_dofs, w_dofs, parts, bathy_v)
        mv = lambda x: self._apply_A(x, parts)
        prec = lambda x: x / self._diag
        q, _ = jax.scipy.sparse.linalg.bicgstab(
            mv, b, x0=q0 if q0 is not None else jnp.zeros(self.nq_nodes),
            tol=self.rtol, atol=0.0, M=prec, maxiter=self.maxiter,
        )
        q = jnp.where(self.dirichlet, 0.0, q)

        # velocity updates, L2-projected onto the P1DG spaces
        # (ref utility.py:1077-1099):
        # uv -= dt/(2 rho0) (grad q + ghori/H q);  w += dt/rho0 * q/H
        asm = self.asm
        gq = self._q_grads(q)                         # (nc, nq, 2)
        q_q = self._q_values(q)
        eta_q = self._p1_values(elev_dofs)
        H_q = jnp.maximum(eta_q + self._p1_values(bathy_v[self.cells]), 0.05)
        ghori_q = parts["ghori"][:, None, :]
        duv_q = -0.5 * self.dt / self.rho0 * (
            gq + ghori_q * (q_q / H_q)[..., None]
        )
        dw_q = self.dt / self.rho0 * q_q / H_q
        # project (nc, nq[, k]) onto P1DG with the q-space quadrature
        Minv = jnp.asarray(np.linalg.inv(
            np.einsum("qd,qe,q->de",
                      np.asarray(self.p1tab), np.asarray(self.p1tab),
                      np.asarray(self.q_space._tab_np["qw"]))))

        def project(fq):
            rhs = jnp.einsum("cq...,cq,qd->cd...", fq, self.wdetJ,
                             self.p1tab)
            return jnp.einsum("de,ce...->cd...", Minv, rhs) / (
                self.mesh.detJ[:, None] if fq.ndim == 2
                else self.mesh.detJ[:, None, None])

        uv_new = uv_dofs + project(duv_q)
        w_new = w_dofs + project(dw_q)
        return q, uv_new, w_new


class FreeSurfaceEquation2D(EquationBase):
    """eta-only continuity equation for the NH free-surface corrector
    (ref ``shallowwater_eq.py:969-997``): d(eta)/dt = -div(H uv) with
    frozen velocity, same Riemann interface flux as the coupled
    continuity term (``shallowwater_eq.py:396-450``)."""

    def __init__(self, mesh, asm, depth, bathymetry, bnd_conditions=None):
        super().__init__(mesh, asm, bnd_conditions)
        self.depth = depth
        self.g = float(physical_constants["g_grav"])
        self.bathy_q = jnp.asarray(
            asm.cg1_values(bathymetry[mesh.cells])
            if np.asarray(bathymetry).ndim == 1
            else jnp.broadcast_to(jnp.asarray(bathymetry),
                                  (mesh.nc, len(asm.space._tab_np["qw"])))
        )
        from .base import facet_quad_value_2s
        self.bathy_tr = facet_quad_value_2s(asm, bathymetry)

    def residual(self, label, solution, solution_old, fields, fields_old,
                 bnd_values):
        asm = self.asm
        eta = solution["elev"]
        uv_dofs = fields["uv_2d"]
        n = self.mesh.facet_normal[:, None, :]

        eta_q = asm.cell_values(eta)
        H_q = self.depth.total_depth(self.bathy_q, eta_q)
        uv_q = asm.cell_values(uv_dofs)
        B_grad = H_q[..., None] * uv_q                    # H uv . grad t

        # interior Riemann flux with eta jump (frozen uv)
        eta_tr = asm.facet_traces(eta)
        uv_tr = asm.facet_traces(uv_dofs)
        H_tr = self.depth.total_depth(self.bathy_tr, eta_tr)
        h = 0.5 * (H_tr[:, 0] + H_tr[:, 1])
        uv_rie = 0.5 * (uv_tr[:, 0] + uv_tr[:, 1]) + (
            jnp.sqrt(self.g / jnp.maximum(jnp.abs(h), 1e-12))
            * (eta_tr[:, 0] - eta_tr[:, 1])
        )[..., None] * n
        hu_star_n = h * (uv_rie * n).sum(-1)
        mi = self._mask_q(self.mask_int)
        B_facet = jnp.stack([-hu_star_n, hu_star_n], axis=1) * mi[:, None]

        # open boundaries with an 'elev' BC: flux h_rie * un with the
        # exterior elevation; other/land boundaries: no flux
        for m in self.open_markers:
            if "elev" not in self.bnd_keys.get(m, ()):
                continue
            mask = self._mask_q(self.marker_masks[m])
            eta_ext = facet_quad_value(asm, bnd_values[m]["elev"])
            eta_b = eta_tr[:, 0]
            H_b = H_tr[:, 0]
            un_b = (uv_tr[:, 0] * n).sum(-1)
            un_rie = un_b + jnp.sqrt(
                self.g / jnp.maximum(jnp.abs(H_b), 1e-12)
            ) * (eta_b - eta_ext)
            contrib = -H_b * un_rie * mask
            B_facet = B_facet + jnp.stack(
                [contrib, jnp.zeros_like(contrib)], axis=1
            )

        r = asm.grad_to_dofs(B_grad) + asm.facet_to_dofs(B_facet)
        return {"elev": r}

    def mass_term(self, solution):
        return {"elev": self.asm.mass_apply(solution["elev"])}

    def mass_inverse(self, r):
        return {"elev": self.asm.mass_inverse(r["elev"])}
