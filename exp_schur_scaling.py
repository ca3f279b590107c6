"""Iteration-count vs mesh-size at implicit wave CFL ~25 (the regime the
reference's fieldsplit/Schur KSPs target): block-Jacobi and the coarse
V-cycle need O(mesh-diameter) iterations; the Schur fieldsplit PC stays
O(1).  CPU f64 (rates are hardware-independent); results logged in
PERF.md."""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from types import SimpleNamespace
from thetis_tpu.mesh.generation import RectangleMesh
from thetis_tpu.fem.functionspace import FunctionSpace, Function
from thetis_tpu.fem.assembly import DGAssembler
from thetis_tpu.equations.shallowwater_2d import ShallowWaterEquations, swe_state
from thetis_tpu.solvers.assembled import (
    PackedState, assemble_affine_operator, get_coloring, CoarseCorrection,
    batched_inv_small, ring_apply, get_stencil)
from thetis_tpu.solvers.fieldsplit import SchurFieldsplitPC

def build(nx, ny, cfl=25.0):
    lx, ly = 100e3, 50e3
    mesh = RectangleMesh(nx, ny, lx, ly)
    V = FunctionSpace(mesh, "DG", 1)
    asm = DGAssembler(mesh, V)
    opts = SimpleNamespace(use_nonlinear_equations=True, use_wetting_and_drying=False,
        use_lax_friedrichs_velocity=True, use_grad_div_viscosity_term=False,
        use_grad_depth_viscosity_term=True, sipg_factor=1.0, norm_smoother=0.0)
    eq = ShallowWaterEquations(mesh, asm, opts, bathymetry=50.0, bnd_conditions={})
    fields = {"lax_friedrichs_velocity_scaling_factor": jnp.asarray(1.0),
              "quadratic_drag_coefficient": jnp.asarray(2.5e-3)}
    c = np.sqrt(9.81*51.0)
    dt = cfl*(lx/nx)/c
    zero = swe_state(jnp.zeros((mesh.nc,3,2)), jnp.zeros((mesh.nc,3)))
    ps = PackedState(zero)
    def Fw(x):
        st0 = ps.unpack(x)
        r = eq.residual("all", st0, zero, fields, fields, {})
        m = eq.mass_term(st0)
        return ps.pack(swe_state(m["uv"]-0.5*dt*r["uv"], m["elev"]-0.5*dt*r["elev"]))
    blocks, _ = jax.jit(lambda x0: assemble_affine_operator(Fw, x0, mesh))(ps.pack(zero))
    ring, _, _ = get_coloring(mesh)
    lx_ = lx
    elev = jnp.asarray(np.exp(-((np.asarray(mesh.coords_np[mesh.cells_np][...,0])-lx_/2)/15e3)**2))
    b = ps.pack(swe_state(jnp.zeros((mesh.nc,3,2)), elev))
    return mesh, blocks, jnp.asarray(ring), b

def fgmres_iters(mesh, blocks, ring, b, M, maxit=400, rtol=1e-5):
    mv = jax.jit(lambda x: ring_apply(blocks, ring, x))
    bf = np.asarray(b, np.float64).reshape(-1)
    bnorm = np.linalg.norm(bf)
    beta = bnorm
    V_ = [bf/beta]; Z=[]; H=np.zeros((maxit+1, maxit))
    for j in range(maxit):
        z = np.asarray(M(jnp.asarray(V_[j].reshape(mesh.nc,9)))).reshape(-1)
        w = np.asarray(mv(jnp.asarray(z.reshape(mesh.nc,9)))).reshape(-1)
        for i in range(j+1):
            H[i,j] = V_[i]@w; w = w - H[i,j]*V_[i]
        H[j+1,j] = np.linalg.norm(w)
        V_.append(w/max(H[j+1,j],1e-300)); Z.append(z)
        e1 = np.zeros(j+2); e1[0]=beta
        y,_,_,_ = np.linalg.lstsq(H[:j+2,:j+1], e1, rcond=None)
        rn = np.linalg.norm(H[:j+2,:j+1]@y - e1)
        if rn/bnorm < rtol:
            return j+1
    return maxit

import json
for nx, ny in ((40,20),(80,40),(160,80)):
    mesh, blocks, ring, b = build(nx, ny)
    di = batched_inv_small(blocks[:,0])
    bjac = jax.jit(lambda r: jnp.einsum("cij,cj->ci", di, r))
    it_b = fgmres_iters(mesh, blocks, ring, b, bjac, maxit=300)
    coarse = CoarseCorrection(blocks, np.asarray(ring), mesh)
    mvj = jax.jit(lambda x: ring_apply(blocks, ring, x))
    def vcyc(r):
        z = bjac(r); r2 = r - mvj(z); z = z + coarse(r2)
        r3 = r - mvj(z); return z + bjac(r3)
    it_c = fgmres_iters(mesh, blocks, ring, b, jax.jit(vcyc), maxit=300)
    fs = SchurFieldsplitPC(blocks, np.asarray(ring), mesh)
    it_s = fgmres_iters(mesh, blocks, ring, b, jax.jit(fs), maxit=300)
    print(json.dumps({"mesh": f"{nx}x{ny}", "nc": mesh.nc, "wave_cfl": 25,
                      "bjac": it_b, "coarse_vcycle": it_c,
                      "schur_fieldsplit": it_s}), flush=True)
