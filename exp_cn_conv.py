"""Convergence-history experiment: outer FGMRES iterations to rtol on the
bench CN system (320x160, wave CFL ~25) under each preconditioner.
CPU f64; rates are hardware-independent.  Scratch driver for PERF.md."""
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

import sys
nx, ny = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (320, 160)
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
dt = 2.0*float(mesh.cell_hmin_np.min())/c
print("wave CFL (hmin)", c*dt/float(mesh.cell_hmin_np.min()), "nc", mesh.nc, flush=True)

zero = swe_state(jnp.zeros((mesh.nc,3,2)), jnp.zeros((mesh.nc,3)))
ps = PackedState(zero)
def Fw(x):
    st0 = ps.unpack(x)
    r = eq.residual("all", st0, zero, fields, fields, {})
    m = eq.mass_term(st0)
    return ps.pack(swe_state(m["uv"]-0.5*dt*r["uv"], m["elev"]-0.5*dt*r["elev"]))
blocks, _ = jax.jit(lambda x0: assemble_affine_operator(Fw, x0, mesh))(ps.pack(zero))
ring, _, _ = get_coloring(mesh)
stencil = get_stencil(mesh)
diag_inv = batched_inv_small(blocks[:, 0])

# RHS: a representative wave state residual
rng = np.random.RandomState(0)
elev = jnp.asarray(np.exp(-((np.asarray(mesh.coords_np[mesh.cells_np][...,0])-lx/2)/15e3)**2))
b = ps.pack(swe_state(jnp.zeros((mesh.nc,3,2)), elev))

def mv(x):
    return ring_apply(blocks, jnp.asarray(ring), x, stencil=stencil)
def bjac(r):
    return jnp.einsum("cij,cj->ci", diag_inv, r)

def fgmres_hist(M, label, maxit=60, rtol=1e-5):
    n = b.size
    bf = np.asarray(b, dtype=np.float64).reshape(-1)
    x = np.zeros(n)
    r = bf.copy()
    bnorm = np.linalg.norm(bf)
    V_ = []; Z = []; H = np.zeros((maxit+1, maxit))
    beta = np.linalg.norm(r)
    V_.append(r/beta)
    hist = [beta/bnorm]
    mvj = jax.jit(mv); Mj = M
    for j in range(maxit):
        z = np.asarray(Mj(jnp.asarray(V_[j].reshape(mesh.nc, 9)))).reshape(-1)
        w = np.asarray(mvj(jnp.asarray(z.reshape(mesh.nc, 9)))).reshape(-1)
        for i in range(j+1):
            H[i,j] = V_[i] @ w
            w = w - H[i,j]*V_[i]
        H[j+1,j] = np.linalg.norm(w)
        V_.append(w/max(H[j+1,j],1e-300))
        Z.append(z)
        e1 = np.zeros(j+2); e1[0] = beta
        y, res, _, _ = np.linalg.lstsq(H[:j+2,:j+1], e1, rcond=None)
        rn = np.linalg.norm(H[:j+2,:j+1]@y - e1)
        hist.append(rn/bnorm)
        if rn/bnorm < rtol:
            break
    print(label, "iters", len(hist)-1, ["%.1e"%h for h in hist[::max(1,len(hist)//12)]], flush=True)
    return len(hist)-1

fgmres_hist(lambda r: bjac(r), "bjac")
coarse = CoarseCorrection(blocks, np.asarray(ring), mesh)
def vcyc(r):
    z = bjac(r)
    r2 = r - mv(z)
    z = z + coarse(r2)
    r3 = r - mv(z)
    return z + bjac(r3)
fgmres_hist(jax.jit(vcyc), "coarse_vcycle")
for si, us in ((8,2),(4,1),(16,2)):
    fs = SchurFieldsplitPC(blocks, np.asarray(ring), mesh, s_iters=si, u_smooth=us)
    fgmres_hist(jax.jit(fs), f"fieldsplit_s{si}_u{us}")
