r"""shard_map distributed DG operators with ICI halo exchange.

The execution model mirrors the reference's MPI domain decomposition
(SURVEY.md sections 2.10, 5.8): each device owns a stripe of cells; before
each RHS evaluation the ghost-cell dofs are refreshed with one
``ppermute`` pair to the ring neighbours (PyOP2 halo exchange analogue);
facet and cell integrals then proceed exactly as in the serial
scatter-free formulation on device-local tables.  Scalar reductions
(norms, CFL, conservation sums) use ``psum``.

``sharded_tracer_rhs`` is the first production operator on this path (2D
tracer advection); it is validated bit-for-bit against the serial operator
in ``tests/test_parallel.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["halo_exchange", "sharded_tracer_advection", "make_device_mesh"]


def make_device_mesh(n_devices, axis="cells"):
    devs = np.array(jax.devices()[:n_devices])
    return Mesh(devs, axis_names=(axis,))


def halo_exchange(u_loc, send_left, send_right, halo, axis="cells"):
    """Refresh ghost cells: returns the extended array
    [owned | ghost_from_left | ghost_from_right].

    ``send_left/right``: (halo,) local indices of owned cells to ship to
    each ring neighbour (ppermute over ICI)."""
    n_dev = jax.lax.axis_size(axis)
    sl = u_loc[send_left]
    sr = u_loc[send_right]
    right_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    ghost_left = jax.lax.ppermute(sr, axis, right_perm)   # from left nbr
    ghost_right = jax.lax.ppermute(sl, axis, left_perm)   # from right nbr
    return jnp.concatenate([u_loc, ghost_left, ghost_right], axis=0)


def _tracer_advection_local(c_ext, uv_ext, t, phi, phi_f, qw, qwf, qt_dummy,
                            dphi):
    """Device-local upwind advection residual on extended arrays.

    ``t``: per-device table pytree (facet_cells indexed into the extended
    array; see StripePartition)."""
    # cell term: R_grad += c * uv tested against grad(test)
    c_q = jnp.einsum("qd,cd->cq", phi, c_ext)
    uv_q = jnp.einsum("qd,cdk->cqk", phi, uv_ext)
    # physical divergence: du_k/dx_i = dphi Jinv
    guv = jnp.einsum("qdj,cji,cdk->cqki", dphi, t["Jinv_ext"], uv_ext)
    div_uv = guv[..., 0, 0] + guv[..., 1, 1]
    wdetJ = qw[None, :] * t["detJ_ext"][:, None]

    acc_cell = c_q * div_uv
    acc_grad = c_q[..., None] * uv_q

    # facet terms
    fc = t["facet_cells"]
    tabs0 = phi_f[t["facet_variant"][:, 0]]
    tabs1 = phi_f[t["facet_variant"][:, 1]]
    c0 = jnp.einsum("fqd,fd->fq", tabs0, c_ext[fc[:, 0]])
    c1 = jnp.einsum("fqd,fd->fq", tabs1, c_ext[fc[:, 1]])
    u0 = jnp.einsum("fqd,fdk->fqk", tabs0, uv_ext[fc[:, 0]])
    u1 = jnp.einsum("fqd,fdk->fqk", tabs1, uv_ext[fc[:, 1]])
    n = t["facet_normal"][:, None, :]
    un0 = (u0 * n).sum(-1)
    un1 = (u1 * n).sum(-1)
    un_av = 0.5 * (un0 + un1)
    s = 0.5 * (jnp.sign(un_av) + 1.0)
    c_up = c0 * s + c1 * (1 - s)
    mi = t["facet_mask_int"][:, None]
    mb = t["facet_mask_bnd"][:, None]
    f0 = (-c_up * un0) * mi + (-c0 * un0) * mb
    f1 = (c_up * un1) * mi
    # LF stabilisation
    gamma = 0.5 * jnp.abs(un_av)
    f0 = f0 + gamma * (c1 - c0) * mi
    f1 = f1 - gamma * (c1 - c0) * mi
    wlen = qwf[None, :] * t["facet_len"][:, None]
    contrib0 = jnp.einsum("fq,fqd->fd", f0 * wlen, tabs0)
    contrib1 = jnp.einsum("fq,fqd->fd", f1 * wlen, tabs1)
    contrib = jnp.stack([contrib0, contrib1], axis=1)
    g2 = contrib[t["cell_facets"], t["cell_sides"]].sum(axis=1)

    n_loc = t["cell_facets"].shape[0]
    accw_c = (acc_cell * wdetJ)[:n_loc]
    r = jnp.einsum("cq,qd->cd", accw_c, phi)
    accw_g = (acc_grad * wdetJ[..., None])[:n_loc]
    r = r + jnp.einsum(
        "cqi,qdj,cji->cd", accw_g, dphi, t["Jinv_ext"][:n_loc]
    )
    return r + g2


def sharded_tracer_advection(partition, space, device_mesh):
    """Build a jitted distributed RHS ``f(c_sharded, uv_sharded) ->
    r_sharded`` for 2D upwind tracer advection over the partition."""
    from jax.sharding import NamedSharding

    tabs = space._tab_np
    phi = jnp.asarray(tabs["phi"])
    dphi = jnp.asarray(tabs["dphi"])
    phi_f = jnp.asarray(tabs["phi_f"])
    qw = jnp.asarray(tabs["qw"])
    qwf = jnp.asarray(tabs["qwf"])
    halo = partition.halo
    T = {k: jnp.asarray(v) for k, v in partition.tables.items()}

    def local_fn(c_loc, uv_loc, t):
        # blocks arrive with a leading size-1 device axis; strip it
        c_loc = c_loc[0]
        uv_loc = uv_loc[0]
        t = {k: v[0] for k, v in t.items()}
        sl, sr = t["send_left"], t["send_right"]
        c_ext = halo_exchange(c_loc, sl, sr, halo)
        uv_ext = halo_exchange(uv_loc, sl, sr, halo)
        # extended geometry: ghosts need detJ/Jinv too
        tt = dict(t)
        tt["detJ_ext"] = halo_exchange(t["detJ"], sl, sr, halo)
        tt["Jinv_ext"] = halo_exchange(t["Jinv"], sl, sr, halo)
        r = _tracer_advection_local(
            c_ext, uv_ext, tt, phi, phi_f, qw, qwf, None, dphi
        )
        return r[None]

    in_spec = (P("cells"), P("cells"), {k: P("cells") for k in T})
    fn = jax.jit(
        jax.shard_map(
            local_fn, mesh=device_mesh, in_specs=in_spec,
            out_specs=P("cells"),
        )
    )

    sh = NamedSharding(device_mesh, P("cells"))
    T_dev = {k: jax.device_put(v, sh) for k, v in T.items()}

    def rhs(c_sharded, uv_sharded):
        return fn(c_sharded, uv_sharded, T_dev)

    return rhs
