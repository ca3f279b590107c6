r"""Assembled block-sparse wave-system preconditioner.

The TPU-native analogue of the reference's assembled implicit-SWE
preconditioning: PETSc assembles the Jacobian and runs fieldsplit /
bjacobi+ilu KSP on it (the 2D SWE default ``solver_parameters``, ref
``options.py:44-48``), and ``AssembledSchurPC`` (ref
``assembledschur.py:5-89``) assembles the elevation Schur complement for
the pressure-projection path.  The matrix-free analogue
(:class:`~thetis_tpu.solvers.schur.WaveEquationSchurPC`) pays full
linearized residual evaluations per application *and* drops the Riemann
jump-penalty contributions to the diagonal blocks — which dominate at
large wave CFL (``head_star`` carries ``sqrt(H/g) jump(uv, n)``, ref
``shallowwater_eq.py:363``, an O(c dt / h) penalty).  Here the **complete
theta-weighted wave Jacobian**

    W = d/du [ M u - theta dt R_wave(u) ],   R_wave = EPG + HUDiv terms

is extracted once at setup as 1-ring cell blocks (9x9 per cell pair:
6 uv dofs + 3 eta dofs) and the preconditioner application solves
``W x = r`` with a fixed-iteration block-Jacobi-preconditioned GMRES —
every iteration is one index-gather plus a batched small-matrix
contraction, an order of magnitude fewer device kernels than a
matrix-free residual pass.

How the blocks are extracted (graph-color probing):

* For P1DG on triangles every wave term couples a cell only to itself
  and its 3 facet neighbours (the *1-ring*).
* Color the dual graph so any two cells within distance 2 differ; then
  for each (color k, packed dof j) the probe ``t[c'] = e_j if
  color[c'] == k else 0`` isolates exactly one ring member per cell:
  ``(W t)[c]`` is the j-column of the block ``W[c, n]`` for the unique
  ring member ``n`` of color ``k``.
* ~5-10 colors x 9 dofs probes, evaluated in ONE vmapped+jitted call at
  setup, assemble the exact operator blocks.

Built once at solver setup, linearized about the rest state; depth
perturbations (eta != 0) and the non-wave implicit terms (advection,
Coriolis, drag) are absorbed by the outer FGMRES, exactly as PETSc's
fieldsplit leaves the off-block physics to the outer KSP.
"""
import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["AssembledWavePC", "cell_ring", "distance2_coloring",
           "assemble_ring_blocks", "ring_apply", "get_coloring",
           "assemble_affine_operator", "ring_gmres", "PackedState",
           "batched_inv_small", "aggregate_cells", "CoarseCorrection",
           "ShiftStencil", "get_stencil"]

_WAVE = frozenset(["ExternalPressureGradientTerm", "HUDivTerm"])


def cell_ring(mesh):
    """Closed 1-ring table of the dual graph.

    Returns ``(ring, valid)``: ``ring`` (nc, 4) int array
    ``[self, n0, n1, n2]`` (neighbour slots point back at ``self`` across
    boundary facets) and ``valid`` (nc, 4) bool mask (False where the
    neighbour slot is a boundary mirror)."""
    cf = np.asarray(mesh.cell_facets_np)
    fc = np.asarray(mesh.facet_cells_np)
    nc = cf.shape[0]
    cells = np.arange(nc, dtype=cf.dtype)
    both = fc[cf]  # (nc, 3, 2)
    nbr = np.where(both[:, :, 0] == cells[:, None],
                   both[:, :, 1], both[:, :, 0])
    ring = np.concatenate([cells[:, None], nbr], axis=1).astype(np.int32)
    valid = np.ones((nc, 4), dtype=bool)
    valid[:, 1:] = nbr != cells[:, None]
    return ring, valid


def distance2_coloring(ring, valid):
    """Greedy proper coloring of the *square* of the dual graph: any two
    cells at distance <= 2 receive different colors, so every closed
    1-ring holds pairwise-distinct colors.  Max dual degree 3 =>
    typically 5-6, at most ~10 colors."""
    nc = ring.shape[0]
    ring2 = ring[ring].reshape(nc, -1)  # (nc, 16) 2-ring incl. duplicates
    colors = np.full(nc, -1, dtype=np.int64)
    for c in range(nc):
        used = colors[ring2[c]]
        used = used[used >= 0]
        u = set(used.tolist())
        col = 0
        while col in u:
            col += 1
        colors[c] = col
    return colors


def assemble_ring_blocks(linop, in_tail, out_tail, ring, valid, colors,
                         n_colors, nc, dtype=jnp.float32):
    """Assemble the 1-ring blocks of a linear operator with nearest-
    neighbour coupling.

    :arg linop: UNBATCHED linear map ``(nc,) + in_tail -> (nc,) + out_tail``
    :arg in_tail/out_tail: dof tail shapes, e.g. ``(9,)`` for the packed
        wave state
    :returns: blocks ``(nc, 4, out_dim, in_dim)`` with flattened tails,
        zeroed on invalid (boundary-mirror) slots

    The probe batch rides the TRAILING axis (``vmap(in_axes=-1)``): the
    equation machinery's gathers then see one wide row per cell/facet
    instead of P separate strided gathers — on TPU, gather cost is flat
    in row width (CLAUDE.md), so the whole probe sweep costs a few
    residual evaluations rather than P of them.
    """
    in_dim = int(np.prod(in_tail))
    out_dim = int(np.prod(out_tail))
    P = n_colors * in_dim
    eye = np.eye(in_dim, dtype=np.float32)
    onehot = (colors[:, None] == np.arange(n_colors)[None, :]).astype(
        np.float32
    )  # (nc, K)
    # probes[c, j, (k, i)] = onehot[c, k] * eye[j, i]
    probes = (onehot[:, None, :, None] * eye[None, :, None, :]).reshape(
        nc, in_dim, P)
    probes = jnp.asarray(
        probes.reshape((nc,) + in_tail + (P,)), dtype=dtype)
    Y = jax.vmap(linop, in_axes=-1, out_axes=-1)(probes)
    Y = Y.reshape(nc, out_dim, n_colors, in_dim)
    cidx = jnp.asarray(colors[ring])  # (nc, 4)
    # blocks[c, s, o, j] = Y[c, o, color[ring[c, s]], j]
    blocks = Y[jnp.arange(nc)[:, None], :, cidx, :]  # (nc, 4, out_dim, in_dim)
    return blocks * jnp.asarray(valid, dtype=blocks.dtype)[:, :, None, None]


def ring_apply(blocks, ring, x, stencil=None):
    """Apply assembled 1-ring blocks: ``x`` (nc, in_dim) -> (nc, out_dim).

    With a :class:`ShiftStencil` the neighbour gather is replaced by
    static slice-shifts (see the class docstring) — on TPU a mesh-sized
    row gather costs ~1.2 ms at 102k cells (lane-padding waste; measured,
    PERF.md) while the shifted form runs at the blocks' bandwidth."""
    if stencil is not None:
        return stencil.apply(blocks, x)
    xg = x[ring]  # (nc, 4, in_dim)
    return jnp.einsum("csoj,csj->co", blocks, xg)


class ShiftStencil:
    r"""Offset (DIA-format) decomposition of the 1-ring neighbour map.

    On the row-major generated meshes (``RectangleMesh`` & friends) each
    facet slot's neighbour index is ``c + d`` for a handful of constant
    offsets ``d`` (e.g. the tri1/tri2 halves each contribute one offset
    per slot), except along the boundary/seam.  The ring matvec then
    decomposes into masked *slice-shifts* — contiguous reads the TPU
    runs at HBM bandwidth — plus a compact gather/scatter correction for
    the nonconforming rows.  A mesh-sized row gather costs ~1.2 ms at
    102k cells on v5e (lane padding: a 9-wide row occupies a 128-lane
    tile) vs ~0.2 ms for the whole shifted matvec.

    Terms with < ``min_frac`` coverage go to the correction list; if the
    correction list ends up > ``max_corr_frac`` of all entries the
    stencil is not worth it and :func:`get_stencil` returns ``None``
    (gather fallback).
    """

    def __init__(self, ring, valid, min_frac=0.02, max_corr_frac=0.2):
        ring = np.asarray(ring)
        valid = np.asarray(valid)
        nc, ns = ring.shape
        idx = np.arange(nc)
        terms = []           # (slot, offset, mask (nc,) bool)
        covered = np.zeros((nc, ns), dtype=bool)
        covered[:, 0] = True  # slot 0 = self: no shift needed
        for s in range(1, ns):
            live = valid[:, s]
            d_all = ring[:, s] - idx
            vals, counts = np.unique(d_all[live], return_counts=True)
            for d, cnt in sorted(zip(vals.tolist(), counts.tolist()),
                                 key=lambda t: -t[1]):
                if cnt < min_frac * nc or d == 0:
                    continue
                m = live & (d_all == d)
                terms.append((s, int(d), m))
                covered[:, s] |= m
        # nonconforming live entries -> compact gather/scatter lists
        miss = (~covered) & valid
        rows, slots = np.nonzero(miss)
        self.n_corr = len(rows)
        if self.n_corr > max_corr_frac * nc * (ns - 1):
            raise ValueError("stencil coverage too poor")
        self.nc = nc
        # get_stencil() may first fire inside a jit trace (a stepper's
        # advance under lax.scan) and the stencil is cached on the mesh:
        # materialize the device tables eagerly or they leak as tracers
        # (CLAUDE.md convention)
        with jax.ensure_compile_time_eval():
            self.terms = [
                (s, d, jnp.asarray(m[:, None], dtype=jnp.float32))
                for (s, d, m) in terms
            ]
            if self.n_corr:
                self.corr_rows = jnp.asarray(rows.astype(np.int32))
                self.corr_slots = jnp.asarray(slots.astype(np.int32))
                self.corr_srcs = jnp.asarray(
                    ring[rows, slots].astype(np.int32))

    @staticmethod
    def _shift(x, d):
        """xs[c] = x[c + d] (zero outside range)."""
        if d > 0:
            return jnp.pad(x[d:], ((0, d), (0, 0)))
        if d < 0:
            return jnp.pad(x[:d], ((-d, 0), (0, 0)))
        return x

    def apply(self, blocks, x):
        y = jnp.einsum("cij,cj->ci", blocks[:, 0], x)
        for s, d, mask in self.terms:
            xs = self._shift(x, d) * mask.astype(x.dtype)
            y = y + jnp.einsum("cij,cj->ci", blocks[:, s], xs)
        if self.n_corr:
            contrib = jnp.einsum(
                "kij,kj->ki", blocks[self.corr_rows, self.corr_slots],
                x[self.corr_srcs])
            y = y.at[self.corr_rows].add(contrib)
        return y

    # -- component-major ("T") layout --------------------------------
    # TPU (8,128) tiling pads the two minormost axes, so a (nc, d, d)
    # block array wastes most of each 128-lane tile on d = 9.  Keeping
    # the CELL index minormost — blocks (ns, d, d, nc), vectors (d, nc)
    # — streams every (i, j) slab at full bandwidth (measured 0.51 ms vs
    # 0.71 ms per 102k-cell matvec, and bjac 0.08 vs 0.16 ms).

    @staticmethod
    def _shift_T(x, d):
        """xs[:, c] = x[:, c + d] (zero outside range); x (d, nc)."""
        if d > 0:
            return jnp.pad(x[:, d:], ((0, 0), (0, d)))
        if d < 0:
            return jnp.pad(x[:, :d], ((0, 0), (-d, 0)))
        return x

    def corr_blocks(self, blocks):
        """Compact (n_corr, do, di) correction blocks, extracted from the
        CELL-MAJOR blocks once per solve (cheap small gather)."""
        if not self.n_corr:
            return None
        return blocks[self.corr_rows, self.corr_slots]

    def corr_blocks_T(self, blocks_T):
        """Compact (n_corr, do, di) correction blocks from T-layout
        (ns, do, di, nc) blocks (cheap: n_corr is O(boundary))."""
        if not self.n_corr:
            return None
        return blocks_T[self.corr_slots, :, :, self.corr_rows]

    def apply_T(self, blocks_T, xT, corrB=None):
        """blocks_T (ns, do, di, nc), xT (di, nc) -> (do, nc)."""
        from ..kernels.ringmv import ring_mv_pallas

        # fused single-kernel path (TPU): all (slot, offset) terms in one
        # Pallas launch, each block byte read once
        y = (ring_mv_pallas(self, blocks_T, xT)
             if blocks_T.shape[1] == blocks_T.shape[2] else None)
        if y is None:
            y = jnp.einsum("ijc,jc->ic", blocks_T[0], xT)
            for s, d, mask in self.terms:
                xs = self._shift_T(xT, d) * mask[:, 0].astype(
                    xT.dtype)[None, :]
                y = y + jnp.einsum("ijc,jc->ic", blocks_T[s], xs)
        if self.n_corr:
            xsrc = xT[:, self.corr_srcs]                 # (di, k)
            contrib = jnp.einsum("kij,jk->ik", corrB, xsrc)
            y = y.at[:, self.corr_rows].add(contrib)
        return y


def get_stencil(mesh):
    """Cached :class:`ShiftStencil` for a mesh (``None`` when the cell
    ordering doesn't expose enough constant offsets, e.g. gmsh input)."""
    cached = getattr(mesh, "_shift_stencil", None)
    if cached is not None:
        return cached if cached is not False else None
    ring, valid = cell_ring(mesh)
    try:
        st = ShiftStencil(ring, valid)
    except ValueError:
        mesh._shift_stencil = False
        return None
    mesh._shift_stencil = st
    return st


def batched_inv_small_T(AT):
    """T-layout batched small-matrix inverse: (d, d, n) -> (d, d, n) by
    pivotless Gauss-Jordan on batch-trailing (n,) slabs (see
    :func:`batched_inv_small` for why).  Pivotless is safe here: the
    blocks are theta-weighted mass + jump-penalty matrices whose
    diagonal stays positive and dominant."""
    d, _, n = AT.shape
    one = jnp.ones((n,), dtype=AT.dtype)
    zero = jnp.zeros((n,), dtype=AT.dtype)
    M = [[AT[i, j] for j in range(d)]
         + [one if j == i else zero for j in range(d)]
         for i in range(d)]
    for k in range(d):
        inv_piv = 1.0 / M[k][k]
        piv = [M[k][j] * inv_piv for j in range(2 * d)]
        for i in range(d):
            if i == k:
                continue
            f = M[i][k]
            M[i] = [M[i][j] - f * piv[j] for j in range(2 * d)]
        M[k] = piv
    return jnp.stack([jnp.stack(M[i][d:]) for i in range(d)])  # (d, d, n)


def batched_inv_small(A):
    """Batched small-matrix inverse by pivotless Gauss-Jordan.

    XLA's batched ``linalg.inv`` lowers to a LAPACK-style loop that is
    very slow on TPU (a batched 6x6 inverse measured 65 ms on v5e,
    CLAUDE.md).  The elimination is fully unrolled on batch-trailing
    (n,) slabs: materializing (n, d, 2d) intermediates puts the two tiny
    dims on the padded (8,128) tile axes (measured 12.9 ms at d=9,
    n=102k vs ~1 ms for the slab form)."""
    out = batched_inv_small_T(jnp.transpose(A, (1, 2, 0)))
    return jnp.transpose(out, (2, 0, 1))


def aggregate_cells(mesh, target_size=96):
    """Geometric aggregation of cells into contiguous patches (the
    coarse space of the two-level preconditioner): bin cell centroids
    into a rectangular grid sized for ~``target_size`` cells per
    aggregate.  Returns (agg_ids (nc,), n_agg)."""
    mids = np.asarray(mesh.coords_np)[np.asarray(mesh.cells_np)].mean(axis=1)
    nc = mids.shape[0]
    n_agg_target = max(1, nc // int(target_size))
    lo, hi = mids.min(0), mids.max(0)
    ext = np.maximum(hi - lo, 1e-12)
    aspect = ext[0] / ext[1]
    nbx = max(1, int(round(np.sqrt(n_agg_target * aspect))))
    nby = max(1, int(round(n_agg_target / nbx)))
    ix = np.minimum((mids[:, 0] - lo[0]) / ext[0] * nbx, nbx - 1e-9).astype(int)
    iy = np.minimum((mids[:, 1] - lo[1]) / ext[1] * nby, nby - 1e-9).astype(int)
    raw = ix * nby + iy
    # compress empty bins
    uniq, agg = np.unique(raw, return_inverse=True)
    return agg.astype(np.int32), len(uniq)


class CoarseCorrection:
    """Galerkin coarse correction for an assembled 1-ring operator.

    The coarse space is piecewise-constant per (aggregate, packed dof
    component): P injects coarse dofs to cells, A_c = P^T A P is formed
    from the 1-ring blocks on the host ONCE at setup and inverted
    densely; each application is a segment-sum restriction, one dense
    (MXU) matvec and a gather prolongation — this is the grid-scalable
    component the one-level block-Jacobi smoother lacks (iterations of
    smoothed GMRES grow ~linearly with the implicit wave CFL without it).
    """

    def __init__(self, blocks, ring, mesh, target_size=None):
        nc_total, _, d0, _ = blocks.shape
        if target_size is None:
            # cap the coarse dimension at ~4096 (dense inverse = 67 MB
            # f32 graph constant — still well under the remote compiler's
            # upload limit) while the aggregate diameter grows with the
            # mesh; a finer coarse space cuts Krylov iterations at large
            # mesh sizes where block-Jacobi alone needs O(diameter)
            target_size = max(48, int(np.ceil(nc_total * d0 / 4096.0)))
        agg, n_agg = aggregate_cells(mesh, target_size)
        nc, _, d, _ = blocks.shape
        self.agg = jnp.asarray(agg)
        self.n_agg = n_agg
        self.d = d
        b_np = np.asarray(blocks, dtype=np.float64)
        ring_np = np.asarray(ring)
        A_c = np.zeros((n_agg, d, n_agg, d))
        # A_c[I, :, J, :] += blocks[c, s] for agg[c] = I, agg[ring[c,s]] = J
        np.add.at(A_c, (agg[:, None], slice(None), agg[ring_np]), b_np)
        A_c = A_c.reshape(n_agg * d, n_agg * d)
        self.Ac_inv = jnp.asarray(np.linalg.inv(A_c), dtype=blocks.dtype)

    def __call__(self, r):
        """r (nc, d) -> coarse-corrected increment (nc, d)."""
        r_c = jax.ops.segment_sum(r, self.agg, num_segments=self.n_agg)
        z_c = (self.Ac_inv @ r_c.reshape(-1)).reshape(self.n_agg, self.d)
        return z_c[self.agg]

    def transpose(self):
        """Coarse correction for the TRANSPOSED operator (used by the
        implicit-differentiation adjoint solve): (P^T A P)^T = P^T A^T P,
        so the transposed coarse inverse is just ``Ac_inv.T``."""
        cached = getattr(self, "_transposed", None)
        if cached is None:
            cached = _TransposedCoarse(self)
            self._transposed = cached
        return cached


class _TransposedCoarse:
    def __init__(self, coarse):
        self.agg = coarse.agg
        self.n_agg = coarse.n_agg
        self.d = coarse.d
        # transpose() may first fire inside an adjoint trace and the
        # result is cached on the forward object: materialize eagerly
        # (CLAUDE.md tracer-leak convention)
        with jax.ensure_compile_time_eval():
            self.Ac_inv_T = coarse.Ac_inv.T

    def __call__(self, r):
        r_c = jax.ops.segment_sum(r, self.agg, num_segments=self.n_agg)
        z_c = (self.Ac_inv_T @ r_c.reshape(-1)).reshape(self.n_agg, self.d)
        return z_c[self.agg]


def get_coloring(mesh):
    """Cached (ring, valid, colors) tables for a mesh."""
    cached = getattr(mesh, "_ring_coloring", None)
    if cached is not None:
        return cached
    ring, valid = cell_ring(mesh)
    colors = distance2_coloring(ring, valid)
    mesh._ring_coloring = (ring, valid, colors)
    return mesh._ring_coloring


def assemble_affine_operator(F, x0, mesh, dtype=None):
    """Assemble an affine 1-ring-local operator ``F(x) = A x - b`` on
    packed cell dofs.

    :arg F: function (nc, d) -> (nc, d), affine in its argument with
        nearest-neighbour (facet) coupling only
    :arg x0: (nc, d) point to linearize about (exact for affine F)
    :returns: ``(blocks, f0)`` — ``blocks`` (nc, 4, d, d) such that
        ``A x = ring_apply(blocks, ring, x)``, and ``f0 = F(0) = -b``.

    Everything is jit-traceable: called per step inside ``lax.scan``,
    the probes are one vmapped tangent evaluation (shared gathers over a
    wide probe axis — TPU gather cost is flat in row width)."""
    ring, valid, colors = get_coloring(mesh)
    nc, d = x0.shape
    n_colors = int(colors.max()) + 1
    f0_at_x0, A = jax.linearize(F, x0)
    f0 = f0_at_x0 - A(x0)  # affine: F(0) = F(x0) - A x0
    blocks = assemble_ring_blocks(
        A, (d,), (d,), ring, valid, colors, n_colors, nc,
        dtype=dtype or x0.dtype,
    )
    return blocks, f0


def _ring_solve_impl(blocks, ring, b, diag_inv, rtol, restart, max_cycles,
                     coarse, rtol_scale=None, stencil=None, layout="cell"):
    """Pure GMRES core on an assembled ring operator: ``b`` (nc, d) ->
    ``(x, rnorm, bnorm)`` with x (nc, d).  ``rtol_scale`` optionally
    replaces ``||b||`` as the convergence anchor (warm starts keep the
    target anchored to the original RHS).  With ``layout="T"`` the
    blocks/diag_inv arrive component-major — (ns, d, d, nc)/(d, d, nc) —
    and no relayout is paid at all (requires a stencil)."""
    from .newton import _fgmres_flat

    if layout == "T":
        _, d, _, nc = blocks.shape
    else:
        nc, _, d, _ = blocks.shape

    if stencil is not None:
        # component-major fast path: cell index rides the 128-lane axis
        # everywhere inside the Krylov loop (see ShiftStencil.apply_T);
        # T-layout callers skip the relayout entirely (the cell-major
        # (nc, ns, d, d) form is (8,128)-padded ~25x at d=9 — PERF.md)
        if layout == "T":
            blocks_T = blocks
            diag_T = diag_inv
            corrB = stencil.corr_blocks_T(blocks_T)
        else:
            blocks_T = jnp.transpose(blocks, (1, 2, 3, 0))  # (ns, d, d, nc)
            diag_T = jnp.transpose(diag_inv, (1, 2, 0))     # (d, d, nc)
            corrB = stencil.corr_blocks(blocks)

        def mv(v):
            return stencil.apply_T(blocks_T, v.reshape(d, nc),
                                   corrB).reshape(-1)

        def bjac(r):
            return jnp.einsum("ijc,jc->ic", diag_T, r)

        def to_cell(rT):
            return rT.T

        def from_cell(r):
            return r.T

        def unflat(v):
            return v.reshape(d, nc)

        def reflat(x):
            return x.reshape(d, nc).T  # final result back to (nc, d)

        bf = b.T.reshape(-1)
    else:
        def mv(v):
            return ring_apply(blocks, ring, v.reshape(nc, d),
                              stencil=None).reshape(-1)

        def bjac(r):
            return jnp.einsum("cij,cj->ci", diag_inv, r)

        def to_cell(r):
            return r

        def from_cell(r):
            return r

        def unflat(v):
            return v.reshape(nc, d)

        def reflat(x):
            return x.reshape(nc, d)

        bf = b.reshape(-1)

    if coarse is None:
        def M(v):
            return bjac(unflat(v)).reshape(-1)
    elif getattr(coarse, "is_full_pc", False):
        # a complete preconditioner (e.g. the Schur fieldsplit V-cycle,
        # ``solvers/fieldsplit.py``): applied as-is, no extra smoothing
        def M(v):
            return from_cell(coarse(to_cell(unflat(v)))).reshape(-1)
    else:
        def M(v):
            # multiplicative two-level V-cycle: smooth, coarse-correct,
            # smooth — iteration counts stay O(10) at any wave CFL
            r = unflat(v)
            z = bjac(r)
            r2 = r - unflat(mv(z.reshape(-1)))
            z = z + from_cell(coarse(to_cell(r2)))
            r3 = r - unflat(mv(z.reshape(-1)))
            z = z + bjac(r3)
            return z.reshape(-1)

    rtol_eff = rtol
    if rtol_scale is not None:
        rtol_eff = rtol * rtol_scale / jnp.maximum(
            jnp.linalg.norm(bf), jnp.finfo(bf.dtype).tiny)
    x, rnorm, bnorm = _fgmres_flat(mv, bf, M, rtol_eff, restart, max_cycles)
    return reflat(x), rnorm, bnorm


def _ring_transpose(blocks, ring):
    """Blocks of A^T for the same ring table: ``A^T[c, s] =
    A[ring[c, s], rev(c, s)]^T`` where ``rev(c, s)`` is the slot of
    ``c`` inside its neighbour's ring (facet adjacency is symmetric).
    Boundary-mirror slots are masked to zero exactly as in the forward
    blocks."""
    nc = ring.shape[0]
    cells = jnp.arange(nc, dtype=ring.dtype)
    rr = ring[ring]                              # (nc, 4, 4)
    rev = jnp.argmax(rr == cells[:, None, None], axis=-1)  # (nc, 4)
    bT = blocks[ring, rev].transpose(0, 1, 3, 2)  # (nc, 4, d, d)
    valid = jnp.concatenate(
        [jnp.ones((nc, 1), bool), ring[:, 1:] != cells[:, None]], axis=1)
    return bT * valid[:, :, None, None].astype(bT.dtype)


from functools import partial  # noqa: E402


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _ring_solve(blocks, ring, b, diag_inv, rtol_scale, rtol, restart,
                max_cycles, coarse, stencil, layout):
    """Differentiable assembled-ring solve ``x = A^{-1} b``.

    The FGMRES core uses ``lax.while_loop`` (not reverse-differentiable);
    reverse-mode is provided by the implicit function theorem instead:
    ``A^T lam = xbar`` is solved with the SAME assembled machinery on the
    transposed blocks, then ``b_bar = lam`` and
    ``blocks_bar[c, s] = -lam[c] (x[ring[c, s]])^T`` (the standard
    linear-solve adjoint, cf. the ``custom_vjp`` Newton solve in
    ``solvers/newton.py``).  Returns ``(x, rnorm, bnorm)``; the norms
    carry no gradient."""
    return _ring_solve_impl(blocks, ring, b, diag_inv, rtol, restart,
                            max_cycles, coarse, rtol_scale=rtol_scale,
                            stencil=stencil, layout=layout)


def _ring_solve_fwd(blocks, ring, b, diag_inv, rtol_scale, rtol, restart,
                    max_cycles, coarse, stencil, layout):
    out = _ring_solve_impl(blocks, ring, b, diag_inv, rtol, restart,
                           max_cycles, coarse, rtol_scale=rtol_scale,
                           stencil=stencil, layout=layout)
    return out, (blocks, ring, diag_inv, rtol_scale, out[0])


def _ring_solve_bwd(rtol, restart, max_cycles, coarse, stencil, layout,
                    res, cotangents):
    blocks, ring, diag_inv, rtol_scale, x = res
    xbar = cotangents[0]  # rnorm/bnorm cotangents are dead ends
    # adjoint solves are rare (one per outer VJP) — the T layout pays the
    # cell-major round trip here rather than complicating _ring_transpose
    blocks_c = (jnp.transpose(blocks, (3, 0, 1, 2)) if layout == "T"
                else blocks)
    diag_c = (jnp.transpose(diag_inv, (2, 0, 1)) if layout == "T"
              else diag_inv)
    bT = _ring_transpose(blocks_c, ring)
    coarseT = coarse.transpose() if coarse is not None else None
    # the transposed operator couples through the SAME (symmetric) facet
    # adjacency, so the forward stencil applies unchanged to bT
    lam, _, _ = _ring_solve_impl(
        bT, ring, xbar, diag_c.transpose(0, 2, 1), rtol, restart,
        max_cycles, coarseT, stencil=stencil)
    blocks_bar = -jnp.einsum("co,csj->csoj", lam, x[ring])
    if layout == "T":
        blocks_bar = jnp.transpose(blocks_bar, (1, 2, 3, 0))
    ring_bar = np.zeros(ring.shape, dtype=jax.dtypes.float0)
    scale_bar = None if rtol_scale is None else jnp.zeros_like(rtol_scale)
    return blocks_bar, ring_bar, lam, jnp.zeros_like(diag_inv), scale_bar


_ring_solve.defvjp(_ring_solve_fwd, _ring_solve_bwd)


def ring_apply_T(blocks_T, x, stencil):
    """T-layout ring matvec on a cell-major vector: ``x`` (nc, d) ->
    (nc, d) through :meth:`ShiftStencil.apply_T` (vector transposes are
    cheap; the blocks never leave the component-major layout)."""
    corrB = stencil.corr_blocks_T(blocks_T)
    return stencil.apply_T(blocks_T, x.T, corrB).T


def ring_gmres(blocks, ring, b, diag_inv=None, rtol=1e-5, restart=24,
               max_cycles=4, coarse=None, x0=None, stencil=None,
               layout="cell", r0=None):
    """Solve ``A x = b`` for an assembled 1-ring operator with restarted
    GMRES, right-preconditioned by block-Jacobi (inverted diagonal
    blocks), optionally wrapped in a two-level V-cycle with a
    :class:`CoarseCorrection`.  Every iteration is gathers + batched
    contractions — the KSP loop never touches the residual machinery
    (cf. PETSc KSP on the assembled Jacobian, the reference's 2D default
    ``options.py:44-48``).

    ``layout="T"`` takes component-major blocks (ns, d, d, nc) — the
    TPU-native form; requires a stencil.  Vectors stay (nc, d).

    Reverse-differentiable via :func:`_ring_solve`'s implicit-function
    adjoint.  With a warm start ``x0``, the residual system
    ``A dx = b - A x0`` is solved (with the convergence target still
    anchored to ``||b||``) and ``x = x0 + dx``; the adjoint stays exact
    because the direct ``x0`` path and the ``-A^{-1} A x0`` path cancel
    analytically.  A caller that knows ``b - A x0`` in closed form may
    pass it as ``r0`` to skip the matvec (gradients then flow through
    ``r0``'s own construction, which is algebraically the same
    function)."""
    if diag_inv is None:
        diag_inv = (batched_inv_small_T(blocks[0]) if layout == "T"
                    else batched_inv_small(blocks[:, 0]))

    if x0 is not None:
        if r0 is None:
            r0 = b - (ring_apply_T(blocks, x0, stencil) if layout == "T"
                      else ring_apply(blocks, ring, x0, stencil=stencil))
        bscale = jnp.linalg.norm(b.reshape(-1))
        dx, rnorm, _ = _ring_solve(blocks, ring, r0, diag_inv, bscale,
                                   float(rtol), restart, max_cycles, coarse,
                                   stencil, layout)
        x = x0 + dx
        # the residual-system rnorm IS the true residual ||b - A x||
        bnorm = bscale
    else:
        x, rnorm, bnorm = _ring_solve(blocks, ring, b, diag_inv, None,
                                      float(rtol), restart, max_cycles,
                                      coarse, stencil, layout)
    diverged = rnorm > 1e4 * jnp.maximum(bnorm, jnp.finfo(rnorm.dtype).tiny)
    x = jnp.where(diverged, jnp.nan, x)
    return x


class PackedState:
    """Pack/unpack a pytree of (nc, nd[, k]) cell-dof leaves into a
    single (nc, d) matrix (deterministic tree order)."""

    def __init__(self, template):
        leaves, self.treedef = jax.tree_util.tree_flatten(template)
        self.nc = leaves[0].shape[0]
        self.shapes = [leaf.shape[1:] for leaf in leaves]
        self.sizes = [int(np.prod(s)) for s in self.shapes]
        self.d = sum(self.sizes)

    def pack(self, tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.concatenate(
            [leaf.reshape(self.nc, -1) for leaf in leaves], axis=-1
        )

    def unpack(self, x):
        out = []
        off = 0
        for s, size in zip(self.shapes, self.sizes):
            out.append(x[:, off:off + size].reshape((self.nc,) + s))
            off += size
        return jax.tree_util.tree_unflatten(self.treedef, out)


class AssembledWavePC:
    r"""Approximate inverse of the theta-weighted implicit SWE system,
    applied through assembled 1-ring blocks of the wave Jacobian.

    ``__call__`` runs a fixed number of block-Jacobi right-preconditioned
    GMRES iterations on ``W x = r`` (static control flow for jit/scan);
    per iteration cost is one ring gather + one (nc, 4, 9, 9) batched
    contraction.

    Construction runs the color probes in one jitted vmap; build once per
    solver setup (NOT per step — the blocks are concrete device arrays).

    :arg eq: ShallowWaterEquations-like object (must expose the
        EPG/HUDiv term names, ``mass_term`` and the P1DG assembler)
    :arg lin_state: solution pytree to linearize about (typically the
        rest state)
    :arg inner_iterations: static GMRES iteration count for the W solve
    """

    def __init__(self, eq, dt, theta, lin_state, fields=None,
                 bnd_values=None, inner_iterations=20):
        self.eq = eq
        self.coeff = float(theta) * float(dt)
        self.n_inner = int(inner_iterations)
        mesh = eq.mesh
        asm = eq.asm
        if asm.ndofs != 3:
            raise NotImplementedError(
                "assembled wave PC supports P1DG (3-dof) cells; use the "
                "matrix-free WaveEquationSchurPC for other elements"
            )
        fields = fields or {}
        if bnd_values is None:
            # zero-valued boundary data with the equation's static BC-key
            # structure (values only shift the affine part of the
            # linearization)
            bnd_values = {
                m: {k: 0.0 for k in keys}
                for m, keys in getattr(eq, "bnd_keys", {}).items()
            }

        ring_np, valid_np = cell_ring(mesh)
        self.stencil = get_stencil(mesh)
        # cache the coloring on the mesh (shared by every PC on that mesh)
        colors = getattr(mesh, "_d2_coloring", None)
        if colors is None:
            colors = distance2_coloring(ring_np, valid_np)
            mesh._d2_coloring = colors
        n_colors = int(colors.max()) + 1
        nc = ring_np.shape[0]
        self.nc = nc
        self.ring = jnp.asarray(ring_np)
        dtype = lin_state["elev"].dtype
        c = self.coeff

        def pack(st):
            return jnp.concatenate(
                [st["uv"].reshape(nc, 6), st["elev"]], axis=-1
            )

        def unpack(x):
            return {"uv": x[:, :6].reshape(nc, 3, 2), "elev": x[:, 6:]}

        self._pack, self._unpack = pack, unpack

        def wave_system(x):
            """F_wave(u) = M u - theta dt R_wave(u); solution_old fixed at
            the linearization state (the semi-implicit 'ksponly'
            linearization, ref ``timeintegrator.py:186-211``)."""
            st = unpack(x)
            r = eq.residual(_WAVE, st, lin_state, fields, fields,
                            bnd_values)
            m = eq.mass_term(st)
            return pack({"uv": m["uv"] - c * r["uv"],
                         "elev": m["elev"] - c * r["elev"]})

        @jax.jit
        def build_blocks():
            _, W = jax.linearize(wave_system, pack(lin_state))
            return assemble_ring_blocks(
                W, (9,), (9,), ring_np, valid_np, colors,
                n_colors, nc, dtype=dtype,
            )

        Wb = build_blocks()
        self.Wb = Wb
        # block-Jacobi: inverted diagonal (slot-0) blocks
        self.Wdiag_inv = jnp.asarray(
            np.linalg.inv(np.asarray(Wb[:, 0], dtype=np.float64))
        ).astype(dtype)

    # -- operator applications ------------------------------------------
    def _W(self, x):
        return ring_apply(self.Wb, self.ring, x, stencil=self.stencil)

    def _bjac(self, r):
        return jnp.einsum("cij,cj->ci", self.Wdiag_inv, r)

    def _solve(self, b):
        """Fixed-iteration non-restarted GMRES on ``W x = b``, right-
        preconditioned with block-Jacobi (cf. PETSc gmres+bjacobi, the
        reference's assembled-Jacobian default)."""
        nc = self.nc
        m = self.n_inner
        bf = b.reshape(-1)
        n = bf.shape[0]
        dtype = bf.dtype
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype=dtype)
        beta = jnp.linalg.norm(bf)
        V0 = jnp.zeros((m + 1, n), dtype=dtype)
        V0 = V0.at[0].set(bf / jnp.maximum(beta, tiny))
        Z0 = jnp.zeros((m, n), dtype=dtype)
        H0 = jnp.zeros((m + 1, m), dtype=dtype)
        brk = jnp.asarray(jnp.finfo(dtype).eps, dtype=dtype)

        def arnoldi(j, VZH):
            V, Z, H = VZH
            z = self._bjac(V[j].reshape(nc, 9)).reshape(-1)
            w = self._W(z.reshape(nc, 9)).reshape(-1)
            h = V @ w
            w = w - h @ V
            hj1 = jnp.linalg.norm(w)
            v_next = jnp.where(
                hj1 > brk * jnp.maximum(beta, tiny),
                w / jnp.maximum(hj1, tiny),
                jnp.zeros_like(w),
            )
            H = H.at[:, j].set(h).at[j + 1, j].set(hj1)
            V = V.at[j + 1].set(v_next)
            Z = Z.at[j].set(z)
            return V, Z, H

        V, Z, H = jax.lax.fori_loop(0, m, arnoldi, (V0, Z0, H0))
        e1 = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
        y = jnp.linalg.lstsq(H, e1)[0]
        return (y @ Z).reshape(b.shape)

    # -- the preconditioner ----------------------------------------------
    def __call__(self, r):
        x = self._solve(self._pack(r))
        return self._unpack(x)
