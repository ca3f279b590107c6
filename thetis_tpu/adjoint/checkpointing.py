r"""Adjoint memory checkpointing for long time loops.

The reference bounds adjoint memory by pyadjoint tape checkpointing
(``solver2d.py:987-989`` enables disk/memory tape checkpoints through
``timeintegrator.py:67``): the forward stores snapshots, the reverse
sweep replays intervals between them.  The functional-AD analogue is
rematerialisation: :func:`checkpointed_scan` runs the time loop as an
outer ``lax.scan`` over chunks with each chunk body wrapped in
``jax.checkpoint``, so reverse-mode stores only the chunk-boundary
states (``n/chunk`` of them) plus one chunk's worth of per-step
activations while it replays that chunk — the classic
:math:`O(\sqrt{N})` treeverse-1 schedule at ``chunk ~ sqrt(N)``.

Cost: one extra forward evaluation of each chunk during the backward
sweep (total forward work x2), against activation memory dropping from
``O(N)`` to ``O(sqrt(N))`` — the trade that makes tohoku/headland-scale
inversions (thousands of steps) fit on one chip (measured numbers in
PERF.md "Adjoint checkpointing").
"""
import math

import jax

__all__ = ["checkpointed_scan"]


def checkpointed_scan(body, carry, n, chunk=None):
    """Run ``carry = body(carry)`` ``n`` times with sqrt-N remat.

    Drop-in for ``lax.scan(lambda c, _: (body(c), None), carry, None,
    length=n)[0]`` with bounded reverse-mode memory.

    :arg body: ``carry -> carry`` (one time step; pure)
    :arg carry: initial carry pytree
    :arg n: static number of steps
    :kwarg chunk: steps per rematerialised chunk (default
        ``ceil(sqrt(n))``)
    :returns: final carry
    """
    n = int(n)
    if n <= 0:
        return carry
    if chunk is None:
        chunk = max(1, int(math.ceil(math.sqrt(float(n)))))
    chunk = max(1, min(int(chunk), n))
    n_outer, rem = divmod(n, chunk)

    def run_chunk(m):
        @jax.checkpoint
        def chunk_fn(c):
            return jax.lax.scan(
                lambda cc, _: (body(cc), None), c, None, length=m)[0]

        return chunk_fn

    if n_outer > 0:
        chunk_fn = run_chunk(chunk)
        carry = jax.lax.scan(
            lambda c, _: (chunk_fn(c), None), carry, None, length=n_outer
        )[0]
    if rem:
        carry = run_chunk(rem)(carry)
    return carry


def _tree_bytes(tree):
    """Total payload bytes of a pytree of arrays (diagnostics)."""
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype")
    )
