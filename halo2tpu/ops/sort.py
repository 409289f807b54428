"""Bitonic sort for multi-word keys on TPU (SURVEY §7 "sorting on TPU").

jax.lax.sort with wide multi-operand keys does not compile in workable time
on the axon TPU stack (>10 min for 17 operands x 64k rows), and its variadic
comparator is opaque to the fusion passes.  This bitonic network uses only
"clean" ops — reshape/flip partner exchange, elementwise lexicographic
compares, selects — so it compiles fast, runs on the VPU at memory speed,
and avoids the gather patterns that degrade the axon runtime's dispatch
pipelining (see ops/ntt.py docstring).

Keys are (m, W) uint32 word rows compared lexicographically, word 0 most
significant.  Callers append a unique tie-break word (e.g. the original row
index) to make the order total — the network is not stable on its own.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _lex_less(a, b):
    """(m, W) vs (m, W) -> (m,) bool lexicographic a < b, word 0 is MSW."""
    W = a.shape[1]
    lt = jnp.zeros(a.shape[0], jnp.bool_)
    eq = jnp.ones(a.shape[0], jnp.bool_)
    for i in range(W):
        lt = lt | (eq & (a[:, i] < b[:, i]))
        eq = eq & (a[:, i] == b[:, i])
    return lt


@partial(jax.jit, static_argnums=())
def bitonic_sort_rows(words):
    """Sort (m, W) uint32 rows ascending lexicographically; m a power of 2.
    Returns the sorted rows.  O(m log^2 m) compare-exchanges, unrolled into
    one XLA program (log2(m)*(log2(m)+1)/2 stages)."""
    m, W = words.shape
    logm = m.bit_length() - 1
    assert 1 << logm == m, "row count must be a power of two"
    idx = jnp.arange(m, dtype=jnp.uint32)
    x = words
    for k in range(1, logm + 1):
        # ascending block iff bit k of the index is 0
        asc = ((idx >> k) & 1) == 0
        for j in range(k - 1, -1, -1):
            stride = 1 << j
            # partner = i XOR stride, via reshape + flip (no gathers)
            p = x.reshape(m // (2 * stride), 2, stride, W)[:, ::-1]
            p = p.reshape(m, W)
            lower = (idx & stride) == 0
            p_less = _lex_less(p, x)
            # lower slot of an ascending pair keeps the min
            want_min = lower == asc
            take_p = want_min == p_less
            x = jnp.where(take_p[:, None], p, x)
    return x


@partial(jax.jit, static_argnums=())
def bitonic_sort_rows_batched(words):
    """Batched bitonic sort: (L, m, W) -> each L-slice sorted independently
    (ascending lexicographic, word 0 MSW).  HAND-batched — on the axon TPU
    stack, jax.vmap of bitonic_sort_rows lowers INCORRECTLY (observed:
    batch-of-1 correct, batch-of-12 consistently wrong even on identical
    tiled inputs), so the leading axis is threaded explicitly."""
    L, m, W = words.shape
    logm = m.bit_length() - 1
    assert 1 << logm == m, "row count must be a power of two"
    idx = jnp.arange(m, dtype=jnp.uint32)
    x = words

    def lex_less(a, b):
        lt = jnp.zeros((L, m), jnp.bool_)
        eq = jnp.ones((L, m), jnp.bool_)
        for i in range(W):
            lt = lt | (eq & (a[:, :, i] < b[:, :, i]))
            eq = eq & (a[:, :, i] == b[:, :, i])
        return lt

    for k in range(1, logm + 1):
        asc = ((idx >> k) & 1) == 0
        for j in range(k - 1, -1, -1):
            stride = 1 << j
            p = x.reshape(L, m // (2 * stride), 2, stride, W)[:, :, ::-1]
            p = p.reshape(L, m, W)
            lower = (idx & stride) == 0
            p_less = lex_less(p, x)
            want_min = (lower == asc)[None, :]
            take_p = want_min == p_less
            x = jnp.where(take_p[:, :, None], p, x)
    return x
