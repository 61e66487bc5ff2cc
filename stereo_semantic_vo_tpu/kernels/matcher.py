"""Fused Pallas matcher: Hamming distances + best/second-best in one kernel.

The two-stage matching in the tracker needs, per query descriptor, only the
best and second-best Hamming distances over the train set (gates 15 / 30 /
ratio-2, pnpmatch.cc:101,192) — materializing the full (Q, T) distance
matrix in HBM and re-reading it for argmin/second-best wastes bandwidth.
This kernel keeps each query block's distance tile in VMEM and reduces it to
(best_idx, best, second) in place.

The (dist, index) pair is packed into one int32 (dist * T + idx) so a single
min-reduction yields both values — same encoding trick the engine uses for
match conflict resolution (engine/tracker.py::_resolve_matches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_semantic_vo_tpu.kernels.hamming import DESC_BITS, DESC_WORDS

_BIG_D = DESC_BITS + 1  # sentinel distance for masked entries


def _matcher_kernel(q_ref, t_ref, qv_ref, tv_ref, code_ref, second_ref):
    q = q_ref[:]          # (BQ, 8) int32
    t = t_ref[:]          # (T, 8) int32
    qv = qv_ref[:]        # (BQ, 1) int32 (bool as int)
    tv = tv_ref[:]        # (T, 1) int32
    T = t.shape[0]

    # accumulate one descriptor word at a time: the obvious broadcast
    # q[:,None,:] ^ t[None,:,:] stacks a (BQ, T, 8) temporary (and its
    # popcount twin) in scoped VMEM — 37 MB at T=2048, over the 16 MB
    # limit.  Word-wise accumulation keeps every temporary at (BQ, T).
    d = jnp.zeros((q.shape[0], T), jnp.int32)
    for w in range(q.shape[1]):
        x = jnp.bitwise_xor(q[:, w][:, None], t[:, w][None, :])
        d = d + jax.lax.population_count(x).astype(jnp.int32)  # (BQ, T)
    valid = (qv > 0) & (tv[:, 0][None, :] > 0)
    d = jnp.where(valid, d, _BIG_D)

    idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    code = d * T + idx
    best_code = jnp.min(code, axis=1, keepdims=True)       # (BQ, 1)
    best_idx = best_code % T
    # exclude the winner, reduce again for the second-best distance
    code2 = jnp.where(idx == best_idx, jnp.int32(_BIG_D * T), code)
    second = jnp.min(code2, axis=1, keepdims=True) // T
    code_ref[:] = best_code
    second_ref[:] = second


@functools.partial(jax.jit, static_argnames=("block_q",))
def fused_best_match(
    query: jax.Array,
    train: jax.Array,
    query_valid: jax.Array,
    train_valid: jax.Array,
    block_q: int = 128,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(Q, 8) x (T, 8) packed descriptors -> (best_idx, best, second), each
    (Q,), masked entries pushed to distance 257 (DESC_BITS + 1)."""
    Q = query.shape[0]
    T = train.shape[0]
    qi = jax.lax.bitcast_convert_type(query, jnp.int32)
    ti = jax.lax.bitcast_convert_type(train, jnp.int32)
    qv = query_valid.astype(jnp.int32)[:, None]
    tv = train_valid.astype(jnp.int32)[:, None]
    grid = (pl.cdiv(Q, block_q),)
    code, second = pl.pallas_call(
        _matcher_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, DESC_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, DESC_WORDS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_q, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=jax.default_backend() == "cpu",
    )(qi, ti, qv, tv)
    code = code[:, 0]
    best_idx = code % T
    best = code // T
    return best_idx, best, second[:, 0]
