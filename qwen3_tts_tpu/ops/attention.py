"""Attention ops: GQA prefill + KV-cache decode.

Reference behavior being replaced: llama.cpp flash attention over its own KV
cache (`src/models/llama/mod.rs:415` flash_attn_type=1). Here the cache is a
preallocated device buffer `[n_layers, B, max_seq, n_kv_heads, head_dim]`
updated with `lax.dynamic_update_slice`, and attention is computed with
length-masked dense math that XLA fuses well on the MXU. A Pallas
flash-decode kernel (ops/flash_decode.py) takes over the single-token decode
path on TPU for long contexts.

All math accumulates in float32 regardless of the cache/activation dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def update_kv_cache(
    k_cache: jax.Array,   # [B, T, nk, hd]
    v_cache: jax.Array,
    k_new: jax.Array,     # [B, S, nk, hd]
    v_new: jax.Array,
    start: jax.Array,     # scalar int32: write offset (= tokens already cached)
):
    zero = jnp.zeros((), jnp.int32)
    idx = (zero, jnp.asarray(start, jnp.int32), zero, zero)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new.astype(k_cache.dtype), idx)
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new.astype(v_cache.dtype), idx)
    return k_cache, v_cache


def gqa_attention(
    q: jax.Array,          # [B, S, nq, hd]
    k: jax.Array,          # [B, T, nk, hd] (full cache buffer)
    v: jax.Array,          # [B, T, nk, hd]
    q_start: jax.Array,    # scalar: cache slot of query 0
    kv_len: jax.Array,     # scalar: number of valid cache entries (incl. new)
    kv_valid_from: jax.Array | None = None,   # [B]: first valid cache slot
) -> jax.Array:
    """Causal masked attention of new queries against the cache buffer.

    Query i (cache slot q_start + i) attends cache slots j with
    kv_valid_from[b] <= j <= q_start + i and j < kv_len. `kv_valid_from`
    implements left-padded ragged prompt batches: pad slots hold garbage
    keys and are masked out per row. Returns [B, S, nq, hd] in q.dtype.
    """
    B, S, nq, hd = q.shape
    T = k.shape[1]
    nk = k.shape[2]
    g = nq // nk

    qf = q.astype(jnp.float32).reshape(B, S, nk, g, hd)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    scores = jnp.einsum("bskgh,btkh->bkgst", qf, kf) / jnp.sqrt(float(hd))

    t_idx = jnp.arange(T, dtype=jnp.int32)
    s_idx = jnp.arange(S, dtype=jnp.int32)
    q_pos = jnp.asarray(q_start, jnp.int32) + s_idx          # [S]
    mask = (t_idx[None, :] <= q_pos[:, None]) & (
        t_idx[None, :] < jnp.asarray(kv_len, jnp.int32)
    )                                                        # [S, T]
    mask = jnp.broadcast_to(mask[None], (B, S, T))
    if kv_valid_from is not None:
        valid = t_idx[None, :] >= jnp.asarray(kv_valid_from, jnp.int32)[:, None]
        mask = mask & valid[:, None, :]
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgst,btkh->bskgh", probs, vf)
    return out.reshape(B, S, nq, hd).astype(q.dtype)
