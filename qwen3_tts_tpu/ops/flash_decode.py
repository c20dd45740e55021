"""Pallas flash-decode attention: single-token GQA against a paged KV cache.

The dense fallback (ops/attention.py) reads the FULL preallocated cache
buffer (max_seq slots) every step and masks invalid slots; this kernel keeps
the cache in HBM and manually DMAs only `ceil(kv_len / BLK)` blocks into
VMEM with double buffering, so HBM traffic scales with the *valid* prefix,
not the capacity (4096 slots ≈ 235 MB/step on the flagship talker).

Online-softmax over K blocks, one grid cell per (batch row, kv head);
the q heads of a group ride along as rows of a [g_pad, hd] tile.

Contract matches `attention.gqa_attention` at S=1:
  out[b, qh] = softmax_j(q·k_j / sqrt(hd)) v_j over
               valid_from[b] <= j <= q_pos[b], j < kv_len[b].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BLK = 256          # cache slots per DMA block
NEG_INF = -1e30


def _kernel(layer_ref, kv_len_ref, valid_from_ref, q_ref, k_new_ref,
            v_new_ref, out_ref, k_hbm, v_hbm, k_buf, v_buf,
            acc_ref, m_ref, l_ref, sem_k, sem_v):
    """Grid cell (b, h): attend q[b, h-group] over k/v[layer, b, h, :kv_len)
    PLUS the current step's own key/value passed directly in VMEM.

    The cache stays STACKED [L, B, nk, T, hd] in HBM with the layer index
    scalar-prefetched, and — critically — the kernel reads the PRE-update
    cache: the same-step token arrives via `k_new/v_new`, so the cache write
    has no read-after-write hazard against this kernel and XLA never copies
    the carried cache buffers.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    h = pl.program_id(1)
    g_pad, hd = q_ref.shape

    layer = layer_ref[0]
    kv_len = kv_len_ref[b]          # tokens already in the cache (EXCLUDES
    valid_from = valid_from_ref[b]  # the current step's token)
    # >= 1 so the warm-up DMA is always awaited (an empty cache is fully
    # masked; the explicit-p masking keeps it exact)
    n_blocks = jnp.maximum(pl.cdiv(kv_len, BLK), 1)

    def k_dma(slot, blk_idx):
        return pltpu.make_async_copy(
            k_hbm.at[layer, b, h, pl.ds(blk_idx * BLK, BLK), :],
            k_buf.at[slot], sem_k.at[slot])

    def v_dma(slot, blk_idx):
        return pltpu.make_async_copy(
            v_hbm.at[layer, b, h, pl.ds(blk_idx * BLK, BLK), :],
            v_buf.at[slot], sem_v.at[slot])

    # warm up the pipeline
    k_dma(0, 0).start()
    v_dma(0, 0).start()

    acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    m_ref[:] = jnp.full(m_ref.shape, NEG_INF, m_ref.dtype)
    l_ref[:] = jnp.zeros(l_ref.shape, l_ref.dtype)

    q = q_ref[:].astype(jnp.float32) / jnp.sqrt(jnp.float32(hd))

    def body(i, _):
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i + 1 < n_blocks)
        def _():
            k_dma(nxt, i + 1).start()
            v_dma(nxt, i + 1).start()

        k_dma(slot, i).wait()
        v_dma(slot, i).wait()

        k = k_buf[slot].astype(jnp.float32)              # [BLK, hd]
        v = v_buf[slot].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [g_pad, BLK]

        pos = i * BLK + jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
        ok = (pos < kv_len) & (pos >= valid_from)
        scores = jnp.where(ok, scores, NEG_INF)

        m_prev = m_ref[:]                                # [g_pad, 1]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        # explicit mask: in a fully-masked block m_new == NEG_INF and
        # exp(scores - m_new) would be exp(0) == 1 for every masked lane
        p = jnp.where(ok, jnp.exp(scores - m_new), 0.0)  # [g_pad, BLK]
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new
        return ()

    jax.lax.fori_loop(0, n_blocks, body, ())

    # fold in the current token (always valid: causal self-attention);
    # the block carries 16 broadcast rows (bf16 sublane tiling), row 0 used
    k_n = k_new_ref[:].reshape(-1, hd)[0:1].astype(jnp.float32)   # [1, hd]
    v_n = v_new_ref[:].reshape(-1, hd)[0:1].astype(jnp.float32)
    s_new = jax.lax.dot_general(
        q, k_n, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [g_pad, 1]
    m_prev = m_ref[:]
    m_fin = jnp.maximum(m_prev, s_new)
    alpha = jnp.exp(m_prev - m_fin)
    p_new = jnp.exp(s_new - m_fin)
    l_fin = l_ref[:] * alpha + p_new
    acc_fin = acc_ref[:] * alpha + p_new * v_n
    out_ref[:] = (acc_fin / jnp.maximum(l_fin, 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_stacked(
    q: jax.Array,            # [B, nq, hd] single-position queries
    k_all: jax.Array,        # [L, B, nk, T, hd] STACKED cache (HBM),
    v_all: jax.Array,        #   PRE-update: current token NOT yet visible
    k_new: jax.Array,        # [B, nk, hd] current step's key (post-RoPE)
    v_new: jax.Array,        # [B, nk, hd] current step's value
    layer: jax.Array,        # scalar int32 layer index
    kv_len: jax.Array,       # [B] tokens already cached (EXCLUDING current)
    kv_valid_from: jax.Array,  # [B] first valid slot (left-pad offset)
    *,
    interpret: bool = False,
) -> jax.Array:
    """Returns [B, nq, hd] in q.dtype."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, nq, hd = q.shape
    nk, T = k_all.shape[2], k_all.shape[3]
    g = nq // nk
    g_pad = max(8, g)        # f32 sublane minimum

    # group q heads with their kv head: [B, nk, g_pad, hd]
    qg = q.reshape(B, nk, g, hd)
    if g_pad != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - g), (0, 0)))

    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    kv_len = jnp.asarray(kv_len, jnp.int32).reshape(B)
    valid_from = jnp.asarray(kv_valid_from, jnp.int32).reshape(B)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,           # layer, kv_len, valid_from
        grid=(B, nk),
        in_specs=[
            pl.BlockSpec((1, 1, g_pad, hd), lambda b, h, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16, hd), lambda b, h, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16, hd), lambda b, h, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # k stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # v stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, g_pad, hd), lambda b, h, *_: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, BLK, hd), k_all.dtype),  # cache dtype preserved
            pltpu.VMEM((2, BLK, hd), v_all.dtype),
            pltpu.VMEM((g_pad, hd), jnp.float32),
            pltpu.VMEM((g_pad, 1), jnp.float32),
            pltpu.VMEM((g_pad, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(layer_ref, kv_len_ref, valid_from_ref, q_ref, k_new_ref,
               v_new_ref, k_hbm, v_hbm, out_ref, k_buf, v_buf,
               acc, m, l, sem_k, sem_v):
        _kernel(layer_ref, kv_len_ref, valid_from_ref,
                q_ref.at[0, 0], k_new_ref, v_new_ref,
                out_ref.at[0, 0], k_hbm, v_hbm,
                k_buf, v_buf, acc, m, l, sem_k, sem_v)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nk, g_pad, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(layer, kv_len, valid_from, qg.astype(q.dtype),
      jnp.broadcast_to(k_new.astype(q.dtype)[:, :, None], (B, nk, 16, hd)),
      jnp.broadcast_to(v_new.astype(q.dtype)[:, :, None], (B, nk, 16, hd)),
      k_all, v_all)
    return out[:, :, :g].reshape(B, nq, hd)


def decode_attention(q, k, v, k_new, v_new, kv_len, kv_valid_from, *,
                     interpret=False):
    """Single-layer convenience wrapper: cache [B, nk, T, hd] (pre-update),
    plus the current token's k/v [B, nk, hd]."""
    return decode_attention_stacked(
        q, k[None], v[None], k_new, v_new, jnp.int32(0), kv_len,
        kv_valid_from, interpret=interpret)


def usable(cfg, cache_dtype=None, cache_window=None) -> bool:
    """Static eligibility: decode-step shapes this kernel supports.

    DEFAULT ON for TPU decode steps since the on-device A/B
    (tools/bench_flash.py, full generation loop, int8 flagship weights):
    B=1 9.61 vs 11.08 ms/frame dense (-13%), B=8 12.96 vs 16.10 (-20%).
    The pre-update-cache formulation folds the current token's k/v in VMEM,
    so the cache write has no read-after-write hazard and XLA never copies
    the carried cache buffers. `QWEN3_TTS_NO_FLASH=1` forces the dense
    exact-reference math. Numerics note: flash deviates from dense at ~1e-4
    (TPU matmul-pass rounding, llama.cpp flash-attention-class deviation);
    each path is individually deterministic under a fixed seed.
    """
    import os

    if os.environ.get("QWEN3_TTS_NO_FLASH") == "1":
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return (
        backend not in ("cpu",)
        and cfg.head_dim % 64 == 0
        and (cache_window or cfg.max_seq) % BLK == 0
        and cfg.n_q_heads % cfg.n_kv_heads == 0
    )
