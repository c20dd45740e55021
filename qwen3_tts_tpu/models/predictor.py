"""Predictor: per-frame autoregressive codebook expansion.

TPU-native replacement for the reference's 16 sequential llama.cpp FFI calls
per frame (`src/tts/engine.rs:564-611`): the KV clear, the 2-token prefill
`[proj(talker_hidden), codec_emb_1024(0, code_0)]`, and the 15 greedy
single-token decodes all live inside ONE compiled program — a `lax.scan` over
codebooks — so the host never syncs mid-frame (SURVEY.md §7 "hard parts").

Per-codebook sampling slices the 16x2048 output head: codebook q is always
greedy over `logits[(q-1)*2048 : q*2048]` minus the offset
(`src/tts/engine.rs:587-597`; predictor sampler is greedy,
`src/tts/engine.rs:470`).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..assets.tables import Assets
from ..core import protocol
from ..core.config import PredictorConfig
from . import decoder


def frame_codes(
    params: decoder.DecoderParams,
    cfg: PredictorConfig,
    assets: Assets,
    talker_hidden_1024: jax.Array,   # [B, 1024] = assets.project(talker hidden)
    code_0: jax.Array,               # [B] int32 sampled by the talker
) -> jax.Array:
    """Expand code_0 into the full 16-code frame. Returns [B, 16] int32."""
    B = code_0.shape[0]
    cache = decoder.init_kv_cache(cfg, B)

    # --- prefill: [proj(m_hidden), codec_emb_1024(0, code_0)] at pos 0,1 ---
    c0_emb = assets.codec_embedding_1024(jnp.zeros_like(code_0), code_0)
    x = jnp.stack([talker_hidden_1024, c0_emb], axis=1)      # [B, 2, 1024]
    pos = jnp.broadcast_to(jnp.arange(2, dtype=jnp.int32)[None], (B, 2))
    h, _, cache = decoder.forward(
        params, cfg, x.astype(jnp.dtype(cfg.dtype)), pos, cache, jnp.int32(0),
        with_logits=False,
    )
    # only codebook-1's 2048-column head slice is needed from the prefill
    # (16x less head traffic than materialising all 32768 logits per step)
    row_logits = decoder.head_logits(
        params, h[:, -1], jnp.int32(0), protocol.CODE_VOCAB)  # [B, 2048]

    def step(carry, q):
        cache, row_logits = carry
        # greedy over head slice [(q-1)*2048, q*2048), offset removed
        code_q = jnp.argmax(row_logits, axis=-1).astype(jnp.int32)
        # feed codec_emb_1024(q, code_q) at position q+1. The reference skips
        # the decode after q=15; running it uniformly inside scan is free of
        # host syncs and its output is simply unused.
        emb = assets.codec_embedding_1024(jnp.full_like(code_q, q), code_q)
        pos = jnp.broadcast_to((q + 1)[None, None], (B, 1))
        h, _, cache = decoder.forward(
            params, cfg, emb[:, None].astype(jnp.dtype(cfg.dtype)), pos,
            cache, q + 1, with_logits=False,
        )
        row_logits = decoder.head_logits(
            params, h[:, -1], q * protocol.CODE_VOCAB, protocol.CODE_VOCAB)
        return (cache, row_logits), code_q

    qs = jnp.arange(1, protocol.NUM_CODEBOOKS, dtype=jnp.int32)
    # codes come back as stacked scan outputs — no per-step scatter
    (cache, _), codes_rest = jax.lax.scan(step, (cache, row_logits), qs)
    return jnp.concatenate(
        [code_0[:, None], jnp.moveaxis(codes_rest, 0, 1)], axis=1)
