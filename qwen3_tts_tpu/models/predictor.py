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

from typing import Dict

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
    _, logits, cache = decoder.forward(
        params, cfg, x.astype(jnp.dtype(cfg.dtype)), pos, cache, jnp.int32(0)
    )
    last_logits = logits[:, -1]                              # [B, 32768]

    codes0 = jnp.zeros((B, protocol.NUM_CODEBOOKS), jnp.int32)
    codes0 = codes0.at[:, 0].set(code_0)

    def step(carry, q):
        cache, last_logits, codes = carry
        # greedy over head slice [(q-1)*2048, q*2048), offset removed
        sliced = jax.lax.dynamic_index_in_dim(
            last_logits.reshape(B, protocol.NUM_CODEBOOKS, protocol.CODE_VOCAB),
            q - 1, axis=1, keepdims=False,
        )                                                    # [B, 2048]
        code_q = jnp.argmax(sliced, axis=-1).astype(jnp.int32)
        codes = codes.at[:, q].set(code_q)
        # feed codec_emb_1024(q, code_q) at position q+1. The reference skips
        # the decode after q=15; running it uniformly inside scan is free of
        # host syncs and its output is simply unused.
        emb = assets.codec_embedding_1024(jnp.full_like(code_q, q), code_q)
        pos = jnp.broadcast_to((q + 1)[None, None], (B, 1))
        _, logits, cache = decoder.forward(
            params, cfg, emb[:, None].astype(jnp.dtype(cfg.dtype)), pos,
            cache, q + 1,
        )
        return (cache, logits[:, -1], codes), None

    qs = jnp.arange(1, protocol.NUM_CODEBOOKS, dtype=jnp.int32)
    (cache, _, codes), _ = jax.lax.scan(step, (cache, last_logits, codes0), qs)
    return codes
