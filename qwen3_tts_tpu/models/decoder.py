"""Qwen3-style decoder shared by the talker and the predictor.

TPU-native replacement for the two GGUF transformers the reference runs
inside llama.cpp (`src/models/llama/mod.rs`): embedding *inputs* (never token
ids), RMSNorm + QK-norm, GQA with M-RoPE, SwiGLU MLP, final norm + dense head.
Layer weights are stacked on a leading axis and executed with `lax.scan`, so
the whole decode step is one compiled program regardless of depth.

Weight pytree layout (all [L, ...] stacked):
  layers/ln1 [L,H], wq [L,H,nq*hd], wk [L,H,nk*hd], wv [L,H,nk*hd],
  q_norm [L,hd], k_norm [L,hd], wo [L,nq*hd,H],
  ln2 [L,H], w_gate [L,H,F], w_up [L,H,F], w_down [L,F,H]
  final_norm [H], head [H, vocab]

The KV cache is {"k","v": [L, B, max_seq, nk, hd]} plus an external int32
`cache_len` (tokens already written).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.config import PredictorConfig, TalkerConfig
from ..ops import attention, flash_decode, rope
from ..ops.quant import linear

DecoderParams = Dict[str, Any]
Config = TalkerConfig | PredictorConfig


def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale


def init_decoder(key: jax.Array, cfg: Config, scale: float = 0.02) -> DecoderParams:
    L, H, F = cfg.n_layers, cfg.hidden, cfg.ffn_dim
    nq, nk, hd = cfg.n_q_heads, cfg.n_kv_heads, cfg.head_dim
    dtype = jnp.dtype(cfg.dtype)
    ks = jax.random.split(key, 8)

    def w(k, shape):
        return (scale * jax.random.normal(k, shape)).astype(dtype)

    return {
        "layers": {
            "ln1": jnp.ones((L, H), dtype),
            "wq": w(ks[0], (L, H, nq * hd)),
            "wk": w(ks[1], (L, H, nk * hd)),
            "wv": w(ks[2], (L, H, nk * hd)),
            "q_norm": jnp.ones((L, hd), dtype),
            "k_norm": jnp.ones((L, hd), dtype),
            "wo": w(ks[3], (L, nq * hd, H)),
            "ln2": jnp.ones((L, H), dtype),
            "w_gate": w(ks[4], (L, H, F)),
            "w_up": w(ks[5], (L, H, F)),
            "w_down": w(ks[6], (L, F, H)),
        },
        "final_norm": jnp.ones((H,), dtype),
        "head": w(ks[7], (H, cfg.vocab)),
    }


def init_kv_cache(cfg: Config, batch: int, dtype=None) -> Dict[str, jax.Array]:
    """Head-major layout [L, B, n_kv, T, hd]: per-head cache slices are
    contiguous, which both the dense path and the flash-decode DMA want."""
    dtype = dtype or jnp.dtype(cfg.dtype)
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, cfg.max_seq, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def forward(
    params: DecoderParams,
    cfg: Config,
    x: jax.Array,              # [B, S, H] embedding inputs
    positions: jax.Array,      # [B, S] sequence positions
    cache: Dict[str, jax.Array],
    cache_len: jax.Array,      # scalar int32: tokens already in cache
    *,
    kv_valid_from: jax.Array | None = None,  # [B] first valid cache slot
    with_logits: bool = True,
) -> Tuple[jax.Array, jax.Array | None, Dict[str, jax.Array]]:
    """Run S new tokens through the decoder.

    Returns (hidden [B,S,H], logits [B,S,vocab] or None, updated cache).
    """
    B, S, H = x.shape
    nq, nk, hd = cfg.n_q_heads, cfg.n_kv_heads, cfg.head_dim
    cache_len = jnp.asarray(cache_len, jnp.int32)
    kv_len = cache_len + S
    # Single-token decode on TPU uses the Pallas flash-decode kernel: HBM
    # traffic scales with the valid cache prefix instead of max_seq.
    use_flash = S == 1 and flash_decode.usable(cfg)

    pos4 = rope.mrope_positions(positions)
    cos, sin = rope.rope_angles(pos4, cfg.mrope_sections, hd, cfg.rope_theta)

    def layer_step(h, inputs):
        lw, k_cache, v_cache = inputs
        # --- attention block ---
        a_in = rms_norm(h, lw["ln1"], cfg.rms_eps)
        q = linear(a_in, lw["wq"]).reshape(B, S, nq, hd)
        k = linear(a_in, lw["wk"]).reshape(B, S, nk, hd)
        v = linear(a_in, lw["wv"]).reshape(B, S, nk, hd)
        q = rms_norm(q, lw["q_norm"], cfg.rms_eps)
        k = rms_norm(k, lw["k_norm"], cfg.rms_eps)
        q = rope.apply_rope(q, cos, sin)
        k = rope.apply_rope(k, cos, sin)
        k_cache, v_cache = attention.update_kv_cache(k_cache, v_cache, k, v, cache_len)
        if use_flash:
            valid_from = (kv_valid_from if kv_valid_from is not None
                          else jnp.zeros((B,), jnp.int32))
            attn = flash_decode.decode_attention(
                q[:, 0], k_cache, v_cache,
                jnp.broadcast_to(kv_len, (B,)), valid_from,
            )[:, None]
        else:
            attn = attention.gqa_attention(
                q, k_cache, v_cache, cache_len, kv_len, kv_valid_from
            )
        h = h + linear(attn.reshape(B, S, nq * hd), lw["wo"])
        # --- MLP block (SwiGLU) ---
        m_in = rms_norm(h, lw["ln2"], cfg.rms_eps)
        gated = jax.nn.silu(linear(m_in, lw["w_gate"])) * linear(m_in, lw["w_up"])
        h = h + linear(gated, lw["w_down"])
        return h, (k_cache, v_cache)

    h, (new_k, new_v) = jax.lax.scan(
        layer_step, x.astype(jnp.dtype(cfg.dtype)),
        (params["layers"], cache["k"], cache["v"]),
    )
    new_cache = {"k": new_k, "v": new_v}

    h = rms_norm(h, params["final_norm"], cfg.rms_eps)
    logits = None
    if with_logits:
        logits = linear(h, params["head"]).astype(jnp.float32)
    return h, logits, new_cache
