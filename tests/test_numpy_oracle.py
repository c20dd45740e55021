"""Independent numpy re-implementation of the decoder math, compared against
the JAX stack (fp32 tiny config). Locks RoPE section mapping, QK-norm, GQA
masking, SwiGLU, and the fused-weight splits against an implementation that
shares no code with models/decoder.py."""

import numpy as np
import jax
import jax.numpy as jnp

from qwen3_tts_tpu.core.config import TalkerConfig
from qwen3_tts_tpu.models import decoder

CFG = TalkerConfig(
    hidden=32, n_layers=2, n_q_heads=4, n_kv_heads=2, head_dim=8,
    ffn_dim=48, vocab=64, max_seq=32, mrope_sections=(2, 1, 1, 0),
    dtype="float32",
)


def np_rms(x, scale, eps):
    var = np.mean(x.astype(np.float64) ** 2, axis=-1, keepdims=True)
    return (x / np.sqrt(var + eps)) * scale


def np_rope_angles(positions, sections, head_dim, theta):
    half = head_dim // 2
    inv = 1.0 / theta ** (np.arange(half) * 2.0 / head_dim)
    # streams: t=h=w=pos, channel=0; frequency i uses its section's stream
    stream_pos = []
    for stream, width in enumerate(sections):
        p = positions if stream < 3 else np.zeros_like(positions)
        stream_pos.extend([p] * width)
    pos_per_freq = np.stack(stream_pos, axis=-1)     # [S, half]
    ang = pos_per_freq * inv
    ang = np.concatenate([ang, ang], axis=-1)
    return np.cos(ang), np.sin(ang)


def np_apply_rope(x, cos, sin):
    half = x.shape[-1] // 2
    rot = np.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * cos[:, None, :] + rot * sin[:, None, :]


def np_forward(params, cfg, x, positions):
    """x [S, H]; full-sequence causal forward (no cache)."""
    S, H = x.shape
    nq, nk, hd = cfg.n_q_heads, cfg.n_kv_heads, cfg.head_dim
    cos, sin = np_rope_angles(positions, cfg.mrope_sections, hd,
                              cfg.rope_theta)
    L = cfg.n_layers
    lw = jax.tree.map(np.asarray, params["layers"])
    h = x.copy()
    for l in range(L):
        a = np_rms(h, lw["ln1"][l], cfg.rms_eps)
        qkv = a @ lw["wqkv"][l]
        q = qkv[:, : nq * hd].reshape(S, nq, hd)
        k = qkv[:, nq * hd: (nq + nk) * hd].reshape(S, nk, hd)
        v = qkv[:, (nq + nk) * hd:].reshape(S, nk, hd)
        q = np_rms(q, lw["q_norm"][l], cfg.rms_eps)
        k = np_rms(k, lw["k_norm"][l], cfg.rms_eps)
        q = np_apply_rope(q, cos, sin)
        k = np_apply_rope(k, cos, sin)
        g = nq // nk
        out = np.zeros((S, nq, hd))
        for s in range(S):
            for head in range(nq):
                kh = head // g
                scores = (k[: s + 1, kh] @ q[s, head]) / np.sqrt(hd)
                p = np.exp(scores - scores.max())
                p /= p.sum()
                out[s, head] = p @ v[: s + 1, kh]
        h = h + out.reshape(S, nq * hd) @ lw["wo"][l]
        m = np_rms(h, lw["ln2"][l], cfg.rms_eps)
        gu = m @ lw["w_gu"][l]
        F = gu.shape[-1] // 2
        gate, up = gu[:, :F], gu[:, F:]
        silu = gate / (1.0 + np.exp(-gate))
        h = h + (silu * up) @ lw["w_down"][l]
    h = np_rms(h, np.asarray(params["final_norm"]), cfg.rms_eps)
    logits = h @ np.asarray(params["head"])
    return h, logits


def test_decoder_matches_numpy_oracle():
    params = decoder.init_decoder(jax.random.key(0), CFG)
    S = 6
    x = np.asarray(
        0.2 * jax.random.normal(jax.random.key(1), (S, CFG.hidden)),
        np.float32)
    positions = np.arange(S)

    want_h, want_logits = np_forward(params, CFG, x, positions)

    cache = decoder.init_kv_cache(CFG, 1)
    got_h, got_logits, _ = decoder.forward(
        params, CFG, jnp.asarray(x)[None], jnp.asarray(positions)[None],
        cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(got_h[0]), want_h,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_logits[0]), want_logits,
                               rtol=2e-4, atol=2e-4)


def test_incremental_decode_matches_oracle():
    """Prefill + single-token steps through the cache must equal the
    full-sequence oracle at every position."""
    params = decoder.init_decoder(jax.random.key(2), CFG)
    S = 5
    x = np.asarray(
        0.2 * jax.random.normal(jax.random.key(3), (S, CFG.hidden)),
        np.float32)
    positions = np.arange(S)
    want_h, want_logits = np_forward(params, CFG, x, positions)

    cache = decoder.init_kv_cache(CFG, 1)
    # prefill 2, then 3 single steps
    _, logits_p, cache = decoder.forward(
        params, CFG, jnp.asarray(x[:2])[None],
        jnp.asarray(positions[:2])[None], cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits_p[0]), want_logits[:2],
                               rtol=2e-4, atol=2e-4)
    for s in range(2, S):
        _, logits_s, cache = decoder.forward(
            params, CFG, jnp.asarray(x[s:s + 1])[None],
            jnp.asarray([[s]]), cache, jnp.int32(s))
        np.testing.assert_allclose(
            np.asarray(logits_s[0, 0]), want_logits[s],
            rtol=2e-4, atol=2e-4,
            err_msg=f"divergence at step {s}")
