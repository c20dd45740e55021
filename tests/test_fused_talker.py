"""Fused talker decode-step kernel vs the XLA decoder path.

The fused kernel (ops/fused_talker.py) must reproduce models/decoder.forward
at S=1 with flash attention (its math is copied block-for-block from
ops/flash_decode.py) on f32 tiny configs in interpret mode: same hidden,
same logits argmax, same cache writes — including left-padded rows, per-row
slots (continuous batching), quantized weights, and multi-block prefixes.
"""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas whole-step kernel (docs/TESTING.md)

from qwen3_tts_tpu.core.config import TalkerConfig
from qwen3_tts_tpu.models import decoder
from qwen3_tts_tpu.ops import flash_decode, fused_talker, quant

CFG = TalkerConfig(
    hidden=64, n_layers=2, n_q_heads=4, n_kv_heads=2, head_dim=16,
    ffn_dim=128, vocab=2176, max_seq=512, mrope_sections=(4, 2, 2, 0),
    dtype="float32",
)


def _flash_interpret(monkeypatch):
    """Force decoder.forward onto the flash path, in interpret mode."""
    orig = flash_decode.decode_attention_stacked
    monkeypatch.setattr(flash_decode, "usable", lambda *a, **k: True)
    monkeypatch.setattr(
        flash_decode, "decode_attention_stacked",
        lambda *a, **kw: orig(*a, interpret=True, **kw))


def _setup(cfg, B, prefill_len, pad, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    params = decoder.init_decoder(ks[0], cfg)
    cache = decoder.init_kv_cache(cfg, B)
    pad = jnp.asarray(pad, jnp.int32)
    x = 0.1 * jax.random.normal(
        ks[1], (B, prefill_len, cfg.hidden)).astype(jnp.dtype(cfg.dtype))
    slots = jnp.arange(prefill_len, dtype=jnp.int32)[None]
    positions = jnp.maximum(slots - pad[:, None], 0)
    _, _, cache = decoder.forward(
        params, cfg, x, positions, cache, jnp.int32(0), kv_valid_from=pad)
    fb = 0.1 * jax.random.normal(
        ks[2], (B, cfg.hidden)).astype(jnp.dtype(cfg.dtype))
    return params, cache, pad, fb


def _ref_step(params, cfg, fb, slot, pad, cache, monkeypatch):
    _flash_interpret(monkeypatch)
    positions = (jnp.broadcast_to(slot, pad.shape) - pad)[:, None]
    h, logits, cache = decoder.forward(
        params, cfg, fb[:, None], positions, cache, slot,
        kv_valid_from=pad)
    return h[:, -1], logits[:, -1], cache


def _fused_step(params, cfg, fb, slot, pad, cache):
    B = fb.shape[0]
    slot_b = jnp.broadcast_to(jnp.asarray(slot, jnp.int32), (B,))
    positions = slot_b - pad
    h, logits, k, v = fused_talker.talker_step_fused(
        params, cfg, fb, positions, slot_b, slot_b, pad,
        cache["k"], cache["v"], interpret=True)
    return h, logits, {"k": k, "v": v}


@pytest.mark.parametrize(
    "batch,pad",
    [(1, [0]), (2, [0, 3]), (8, [0, 3, 1, 0, 2, 4, 0, 1])])
def test_fused_matches_flash_xla(batch, pad, monkeypatch):
    S = 5
    params, cache, pad, fb = _setup(CFG, batch, S, pad)
    rh, rl, rc = _ref_step(params, CFG, fb, jnp.int32(S), pad, cache,
                           monkeypatch)
    fh, fl, fc = _fused_step(params, CFG, fb, jnp.int32(S), pad, cache)
    assert jnp.allclose(rh, fh, atol=1e-5), jnp.abs(rh - fh).max()
    assert jnp.allclose(rl, fl, atol=1e-4)
    assert jnp.array_equal(jnp.argmax(rl, -1), jnp.argmax(fl, -1))
    assert jnp.allclose(rc["k"], fc["k"], atol=1e-5)
    assert jnp.allclose(rc["v"], fc["v"], atol=1e-5)


def test_fused_multiblock_prefix(monkeypatch):
    """Prefix longer than one ABLK block exercises the online softmax."""
    S = fused_talker.ABLK + 37
    params, cache, pad, fb = _setup(CFG, 1, S, [0], seed=1)
    rh, rl, rc = _ref_step(params, CFG, fb, jnp.int32(S), pad, cache,
                           monkeypatch)
    fh, fl, fc = _fused_step(params, CFG, fb, jnp.int32(S), pad, cache)
    assert jnp.allclose(rh, fh, atol=1e-5)
    assert jnp.array_equal(jnp.argmax(rl, -1), jnp.argmax(fl, -1))
    assert jnp.allclose(rc["k"], fc["k"], atol=1e-5)


def test_fused_per_row_slots(monkeypatch):
    """Continuous batching: rows write at different slots with different
    prefix lengths."""
    B = 2
    params, cache, pad, fb = _setup(CFG, B, 6, [0, 0], seed=2)
    slot = jnp.array([6, 4], jnp.int32)     # row 1 is two tokens behind
    _flash_interpret(monkeypatch)
    positions = (slot - pad)[:, None]
    rh, rl, rc = decoder.forward(
        params, CFG, fb[:, None], positions, cache, slot, kv_valid_from=pad)
    fh, fl, fk, fv = fused_talker.talker_step_fused(
        params, CFG, fb, slot - pad, slot, slot, pad,
        cache["k"], cache["v"], interpret=True)
    assert jnp.allclose(rh[:, -1], fh, atol=1e-5)
    assert jnp.array_equal(jnp.argmax(rl[:, -1], -1), jnp.argmax(fl, -1))
    assert jnp.allclose(rc["k"], fk, atol=1e-5)
    assert jnp.allclose(rc["v"], fv, atol=1e-5)


def test_fused_quantized(monkeypatch):
    params, cache, pad, fb = _setup(CFG, 1, 4, [0], seed=3)
    params_q = quant.quantize_decoder_params(params)
    rh, rl, rc = _ref_step(params_q, CFG, fb, jnp.int32(4), pad, cache,
                           monkeypatch)
    fh, fl, fc = _fused_step(params_q, CFG, fb, jnp.int32(4), pad, cache)
    assert jnp.allclose(rh, fh, atol=1e-5)
    assert jnp.array_equal(jnp.argmax(rl, -1), jnp.argmax(fl, -1))
    assert jnp.allclose(rl, fl, atol=1e-4)


def test_fused_bf16_quantized(monkeypatch):
    """Production config class (bf16 + int8): logits round through cfg.dtype
    like the XLA path, argmax agrees."""
    cfg = TalkerConfig(
        hidden=64, n_layers=2, n_q_heads=4, n_kv_heads=2, head_dim=16,
        ffn_dim=128, vocab=2176, max_seq=512, mrope_sections=(4, 2, 2, 0),
        dtype="bfloat16",
    )
    params, cache, pad, fb = _setup(cfg, 1, 4, [0], seed=4)
    params_q = quant.quantize_decoder_params(params)
    rh, rl, rc = _ref_step(params_q, cfg, fb, jnp.int32(4), pad, cache,
                           monkeypatch)
    fh, fl, fc = _fused_step(params_q, cfg, fb, jnp.int32(4), pad, cache)
    # CPU qmatmul falls back to f32 dequant (the TPU pallas path is bf16
    # like the kernel), so allow bf16-scale tolerance; decisions must agree
    assert jnp.allclose(rh.astype(jnp.float32), fh.astype(jnp.float32),
                        atol=0.05, rtol=0.05)
    assert jnp.array_equal(jnp.argmax(rl, -1), jnp.argmax(fl, -1))


def test_fused_int4(monkeypatch):
    """Grouped-int4 weights (Q4_K-class): the kernel's panel dequant must
    reproduce quant.dequant4_dt bit-for-bit, so logits match the XLA int4
    path exactly on f32 configs."""
    cfg = TalkerConfig(
        hidden=256, n_layers=2, n_q_heads=2, n_kv_heads=2, head_dim=128,
        ffn_dim=256, vocab=2176, max_seq=512, mrope_sections=(32, 16, 16, 0),
        dtype="float32",
    )
    params, cache, pad, fb = _setup(cfg, 1, 5, [0], seed=6)
    params_q = quant.quantize_decoder_params(params, kind="int4")
    rh, rl, rc = _ref_step(params_q, cfg, fb, jnp.int32(5), pad, cache,
                           monkeypatch)
    fh, fl, fc = _fused_step(params_q, cfg, fb, jnp.int32(5), pad, cache)
    assert jnp.allclose(rh, fh, atol=1e-4), jnp.abs(rh - fh).max()
    assert jnp.allclose(rl, fl, atol=1e-3)
    assert jnp.array_equal(jnp.argmax(rl, -1), jnp.argmax(fl, -1))
    assert jnp.allclose(rc["k"], fc["k"], atol=1e-4)


def test_int4_quantizer_roundtrip():
    w = 0.3 * jax.random.normal(jax.random.key(0), (512, 384))
    q = quant.quantize_int4(w)
    assert q["q4"].shape == (256, 384) and q["m8"].shape == (4, 384)
    rel = float(jnp.abs(quant.dequantize4(q) - w).mean()
                / jnp.abs(w).mean())
    assert rel < 0.2, rel                     # Q4-class quantization error
    # packing round-trip is exact
    nib = quant.unpack4(q["q4"])
    assert int(jnp.max(nib)) <= 7 and int(jnp.min(nib)) >= -7
    x = jax.random.normal(jax.random.key(1), (4, 512), jnp.float32)
    y = quant.qmatmul4(x, q)
    ref = (x @ quant.dequant4_dt(q["q4"], q["m8"], x.dtype)) * q["scale"]
    assert jnp.allclose(y, ref, rtol=1e-6)


def test_usable_gating(monkeypatch):
    """usable() rejects CPU backends and oversized batches."""
    assert not fused_talker.usable(CFG, 1)   # cpu backend in tests
    monkeypatch.setenv("QWEN3_TTS_NO_FUSED_TALKER", "1")
    assert not fused_talker.usable(CFG, 1)
