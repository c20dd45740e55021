"""Fused predictor-frame kernel vs the XLA predictor path.

The fused kernel (ops/fused_predictor.py) must reproduce models/predictor.py
exactly on f32 tiny configs (interpret mode): same greedy codes for every
batch row, including padded batches and quantized weights.
"""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas frame-expansion kernel (docs/TESTING.md)

from qwen3_tts_tpu.assets import tables
from qwen3_tts_tpu.core.config import PredictorConfig
from qwen3_tts_tpu.models import decoder, predictor
from qwen3_tts_tpu.ops import fused_predictor, quant

CFG = PredictorConfig(
    hidden=32, n_layers=2, n_q_heads=2, n_kv_heads=2, head_dim=16,
    ffn_dim=64, max_seq=32, mrope_sections=(8, 0, 0, 0), dtype="float32",
)
CFG_GQA = PredictorConfig(
    hidden=64, n_layers=2, n_q_heads=4, n_kv_heads=2, head_dim=16,
    ffn_dim=64, max_seq=32, mrope_sections=(8, 0, 0, 0), dtype="float32",
)


def _setup(cfg, seed=0, codec_rows=96):
    k = jax.random.split(jax.random.key(seed), 3)
    params = decoder.init_decoder(k[0], cfg)
    assets = tables.random_assets(
        k[1], text_vocab=64, codec_rows=codec_rows, dim=48,
        proj_dim=cfg.hidden)
    ptab, rows = fused_predictor.make_ptab(assets, cfg)
    return params, assets, (ptab, rows), k[2]


@pytest.mark.parametrize("batch", [1, 2, 5])
def test_fused_matches_xla(batch):
    params, assets, ptab, key = _setup(CFG)
    kh, kc = jax.random.split(key)
    h1024 = jax.random.normal(kh, (batch, CFG.hidden), jnp.float32)
    code0 = jax.random.randint(kc, (batch,), 0, 90, jnp.int32)

    ref = predictor.frame_codes(params, CFG, assets, h1024, code0)
    got = fused_predictor.frame_codes_fused(
        params, CFG, ptab[0], ptab[1], h1024, code0, interpret=True)
    assert got.shape == (batch, 16)
    assert jnp.array_equal(ref, got), (ref, got)


def test_fused_matches_xla_gqa():
    params, assets, ptab, key = _setup(CFG_GQA, seed=3)
    kh, kc = jax.random.split(key)
    h1024 = jax.random.normal(kh, (2, CFG_GQA.hidden), jnp.float32)
    code0 = jnp.array([5, 17], jnp.int32)

    ref = predictor.frame_codes(params, CFG_GQA, assets, h1024, code0)
    got = fused_predictor.frame_codes_fused(
        params, CFG_GQA, ptab[0], ptab[1], h1024, code0, interpret=True)
    assert jnp.array_equal(ref, got)


def test_fused_matches_xla_quantized():
    params, assets, ptab, key = _setup(CFG, seed=1)
    params_q = quant.quantize_decoder_params(params)
    kh, kc = jax.random.split(key)
    h1024 = jax.random.normal(kh, (2, CFG.hidden), jnp.float32)
    code0 = jnp.array([3, 70], jnp.int32)

    ref = predictor.frame_codes(params_q, CFG, assets, h1024, code0)
    got = fused_predictor.frame_codes_fused(
        params_q, CFG, ptab[0], ptab[1], h1024, code0, interpret=True)
    assert jnp.array_equal(ref, got)


def test_fused_matches_xla_bf16_quantized():
    """Production config class (bf16 + int8): the head logits must round
    through cfg.dtype exactly like quant.linear does on the XLA path, or
    greedy argmax diverges on near-tie logits (ADVICE r1, medium)."""
    cfg = PredictorConfig(
        hidden=32, n_layers=2, n_q_heads=2, n_kv_heads=2, head_dim=16,
        ffn_dim=64, max_seq=32, mrope_sections=(8, 0, 0, 0),
        dtype="bfloat16",
    )
    params, assets, ptab, key = _setup(cfg, seed=4)
    params_q = quant.quantize_decoder_params(params)
    kh, kc = jax.random.split(key)
    h1024 = jax.random.normal(kh, (2, cfg.hidden), jnp.float32)
    code0 = jnp.array([8, 41], jnp.int32)

    ref = predictor.frame_codes(params_q, cfg, assets, h1024, code0)
    got = fused_predictor.frame_codes_fused(
        params_q, cfg, ptab[0], ptab[1], h1024, code0, interpret=True)
    assert jnp.array_equal(ref, got), (ref, got)


def test_fused_matches_xla_int4():
    """Grouped-int4 weights (Q4_K-class): the kernel's panel dequant must
    reproduce quant.dequant4_dt bit-for-bit, so greedy codes match the XLA
    int4 path (quant.qmatmul4) exactly on f32 configs. Geometry needs
    K % (2*GROUP4) == 0 for every matmul, hence the 256-wide config."""
    cfg = PredictorConfig(
        hidden=256, n_layers=2, n_q_heads=2, n_kv_heads=2, head_dim=128,
        ffn_dim=256, max_seq=32, mrope_sections=(64, 0, 0, 0),
        dtype="float32",
    )
    params, assets, ptab, key = _setup(cfg, seed=5)
    params_q = quant.quantize_decoder_params(params, kind="int4")
    kh, kc = jax.random.split(key)
    h1024 = jax.random.normal(kh, (2, cfg.hidden), jnp.float32)
    code0 = jnp.array([3, 70], jnp.int32)

    ref = predictor.frame_codes(params_q, cfg, assets, h1024, code0)
    got = fused_predictor.frame_codes_fused(
        params_q, cfg, ptab[0], ptab[1], h1024, code0, interpret=True)
    assert jnp.array_equal(ref, got), (ref, got)


def test_fused_oob_code0_uses_bias_row():
    # codec_embedding clamps OOB rows to zeros, so codec_embedding_1024
    # becomes just the projection bias; ptab's padded rows must reproduce it
    params, assets, ptab, key = _setup(CFG, seed=2, codec_rows=96)
    h1024 = jax.random.normal(key, (1, CFG.hidden), jnp.float32)
    code0 = jnp.array([982], jnp.int32)  # OOB for 96-row tables

    ref = predictor.frame_codes(params, CFG, assets, h1024, code0)
    got = fused_predictor.frame_codes_fused(
        params, CFG, ptab[0], ptab[1], h1024, code0, interpret=True)
    assert jnp.array_equal(ref, got)


def test_make_ptab_matches_codec_embedding_1024():
    _, assets, (ptab, rows), _ = _setup(CFG)
    assert rows == 96 and ptab.shape[1] > rows     # padded past real rows
    q = jnp.array([0, 3, 15, 2], jnp.int32)
    c = jnp.array([1, 50, 95, 2000], jnp.int32)    # last one OOB -> bias
    ref = assets.codec_embedding_1024(q, c)
    sel = jnp.where(c < rows, c, ptab.shape[1] - 1)
    got = ptab[q, sel]
    assert jnp.allclose(ref.astype(jnp.float32), got.astype(jnp.float32),
                        atol=1e-6)


def test_gather_matches_streamed():
    """Tile-aligned ptab row gather (aligned GW-row window DMA + one-hot
    row select, the r4 fix for the Mosaic-illegal 1-row slice of VERDICT r3
    #1) vs the row-panel streamed path, and both vs the XLA oracle. Needs
    R % GW == 0: codec_rows=95 pads to exactly 96 rows."""
    import os

    params, assets, (ptab, rows), key = _setup(CFG, seed=11, codec_rows=95)
    assert ptab.shape[1] % fused_predictor.GW == 0, ptab.shape
    kh, kc = jax.random.split(key)
    h1024 = jax.random.normal(kh, (2, CFG.hidden), jnp.float32)
    code0 = jnp.array([3, 90], jnp.int32)

    ref = predictor.frame_codes(params, CFG, assets, h1024, code0)
    got = fused_predictor.frame_codes_fused(
        params, CFG, ptab, rows, h1024, code0, interpret=True)
    assert jnp.array_equal(ref, got), (ref, got)

    os.environ["QWEN3_TTS_NO_PTAB_GATHER"] = "1"
    try:
        jax.clear_caches()      # the flag is read at trace time
        stream = fused_predictor.frame_codes_fused(
            params, CFG, ptab, rows, h1024, code0, interpret=True)
    finally:
        del os.environ["QWEN3_TTS_NO_PTAB_GATHER"]
        jax.clear_caches()
    assert jnp.array_equal(got, stream), (got, stream)


def test_generate_codes_fused_wiring(monkeypatch):
    """generate_codes with fused_rows>0 routes frames through the fused
    kernel (forced eligible + interpret on CPU) and matches the dense path
    exactly on a greedy f32 tiny config."""
    from qwen3_tts_tpu.core.config import tiny_engine_config
    from qwen3_tts_tpu.tts import generate

    ecfg = tiny_engine_config(max_steps=4)
    k1, k2, k3, kp = jax.random.split(jax.random.key(7), 4)
    models = {
        "talker": decoder.init_decoder(k1, ecfg.talker),
        "predictor": decoder.init_decoder(k2, ecfg.predictor),
        "assets": tables.random_assets(
            k3, text_vocab=256, codec_rows=2176,
            dim=ecfg.talker.hidden, proj_dim=ecfg.predictor.hidden),
    }
    prompt = 0.1 * jax.random.normal(kp, (1, 5, ecfg.talker.hidden))
    args = (ecfg.talker, ecfg.predictor, prompt,
            jnp.zeros((1,), jnp.int32), jax.random.key(0), 0.0, 0, 1.0, 4)

    dense_codes, dense_n = generate.generate_codes(models, *args)

    ptab, rows = fused_predictor.make_ptab(models["assets"], ecfg.predictor)
    monkeypatch.setattr(fused_predictor, "usable",
                        lambda cfg, b, p=None: True)
    orig = fused_predictor.frame_codes_fused
    monkeypatch.setattr(
        fused_predictor, "frame_codes_fused",
        lambda *a, **kw: orig(*a, interpret=True, **kw))
    fused_codes, fused_n = generate.generate_codes(
        dict(models, pred_ptab=ptab), *args, fused_rows=rows)

    assert jnp.array_equal(dense_n, fused_n)
    assert jnp.array_equal(dense_codes, fused_codes)


def test_resident_matches_streamed_int8():
    """The VMEM-resident int8 path (weights staged once per frame) must be
    BIT-identical to the panel-streamed int8 path: same panel widths, same
    dot/cast order, only the DMA source differs (fused_predictor.py
    RESIDENT_BUDGET block)."""
    import os

    params, assets, ptab, key = _setup(CFG, seed=7)
    params_q = quant.quantize_decoder_params(params)
    kh, kc = jax.random.split(key)
    h1024 = jax.random.normal(kh, (1, CFG.hidden), jnp.float32)
    code0 = jnp.array([11], jnp.int32)

    assert fused_predictor._resident_bytes(CFG) <= \
        fused_predictor.RESIDENT_BUDGET
    res = fused_predictor.frame_codes_fused(
        params_q, CFG, ptab[0], ptab[1], h1024, code0, interpret=True)

    os.environ["QWEN3_TTS_NO_RESIDENT"] = "1"
    try:
        jax.clear_caches()      # the flag is read at trace time
        stream = fused_predictor.frame_codes_fused(
            params_q, CFG, ptab[0], ptab[1], h1024, code0, interpret=True)
    finally:
        del os.environ["QWEN3_TTS_NO_RESIDENT"]
        jax.clear_caches()
    assert jnp.array_equal(res, stream), (res, stream)


def test_kv_resident_matches_hbm_cache():
    """kv-resident mode (frame cache in VMEM scratch, no per-(step,layer)
    DMA) vs the HBM-cache dance, and both vs the XLA oracle. Needs
    B*nq >= 8, so an 8-head config."""
    import os

    cfg = PredictorConfig(
        hidden=64, n_layers=2, n_q_heads=8, n_kv_heads=8, head_dim=16,
        ffn_dim=128, max_seq=32, mrope_sections=(8, 0, 0, 0),
        dtype="float32",
    )
    params, assets, ptab, key = _setup(cfg, seed=9)
    params_q = quant.quantize_decoder_params(params)
    kh, kc = jax.random.split(key)
    h1024 = jax.random.normal(kh, (1, cfg.hidden), jnp.float32)
    code0 = jnp.array([21], jnp.int32)

    ref = predictor.frame_codes(params_q, cfg, assets, h1024, code0)
    got = fused_predictor.frame_codes_fused(
        params_q, cfg, ptab[0], ptab[1], h1024, code0, interpret=True)
    assert jnp.array_equal(ref, got), (ref, got)

    os.environ["QWEN3_TTS_NO_KV_RES"] = "1"
    try:
        jax.clear_caches()
        hbm = fused_predictor.frame_codes_fused(
            params_q, cfg, ptab[0], ptab[1], h1024, code0, interpret=True)
    finally:
        del os.environ["QWEN3_TTS_NO_KV_RES"]
        jax.clear_caches()
    assert jnp.array_equal(got, hbm), (got, hbm)
