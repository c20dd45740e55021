#!/usr/bin/env python
"""Repro/verify: the streaming step_fn (scan over frames) compiles on TPU.

BENCH r3 first-chunk measurement failed with a scoped-VMEM OOM (17.45M >
16M) in the fused talker pallas_call ONLY inside the scan-based step_fn —
the while_loop generate_codes program with the identical kernel compiles
fine. Run with QWEN3_TTS_SCOPED_VMEM_KIB unset (default env) to test the
kernel-footprint fix, or set it to test the flag path.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

kib = os.environ.get("QWEN3_TTS_SCOPED_VMEM_KIB")
if kib:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_tpu_scoped_vmem_limit_kib={kib}")

import jax
import jax.numpy as jnp

from qwen3_tts_tpu.core import protocol as P
from qwen3_tts_tpu.core.config import EngineConfig
from qwen3_tts_tpu.models import decoder
from qwen3_tts_tpu.assets import tables
from qwen3_tts_tpu.tts import generate
from qwen3_tts_tpu.ops import fused_predictor, quant


def main() -> int:
    cfg = EngineConfig()
    k = jax.random.split(jax.random.key(0), 4)
    models = {
        "talker": quant.quantize_decoder_params(
            decoder.init_decoder(k[0], cfg.talker), kind="int4"),
        "predictor": quant.quantize_decoder_params(
            decoder.init_decoder(k[1], cfg.predictor), kind="int4"),
        "assets": tables.random_assets(
            k[2], text_vocab=P.TEXT_VOCAB, codec_rows=3072,
            dim=cfg.talker.hidden, proj_dim=cfg.predictor.hidden),
    }
    rows = 0
    if fused_predictor.usable(cfg.predictor, 1):
        ptab, rows = fused_predictor.make_ptab(models["assets"],
                                               cfg.predictor)
        models["pred_ptab"] = ptab
    jax.block_until_ready(models)

    prompt = 0.1 * jax.random.normal(
        jax.random.key(9), (1, 64, cfg.talker.hidden), jnp.bfloat16)
    pad = jnp.zeros((1,), jnp.int32)
    prefill_fn, step_fn = generate.make_stream_fns(
        cfg.talker, cfg.predictor, 40, frames_per_call=4, fused_rows=rows)

    t0 = time.perf_counter()
    st = prefill_fn(models, prompt, pad, jax.random.key(1), 0.7, 0.9)
    st, codes, active = step_fn(models, st)
    jax.block_until_ready(codes)
    print(f"stream step_fn compiled+ran in {time.perf_counter()-t0:.1f}s; "
          f"codes[0,0]={jax.device_get(codes[0, 0]).tolist()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
