#!/usr/bin/env python
"""On-device A/B of the flash-decode kernel inside the FULL generation loop.

Usage:  python tools/bench_flash.py [batch ...]
Flash is default-on on TPU; set QWEN3_TTS_NO_FLASH=1 for the dense baseline
(the flag is read at trace time, so each configuration must run in its own
process).

Prints ms/frame-step medians per batch size to stderr and one JSON summary
line to stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


N_STEPS = 64


def main() -> int:
    batches = [int(a) for a in sys.argv[1:]] or [1, 8]

    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.core import protocol as P
    from qwen3_tts_tpu.core.config import EngineConfig
    from qwen3_tts_tpu.models import decoder
    from qwen3_tts_tpu.assets import tables
    from qwen3_tts_tpu.tts import generate
    from qwen3_tts_tpu.ops import quant, flash_decode

    cfg0 = EngineConfig()
    flash = flash_decode.usable(cfg0.talker)
    dev = jax.devices()[0]
    print(f"device: {dev}  flash={flash}", file=sys.stderr)

    cfg = cfg0
    k = jax.random.split(jax.random.key(0), 4)
    models = {
        "talker": decoder.init_decoder(k[0], cfg.talker),
        "predictor": decoder.init_decoder(k[1], cfg.predictor),
        "assets": tables.random_assets(
            k[2], text_vocab=P.TEXT_VOCAB, codec_rows=3072,
            dim=cfg.talker.hidden, proj_dim=cfg.predictor.hidden,
        ),
    }
    models_q = {
        "talker": quant.quantize_decoder_params(models["talker"]),
        "predictor": quant.quantize_decoder_params(models["predictor"]),
        "assets": models["assets"],
    }
    jax.block_until_ready(models_q)

    seed_base = (int(time.time()) % 1_000_000) * 100
    S = 64
    results = {}

    for bi, B in enumerate(batches):
        prompt = 0.1 * jax.random.normal(
            jax.random.key(9), (B, S, cfg.talker.hidden), jnp.bfloat16)
        pad = jnp.zeros((B,), jnp.int32)

        def gen(seed):
            return generate.generate_codes(
                models_q, cfg.talker, cfg.predictor, prompt, pad,
                jax.random.key(seed), 0.7, 40, 0.9, N_STEPS)

        off = seed_base + 100 * bi
        t0 = time.perf_counter()
        for i in (0, 1):
            jax.block_until_ready(gen(off + i))
        print(f"[B={B}] compile+warmup {time.perf_counter()-t0:.1f} s",
              file=sys.stderr)
        samples = []
        for i in range(4):
            t0 = time.perf_counter()
            codes, n_frames = gen(off + 2 + i)
            n = int(jax.device_get(jnp.max(n_frames)))
            samples.append((time.perf_counter() - t0, max(n, 1)))
        med_t, med_n = sorted(samples)[len(samples) // 2]
        fms = 1e3 * med_t / med_n
        print(f"[B={B}] {[(round(t, 3), n) for t, n in samples]} "
              f"-> median {fms:.2f} ms/frame-step", file=sys.stderr)
        results[f"b{B}_frame_ms"] = round(fms, 3)

    print(json.dumps({"flash": flash, **results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
