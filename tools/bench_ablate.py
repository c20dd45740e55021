#!/usr/bin/env python
"""Ablation timing for the fused kernels: attribute step time to stages.

Runs the chosen kernel with each QWEN3_TTS_ABLATE set (results are wrong;
only wall time matters) and prints ms per step/frame. The difference
baseline - ablated(stage) upper-bounds the stage's critical-path cost.

Usage: bench_ablate.py talker|predictor [int8|int4]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ABLATIONS = ["", "mlp", "qkv", "wo", "attn", "head", "qkv,wo,mlp,attn,head"]


def med(ts):
    return sorted(ts)[len(ts) // 2]


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "predictor"
    kind = sys.argv[2] if len(sys.argv) > 2 else "int4"
    global ABLATIONS
    if len(sys.argv) > 3:        # explicit ablation list ("-" = baseline)
        ABLATIONS = [a if a != "-" else "" for a in sys.argv[3].split(";")]

    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.core.config import EngineConfig
    from qwen3_tts_tpu.models import decoder
    from qwen3_tts_tpu.assets import tables
    from qwen3_tts_tpu.ops import fused_predictor, fused_talker, quant

    cfg = EngineConfig()
    tc, pc = cfg.talker, cfg.predictor
    dt = jnp.dtype(tc.dtype)
    print(f"device: {jax.devices()[0]} kernel={which} kind={kind}",
          file=sys.stderr)
    k = jax.random.split(jax.random.key(0), 3)
    seed_base = (int(time.time()) % 1_000_000) * 100
    REPS, STEPS = 3, 20

    if which == "talker":
        pt = quant.quantize_decoder_params(
            decoder.init_decoder(k[0], tc), kind=kind)
        jax.block_until_ready(pt)
        B, PREFILL = 1, 64
        pad = jnp.zeros((B,), jnp.int32)
        cache0 = decoder.init_kv_cache(tc, B)
        x = 0.05 * jax.random.normal(
            jax.random.key(seed_base), (B, PREFILL, tc.hidden)).astype(dt)
        pos = jnp.broadcast_to(
            jnp.arange(PREFILL, dtype=jnp.int32)[None], (B, PREFILL))
        _, _, cache0 = jax.block_until_ready(jax.jit(
            lambda p, x, c: decoder.forward(
                p, tc, x, pos, c, jnp.int32(0), kv_valid_from=pad)
        )(pt, x, cache0))
        fb = 0.05 * jax.random.normal(
            jax.random.key(seed_base + 1), (B, tc.hidden)).astype(dt)

        for ab in ABLATIONS:
            os.environ["QWEN3_TTS_ABLATE"] = ab

            @jax.jit
            def steps(w, fb, cache, s0):
                def body(i, carry):
                    fb, cache = carry
                    slot = s0 + i
                    slot_b = jnp.broadcast_to(slot, (B,))
                    h, lg, kc, vc = fused_talker.talker_step_fused(
                        w, tc, fb, slot_b - pad, slot, slot_b, pad,
                        cache["k"], cache["v"])
                    return (0.999 * fb + 0.001 * h).astype(dt), \
                        {"k": kc, "v": vc}
                return jax.lax.fori_loop(0, STEPS, body, (fb, cache))

            jax.block_until_ready(steps(pt, fb, cache0, jnp.int32(PREFILL)))
            ts = []
            for r in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(
                    steps(pt, fb, cache0, jnp.int32(PREFILL + r + 1)))
                ts.append((time.perf_counter() - t0) / STEPS)
            print(f"talker {kind} ablate={ab or 'none':24s} "
                  f"{med(ts)*1e3:7.3f} ms/step", flush=True)
            jax.clear_caches()   # _clear_cache() does NOT drop the
            # tracing cache for partial-wrapped jits; global clear does
    else:
        pp = quant.quantize_decoder_params(
            decoder.init_decoder(k[1], pc), kind=kind)
        assets = tables.random_assets(k[2], text_vocab=256, codec_rows=3072,
                                      dim=tc.hidden, proj_dim=pc.hidden)
        ptab, rows = fused_predictor.make_ptab(assets, pc)
        jax.block_until_ready((pp, ptab))

        for ab in ABLATIONS:
            os.environ["QWEN3_TTS_ABLATE"] = ab

            @jax.jit
            def frames(w, s0):
                def body(i, acc):
                    h = 0.1 * jax.random.normal(
                        jax.random.fold_in(jax.random.key(0), s0 + i),
                        (1, pc.hidden), jnp.float32)
                    c0 = (acc % 2048).reshape(1)
                    codes = fused_predictor.frame_codes_fused(
                        w, pc, ptab, rows, h, c0)
                    return acc + jnp.sum(codes)
                return jax.lax.fori_loop(0, STEPS, body, jnp.int32(0))

            jax.block_until_ready(frames(pp, jnp.int32(0)))
            ts = []
            for r in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(frames(pp, jnp.int32(r + 1)))
                ts.append((time.perf_counter() - t0) / STEPS)
            print(f"predictor {kind} ablate={ab or 'none':24s} "
                  f"{med(ts)*1e3:7.3f} ms/frame", flush=True)
            jax.clear_caches()
    return 0


if __name__ == "__main__":
    sys.exit(main())
