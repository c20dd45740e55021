#!/usr/bin/env python
"""Per-kernel quant-kind timing: fused talker step + fused predictor frame,
int8 vs int4, B=1 (+ optional batches). Separates which kernel loses the
int4 byte advantage to dequant compute.  Usage: bench_quant_kinds.py [B...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def med(ts):
    return sorted(ts)[len(ts) // 2]


def main() -> int:
    batches = [int(a) for a in sys.argv[1:]] or [1]

    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.core.config import EngineConfig
    from qwen3_tts_tpu.models import decoder, predictor
    from qwen3_tts_tpu.assets import tables
    from qwen3_tts_tpu.ops import fused_predictor, fused_talker, quant

    cfg = EngineConfig()
    tc, pc = cfg.talker, cfg.predictor
    dt = jnp.dtype(tc.dtype)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    k = jax.random.split(jax.random.key(0), 3)
    base_t = decoder.init_decoder(k[0], tc)
    base_p = decoder.init_decoder(k[1], pc)
    assets = tables.random_assets(k[2], text_vocab=256, codec_rows=3072,
                                  dim=tc.hidden, proj_dim=pc.hidden)
    ptab, rows = fused_predictor.make_ptab(assets, pc)
    jax.block_until_ready((base_t, base_p, ptab))
    seed_base = (int(time.time()) % 1_000_000) * 100
    PREFILL, REPS, STEPS = 64, 3, 20

    for kind in ("int8", "int4"):
        pt = quant.quantize_decoder_params(base_t, kind=kind)
        pp = quant.quantize_decoder_params(base_p, kind=kind)
        jax.block_until_ready((pt, pp))

        for B in batches:
            if not fused_talker.usable(tc, B, pt):
                print(f"talker {kind} B={B}: not usable")
                continue
            pad = jnp.zeros((B,), jnp.int32)
            cache = decoder.init_kv_cache(tc, B)
            x = 0.05 * jax.random.normal(
                jax.random.key(seed_base), (B, PREFILL, tc.hidden)).astype(dt)
            pos = jnp.broadcast_to(
                jnp.arange(PREFILL, dtype=jnp.int32)[None], (B, PREFILL))
            _, _, cache = jax.block_until_ready(jax.jit(
                lambda p, x, c: decoder.forward(
                    p, tc, x, pos, c, jnp.int32(0), kv_valid_from=pad)
            )(pt, x, cache))

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

            fb = 0.05 * jax.random.normal(
                jax.random.key(seed_base + 1), (B, tc.hidden)).astype(dt)
            jax.block_until_ready(steps(pt, fb, cache, jnp.int32(PREFILL)))
            ts = []
            for r in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(
                    steps(pt, fb, cache, jnp.int32(PREFILL + r + 1)))
                ts.append((time.perf_counter() - t0) / STEPS)
            print(f"talker    {kind} B={B}: {med(ts)*1e3:7.3f} ms/step "
                  f"({[round(t*1e3,3) for t in ts]})", flush=True)

        if fused_predictor.usable(pc, 1, pp):
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
            print(f"predictor {kind} B=1: {med(ts)*1e3:7.3f} ms/frame "
                  f"({[round(t*1e3,3) for t in ts]})", flush=True)
        else:
            print(f"predictor {kind}: not usable")
    return 0


if __name__ == "__main__":
    sys.exit(main())
