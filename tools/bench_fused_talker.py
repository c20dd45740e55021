#!/usr/bin/env python
"""On-device A/B: fused talker decode-step kernel vs the XLA decoder path.

Production geometry, int8 weights, warm cache. Checks logits agreement and
times both paths. Usage: python tools/bench_fused_talker.py [B ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    batches = [int(a) for a in sys.argv[1:]] or [1, 2]

    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.core.config import EngineConfig
    from qwen3_tts_tpu.models import decoder
    from qwen3_tts_tpu.ops import fused_talker, quant

    tc = EngineConfig().talker
    dt = jnp.dtype(tc.dtype)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    print(f"usable(B=1): {fused_talker.usable(tc, 1)}", file=sys.stderr)

    k = jax.random.split(jax.random.key(0), 3)
    params = quant.quantize_decoder_params(decoder.init_decoder(k[0], tc))
    jax.block_until_ready(params)
    seed_base = (int(time.time()) % 1_000_000) * 100

    PREFILL = 64

    for B in batches:
        cache = decoder.init_kv_cache(tc, B)
        pad = jnp.zeros((B,), jnp.int32)
        kp = jax.random.key(seed_base + B)
        x = 0.05 * jax.random.normal(kp, (B, PREFILL, tc.hidden)).astype(dt)
        pos = jnp.broadcast_to(
            jnp.arange(PREFILL, dtype=jnp.int32)[None], (B, PREFILL))
        prefill = jax.jit(lambda p, x, c: decoder.forward(
            p, tc, x, pos, c, jnp.int32(0), kv_valid_from=pad))
        _, _, cache = jax.block_until_ready(prefill(params, x, cache))
        fb = 0.05 * jax.random.normal(
            jax.random.key(seed_base + B + 1), (B, tc.hidden)).astype(dt)

        def xla_body(w, fb, slot, cache):
            positions = (slot - pad)[:, None]
            h, lg, cache = decoder.forward(
                w, tc, fb[:, None], positions, cache,
                jnp.broadcast_to(slot, (B,)), kv_valid_from=pad)
            return h[:, -1], lg[:, -1], cache

        def fused_body(w, fb, slot, cache):
            slot_b = jnp.broadcast_to(slot, (B,))
            h, lg, kc, vc = fused_talker.talker_step_fused(
                w, tc, fb, slot_b - pad, slot, slot_b, pad,
                cache["k"], cache["v"])
            return h, lg, {"k": kc, "v": vc}

        # single-step agreement
        s0 = jnp.int32(PREFILL)
        rh, rl, _ = jax.block_until_ready(
            jax.jit(xla_body)(params, fb, s0, cache))
        t0 = time.perf_counter()
        fh, fl, _ = jax.block_until_ready(
            jax.jit(fused_body)(params, fb, s0, cache))
        print(f"[B={B}] fused compile {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        am = int(jnp.sum(jnp.argmax(rl, -1) == jnp.argmax(fl, -1)))
        print(f"[B={B}] argmax agreement {am}/{B}; "
              f"max|dlogits| {float(jnp.abs(rl-fl).max()):.4g}; "
              f"max|dh| {float(jnp.abs(rh.astype(jnp.float32)-fh.astype(jnp.float32)).max()):.4g}",
              file=sys.stderr)

        def chain(body, n):
            @jax.jit
            def run(w, fb, cache, slot0):
                def one(carry, _):
                    fb, cache, slot = carry
                    h, lg, cache = body(w, fb, slot, cache)
                    fb2 = (0.99 * fb.astype(jnp.float32)
                           + 0.01 * h.astype(jnp.float32)).astype(dt)
                    return (fb2, cache, slot + 1), lg[:, 0]
                (_, cache, _), outs = jax.lax.scan(
                    one, (fb, cache, slot0), None, length=n)
                return outs, cache

            return run

        N = 32
        for name, body in (("xla", xla_body), ("fused", fused_body)):
            fn = chain(body, N)
            t0 = time.perf_counter()
            try:
                jax.block_until_ready(fn(params, fb, cache, s0))
            except Exception as e:
                print(f"[B={B}] {name} chain failed: {str(e)[:200]}",
                      file=sys.stderr)
                continue
            print(f"[B={B}] {name} chain compile+warm "
                  f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
            times = []
            for i in range(4):
                f2 = fb + 1e-3 * (i + 1)
                t0 = time.perf_counter()
                jax.block_until_ready(fn(params, f2, cache, s0))
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            print(f"[B={B}] {name}: {[round(t*1e3,1) for t in times]} ms "
                  f"/{N} -> {med*1e3/N:.2f} ms/step", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
