#!/usr/bin/env python
"""On-device A/B: fused predictor-frame kernel vs the XLA scan path.

Production geometry, int8 weights. Checks code agreement and times both
paths at each batch size.  Usage: python tools/bench_fused_predictor.py [B ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    batches = [int(a) for a in sys.argv[1:]] or [1, 8]

    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.core import protocol as P
    from qwen3_tts_tpu.core.config import EngineConfig
    from qwen3_tts_tpu.models import decoder, predictor
    from qwen3_tts_tpu.assets import tables
    from qwen3_tts_tpu.ops import fused_predictor, quant

    cfg = EngineConfig()
    pc = cfg.predictor
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    k = jax.random.split(jax.random.key(0), 3)
    params = quant.quantize_decoder_params(decoder.init_decoder(k[0], pc))
    assets = tables.random_assets(
        k[1], text_vocab=256, codec_rows=3072,
        dim=cfg.talker.hidden, proj_dim=pc.hidden)
    ptab, rows = fused_predictor.make_ptab(assets, pc)
    jax.block_until_ready((params, ptab))

    seed_base = (int(time.time()) % 1_000_000) * 100

    for B in batches:
        kh = jax.random.key(seed_base + B)
        h1024 = jax.random.normal(kh, (B, pc.hidden), jnp.float32)
        code0 = jax.random.randint(jax.random.key(seed_base + B + 1),
                                   (B,), 0, 2048, jnp.int32)

        xla_jit = jax.jit(
            lambda pr, ast, h, c: predictor.frame_codes(pr, pc, ast, h, c))

        def run_xla_j(h, c):
            return xla_jit(params, assets, h, c)

        def run_fused(h, c):
            # params/ptab flow through frame_codes_fused's own jit as args
            return fused_predictor.frame_codes_fused(
                params, pc, ptab, rows, h, c)

        t0 = time.perf_counter()
        ref = jax.block_until_ready(run_xla_j(h1024, code0))
        print(f"[B={B}] xla compile {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.perf_counter()
        got = jax.block_until_ready(run_fused(h1024, code0))
        print(f"[B={B}] fused compile {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        agree = int(jnp.sum(ref == got))
        print(f"[B={B}] code agreement: {agree}/{ref.size}", file=sys.stderr)

        # chain N frames inside ONE dispatch so the relay round-trip
        # amortises away and we measure the on-device per-frame cost.
        # Weights flow as explicit jit args (closure consts would be inlined
        # into the HLO and blow the relay's request-size limit).
        def chain(body, n):
            @functools.partial(jax.jit, static_argnums=())
            def run(weights, h, c):
                def one(carry, _):
                    h, c = carry
                    codes = body(weights, h, c)
                    c2 = codes[:, 15] & 2047
                    h2 = h + 1e-4 * codes[:, 1].astype(jnp.float32)[:, None]
                    return (h2, c2), codes[:, 0]
                (_, _), outs = jax.lax.scan(one, (h, c), None, length=n)
                return outs

            return lambda h, c: run((params, assets, ptab), h, c)

        plans = (
            ("xla", lambda w, h, c: predictor.frame_codes(
                w[0], pc, w[1], h, c)),
            ("fused", lambda w, h, c: fused_predictor.frame_codes_fused(
                w[0], pc, w[2], rows, h, c)),
        )
        for name, body in plans:
            fn = None
            for n in (32, 8, 2):
                cand = chain(body, n)
                t0 = time.perf_counter()
                try:
                    jax.block_until_ready(cand(h1024, code0))
                except Exception as e:  # relay compile-size limits etc.
                    print(f"[B={B}] {name} chain N={n} failed: "
                          f"{str(e)[:120]}", file=sys.stderr)
                    continue
                print(f"[B={B}] {name} chain N={n} compile+warm "
                      f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
                fn, N = cand, n
                break
            if fn is None:
                continue
            times = []
            for i in range(4):
                h = h1024 + 1e-3 * (i + 1)
                t0 = time.perf_counter()
                jax.block_until_ready(fn(h, code0))
                times.append(time.perf_counter() - t0)
            med = sorted(times)[len(times) // 2]
            print(f"[B={B}] {name}: {[round(t*1e3,1) for t in times]} ms "
                  f"/{N} -> {med*1e3/N:.2f} ms/frame", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
