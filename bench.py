#!/usr/bin/env python
"""Benchmark: single-stream RTF on real TPU hardware.

Times the FUSED generation path — one `lax.while_loop` program that runs the
whole utterance (talker step + 16-code predictor expansion per frame) in a
single dispatch — plus one fused vocoder decode, on the full-size flagship
config with seeded random bf16 weights (reference weights are not
redistributable in this container; FLOP/byte volumes and code paths are
identical — only argmax values differ).

Methodology note: this environment reaches the TPU through a relay tunnel
where (a) repeated dispatch of an identical computation can return without
re-executing and (b) per-dispatch host round-trips cost seconds. Both are
artifacts of the tunnel, not of the framework. We therefore time single
dispatches of fused multi-frame programs with fresh PRNG keys per call and
normalise by the frame count actually generated.

Prints ONE JSON line:
  {"metric": "rtf_per_stream", "value": N, "unit": "s_compute/s_audio",
   "vs_baseline": N}
vs_baseline = 0.553 / value (x-times faster than the reference's best CUDA
RTF on an RTX 2080 Ti, BASELINE.md).
"""

import json
import sys
import time


N_STEPS = 64          # frames per timed generation (~5.3 s of audio)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.core import protocol as P
    from qwen3_tts_tpu.core.config import EngineConfig
    from qwen3_tts_tpu.models import decoder, vocoder
    from qwen3_tts_tpu.assets import tables
    from qwen3_tts_tpu.tts import generate

    from qwen3_tts_tpu.ops import quant

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    cfg = EngineConfig()
    k = jax.random.split(jax.random.key(0), 4)
    models = {
        "talker": decoder.init_decoder(k[0], cfg.talker),
        "predictor": decoder.init_decoder(k[1], cfg.predictor),
        "assets": tables.random_assets(
            k[2], text_vocab=P.TEXT_VOCAB, codec_rows=3072,
            dim=cfg.talker.hidden, proj_dim=cfg.predictor.hidden,
        ),
    }
    voc_params = vocoder.init_vocoder(k[3], cfg.vocoder)
    jax.block_until_ready(models)

    B, S = 1, 64
    prompt = 0.1 * jax.random.normal(
        jax.random.key(9), (B, S, cfg.talker.hidden), jnp.bfloat16)
    pad = jnp.zeros((B,), jnp.int32)

    # every seed is process-unique: the relay can serve repeated identical
    # computations from cache WITHOUT touching the chip, which would push the
    # real chip-claim stall into the first timed call instead of the warmup
    seed_base = (int(time.time()) % 1_000_000) * 100

    def measure_gen(mdl, tag, seed_off=0, rows=0):
        def gen(seed):
            return generate.generate_codes(
                mdl, cfg.talker, cfg.predictor, prompt, pad,
                jax.random.key(seed), 0.7, 40, 0.9, N_STEPS,
                fused_rows=rows)

        # warmup / compile (two rounds: remote compile can finish lazily, so
        # the first post-compile dispatch may still absorb straggler work)
        t0 = time.perf_counter()
        for i in (0, 1):
            out = gen(seed_base + seed_off + i)
            jax.block_until_ready(out)
        print(f"[{tag}] compile+warmup: {time.perf_counter()-t0:.1f} s",
              file=sys.stderr)
        seeds = [seed_base + seed_off + 2 + i for i in range(4)]
        # timed: fresh keys per dispatch (defeats relay-level dedup); median
        # rejects stragglers
        samples = []
        codes = None
        for seed in seeds:
            t0 = time.perf_counter()
            codes, n_frames = gen(seed)
            n = int(jax.device_get(n_frames)[0])   # host fetch = hard sync
            samples.append((time.perf_counter() - t0, max(n, 1)))
        med_t, med_n = sorted(samples)[len(samples) // 2]
        fms = 1e3 * med_t / med_n
        print(f"[{tag}] {[(round(t,3), n) for t, n in samples]} "
              f"-> median {fms:.2f} ms/frame", file=sys.stderr)
        return fms, codes

    def measure_gen_batch(mdl, batch, tag, seed_off=50, rows=0):
        prompt_b = 0.1 * jax.random.normal(
            jax.random.key(9), (batch, S, cfg.talker.hidden), jnp.bfloat16)
        pad_b = jnp.zeros((batch,), jnp.int32)

        def gen(seed):
            return generate.generate_codes(
                mdl, cfg.talker, cfg.predictor, prompt_b, pad_b,
                jax.random.key(seed), 0.7, 40, 0.9, N_STEPS,
                fused_rows=rows)

        for i in (0, 1):
            jax.block_until_ready(gen(seed_base + seed_off + i))
        seeds = [seed_base + seed_off + 2 + i for i in range(3)]
        samples = []
        for seed in seeds:
            t0 = time.perf_counter()
            codes, n_frames = gen(seed)
            n = int(jax.device_get(jnp.max(n_frames)))
            samples.append((time.perf_counter() - t0, max(n, 1)))
        med_t, med_n = sorted(samples)[len(samples) // 2]
        fms = 1e3 * med_t / med_n
        print(f"[{tag}] {[(round(t,3), n) for t, n in samples]} "
              f"-> median {fms:.2f} ms/frame-step ({batch} streams)",
              file=sys.stderr)
        return fms

    # int8 FIRST (per-channel scales, Pallas fused dequant-matmul): the
    # production serving config and the headline number — measured before
    # everything else so a relay straggler late in the run cannot cost the
    # JSON line.
    models_q = {
        "talker": quant.quantize_decoder_params(models["talker"]),
        "predictor": quant.quantize_decoder_params(models["predictor"]),
        "assets": models["assets"],
    }
    # fused predictor kernel (ops/fused_predictor.py): whole frame expansion
    # in one pallas_call; eligibility re-checked inside generate._predict_codes
    from qwen3_tts_tpu.ops import fused_predictor
    ptab_rows = 0
    if fused_predictor.usable(cfg.predictor, 1):
        ptab, ptab_rows = fused_predictor.make_ptab(models["assets"],
                                                    cfg.predictor)
        for m in (models, models_q):
            m["pred_ptab"] = ptab
    jax.block_until_ready(models_q)
    frame_ms_int8, codes = measure_gen(models_q, "int8", rows=ptab_rows)
    frame_ms = frame_ms_int8

    # vocoder: fused decode of the full code matrix, fresh codes per call
    for seed in (seed_base + 80, seed_base + 81):   # compile + warmup
        rnd = jax.random.randint(jax.random.key(seed),
                                 (B, N_STEPS, 16), 0, 2048, jnp.int32)
        wav, _, _ = vocoder.decode(voc_params, cfg.vocoder, rnd,
                                   vocoder.init_state(cfg.vocoder, B), True)
        jax.block_until_ready(wav)
    voc_times = []
    for seed in (seed_base + 82, seed_base + 83, seed_base + 84):
        rnd = jax.random.randint(jax.random.key(seed),
                                 (B, N_STEPS, 16), 0, 2048, jnp.int32)
        t0 = time.perf_counter()
        wav, _, _ = vocoder.decode(voc_params, cfg.vocoder, rnd,
                                   vocoder.init_state(cfg.vocoder, B), True)
        _ = float(jax.device_get(jnp.sum(wav)))   # hard sync
        voc_times.append(time.perf_counter() - t0)
    voc_frame_ms = 1e3 * sorted(voc_times)[len(voc_times) // 2] / N_STEPS
    print(f"vocoder: {[round(t,3) for t in voc_times]} s "
          f"-> median {voc_frame_ms:.2f} ms/frame", file=sys.stderr)

    frame_audio_s = P.FRAME_SAMPLES / P.SAMPLE_RATE      # 1/12 s
    rtf = (frame_ms + voc_frame_ms) / 1e3 / frame_audio_s
    audio_per_s = 1.0 / rtf
    # first chunk = prefill(amortised in while_loop) + 4 frames + 4-frame vocode
    first_chunk_ms = 4 * (frame_ms + voc_frame_ms)

    print(f"RTF/stream: {rtf:.4f}  (audio-s/s/chip: {audio_per_s:.2f}; "
          f"first-chunk est: {first_chunk_ms:.0f} ms)", file=sys.stderr)

    print(json.dumps({
        "metric": "rtf_per_stream",
        "value": round(rtf, 4),
        "unit": "s_compute/s_audio",
        "vs_baseline": round(0.553 / rtf, 2),
        "detail": {
            "frame_ms_int8": round(frame_ms_int8, 3),
            "vocoder_frame_ms": round(voc_frame_ms, 3),
            "first_chunk_ms_est": round(first_chunk_ms, 1),
            "audio_seconds_per_s_per_chip": round(audio_per_s, 2),
            "n_steps": N_STEPS,
            "device": str(dev),
        },
    }), flush=True)

    # --- supplementary (stderr): bf16 single-stream + batch-8 throughput ---
    try:
        frame_ms_bf16, _ = measure_gen(models, "bf16", seed_off=20,
                                       rows=ptab_rows)
        B_TP = 8
        frame_ms_b8 = measure_gen_batch(models_q, B_TP, "batch8",
                                        rows=ptab_rows)
        throughput_b8 = (B_TP * frame_audio_s
                         / ((frame_ms_b8 + voc_frame_ms) / 1e3))
        print(f"bf16 frame: {frame_ms_bf16:.2f} ms; batch8 throughput: "
              f"{throughput_b8:.2f} audio-s/s/chip", file=sys.stderr)
    except Exception as e:   # supplementary metrics must never fail the run
        print(f"supplementary bench skipped: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
