#!/usr/bin/env python
"""Benchmark: single-stream RTF on real TPU hardware.

Times the FUSED generation path — one `lax.while_loop` program that runs the
whole utterance (talker step + 16-code predictor expansion per frame) in a
single dispatch — plus one fused vocoder decode, on the full-size flagship
config with seeded random bf16 weights (reference weights are not
redistributable in this container; FLOP/byte volumes and code paths are
identical — only argmax values differ).

Headline config is mixed: talker grouped int4 (Q4_K-class, ops/quant.py —
streaming 0.7 GB instead of 1.4 GB of weights per step is the talker's HBM
bound) + predictor int8 VMEM-resident (ops/fused_predictor.py: the whole
109 MB layer stack staged into VMEM once per frame, so the 16 sequential
micro-steps stop re-streaming 1.7 GB/frame — residency beats int4's
byte-halving AND avoids its VPU nibble-unpack). int8 falls back if the
mixed path fails; both are reported, with a greedy codes-divergence A/B
across bf16/int8/headline (stderr) quantifying the quant ladder.

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

    def measure_gen(mdl, tag, seed_off=0, rows=0, temperature=0.7):
        def gen(seed):
            return generate.generate_codes(
                mdl, cfg.talker, cfg.predictor, prompt, pad,
                jax.random.key(seed), temperature, 40, 0.9, N_STEPS,
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

    def measure_first_chunk(mdl, rows, seed_off=90):
        """Wall-clock submit -> first 333 ms audio chunk on host (warm
        programs, cold per-request state): prefill + 4 frames + 4-frame
        vocode. Replaces the 4*(frame+voc) estimate (VERDICT r2 #4)."""
        prefill_fn, step_fn = generate.make_stream_fns(
            cfg.talker, cfg.predictor, 40, frames_per_call=4,
            fused_rows=rows)

        def first_chunk(seed):
            st = prefill_fn(mdl, prompt, pad, jax.random.key(seed),
                            0.7, 0.9)
            st, codes, active = step_fn(mdl, st)
            wav, _, _ = vocoder.decode(
                voc_params, cfg.vocoder, codes[:, :4],
                vocoder.init_state(cfg.vocoder, 1), False)
            return jax.device_get(wav)     # host fetch: audio is deliverable

        for i in (0, 1):                   # compile + warm all three programs
            first_chunk(seed_base + seed_off + i)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            first_chunk(seed_base + seed_off + 2 + i)
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(f"first-chunk: {[round(t*1e3,1) for t in times]} ms "
              f"-> median {med*1e3:.1f} ms", file=sys.stderr)
        return med * 1e3

    # fused predictor kernel (ops/fused_predictor.py): whole frame expansion
    # in one pallas_call; eligibility re-checked inside generate._predict_codes
    from qwen3_tts_tpu.ops import fused_predictor
    ptab_rows = 0
    if fused_predictor.usable(cfg.predictor, 1):
        ptab, ptab_rows = fused_predictor.make_ptab(models["assets"],
                                                    cfg.predictor)
        models["pred_ptab"] = ptab

    # Headline config, measured FIRST so a relay straggler late in the run
    # cannot cost the JSON line: talker int4 (grouped Q4_K-class, Pallas
    # fused dequant-matmul — its 0.7 GB/step weight reads are the HBM
    # bound) + predictor int8 VMEM-RESIDENT (ops/fused_predictor.py
    # RESIDENT_BUDGET: the whole 109 MB layer stack staged on-chip once per
    # frame, so the 16 sequential micro-steps stop re-streaming weights;
    # int8 beats int4 here because residency removes the HBM re-reads that
    # int4's nibble-packing was halving, without int4's VPU unpack cost).
    headline = "int4+int8res"
    try:
        models_q = {
            "talker": quant.quantize_decoder_params(models["talker"],
                                                    kind="int4"),
            "predictor": quant.quantize_decoder_params(models["predictor"],
                                                       kind="int8"),
            "assets": models["assets"],
        }
        if ptab_rows:
            models_q["pred_ptab"] = models["pred_ptab"]
        jax.block_until_ready(models_q)
        frame_ms, codes = measure_gen(models_q, headline, rows=ptab_rows)
    except Exception as e:                  # pragma: no cover - HW fallback
        print(f"{headline} path failed ({e}); falling back to int8",
              file=sys.stderr)
        headline = "int8"
        models_q = {
            "talker": quant.quantize_decoder_params(models["talker"]),
            "predictor": quant.quantize_decoder_params(models["predictor"]),
            "assets": models["assets"],
        }
        if ptab_rows:
            models_q["pred_ptab"] = models["pred_ptab"]
        jax.block_until_ready(models_q)
        frame_ms, codes = measure_gen(models_q, "int8", rows=ptab_rows)

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

    # measured first-chunk latency (prefill + 4 frames + vocode, wall clock)
    try:
        first_chunk_ms = measure_first_chunk(models_q, ptab_rows)
        first_chunk_kind = "measured"
    except Exception as e:                  # pragma: no cover - HW fallback
        print(f"first-chunk measurement failed ({e}); estimating",
              file=sys.stderr)
        first_chunk_ms = 4 * (frame_ms + voc_frame_ms)
        first_chunk_kind = "estimated"

    frame_audio_s = P.FRAME_SAMPLES / P.SAMPLE_RATE      # 1/12 s
    rtf = (frame_ms + voc_frame_ms) / 1e3 / frame_audio_s
    audio_per_s = 1.0 / rtf

    print(f"RTF/stream: {rtf:.4f}  (audio-s/s/chip: {audio_per_s:.2f}; "
          f"first-chunk: {first_chunk_ms:.0f} ms)", file=sys.stderr)

    print(json.dumps({
        "metric": "rtf_per_stream",
        "value": round(rtf, 4),
        "unit": "s_compute/s_audio",
        "vs_baseline": round(0.553 / rtf, 2),
        "detail": {
            "quant": headline,
            f"frame_ms_{headline}": round(frame_ms, 3),
            "vocoder_frame_ms": round(voc_frame_ms, 3),
            "first_chunk_ms": round(first_chunk_ms, 1),
            "first_chunk_kind": first_chunk_kind,
            "audio_seconds_per_s_per_chip": round(audio_per_s, 2),
            "n_steps": N_STEPS,
            "device": str(dev),
        },
    }), flush=True)

    # --- supplementary (stderr): batch-8 throughput (fused int4), int8 /
    # bf16 single-stream, and the greedy codes-divergence quant ladder ---
    try:
        B_TP = 8
        frame_ms_b8 = measure_gen_batch(models_q, B_TP, f"batch8-{headline}",
                                        rows=ptab_rows)
        throughput_b8 = (B_TP * frame_audio_s
                         / ((frame_ms_b8 + voc_frame_ms) / 1e3))
        print(f"batch8 throughput: {throughput_b8:.2f} audio-s/s/chip",
              file=sys.stderr)
    except Exception as e:   # supplementary metrics must never fail the run
        print(f"batch8 bench skipped: {e}", file=sys.stderr)

    try:
        # greedy codes ladder: same prompt, temperature 0 (reuses the
        # compiled programs — temperature is a traced argument)
        def greedy_codes(mdl, rows):
            c, n = generate.generate_codes(
                mdl, cfg.talker, cfg.predictor, prompt, pad,
                jax.random.key(seed_base + 70), 0.0, 40, 0.9, N_STEPS,
                fused_rows=rows)
            return jax.device_get(c[0]), int(jax.device_get(n)[0])

        c4, n4 = greedy_codes(models_q, ptab_rows)

        models_q8 = {
            "talker": quant.quantize_decoder_params(models["talker"]),
            "predictor": quant.quantize_decoder_params(models["predictor"]),
            "assets": models["assets"],
        }
        if ptab_rows:
            models_q8["pred_ptab"] = models["pred_ptab"]
        jax.block_until_ready(models_q8)
        frame_ms_q8, _ = measure_gen(models_q8, "int8", seed_off=20,
                                     rows=ptab_rows)
        c8, n8 = greedy_codes(models_q8, ptab_rows)
        del models_q8

        cb, nb = greedy_codes(models, ptab_rows)

        def diverge(a, na, b, nbf, tag):
            n = min(na, nbf, N_STEPS)
            if n == 0:
                print(f"codes-divergence {tag}: no frames", file=sys.stderr)
                return
            import numpy as np
            frames_differ = float(
                np.mean(np.any(a[:n] != b[:n], axis=-1)))
            first = int(np.argmax(np.any(a[:n] != b[:n], axis=-1))) \
                if frames_differ > 0 else -1
            print(f"codes-divergence {tag}: frames_differ_frac="
                  f"{frames_differ:.3f} first_diff_frame="
                  f"{first if frames_differ else 'none'} "
                  f"(n={n}, n_frames a={na} b={nbf}); free-running greedy — "
                  f"one near-tie flip desynchronises the rest of the "
                  f"sequence, so this upper-bounds per-step disagreement",
                  file=sys.stderr)

        diverge(c8, n8, cb, nb, "int8-vs-bf16")
        diverge(c4, n4, cb, nb, f"{headline}-vs-bf16")
        diverge(c4, n4, c8, n8, f"{headline}-vs-int8")

        frame_ms_bf16, _ = measure_gen(models, "bf16", seed_off=30,
                                       rows=ptab_rows)
        print(f"single-stream frame ms: {headline}={frame_ms:.2f} "
              f"int8={frame_ms_q8:.2f} bf16={frame_ms_bf16:.2f}",
              file=sys.stderr)
    except Exception as e:   # supplementary metrics must never fail the run
        print(f"supplementary bench skipped: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
