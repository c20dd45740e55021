#!/usr/bin/env python
"""Multi-host weak-scaling harness: audio-s/s at 1 vs 2 processes.

Measures the BASELINE north-star metric (>=90% audio-seconds/s scaling
1 -> 2 hosts) on the exact sharding the pod deployment uses:

  * data axis ACROSS processes  — utterance DP; the only cross-host
    traffic is the collective-free per-utterance work, so on a real pod
    this axis rides DCN and carries (almost) nothing;
  * model axis WITHIN a process — talker TP; its psum/all-gather
    collectives stay on ICI (intra-host), never crossing DCN.

Each process holds 4 devices (virtual CPU here; one v5e host's chips on a
pod — swap the env for real hardware and the same script is the pod
harness). Weak scaling: per-host batch and per-host devices are constant,
so ideal scaling is equal wall time and efficiency = T1 / T2.

Run:  python tools/multihost_scaling.py [--steps 8] [--reps 3]
      -> one JSON line {"throughput_1p":..., "throughput_2p":...,
                        "scaling_efficiency":...}

Reading the CPU number: the generation while_loop carries one tiny global
reduction per frame (the all-rows-EOS termination check), which costs ~µs
on ICI/DCN but ~ms through Gloo-over-localhost — so the CPU-mesh
efficiency (~0.1 here) measures the ANALOG's collective latency, not the
design's. What the harness proves now: the sharded program compiles, runs,
and produces identical audio at 1 and 2 processes; what it measures on a
pod: the real >=90% target. tests/test_multihost.py asserts the harness
contract (fields present, throughput > 0), not a CPU efficiency bar.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PER_HOST_BATCH = 4
PER_HOST_DEVICES = 4
FRAME_S = 1.0 / 12.0


def worker(rank: int, nprocs: int, port: int, steps: int, reps: int,
           out_path: str) -> int:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={PER_HOST_DEVICES}")
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from qwen3_tts_tpu.parallel import mesh as mesh_lib
    from qwen3_tts_tpu.parallel import run as prun

    if nprocs > 1:
        mesh_lib.initialize_multihost(
            coordinator=f"127.0.0.1:{port}", num_processes=nprocs,
            process_id=rank)
    mesh = mesh_lib.make_mesh(nprocs, PER_HOST_DEVICES)
    cfg = prun.parallel_test_config(max_steps=steps)
    models, voc = prun.build_sharded_models(mesh, cfg, seed=0)
    batch = PER_HOST_BATCH * nprocs

    def step(seed):
        wav, n_frames = prun.sharded_generate_step(
            mesh, cfg, models, voc, batch=batch, prompt_len=16,
            max_steps=steps, seed=seed)
        return jax.block_until_ready((wav, n_frames))

    step(0)                                    # compile + warm
    if nprocs > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("scaling-warm")
    times, frames = [], 0
    for r in range(reps):
        t0 = time.perf_counter()
        _, n_frames = step(r + 1)
        times.append(time.perf_counter() - t0)
        frames += int(jax.numpy.sum(n_frames))
    med = sorted(times)[len(times) // 2]
    audio_s = (frames / reps) * FRAME_S
    if rank == 0:
        with open(out_path, "w") as f:
            json.dump({"nprocs": nprocs, "median_s": med,
                       "audio_s_per_call": audio_s,
                       "throughput": audio_s / med}, f)
    return 0


def run_config(nprocs: int, port: int, steps: int, reps: int) -> dict:
    out = tempfile.mktemp(suffix=".json")
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--rank", str(r),
             "--nprocs", str(nprocs), "--port", str(port),
             "--steps", str(steps), "--reps", str(reps), "--out", out],
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        for r in range(nprocs)
    ]
    rc = 0
    for p in procs:
        rc |= p.wait()
    if rc != 0:
        raise RuntimeError(f"{nprocs}-process run failed (rc {rc})")
    with open(out) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=None)
    ap.add_argument("--port", type=int, default=29431)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.rank is not None:
        return worker(args.rank, args.nprocs, args.port, args.steps,
                      args.reps, args.out)

    r1 = run_config(1, args.port, args.steps, args.reps)
    r2 = run_config(2, args.port + 1, args.steps, args.reps)
    # weak scaling: per-host work is constant, so efficiency
    #   = throughput_2p / (2 * throughput_1p) = T1 / T2 at equal audio/host
    eff = r2["throughput"] / (2.0 * r1["throughput"])
    print(json.dumps({
        "throughput_1p_audio_s_per_s": round(r1["throughput"], 3),
        "throughput_2p_audio_s_per_s": round(r2["throughput"], 3),
        "scaling_efficiency": round(eff, 3),
        "median_s_1p": round(r1["median_s"], 3),
        "median_s_2p": round(r2["median_s"], 3),
        "note": "2 Gloo CPU processes x 4 virtual devices; DP across "
                "processes (DCN analog), TP within (ICI analog). Same "
                "harness drives a real pod slice.",
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
