"""Fused predictor frame-expansion: ONE Pallas kernel per frame.

The XLA predictor path (models/predictor.py) runs prefill + 15 AR codebook
micro-steps as ~150 XLA ops each; at M=1 the per-op fixed cost (~2 us) adds
up to ~4.5 ms/frame of pure dispatch overhead on top of the ~2 ms of weight
reads that bound the math (docs/ROUND1_STATUS.md). This kernel runs the
ENTIRE frame expansion — 2 prefill tokens + 15 greedy codebook steps x
n_layers — in a single `pallas_call`:

  * weights stay int8/bf16 in HBM and are panel-streamed (<=512 lanes) with
    double buffering; VMEM (~16 MB) never holds more than ~2 panels + the
    per-layer KV slice;
  * the KV cache is frame-local: an ANY-space buffer aliased input->output,
    read/written per (step, layer) with async copies (the cache never
    round-trips to the host and is discarded after the frame);
  * greedy sampling is a row-wise max+iota-min argmax in the VPU;
  * the codebook-embedding gather (`codec_embedding_1024`) is a one-hot
    matmul against pre-projected tables (ptab[q] = project(codec_table[q]),
    bf16), so no scalar extraction is ever needed — exact because the
    one-hot picks bf16 rows with 1.0 weights into an f32 accumulator;
  * the 16x2048 output head is column-sliced per codebook
    (src/tts/engine.rs:587-597), streamed like every other weight.

Numerics match models/predictor.py at every rounding point (bf16 casts after
each linear/norm, f32 softmax/accumulators); the attention matmul runs on
bf16 MXU inputs (same class of deviation as ops/flash_decode.py, ~1e-4).
Reference behavior reproduced: greedy argmax per codebook over logit slice
[(q-1)*2048, q*2048) with offset removed, prefill = [proj(talker_hidden),
codec_emb_1024(0, code_0)] at positions 0,1, feedback embedding
codec_emb_1024(q, code_q) at position q+1 (src/tts/engine.rs:564-611).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..core import protocol
from . import quant as quant_mod

NEG = -1e30
PW = 512          # max weight-panel lanes streamed per DMA
GW = 16           # ptab gather window rows: covers the sublane tiling of
#                   every supported dtype (bf16 packs 16 rows/tile, f32 8) so
#                   an aligned GW-row slice is always Mosaic-legal

# --- VMEM-resident weights -------------------------------------------------
# The predictor's RTF cost is dominated by re-streaming the same layer
# weights for EVERY one of the 16 sequential micro-steps (int8: 8 layers x
# 13 MB x 16 steps ~= 1.7 GB of HBM reads per 83 ms frame; int4 halves the
# bytes but pays a VPU nibble-unpack pass per use). A v5e core has 128 MB
# of physical VMEM, and the whole int8 layer stack is ~109 MB: staged ONCE
# per frame (~0.13 ms of DMA), all 16 micro-steps then read weights from
# VMEM and HBM traffic drops ~16x. Panel loop and widths are unchanged, so
# the resident path is bit-identical to the streamed int8 path.
# The output head (32 MB, but only a 2 MB column slice per step) and the
# ptab gather stay streamed. Budget leaves room for kv/rbuf/y scratch and
# Mosaic internals under the 128 MB physical cap.
RESIDENT_BUDGET = 110 * 1024 * 1024
VMEM_FIXED = 14 * 1024 * 1024     # non-resident scratch + inputs + slack


def _resident_bytes(cfg) -> int:
    H, F, L = cfg.hidden, cfg.ffn_dim, cfg.n_layers
    NQKV = (cfg.n_q_heads + 2 * cfg.n_kv_heads) * cfg.head_dim
    return L * (H * NQKV + cfg.n_q_heads * cfg.head_dim * H
                + H * 2 * F + F * H)


def _pw(n: int) -> int:
    return min(PW, n)


def _pw_w(n: int, cap: int) -> int:
    """Weight-panel width: n itself when it fits, else a divisor <= cap."""
    return n if n <= cap else math.gcd(n, cap)


def _kernel_body(cfg, B, B8, dense_round, ptab_rows, int4, wcap, resident,
                 kv_res, gather, refs):
    """The whole frame expansion. `refs` is the dict of kernel refs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # perf-debug ablations, mirroring ops/fused_talker.py: comma-set of
    # {qkv, wo, mlp, attn, head} to SKIP (wrong results; timing attribution
    # only — tools/bench_quant_kinds.py --ablate)
    ablate = set(filter(None, os.environ.get(
        "QWEN3_TTS_ABLATE", "").split(",")))

    H = cfg.hidden
    L = cfg.n_layers
    nq, nk, hd = cfg.n_q_heads, cfg.n_kv_heads, cfg.head_dim
    g = nq // nk
    F = cfg.ffn_dim
    T = cfg.max_seq
    NQKV = (nq + 2 * nk) * hd
    CV = protocol.CODE_VOCAB
    NB = protocol.NUM_CODEBOOKS
    dt = jnp.dtype(cfg.dtype)
    Bp = refs["x"].shape[0]
    R = refs["ptab"].shape[1]
    rbuf = refs.get("rbuf")            # absent in gather mode (dead scratch)
    RW = rbuf.shape[1] if rbuf is not None else 0
    inv_sqrt = 1.0 / float(hd) ** 0.5
    eps = cfg.rms_eps

    x_ref, y_ref, logits_ref, acc_ref = (
        refs["x"], refs["y"], refs["logits"], refs["acc"])
    kbuf, vbuf = refs.get("kbuf"), refs.get("vbuf")   # absent in kv_res mode
    wbuf_h, wbuf_f = refs["wbuf_h"], refs["wbuf_f"]
    mbuf, msem = refs["mbuf"], refs["msem"]
    wsem, rsem = refs["wsem"], refs.get("rsem")
    krsem, vrsem = refs.get("krsem"), refs.get("vrsem")
    kwsem, vwsem = refs.get("kwsem"), refs.get("vwsem")
    cache = refs["cache_out"]
    out_codes = refs["codes"]
    Lc = jnp.int32(L)

    # norm weights arrive f32 (bf16 [L,H] tables cannot be dynamically
    # row-indexed on TPU: sub-tile access). Single-rounding form (all f32
    # math, ONE cast) bit-matches models/decoder.rms_norm, which XLA
    # compiles with intermediate casts elided under
    # --xla_allow_excess_precision.
    def rms2(x, w_row):                      # x [Bp, H] f32-math rms norm
        if "norm" in ablate:
            return x.astype(dt)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + eps) * w_row).astype(dt)

    def rms3(x, w_row):                      # x [Bp, nh, hd]
        if "norm" in ablate:
            return x
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + eps) * w_row[None]).astype(dt)

    def rope(x, cos_r, sin_r):               # x [Bp, nh, hd]; cos_r [1, hd]
        if "rope" in ablate:
            return x
        half = hd // 2
        rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        c = cos_r[None].astype(dt)           # [1, 1, hd]
        s = sin_r[None].astype(dt)
        return x * c + rot * s

    def stream_matmul(x_dt, w_hbm, buf, K, N, col_base=None, m_hbm=None,
                      res=None):
        """y_ref[:, :N] = f32( x_dt [Bp,K] @ deq(w_hbm)[:, base:base+N] ).

        Dense/int8: w_hbm ref [K, N_total]; panels of `pw` lanes
        double-buffered through `buf` [2, >=K, >=pw]. col_base: traced
        column offset (head). Int4 (m_hbm given): w_hbm [K//2, N_total]
        packed biased nibbles + m_hbm [K//GROUP4, N_total] sub-multipliers,
        evaluated by quant.panel_matmul4 (per-group MXU dots, m8 in f32) —
        same recipe as ops/fused_talker.py.
        `res` (VMEM-resident mode): an s8 ref [K, N_total] already staged in
        VMEM by the kernel prologue — the identical panel loop reads panels
        directly (same pw, same dot/cast order -> bit-identical to the
        streamed int8 path), just with no DMA to wait on.
        """
        pw = _pw_w(N, wcap)
        n_panels = N // pw

        if res is not None:
            # one full-width dot: with no DMA to hide there is nothing to
            # pipeline, and at M=Bp the per-panel loop/relayout overhead
            # dominated (>2k panel iterations per frame at pw=512). Output
            # columns are independent, so the result is bit-identical to
            # the panel-streamed evaluation for any column partition.
            # Returned as a VALUE (not via y_ref): the kernel floor is
            # op-latency-bound (~12 us/layer-pass measured r4), and the
            # store+reload of a [Bp, N] f32 through VMEM scratch per matmul
            # is pure serial latency — f32 either way, so bit-identical.
            return jax.lax.dot_general(
                x_dt, res[...].astype(dt), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        is4 = m_hbm is not None
        rows = K // 2 if is4 else K
        exact = buf.shape[1] == rows and buf.shape[2] == pw
        G4 = quant_mod.GROUP4
        ng = K // G4 if is4 else 0

        def dma(slot, p):
            start = p * pw if col_base is None else col_base + p * pw
            src = w_hbm.at[:, pl.ds(start, pw)]
            dst = buf.at[slot] if exact else (
                buf.at[slot, pl.ds(0, rows), pl.ds(0, pw)])
            return pltpu.make_async_copy(src, dst, wsem.at[slot])

        def mdma(slot, p):
            start = p * pw if col_base is None else col_base + p * pw
            return pltpu.make_async_copy(
                m_hbm.at[pl.ds(0, ng), pl.ds(start, pw)],
                mbuf.at[slot, pl.ds(0, ng), pl.ds(0, pw)], msem.at[slot])

        dma(0, 0).start()
        if is4:
            mdma(0, 0).start()

        def body(p, _):
            slot = jax.lax.rem(p, 2)

            @pl.when(p + 1 < n_panels)
            def _():
                dma(jax.lax.rem(p + 1, 2), p + 1).start()
                if is4:
                    mdma(jax.lax.rem(p + 1, 2), p + 1).start()

            dma(slot, p).wait()
            if is4:
                mdma(slot, p).wait()
                w8 = (buf[slot] if exact
                      else buf[slot, pl.ds(0, rows), pl.ds(0, pw)])
                acc = quant_mod.panel_matmul4(
                    x_dt, w8, mbuf[slot, pl.ds(0, ng), pl.ds(0, pw)], dt)
            else:
                wv = buf[slot] if exact else (
                    buf[slot, pl.ds(0, K), pl.ds(0, pw)])
                acc = jax.lax.dot_general(
                    x_dt, wv.astype(dt), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            y_ref[:, pl.ds(p * pw, pw)] = acc
            return ()

        jax.lax.fori_loop(0, n_panels, body, ())

    def attention(q3, k3, v3, pos, nB=None):
        """Block-diagonal GQA decode over the VMEM cache slice.

        q3 [Bp, nq, hd]; k3/v3 [nB*nk, T, hd] (flattened rows). Returns
        [Bp, nq*hd] dt. Pad q rows (>= nB*nq after flatten) select pad kv
        blocks via the group map, so their outputs are garbage but finite
        (bufs zeroed). nB defaults to the sublane-padded B8; the
        kv-resident path passes the true B (its cache has no pad rows —
        requires B*nq >= 8 and B*nk >= 8, checked at eligibility).
        """
        nB = B8 if nB is None else nB
        R_att = nB * nq
        C_att = nB * nk * T
        qf = q3[:nB].reshape(R_att, hd).astype(jnp.float32)
        kf = k3.reshape(C_att, hd)
        vf = v3.reshape(C_att, hd)
        scores = jax.lax.dot_general(
            qf, kf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_sqrt    # [R, C]
        # Block-diagonal extraction entirely in 2D (lane-splitting reshapes
        # are unsupported relayouts): column j = kv-block j//T, slot j%T;
        # row r belongs to kv-block r//g.
        row_blk = jax.lax.broadcasted_iota(
            jnp.int32, (R_att, C_att), 0) // g
        col_blk = jax.lax.broadcasted_iota(
            jnp.int32, (R_att, C_att), 1) // T
        keep = row_blk == col_blk
        # fold scores to [R, T] with the 0/1 slot matrix G[j, t] = (j%T == t)
        gj = jax.lax.broadcasted_iota(jnp.int32, (C_att, T), 0) % T
        gt = jax.lax.broadcasted_iota(jnp.int32, (C_att, T), 1)
        G = (gj == gt).astype(jnp.float32)
        sd = jax.lax.dot_general(
            jnp.where(keep, scores, 0.0), G, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [R, T]
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        sd = jnp.where(t_idx <= pos, sd, NEG)
        m = jnp.max(sd, axis=-1, keepdims=True)
        p = jnp.exp(sd - m)
        probs = p / jnp.sum(p, axis=-1, keepdims=True)        # [R, T]
        # expand back to [R, C] (probs @ G^T), mask to the block diagonal
        gtj = jax.lax.broadcasted_iota(jnp.int32, (T, C_att), 1) % T
        gtt = jax.lax.broadcasted_iota(jnp.int32, (T, C_att), 0)
        GT = (gtj == gtt).astype(jnp.float32)
        pexp = jax.lax.dot_general(
            probs, GT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [R, C]
        attn = jax.lax.dot_general(
            jnp.where(keep, pexp, 0.0), vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [R, hd]
        attn = attn.reshape(nB, nq * hd).astype(dt)
        if nB != Bp:
            attn = jnp.concatenate(
                [attn, jnp.zeros((Bp - nB, nq * hd), dt)], axis=0)
        return attn

    # kbuf/vbuf and the HBM cache are flattened to [rows=B*nk, T, hd]:
    # 4D dynamic-slice ref writes lower as (unsupported) scatters.
    def kv_read_dma(l):
        return (
            pltpu.make_async_copy(
                cache.at[0, l], kbuf.at[pl.ds(0, B * nk)], krsem),
            pltpu.make_async_copy(
                cache.at[1, l], vbuf.at[pl.ds(0, B * nk)], vrsem),
        )

    def kv_write_dma(l, pos):
        return (
            pltpu.make_async_copy(
                kbuf.at[pl.ds(0, B * nk), pl.ds(pos, 1), :],
                cache.at[0, l, :, pl.ds(pos, 1), :], kwsem),
            pltpu.make_async_copy(
                vbuf.at[pl.ds(0, B * nk), pl.ds(pos, 1), :],
                cache.at[1, l, :, pl.ds(pos, 1), :], vwsem),
        )

    def stack_pass(pos):
        """One token (in x_ref) through all layers at cache slot `pos`."""
        cos_r = refs["cos"][pl.ds(pos, 1), :]
        sin_r = refs["sin"][pl.ds(pos, 1), :]

        def layer(l, _):
            if resident:
                # first pass only: this layer's resident weights must have
                # landed (waits exactly once per (kind, layer) semaphore)
                @pl.when(pos == 0)
                def _():
                    for i, (src, dst) in enumerate(res_pairs):
                        pltpu.make_async_copy(
                            src.at[l], dst.at[l],
                            refs["rwsem"].at[i, l]).wait()
            if not kv_res:
                # The pending write-back (previous layer's, or for layer 0
                # the previous token's last layer) reads kbuf/vbuf; it must
                # land before the read DMA below overwrites those buffers.
                @pl.when((pos > 0) | (l > 0))
                def _():
                    l_prev = jnp.where(l > 0, l - 1, Lc - 1)
                    p_prev = jnp.where(l > 0, pos, pos - 1)
                    kw, vw = kv_write_dma(l_prev, p_prev)
                    kw.wait()
                    vw.wait()
                kr, vr = kv_read_dma(l)
                kr.start()
                vr.start()

            xv = x_ref[:]
            a = rms2(xv, refs["ln1"][pl.ds(l, 1), :])
            acc = None
            if "qkv" not in ablate:
                acc = stream_matmul(
                    a, refs["wqkv"].at[l], wbuf_h, H, NQKV,
                    m_hbm=refs["m_qkv"].at[l] if int4 else None,
                    res=refs["rw_qkv"].at[l] if resident else None)
            if acc is None:              # streamed path wrote y_ref
                acc = y_ref[:, pl.ds(0, NQKV)]
            qkv = (acc * refs["sc_qkv"][pl.ds(l, 1), :]).astype(dt)
            q3 = qkv[:, : nq * hd].reshape(Bp, nq, hd)
            k3 = qkv[:, nq * hd: (nq + nk) * hd].reshape(Bp, nk, hd)
            v3 = qkv[:, (nq + nk) * hd:].reshape(Bp, nk, hd)
            q3 = rope(rms3(q3, refs["qn"][pl.ds(l, 1), :]), cos_r, sin_r)
            k3 = rope(rms3(k3, refs["kn"][pl.ds(l, 1), :]), cos_r, sin_r)

            # k3/v3 are already rounded to the model dtype (matching the
            # XLA cache write); the f32 buffers exist because bf16 dynamic
            # single-sublane stores are sub-tile accesses Mosaic rejects
            if kv_res:
                # whole-frame cache lives in VMEM scratch [L*B*nk, T, hd]:
                # no DMA ping-pong, no cross-layer write/read ordering
                kres, vres = refs["kres"], refs["vres"]
                BKr = B * nk
                row0 = pl.multiple_of(l * BKr, BKr)
                if "kv" not in ablate:
                    kres[pl.ds(row0, BKr), pl.ds(pos, 1), :] = \
                        k3[:B].reshape(BKr, 1, hd).astype(jnp.float32)
                    vres[pl.ds(row0, BKr), pl.ds(pos, 1), :] = \
                        v3[:B].reshape(BKr, 1, hd).astype(jnp.float32)
            else:
                kr.wait()
                vr.wait()
                kbuf[:, pl.ds(pos, 1), :] = k3[:B8].reshape(
                    B8 * nk, 1, hd).astype(kbuf.dtype)
                vbuf[:, pl.ds(pos, 1), :] = v3[:B8].reshape(
                    B8 * nk, 1, hd).astype(vbuf.dtype)
                kw, vw = kv_write_dma(l, pos)
                kw.start()
                vw.start()

            if "attn" in ablate:
                attn = jnp.zeros((Bp, nq * hd), dt)
            elif kv_res:
                attn = attention(
                    q3, kres[pl.ds(row0, BKr)], vres[pl.ds(row0, BKr)],
                    pos, nB=B)
            else:
                attn = attention(q3, kbuf[:], vbuf[:], pos)
            acc = None
            if "wo" not in ablate:
                acc = stream_matmul(
                    attn, refs["wo"].at[l], wbuf_h, nq * hd, H,
                    m_hbm=refs["m_wo"].at[l] if int4 else None,
                    res=refs["rw_o"].at[l] if resident else None)
            if acc is None:
                acc = y_ref[:, pl.ds(0, H)]
            wo_out = (acc * refs["sc_wo"][pl.ds(l, 1), :]).astype(dt)
            x_ref[:] = xv + wo_out

            m = rms2(x_ref[:], refs["ln2"][pl.ds(l, 1), :])
            acc = None
            if "mlp" not in ablate:
                acc = stream_matmul(
                    m, refs["wgu"].at[l], wbuf_h, H, 2 * F,
                    m_hbm=refs["m_gu"].at[l] if int4 else None,
                    res=refs["rw_gu"].at[l] if resident else None)
            if acc is None:
                acc = y_ref[:, pl.ds(0, 2 * F)]
            gu = (acc * refs["sc_gu"][pl.ds(l, 1), :]).astype(dt)
            # explicit silu: jax.nn.silu on bf16 trips a Mosaic verifier bug
            # (f32 scalar broadcast into a bf16 vector)
            g = gu[:, :F].astype(jnp.float32)
            act = (g / (1.0 + jnp.exp(-g))).astype(dt) * gu[:, F:]
            acc = None
            if "mlp" not in ablate:
                acc = stream_matmul(
                    act, refs["wdown"].at[l], wbuf_f, F, H,
                    m_hbm=refs["m_down"].at[l] if int4 else None,
                    res=refs["rw_down"].at[l] if resident else None)
            if acc is None:
                acc = y_ref[:, pl.ds(0, H)]
            dn = (acc * refs["sc_down"][pl.ds(l, 1), :]).astype(dt)
            x_ref[:] = x_ref[:] + dn
            return ()

        # QWEN3_TTS_PRED_UNROLL=N: partially inline the L layer iterations
        # so Mosaic can schedule across layer boundaries (the kernel floor
        # is op-latency-bound: ~10-12 us of per-pass orchestration x 136
        # passes). Full unroll ("1"/"8") was a measured regression on r4
        # (3.93 vs 3.55 ms/frame: 8x code outweighs the loop control);
        # partial factors trade the two. Trace-time knob; default off.
        unroll_env = os.environ.get("QWEN3_TTS_PRED_UNROLL")
        if unroll_env == "1" or (unroll_env and unroll_env.isdigit()
                                 and int(unroll_env) >= L):
            jax.lax.fori_loop(0, L, layer, (), unroll=True)
        elif (unroll_env and unroll_env.isdigit() and 1 < int(unroll_env) < L
              and L % int(unroll_env) == 0):
            # Mosaic's fori_loop only supports none/full unroll, so partial
            # factors are hand-rolled: n layer bodies per loop iteration
            n = int(unroll_env)

            def layer_n(j, _):
                for t in range(n):
                    layer(j * n + t, ())
                return ()

            jax.lax.fori_loop(0, L // n, layer_n, ())
        else:
            jax.lax.fori_loop(0, L, layer, ())

    def head_slice(q_idx):
        """logits_ref = head columns [q_idx*CV, (q_idx+1)*CV) of x_ref."""
        h = rms2(x_ref[:], refs["fnorm"][0:1, :])
        if "head" not in ablate:
            stream_matmul(h, refs["whead"], wbuf_h, H, CV,
                          col_base=q_idx * CV,
                          m_hbm=refs["m_head"] if int4 else None)
        lg = y_ref[:, pl.ds(0, CV)] * refs["sc_head"][pl.ds(q_idx, 1), :]
        if dense_round:     # XLA path rounds logits through cfg.dtype for
            # BOTH dense (h @ w in dt) and quantized heads (quant.linear does
            # qmatmul(...).astype(x.dtype) before head_logits' f32 cast)
            lg = lg.astype(dt).astype(jnp.float32)
        logits_ref[:] = lg

    def argmax_row():
        lg = logits_ref[:]
        m = jnp.max(lg, axis=-1, keepdims=True)
        iota = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)
        return jnp.min(jnp.where(lg >= m, iota, CV), axis=-1, keepdims=True)

    # ---- frame expansion ----
    if resident:
        # stage the whole int8 layer stack HBM -> VMEM once (~109 MB,
        # ~0.13 ms of DMA); every micro-step then reads weights at VMEM
        # bandwidth. Staged per (kind, layer) with the WAIT deferred to the
        # layer's first use (pos==0 pass), so layer 0's compute overlaps
        # layers 1..L-1 still streaming in.
        res_pairs = [
            (refs["wqkv"], refs["rw_qkv"]),
            (refs["wo"], refs["rw_o"]),
            (refs["wgu"], refs["rw_gu"]),
            (refs["wdown"], refs["rw_down"]),
        ]
        for i, (src, dst) in enumerate(res_pairs):
            for l0 in range(L):
                pltpu.make_async_copy(
                    src.at[l0], dst.at[l0], refs["rwsem"].at[i, l0]).start()

    out_codes[:] = jnp.zeros(out_codes.shape, jnp.int32)
    if kv_res:
        refs["kres"][:] = jnp.zeros(refs["kres"].shape, jnp.float32)
        refs["vres"][:] = jnp.zeros(refs["vres"].shape, jnp.float32)
    else:
        kbuf[:] = jnp.zeros(kbuf.shape, kbuf.dtype)
        vbuf[:] = jnp.zeros(vbuf.shape, vbuf.dtype)

    # Prefill as a fori_loop so `pos` is always a traced value: Mosaic's
    # load lowering rejects pl.ds() with a constant-folded scalar index.
    def prefill(i, _):
        # e01 is [2*Bp, H]; token i occupies rows [i*Bp, (i+1)*Bp)
        x_ref[:] = refs["e01"][pl.ds(pl.multiple_of(i * Bp, Bp), Bp), :]
        stack_pass(i)

        @pl.when(i == 1)
        def _():
            head_slice(i - 1)          # codebook-1 logits (traced zero)
        return ()

    jax.lax.fori_loop(0, 2, prefill, ())

    def step(q, _):
        code = argmax_row()                               # [Bp, 1] int32
        lane = jax.lax.broadcasted_iota(jnp.int32, out_codes.shape, 1)
        out_codes[:] = jnp.where(lane == q, jnp.broadcast_to(
            code, out_codes.shape), out_codes[:])
        # OOB codes (argmax >= real rows, tiny tables only) hit the bias row
        sel = jnp.where(code < ptab_rows, code, R - 1)

        @pl.when(q < NB - 1)
        def _():
            if gather:
                # tile-aligned row gather (r3's 1-row DMA was Mosaic-illegal:
                # dim-1 slices of the sublane-tiled ptab must be a multiple
                # of the tiling — VERDICT r3 #1). DMA the aligned GW-row
                # window containing sel[b] per batch row (B windows of
                # GW*H*2 bytes replace streaming all R rows per step), then
                # pick each row in-VMEM with a block-diagonal one-hot dot —
                # exact, because 1.0 weights select dt rows into an f32
                # accumulator (== what the one-hot matmul reconstructs).
                rowbuf = refs["rowbuf"]                   # [B*GW, H]
                base = (sel // GW) * GW                   # [Bp, 1]
                rcs = [pltpu.make_async_copy(
                    refs["ptab"].at[
                        q, pl.ds(pl.multiple_of(base[b, 0], GW), GW), :],
                    rowbuf.at[pl.ds(b * GW, GW), :], refs["rowsem"].at[b])
                    for b in range(B)]
                for rc in rcs:
                    rc.start()
                for rc in rcs:
                    rc.wait()
                jcol = jax.lax.broadcasted_iota(jnp.int32, (Bp, B * GW), 1)
                irow = jax.lax.broadcasted_iota(jnp.int32, (Bp, B * GW), 0)
                oh = ((jcol // GW == irow)
                      & (jcol % GW == sel - base)).astype(dt)
                x_ref[:] = jax.lax.dot_general(
                    oh, rowbuf[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dt)
            else:
                # emb = one-hot(code) @ ptab[q] (== codec_embedding_1024)
                rw = RW
                n_panels = R // rw

                def rdma(slot, p):
                    return pltpu.make_async_copy(
                        refs["ptab"].at[q, pl.ds(p * rw, rw), :],
                        rbuf.at[slot], rsem.at[slot])

                rdma(0, 0).start()
                acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

                def body(p, _):
                    slot = jax.lax.rem(p, 2)

                    @pl.when(p + 1 < n_panels)
                    def _():
                        rdma(jax.lax.rem(p + 1, 2), p + 1).start()

                    rdma(slot, p).wait()
                    iota = jax.lax.broadcasted_iota(jnp.int32, (Bp, rw), 1)
                    oh = (iota + p * rw == sel).astype(dt)
                    acc_ref[:] += jax.lax.dot_general(
                        oh, rbuf[slot].astype(dt), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return ()

                jax.lax.fori_loop(0, n_panels, body, ())
                x_ref[:] = acc_ref[:].astype(dt)
            stack_pass(q + 1)
            head_slice(q)              # codebook-(q+1) logits
        return ()

    jax.lax.fori_loop(1, NB, step, ())

    # drain the one still-pending cache write-back (last layer, last token);
    # fori keeps the indices traced (constant pl.ds indices fail to lower)
    if not kv_res:
        def drain(z, _):
            kw, vw = kv_write_dma(z + (L - 1), z + (NB - 1))
            kw.wait()
            vw.wait()
            return ()

        jax.lax.fori_loop(0, 1, drain, ())


def _split_w(w, n_out):
    """(values, m8-or-None, scales[f32; ones if dense]) for a dense / int8 /
    int4 weight. int4 values are the packed [.., K//2, N] nibble planes."""
    if isinstance(w, dict) and "q" in w:
        return w["q"], None, w["scale"].astype(jnp.float32)
    if isinstance(w, dict) and "q4" in w:
        return w["q4"], w["m8"], w["scale"].astype(jnp.float32)
    ones = jnp.ones(w.shape[:-2] + (n_out,), jnp.float32) if w.ndim == 3 \
        else jnp.ones((n_out,), jnp.float32)
    return w, None, ones


@functools.partial(jax.jit,
                   static_argnames=("cfg", "ptab_rows", "interpret"))
def frame_codes_fused(
    params: Dict[str, Any],
    cfg,
    ptab: jax.Array,          # [16, R, H] cfg.dtype from make_ptab (padded)
    ptab_rows: int,           # real (un-padded) codec row count
    h1024: jax.Array,         # [B, H] f32 projected talker hidden
    code_0: jax.Array,        # [B] int32
    *,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused replacement for models/predictor.frame_codes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, L = cfg.hidden, cfg.n_layers
    nq, nk, hd = cfg.n_q_heads, cfg.n_kv_heads, cfg.head_dim
    F, T = cfg.ffn_dim, cfg.max_seq
    NQKV = (nq + 2 * nk) * hd
    CV, NB = protocol.CODE_VOCAB, protocol.NUM_CODEBOOKS
    dt = jnp.dtype(cfg.dtype)
    B = code_0.shape[0]
    sub = 16 if dt == jnp.bfloat16 else 8
    Bp = max(sub, -(-B // sub) * sub)
    B8 = max(8, -(-B // 8) * 8)

    lw = params["layers"]
    wqkv, m_qkv, sc_qkv = _split_w(lw["wqkv"], NQKV)
    wo, m_wo, sc_wo = _split_w(lw["wo"], H)
    wgu, m_gu, sc_gu = _split_w(lw["w_gu"], 2 * F)
    wdown, m_down, sc_down = _split_w(lw["w_down"], H)
    whead, m_head, sc_head = _split_w(params["head"], NB * CV)
    dense_round = dt != jnp.float32
    int4 = m_qkv is not None
    if int4:
        assert all(v is not None for v in (m_wo, m_gu, m_down, m_head)), \
            "mixed int4/non-int4 predictor weights are not supported"
    else:
        dummy = jnp.zeros((L, 1, 1), jnp.int8)
        m_qkv = m_wo = m_gu = m_down = dummy
        m_head = dummy[0]

    # ptab comes pre-padded by make_ptab: rows >= ptab_rows are BIAS rows
    # (the reference's OOB-code result: zero codec row -> projection ->
    # bias, `src/assets_manager.rs:419-442`); negative codes clamp to 0.
    R = ptab.shape[1]
    R0 = ptab_rows

    def _sel(code):
        clamped = jnp.maximum(code, 0)
        return jnp.where(clamped < R0, clamped, R - 1)

    # prefill embeddings, exactly as models/predictor.py builds them
    e0 = h1024.astype(dt)
    e1 = jnp.take(ptab[0], _sel(code_0), axis=0).astype(dt)
    e01 = jnp.stack([e0, e1])                               # [2, B, H]
    if Bp != B:
        e01 = jnp.pad(e01, ((0, 0), (0, Bp - B), (0, 0)))
    e01 = e01.reshape(2 * Bp, -1)           # 3D dynamic ref loads lower
    #                                         as (unsupported) gathers

    from . import rope as rope_mod
    pos4 = rope_mod.mrope_positions(jnp.arange(T, dtype=jnp.int32)[None])
    cos, sin = rope_mod.rope_angles(pos4, cfg.mrope_sections, hd,
                                    cfg.rope_theta)
    cos, sin = cos[0].astype(jnp.float32), sin[0].astype(jnp.float32)

    cache0 = jnp.zeros((2, L, B * nk, T, hd), jnp.float32)

    # resident mode: int8 weights + the whole layer stack fits the VMEM
    # budget (see RESIDENT_BUDGET). Interpret mode included so CPU tests
    # cover the resident code path bit-for-bit against the streamed one.
    resident = (
        not int4
        and quant_mod.is_quantized(lw["wqkv"])
        and _resident_bytes(cfg) <= RESIDENT_BUDGET
        and os.environ.get("QWEN3_TTS_NO_RESIDENT") != "1"
    )
    # kv-resident: the whole frame-local cache as VMEM scratch (no per
    # (step, layer) DMA ping-pong — measured as the largest share of the
    # resident kernel's non-matmul floor). Needs true-B row counts to be
    # sublane-viable and the weight+cache budget to fit under VMEM.
    kv_bytes = 2 * 4 * L * B * nk * T * hd
    kv_res = (
        resident
        and B * nq >= 8 and B * nk >= 8
        and _resident_bytes(cfg) + kv_bytes + VMEM_FIXED
        <= 126 * 1024 * 1024
        and os.environ.get("QWEN3_TTS_NO_KV_RES") != "1"
    )

    # int4 packs two rows per byte AND halves row counts, so panels can be
    # twice as wide for the same VMEM budget (matches ops/fused_talker.py);
    # the per-kernel vmem_limit_bytes below lifts the default 16M scoped
    # cap that once forced int4 back to PW
    wcap = 2 * PW if int4 else PW
    pwh = max(_pw_w(NQKV, wcap), _pw_w(H, wcap), _pw_w(2 * F, wcap),
              _pw_w(CV, wcap))
    pwf = _pw_w(H, wcap)
    wrows_h = H // 2 if int4 else H
    wrows_f = F // 2 if int4 else F
    ngmax = max(H, nq * hd, F) // quant_mod.GROUP4 if int4 else 1
    ymax = max(NQKV, 2 * F, H, CV)

    # direct ptab row gather (see step() in _kernel_body): B aligned-window
    # DMAs per step instead of streaming all R rows; worthwhile at decode
    # batches. Needs R to be window-aligned (make_ptab pads real configs to
    # a PW multiple; tiny test tables may not align -> fall back to stream).
    gather = (B <= 8 and R % GW == 0
              and os.environ.get("QWEN3_TTS_NO_PTAB_GATHER") != "1")

    kern = functools.partial(_kernel, cfg=cfg, B=B, Bp=Bp, B8=B8,
                             dense_round=dense_round, ptab_rows=R0,
                             int4=int4, wcap=wcap, resident=resident,
                             kv_res=kv_res, gather=gather)

    # conditional scratch: kv_res configs skip the kbuf/vbuf DMA ping-pong
    # buffers, gather configs skip the rbuf row-panel stream — both were
    # dead-but-allocated in r3 inside a budget within ~4 MB of the physical
    # VMEM cap (ADVICE r3). _kernel unpacks by the same flag order.
    scratch = [
        pltpu.VMEM((Bp, H), dt),                       # x
        pltpu.VMEM((Bp, ymax), jnp.float32),           # y
        pltpu.VMEM((Bp, CV), jnp.float32),             # logits
        pltpu.VMEM((Bp, H), jnp.float32),              # acc
        pltpu.VMEM((2, wrows_h, pwh), wqkv.dtype),     # wbuf_h
        pltpu.VMEM((2, wrows_f, pwf), wdown.dtype),    # wbuf_f
        pltpu.VMEM((2, ngmax, pwh), jnp.int8),         # mbuf
        pltpu.SemaphoreType.DMA((2,)),                 # wsem
        pltpu.SemaphoreType.DMA((2,)),                 # msem
    ]
    if not kv_res:
        scratch += [
            pltpu.VMEM((B8 * nk, T, hd), jnp.float32),     # kbuf
            pltpu.VMEM((B8 * nk, T, hd), jnp.float32),     # vbuf
            pltpu.SemaphoreType.DMA(()),                   # krsem
            pltpu.SemaphoreType.DMA(()),                   # vrsem
            pltpu.SemaphoreType.DMA(()),                   # kwsem
            pltpu.SemaphoreType.DMA(()),                   # vwsem
        ]
    if not gather:
        scratch += [
            pltpu.VMEM((2, _pw(R), H), dt),                # rbuf
            pltpu.SemaphoreType.DMA((2,)),                 # rsem
        ]
    if resident:
        scratch += [
            pltpu.VMEM((L, H, NQKV), jnp.int8),        # rw_qkv
            pltpu.VMEM((L, nq * hd, H), jnp.int8),     # rw_o
            pltpu.VMEM((L, H, 2 * F), jnp.int8),       # rw_gu
            pltpu.VMEM((L, F, H), jnp.int8),           # rw_down
            pltpu.SemaphoreType.DMA((4, L)),           # rwsem (per kind+layer)
        ]
        vmem_limit = _resident_bytes(cfg) + VMEM_FIXED
    else:
        vmem_limit = 64 * 1024 * 1024
    if kv_res:
        scratch += [
            pltpu.VMEM((L * B * nk, T, hd), jnp.float32),   # kres
            pltpu.VMEM((L * B * nk, T, hd), jnp.float32),   # vres
        ]
        vmem_limit += kv_bytes
    if gather:
        scratch += [
            pltpu.VMEM((B * GW, H), dt),                   # rowbuf
            pltpu.SemaphoreType.DMA((B,)),                 # rowsem
        ]

    codes, _ = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # e01
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cos
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sin
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ln2
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qn
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kn
            pl.BlockSpec(memory_space=pltpu.VMEM),   # fnorm
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sc_qkv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sc_wo
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sc_gu
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sc_down
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sc_head
            pl.BlockSpec(memory_space=pl.ANY),       # wqkv
            pl.BlockSpec(memory_space=pl.ANY),       # wo
            pl.BlockSpec(memory_space=pl.ANY),       # wgu
            pl.BlockSpec(memory_space=pl.ANY),       # wdown
            pl.BlockSpec(memory_space=pl.ANY),       # whead
            pl.BlockSpec(memory_space=pl.ANY),       # m_qkv
            pl.BlockSpec(memory_space=pl.ANY),       # m_wo
            pl.BlockSpec(memory_space=pl.ANY),       # m_gu
            pl.BlockSpec(memory_space=pl.ANY),       # m_down
            pl.BlockSpec(memory_space=pl.ANY),       # m_head
            pl.BlockSpec(memory_space=pl.ANY),       # ptab
            pl.BlockSpec(memory_space=pl.ANY),       # cache (aliased)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),   # codes
            pl.BlockSpec(memory_space=pl.ANY),       # cache_out
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
            jax.ShapeDtypeStruct(cache0.shape, jnp.float32),
        ),
        input_output_aliases={24: 1},
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(e01, cos, sin,
      lw["ln1"].astype(jnp.float32), lw["ln2"].astype(jnp.float32),
      lw["q_norm"].astype(jnp.float32), lw["k_norm"].astype(jnp.float32),
      params["final_norm"].reshape(1, H).astype(jnp.float32),
      sc_qkv, sc_wo, sc_gu, sc_down, sc_head.reshape(NB, CV),
      wqkv, wo, wgu, wdown, whead,
      m_qkv, m_wo, m_gu, m_down, m_head, ptab, cache0)

    codes = codes[:B, :NB]
    return jnp.concatenate([code_0[:, None], codes[:, 1:]], axis=1)


def _kernel(e01, cos, sin, ln1, ln2, qn, kn, fnorm,
            sc_qkv, sc_wo, sc_gu, sc_down, sc_head,
            wqkv, wo, wgu, wdown, whead,
            m_qkv, m_wo, m_gu, m_down, m_head, ptab, cache_in,
            codes, cache_out, *scr,
            cfg, B, Bp, B8, dense_round, ptab_rows, int4, wcap, resident,
            kv_res, gather):
    refs = dict(
        e01=e01, cos=cos, sin=sin, ln1=ln1, ln2=ln2, qn=qn, kn=kn,
        fnorm=fnorm, sc_qkv=sc_qkv, sc_wo=sc_wo, sc_gu=sc_gu,
        sc_down=sc_down, sc_head=sc_head, wqkv=wqkv, wo=wo, wgu=wgu,
        wdown=wdown, whead=whead,
        m_qkv=m_qkv, m_wo=m_wo, m_gu=m_gu, m_down=m_down, m_head=m_head,
        ptab=ptab, cache_out=cache_out, codes=codes,
    )
    # unpack scratch in the exact order frame_codes_fused builds it
    names = ["x", "y", "logits", "acc", "wbuf_h", "wbuf_f", "mbuf",
             "wsem", "msem"]
    if not kv_res:
        names += ["kbuf", "vbuf", "krsem", "vrsem", "kwsem", "vwsem"]
    if not gather:
        names += ["rbuf", "rsem"]
    if resident:
        names += ["rw_qkv", "rw_o", "rw_gu", "rw_down", "rwsem"]
    if kv_res:
        names += ["kres", "vres"]
    if gather:
        names += ["rowbuf", "rowsem"]
    assert len(names) == len(scr)
    refs.update(zip(names, scr))
    _kernel_body(cfg, B, B8, dense_round, ptab_rows, int4, wcap, resident,
                 kv_res, gather, refs)


def make_ptab(assets, cfg):
    """Pre-projected codebook tables: ptab[q, c] = codec_embedding_1024(q, c).

    Computed in f32 (matching assets.project) then stored in cfg.dtype so the
    in-kernel one-hot gather reproduces the XLA path's single rounding.
    Rows are padded to a DMA-panel multiple with at least one BIAS row
    (the reference's OOB-code value: zero codec row -> projection -> bias).

    Returns (ptab [16, R_padded, H], rows) — `rows` is the real row count,
    passed to frame_codes_fused as a static argument.
    """
    tabs = assets.codec_tables.astype(jnp.float32)
    pt = jnp.einsum("qrd,pd->qrp", tabs,
                    assets.proj_weight.astype(jnp.float32))
    pt = pt + assets.proj_bias.astype(jnp.float32)
    rows = pt.shape[1]
    rw = _pw(rows + 1)
    r_pad = -(-(rows + 1) // rw) * rw
    bias = jnp.broadcast_to(assets.proj_bias.astype(jnp.float32),
                            (pt.shape[0], r_pad - rows, pt.shape[2]))
    pt = jnp.concatenate([pt, bias], axis=1)
    return pt.astype(jnp.dtype(cfg.dtype)), rows


def usable(cfg, batch: int, params=None) -> bool:
    """Static eligibility of the fused kernel for compiled execution."""
    if os.environ.get("QWEN3_TTS_NO_FUSED") == "1":
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    if backend != "tpu":     # pltpu primitives: TPU only (not just non-CPU)
        return False
    H, F = cfg.hidden, cfg.ffn_dim
    NQKV = (cfg.n_q_heads + 2 * cfg.n_kv_heads) * cfg.head_dim
    max_b = 16
    ok = (
        cfg.n_q_heads % cfg.n_kv_heads == 0
        and cfg.head_dim % 128 == 0
        and cfg.n_q_heads * cfg.head_dim <= H  # wbuf_h is [2, H, pw]; the wo
        # stream uses K = nq*hd rows of it (GQA configs with nq*hd > H would
        # slice out of bounds)
        and H % PW == 0
        and (2 * F) % PW == 0
        and NQKV % PW == 0
        and protocol.CODE_VOCAB % PW == 0
        and cfg.max_seq >= protocol.NUM_CODEBOOKS + 1
        and cfg.max_seq % 8 == 0
        and batch <= max_b
    )
    if ok and params is not None and quant_mod.is_quantized4(
            params["layers"]["wqkv"]):
        g2 = 2 * quant_mod.GROUP4               # packed halves x k-groups
        ok = (H % g2 == 0 and F % g2 == 0
              and (cfg.n_q_heads * cfg.head_dim) % g2 == 0)
    return ok
