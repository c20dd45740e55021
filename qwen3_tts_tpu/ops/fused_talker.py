"""Fused talker decode step: the full layer stack in ONE Pallas kernel.

The XLA talker step (models/decoder.forward at S=1) runs ~15 ops x 28 layers
per token; at M=1 the per-op dispatch cost dominates the ~1.7 ms of int8
weight reads that bound the math (VERDICT r1: talker ~4.7 of 6.77 ms/frame).
This kernel runs the ENTIRE decode step — 28 layers of qkv/attention/wo/MLP
plus the final norm and output head — in a single `pallas_call`, applying the
ops/fused_predictor.py recipe to the talker:

  * weights stay int8/bf16 in HBM and are panel-streamed with double
    buffering (VMEM holds <=2 panels of one matrix at a time);
  * the PERSISTENT KV cache [L, B*nk, T, hd] stays in HBM, aliased
    input->output; the valid prefix is block-streamed into VMEM with the
    exact online-softmax math of ops/flash_decode.py (same block size, same
    masking, same current-token fold), so HBM attention traffic scales with
    the live prefix, not max_seq;
  * the current token's k/v fold into the softmax from VMEM and are
    returned as a tiny [L, B, nk, hd] output; the wrapper writes them into
    the cache with ONE stacked `dynamic_update_slice` (the pre-update-cache
    formulation of ops/flash_decode.py: no read-after-write hazard, no
    carried-cache copies, and no sub-tile bf16 DMA writes, which Mosaic
    rejects);
  * the output head streams like every other weight; logits round through
    cfg.dtype exactly as quant.linear/`h @ w` do on the XLA path.

Reference semantics preserved: one llama_decode per frame with M-RoPE
positions (src/tts/engine.rs:623-641), logits over the full head (sampling
slices [0, 2160) outside), cache write at the row's slot with left-pad rows
masked via kv_valid_from.

Numerics: on CPU (interpret mode) the kernel matches decoder.forward+flash
to f32-ulp level (~1e-7, reduction-order only; tests/test_fused_talker.py).
On TPU the compiled XLA path is NOT a fixed rounding target: with
--xla_allow_excess_precision XLA elides intermediate bf16 casts
(graph-dependent), and f32 MXU matmuls use backend-chosen bf16 pass counts.
The kernel therefore deviates from the compiled XLA path by ~3e-2 on logits
(std ~0.9) in bf16 — the same deviation class as llama.cpp's CUDA/Vulkan/CPU
backends show against each other. Each path is individually deterministic
under a fixed seed; greedy decisions differ only on near-tie logits. The
kernel keeps the residual stream in f32 (better than round-per-layer).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from . import quant as quant_mod

NEG = -1e30
ABLK = 256        # attention cache slots per DMA block (== flash_decode.BLK)
PW = 512          # max weight-panel lanes streamed per DMA (int8)
# Per-kernel VMEM budget. The default 16M scoped limit is what a v5e core
# can allocate without compiler flags, but the chip has 128M of physical
# VMEM; BENCH r3 hit 17.45M inside the scan-based streaming step (the
# while_loop program packs the same kernel differently) — raising the
# per-kernel cap via CompilerParams fixes that without process-global
# XLA_FLAGS, and leaves headroom for wider weight panels.
VMEM_LIMIT = 64 * 1024 * 1024


def _pw(n: int, cap: int) -> int:
    """Largest panel width dividing n, at most cap."""
    return math.gcd(n, cap)


def _split_w(w, n_out):
    """(values, m8-or-None, scales[f32; ones if dense]) for a dense / int8 /
    int4 weight. int4 values are the packed [.., K//2, N] nibble planes."""
    if isinstance(w, dict) and "q" in w:
        return w["q"], None, w["scale"].astype(jnp.float32)
    if isinstance(w, dict) and "q4" in w:
        return w["q4"], w["m8"], w["scale"].astype(jnp.float32)
    arr = jnp.asarray(w)
    ones = jnp.ones(arr.shape[:-2] + (n_out,), jnp.float32) if arr.ndim == 3 \
        else jnp.ones((n_out,), jnp.float32)
    return arr, None, ones


def _kernel_body(cfg, B, int4, refs):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = cfg.hidden
    L = cfg.n_layers
    nq, nk, hd = cfg.n_q_heads, cfg.n_kv_heads, cfg.head_dim
    g = nq // nk
    F = cfg.ffn_dim
    V = cfg.vocab
    NQKV = (nq + 2 * nk) * hd
    dt = jnp.dtype(cfg.dtype)
    Bp = refs["x"].shape[0]
    BK = B * nk                       # kv-cache rows staged per block
    Ra = refs["acc"].shape[0]         # attention rows (>= B*nq, f32 sublane)
    eps = cfg.rms_eps
    lanes_h = refs["wbuf_h"].shape[2]   # buffer lanes (>= wcap: head panel)
    wcap = refs["wcap_panel"]           # qkv/wo/gu panel width
    fcap = refs["wbuf_f"].shape[2]

    x_ref, y_ref = refs["x"], refs["y"]
    kbuf, vbuf = refs["kbuf"], refs["vbuf"]
    wbuf_h, wbuf_f, mbuf = refs["wbuf_h"], refs["wbuf_f"], refs["mbuf"]
    wsem, msem = refs["wsem"], refs["msem"]
    ksem, vsem = refs["ksem"], refs["vsem"]
    acc_ref, m_ref, l_ref = refs["acc"], refs["m"], refs["l"]
    qref = refs["q"]
    kc, vc = refs["kc"], refs["vc"]
    knew, vnew = refs["knew"], refs["vnew"]
    kvlen_s = refs["kvlen"]           # SMEM [B] i32 (per batch row)
    vfrom_s = refs["vfrom"]           # SMEM [B] i32
    kvmax_s = refs["kvmax"]           # SMEM [1] i32 (max over rows)

    # single-rounding rms (all f32 math, one cast): bit-matches
    # models/decoder.rms_norm, which XLA compiles with intermediate casts
    # elided under --xla_allow_excess_precision
    def rms2(x, w_row):               # x [Bp, H]; w_row [1, H] f32
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + eps) * w_row).astype(dt)

    def rms3(x, w_row):               # x [Bp, nh, hd]; w_row [1, hd] f32
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + eps) * w_row[None]).astype(dt)

    def rope(x, c3, s3):              # x, c3, s3 [Bp, nh, hd] (pre-broadcast)
        half = hd // 2
        rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        return x * c3.astype(dt) + rot * s3.astype(dt)

    def stream_matmul(x_dt, w_hbm, buf, K, N, pw, col_base=None,
                      m_hbm=None, mbuf=None):
        """y_ref[:, :N] = f32( x_dt [Bp,K] @ deq(w_hbm)[:, base:base+N] ).

        Dense/int8: w_hbm [K, N_total], panels cast to dt in VMEM.
        Int4 (m_hbm given): w_hbm [K//2, N_total] packed biased nibbles +
        m_hbm [K//G4, N_total] sub-multipliers, evaluated by
        quant.panel_matmul4 (per-group MXU dots, m8 in f32 — see its
        docstring for why and for the numerics vs dequant4_dt).
        """
        n_panels = N // pw
        int4 = m_hbm is not None
        rows = K // 2 if int4 else K
        exact = buf.shape[1] == rows and buf.shape[2] == pw
        G4 = quant_mod.GROUP4
        ng = K // G4 if int4 else 0

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
        if int4:
            mdma(0, 0).start()

        def body(p, _):
            slot = jax.lax.rem(p, 2)

            @pl.when(p + 1 < n_panels)
            def _():
                dma(jax.lax.rem(p + 1, 2), p + 1).start()
                if int4:
                    mdma(jax.lax.rem(p + 1, 2), p + 1).start()

            dma(slot, p).wait()
            if int4:
                mdma(slot, p).wait()
                w8 = (buf[slot, pl.ds(0, rows), pl.ds(0, pw)] if not exact
                      else buf[slot])
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

    # ---- attention helpers -------------------------------------------------
    # The prefix loop is flattened over (batch row, slot block) pairs in
    # row-major order: each DMA stages ONE row's [nk, ABLK, hd] cache block,
    # so VMEM staging is constant in B and the block-diagonal score waste
    # stays linear in B (a flat [B*nk*ABLK] layout would make it quadratic).
    C = nk * ABLK                      # score columns per block (one row)

    def attn_dma(slot, l, b, i):
        return (
            pltpu.make_async_copy(
                kc.at[l, pl.ds(pl.multiple_of(b * nk, nk), nk),
                      pl.ds(i * ABLK, ABLK), :], kbuf.at[slot], ksem),
            pltpu.make_async_copy(
                vc.at[l, pl.ds(pl.multiple_of(b * nk, nk), nk),
                      pl.ds(i * ABLK, ABLK), :], vbuf.at[slot], vsem),
        )

    # static row->kv-row map for the current-token fold
    def row_kv_2d(cols):
        r2 = jax.lax.broadcasted_iota(jnp.int32, (Ra, cols), 0)
        return (r2 // nq) * nk + (r2 % nq) // g       # rows >= B*nq: unused

    def attention(q3, k3, v3, l):
        """Online-softmax over the HBM prefix blocks + current-token fold.

        Matches ops/flash_decode._kernel bit-for-bit: same q pre-scaling,
        same masking/accumulator updates, same fold order. q3 [Bp, nq, hd];
        k3/v3 [Bp, nk, hd] (current token). Returns [Bp, nq*hd] dt.
        """
        R0 = B * nq
        qf = q3[:B].reshape(R0, hd).astype(jnp.float32)
        if Ra != R0:
            qf = jnp.concatenate(
                [qf, jnp.zeros((Ra - R0, hd), jnp.float32)], axis=0)
        qf = qf / jnp.sqrt(jnp.float32(hd))   # divide: flash_decode parity
        qref[:] = qf

        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
        m_ref[:] = jnp.full(m_ref.shape, NEG, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)

        n_blocks = jnp.maximum(pl.cdiv(kvmax_s[0], ABLK), 1)
        total = B * n_blocks
        # static within-row maps: q row r -> local kv head r // g
        row_h = jax.lax.broadcasted_iota(jnp.int32, (nq, C), 0) // g
        col_h = jax.lax.broadcasted_iota(jnp.int32, (nq, C), 1) // ABLK
        col_off = jax.lax.broadcasted_iota(jnp.int32, (nq, C), 1) % ABLK
        keep = row_h == col_h

        def body(t, _):
            slot = jax.lax.rem(t, 2)
            b = t // n_blocks
            i = jax.lax.rem(t, n_blocks)

            @pl.when(t + 1 < total)
            def _():
                ka, va = attn_dma(jax.lax.rem(t + 1, 2), l,
                                  (t + 1) // n_blocks,
                                  jax.lax.rem(t + 1, n_blocks))
                ka.start()
                va.start()

            ka, va = attn_dma(slot, l, b, i)
            ka.wait()
            va.wait()

            kf = kbuf[slot].reshape(C, hd).astype(jnp.float32)
            vf = vbuf[slot].reshape(C, hd).astype(jnp.float32)
            roff = pl.multiple_of(b * nq, nq)
            qrow = qref[pl.ds(roff, nq), :]
            scores = jax.lax.dot_general(
                qrow, kf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [nq, C]
            pos = i * ABLK + col_off
            ok = keep & (pos < kvlen_s[b]) & (pos >= vfrom_s[b])
            scores = jnp.where(ok, scores, NEG)

            m_prev = m_ref[pl.ds(roff, nq), :][:, 0:1]       # [nq, 1]
            m_cur = jnp.max(scores, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(ok, jnp.exp(scores - m_new), 0.0)
            l_prev = l_ref[pl.ds(roff, nq), :][:, 0:1]
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_ref[pl.ds(roff, nq), :] = (
                acc_ref[pl.ds(roff, nq), :] * alpha + jax.lax.dot_general(
                    p, vf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            m_ref[pl.ds(roff, nq), :] = jnp.broadcast_to(m_new, (nq, 128))
            l_ref[pl.ds(roff, nq), :] = jnp.broadcast_to(l_new, (nq, 128))
            return ()

        jax.lax.fori_loop(0, total, body, ())

        # fold the current token (always valid: causal self-attention)
        kn = k3[:B].reshape(BK, hd).astype(jnp.float32)
        vn = v3[:B].reshape(BK, hd).astype(jnp.float32)
        gmap = (row_kv_2d(BK)
                == jax.lax.broadcasted_iota(jnp.int32, (Ra, BK), 1)
                ).astype(jnp.float32)
        k_rows = jax.lax.dot_general(
            gmap, kn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [Ra, hd]
        v_rows = jax.lax.dot_general(
            gmap, vn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s_new = jnp.sum(qf * k_rows, axis=-1, keepdims=True)
        m_prev = m_ref[:][:, 0:1]
        m_fin = jnp.maximum(m_prev, s_new)
        alpha = jnp.exp(m_prev - m_fin)
        p_new = jnp.exp(s_new - m_fin)
        l_fin = l_ref[:][:, 0:1] * alpha + p_new
        out = (acc_ref[:] * alpha + p_new * v_rows) / jnp.maximum(
            l_fin, 1e-30)
        attn = out[:R0].astype(dt).reshape(B, nq * hd)
        if Bp != B:
            attn = jnp.concatenate(
                [attn, jnp.zeros((Bp - B, nq * hd), dt)], axis=0)
        return attn

    # perf-debug ablations (trace-time env knob; production = unset):
    # comma-set of {attn, mlp, qkv, wo, head} to SKIP — wrong results, used
    # only to attribute kernel time between streams/compute stages
    ablate = set(filter(None, os.environ.get(
        "QWEN3_TTS_ABLATE", "").split(",")))

    # ---- the decode step ---------------------------------------------------
    # The residual stream stays f32: under --xla_allow_excess_precision the
    # compiled XLA path keeps the wo / mlp outputs and residual adds in f32
    # (intermediate bf16 casts elided), rounding only at matmul inputs —
    # this kernel mirrors that (verified bit-exact on-device vs the flash
    # XLA path at L=1..4, flagship widths).
    x_ref[:] = refs["x0"][:].astype(jnp.float32)

    def layer(l, _):
        # prefetch this layer's first attention block behind the qkv matmul
        ka0, va0 = attn_dma(0, l, 0, 0)
        ka0.start()
        va0.start()

        xv = x_ref[:]
        a = rms2(xv, refs["ln1"][pl.ds(l, 1), :])
        if "qkv" not in ablate:
            stream_matmul(a, refs["wqkv"].at[l], wbuf_h, H, NQKV, wcap,
                          m_hbm=refs["m_qkv"].at[l] if int4 else None,
                          mbuf=mbuf)
        qkv = (y_ref[:, pl.ds(0, NQKV)]
               * refs["sc_qkv"][pl.ds(l, 1), :]).astype(dt)
        q3 = qkv[:, : nq * hd].reshape(Bp, nq, hd)
        k3 = qkv[:, nq * hd: (nq + nk) * hd].reshape(Bp, nk, hd)
        v3 = qkv[:, (nq + nk) * hd:].reshape(Bp, nk, hd)
        q3 = rope(rms3(q3, refs["qn"][pl.ds(l, 1), :]),
                  refs["cos_q"][:], refs["sin_q"][:])
        k3 = rope(rms3(k3, refs["kn"][pl.ds(l, 1), :]),
                  refs["cos_k"][:], refs["sin_k"][:])

        # emit the current token's k/v for the wrapper's stacked cache write
        # (f32 lanes; the values are already rounded to the model dtype)
        knew[l] = k3[:B].reshape(BK, hd).astype(jnp.float32)
        vnew[l] = v3[:B].reshape(BK, hd).astype(jnp.float32)

        if "attn" not in ablate:
            attn = attention(q3, k3, v3, l)
        else:
            attn = jnp.zeros((Bp, nq * hd), dt)
        if "wo" not in ablate:
            stream_matmul(attn, refs["wo"].at[l], wbuf_h, nq * hd, H, wcap,
                          m_hbm=refs["m_wo"].at[l] if int4 else None,
                          mbuf=mbuf)
        x_ref[:] = xv + y_ref[:, pl.ds(0, H)] * refs["sc_wo"][pl.ds(l, 1), :]

        mi = rms2(x_ref[:], refs["ln2"][pl.ds(l, 1), :])
        if "mlp" not in ablate:
            stream_matmul(mi, refs["wgu"].at[l], wbuf_h, H, 2 * F, wcap,
                          m_hbm=refs["m_gu"].at[l] if int4 else None,
                          mbuf=mbuf)
        gu = y_ref[:, pl.ds(0, 2 * F)] * refs["sc_gu"][pl.ds(l, 1), :]  # f32
        gg = gu[:, :F]
        act = (gg / (1.0 + jnp.exp(-gg)) * gu[:, F:]).astype(dt)
        if "mlp" not in ablate:
            stream_matmul(act, refs["wdown"].at[l], wbuf_f, F, H, fcap,
                          m_hbm=refs["m_down"].at[l] if int4 else None,
                          mbuf=mbuf)
        x_ref[:] = (x_ref[:]
                    + y_ref[:, pl.ds(0, H)] * refs["sc_down"][pl.ds(l, 1), :])
        return ()

    jax.lax.fori_loop(0, L, layer, ())

    h = rms2(x_ref[:], refs["fnorm"][0:1, :])
    refs["hidden"][:] = h
    # the head's V=2176 shares no large power-of-two factor with the panel
    # cap (gcd 128 -> 17 tiny DMAs + 17 skinny dots); when the buffer was
    # sized to take the whole head in one panel, use it
    pw_head = V if V <= lanes_h else _pw(V, wcap)
    stream_matmul(h, refs["whead"], wbuf_h, H, V, pw_head,
                  m_hbm=refs["m_head"] if int4 else None, mbuf=mbuf)
    lg = y_ref[:, pl.ds(0, V)] * refs["sc_head"][:]
    if dt != jnp.float32:
        # the XLA path rounds logits through cfg.dtype for BOTH dense
        # (h @ w in dt) and quantized heads (quant.linear casts to x.dtype)
        lg = lg.astype(dt).astype(jnp.float32)
    refs["logits"][:] = lg


def _kernel(x0, cos_q, sin_q, cos_k, sin_k, kvlen, vfrom, kvmax,
            ln1, ln2, qn, kn, fnorm,
            sc_qkv, sc_wo, sc_gu, sc_down, sc_head,
            wqkv, wo, wgu, wdown, whead,
            m_qkv, m_wo, m_gu, m_down, m_head, kc, vc,
            hidden, logits, knew, vnew,
            x, y, kbuf, vbuf, wbuf_h, wbuf_f, mbuf,
            acc, m, l, q, wsem, msem, ksem, vsem,
            *, cfg, B, int4, wcap_panel):
    refs = dict(
        wcap_panel=wcap_panel,
        x0=x0, cos_q=cos_q, sin_q=sin_q, cos_k=cos_k, sin_k=sin_k,
        kvlen=kvlen, vfrom=vfrom, kvmax=kvmax, ln1=ln1, ln2=ln2, qn=qn,
        kn=kn, fnorm=fnorm, sc_qkv=sc_qkv, sc_wo=sc_wo, sc_gu=sc_gu,
        sc_down=sc_down, sc_head=sc_head,
        wqkv=wqkv, wo=wo, wgu=wgu, wdown=wdown, whead=whead,
        m_qkv=m_qkv, m_wo=m_wo, m_gu=m_gu, m_down=m_down, m_head=m_head,
        kc=kc, vc=vc, hidden=hidden, logits=logits, knew=knew, vnew=vnew,
        x=x, y=y, kbuf=kbuf, vbuf=vbuf,
        wbuf_h=wbuf_h, wbuf_f=wbuf_f, mbuf=mbuf, acc=acc, m=m, l=l, q=q,
        wsem=wsem, msem=msem, ksem=ksem, vsem=vsem,
    )
    _kernel_body(cfg, B, int4, refs)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def talker_step_fused(
    params: Dict[str, Any],
    cfg,
    x: jax.Array,            # [B, H] embedding input (cfg.dtype)
    positions: jax.Array,    # [B] int32 RoPE positions (slot - pad_offset)
    slot: jax.Array,         # scalar or [B] int32 cache write slot
    kv_len: jax.Array,       # [B] int32 tokens already cached (pre-update)
    valid_from: jax.Array,   # [B] int32 first valid cache slot (left pad)
    k_cache: jax.Array,      # [L, B, nk, T, hd] persistent cache
    v_cache: jax.Array,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One fused talker decode step.

    Returns (hidden [B, H] cfg.dtype (post final-norm), logits [B, vocab]
    f32, k_cache, v_cache) — drop-in for models/decoder.forward at S=1.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from . import rope as rope_mod

    H, L, V = cfg.hidden, cfg.n_layers, cfg.vocab
    nq, nk, hd = cfg.n_q_heads, cfg.n_kv_heads, cfg.head_dim
    F, T = cfg.ffn_dim, k_cache.shape[3]
    NQKV = (nq + 2 * nk) * hd
    dt = jnp.dtype(cfg.dtype)
    B = x.shape[0]
    sub = 16 if dt == jnp.bfloat16 else 8
    Bp = max(sub, -(-B // sub) * sub)
    Ra = max(8, B * nq)

    lw = params["layers"]
    wqkv, m_qkv, sc_qkv = _split_w(lw["wqkv"], NQKV)
    wo, m_wo, sc_wo = _split_w(lw["wo"], H)
    wgu, m_gu, sc_gu = _split_w(lw["w_gu"], 2 * F)
    wdown, m_down, sc_down = _split_w(lw["w_down"], H)
    whead, m_head, sc_head = _split_w(params["head"], V)
    int4 = m_qkv is not None
    if int4:
        assert all(x is not None for x in (m_wo, m_gu, m_down, m_head)), \
            "mixed int4/non-int4 decoder weights are not supported"
        G4 = quant_mod.GROUP4
        assert H % (2 * G4) == 0 and F % (2 * G4) == 0 \
            and (nq * hd) % (2 * G4) == 0
    else:
        dummy = jnp.zeros((L, 1, 1), jnp.int8)
        m_qkv = m_wo = m_gu = m_down = dummy
        m_head = dummy[0]

    # panel widths: narrower weight bytes allow wider panels for the same
    # VMEM budget (int4 packs two rows per byte AND halves the row count).
    # QWEN3_TTS_TALKER_PANEL overrides the base width (trace-time knob for
    # tools/bench_ablate.py sweeps; production default measured on v5e).
    # Trace-time means it is NOT part of the jit cache key: changing it
    # mid-process needs jax.clear_caches() (ADVICE r3). Malformed values
    # fall back to PW instead of killing the step.
    try:
        pw_base = int(os.environ.get("QWEN3_TTS_TALKER_PANEL", PW))
    except ValueError:
        pw_base = PW
    wbytes = jnp.dtype(wqkv.dtype).itemsize
    cap = (2 * pw_base) if int4 else (pw_base if wbytes == 1
                                      else pw_base // 2)
    # wcap serves qkv/wo/gu (N = NQKV, H, 2F); the head would otherwise
    # stream gcd(V, wcap)=128-lane slivers (V=2176 shares only 2^7 with the
    # cap), so the shared buffer gets enough lanes to take the whole head
    # as ONE panel when V is moderate (<= 2304 lanes keeps the buffer well
    # under the raised per-kernel VMEM cap)
    wcap = _pw(math.gcd(NQKV, math.gcd(H, 2 * F)), cap)
    lanes_h = max(wcap, V) if V <= 2304 else wcap
    fcap = _pw(H, cap // 2)
    wrows_h = H // 2 if int4 else H        # wo/head use a row slice
    wrows_f = F // 2 if int4 else F
    ngmax = max(H, nq * hd, F) // quant_mod.GROUP4 if int4 else 1

    xp = x.astype(dt)
    if Bp != B:
        xp = jnp.pad(xp, ((0, Bp - B), (0, 0)))

    pos4 = rope_mod.mrope_positions(positions[:, None])       # [4, B, 1]
    cos, sin = rope_mod.rope_angles(pos4, cfg.mrope_sections, hd,
                                    cfg.rope_theta)           # [B, 1, hd]
    cos = cos[:, 0].astype(jnp.float32)
    sin = sin[:, 0].astype(jnp.float32)
    if Bp != B:
        cos = jnp.pad(cos, ((0, Bp - B), (0, 0)))
        sin = jnp.pad(sin, ((0, Bp - B), (0, 0)))
    cos_q = jnp.broadcast_to(cos[:, None], (Bp, nq, hd))
    sin_q = jnp.broadcast_to(sin[:, None], (Bp, nq, hd))
    cos_k = jnp.broadcast_to(cos[:, None], (Bp, nk, hd))
    sin_k = jnp.broadcast_to(sin[:, None], (Bp, nk, hd))

    # per-batch-row prefix bounds, read as SMEM scalars in the kernel
    kv_len = jnp.asarray(kv_len, jnp.int32).reshape(B)
    valid_from = jnp.asarray(valid_from, jnp.int32).reshape(B)
    kv_max = jnp.max(kv_len).reshape(1)

    kc = k_cache.reshape(L, B * nk, T, hd)
    vc = v_cache.reshape(L, B * nk, T, hd)

    ymax = max(NQKV, 2 * F, H, V)
    kern = functools.partial(_kernel, cfg=cfg, B=B, int4=int4,
                             wcap_panel=wcap)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    aspec = pl.BlockSpec(memory_space=pl.ANY)

    hidden, logits, knew, vnew = pl.pallas_call(
        kern,
        in_specs=[vspec] * 5 + [sspec] * 3 + [vspec] * 10 + [aspec] * 12,
        out_specs=(vspec, vspec, vspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, H), dt),                  # hidden
            jax.ShapeDtypeStruct((Bp, V), jnp.float32),         # logits
            jax.ShapeDtypeStruct((L, B * nk, hd), jnp.float32),  # knew
            jax.ShapeDtypeStruct((L, B * nk, hd), jnp.float32),  # vnew
        ),
        scratch_shapes=[
            pltpu.VMEM((Bp, H), jnp.float32),                   # x (residual)
            pltpu.VMEM((Bp, ymax), jnp.float32),                # y
            pltpu.VMEM((2, nk, ABLK, hd), kc.dtype),            # kbuf (1 row)
            pltpu.VMEM((2, nk, ABLK, hd), vc.dtype),            # vbuf
            pltpu.VMEM((2, wrows_h, lanes_h), wqkv.dtype),      # wbuf_h
            pltpu.VMEM((2, wrows_f, fcap), wdown.dtype),        # wbuf_f
            pltpu.VMEM((2, ngmax, lanes_h), jnp.int8),          # mbuf
            pltpu.VMEM((Ra, hd), jnp.float32),                  # acc
            pltpu.VMEM((Ra, 128), jnp.float32),                 # m
            pltpu.VMEM((Ra, 128), jnp.float32),                 # l
            pltpu.VMEM((Ra, hd), jnp.float32),                  # q
            pltpu.SemaphoreType.DMA((2,)),                      # wsem
            pltpu.SemaphoreType.DMA((2,)),                      # msem
            pltpu.SemaphoreType.DMA(()),                        # ksem
            pltpu.SemaphoreType.DMA(()),                        # vsem
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xp, cos_q, sin_q, cos_k, sin_k, kv_len, valid_from, kv_max,
      lw["ln1"].astype(jnp.float32), lw["ln2"].astype(jnp.float32),
      lw["q_norm"].astype(jnp.float32), lw["k_norm"].astype(jnp.float32),
      params["final_norm"].reshape(1, H).astype(jnp.float32),
      sc_qkv, sc_wo, sc_gu, sc_down, sc_head.reshape(1, V),
      wqkv, wo, wgu, wdown, whead,
      m_qkv, m_wo, m_gu, m_down, m_head, kc, vc)

    # stacked cache write OUTSIDE the kernel (pre-update-cache formulation,
    # exactly like the flash-decode path): in-place via donation, and one
    # dynamic_update_slice when every row writes the same slot.
    new_k = knew.reshape(L, B, nk, 1, hd).astype(k_cache.dtype)
    new_v = vnew.reshape(L, B, nk, 1, hd).astype(v_cache.dtype)
    slot = jnp.asarray(slot, jnp.int32)
    zero = jnp.int32(0)
    if slot.ndim == 0:
        # all rows share the slot: one dynamic_update_slice (no scatter)
        k_out = jax.lax.dynamic_update_slice(
            k_cache, new_k, (zero, zero, zero, slot, zero))
        v_out = jax.lax.dynamic_update_slice(
            v_cache, new_v, (zero, zero, zero, slot, zero))
    else:
        def row_write(cab, nb, s):   # cab [L, nk, T, hd]; nb [L, nk, 1, hd]
            return jax.lax.dynamic_update_slice(cab, nb, (zero, zero, s, zero))

        k_out = jax.vmap(row_write, in_axes=(1, 1, 0), out_axes=1)(
            k_cache, new_k, slot)
        v_out = jax.vmap(row_write, in_axes=(1, 1, 0), out_axes=1)(
            v_cache, new_v, slot)
    return hidden[:B], logits[:B], k_out, v_out


def usable(cfg, batch: int, params=None,
           cache_window=None) -> bool:
    """Static eligibility of the fused talker step for compiled execution."""
    if os.environ.get("QWEN3_TTS_NO_FUSED_TALKER") == "1":
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    if backend != "tpu":      # pltpu primitives: TPU only
        return False
    H, F, V = cfg.hidden, cfg.ffn_dim, cfg.vocab
    NQKV = (cfg.n_q_heads + 2 * cfg.n_kv_heads) * cfg.head_dim
    ok = (
        cfg.n_q_heads % cfg.n_kv_heads == 0
        and cfg.head_dim % 128 == 0
        and cfg.n_q_heads * cfg.head_dim <= H   # wo streams K=nq*hd rows of
                                                # the [2, H, pw] buffer
        and H % 256 == 0
        and NQKV % 256 == 0
        and (2 * F) % 256 == 0
        and V % 128 == 0
        and (cache_window or cfg.max_seq) % ABLK == 0
        and cfg.n_q_heads % 8 == 0              # per-row q slices must be
                                                # sublane-aligned f32 tiles
        and batch <= 32                         # Ra/knew/vnew VMEM budget
                                                # (32 validated on v5e with
                                                # the 256-slot KV window)
    )
    if ok and params is not None and quant_mod.is_quantized4(
            params["layers"]["wqkv"]):
        g2 = 2 * quant_mod.GROUP4               # packed halves x k-groups
        ok = (H % g2 == 0 and F % g2 == 0
              and (cfg.n_q_heads * cfg.head_dim) % g2 == 0)
    return ok
