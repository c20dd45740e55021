"""Prompt assembly: token/codec embedding arithmetic -> [S, 2048] sequences.

Vectorised JAX re-implementation of the reference `PromptBuilder`
(`src/tts/prompt.rs:26-278`). The prompt is a sequence of 2048-d vectors, each
the SUM of a text-table row and a codec-table row (or a raw speaker
embedding); layout order (SURVEY.md §2 "Prompt layout"):

  1. optional instruct block  <|im_start|>user\n ... <|im_end|>\n
  2. role block               <|im_start|>assistant\n
  3. control block            marker + codec0[{THINK, THINK_BOS, lang,
                              THINK_EOS}] (or NOTHINK variant)
  4. speaker                  marker + codec0[spk_id]  |  marker + spk_emb
  5. clone mid-block          ref text (BOS/ids/EOS + pad0), codec-BOS,
                              per-frame marker + sum_q codec_q[code], pad0
  6. task text                BOS_TOKEN/ids/EOS_TOKEN each + codec0[PAD]
  7. activation               marker + codec0[BOS]

Everything is `jnp.take` + adds — one fused gather program per prompt, batched
upstream by the engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..assets.tables import Assets
from ..core import protocol as P


@dataclass
class PromptData:
    """Mirror of the reference PromptData (src/tts/prompt.rs:18-22)."""

    embeds: jax.Array            # [S, dim]
    text_ids: np.ndarray         # task-text token ids
    spk_emb: np.ndarray          # [dim] (zeros when generating by spk_id)


def _text_rows(assets: Assets, ids) -> jax.Array:
    return assets.text_embedding(jnp.asarray(np.asarray(ids, np.int32)))


def _codec0_rows(assets: Assets, ids) -> jax.Array:
    ids = jnp.asarray(np.asarray(ids, np.int32))
    return assets.codec_embedding(jnp.zeros_like(ids), ids)


def build_core(
    assets: Assets,
    text_ids: Sequence[int],
    lang_id: Optional[int] = None,
    spk_id: Optional[int] = None,
    spk_emb: Optional[np.ndarray] = None,
    instruct_ids: Optional[Sequence[int]] = None,
    mid_embeds: Optional[jax.Array] = None,
) -> PromptData:
    """Reference `build_core` (src/tts/prompt.rs:141-277) on device arrays."""
    dim = assets.text_table.shape[1]
    parts = []

    # 1. instruct block (src/tts/prompt.rs:154-169)
    if instruct_ids is not None:
        ins = [P.IM_START, P.ROLE_USER, P.NEWLINE, *instruct_ids,
               P.IM_END, P.NEWLINE]
        parts.append(_text_rows(assets, ins))

    # 2. role block (src/tts/prompt.rs:173-175)
    parts.append(_text_rows(assets, [P.IM_START, P.ROLE_ASSISTANT, P.NEWLINE]))

    marker = assets.text_embedding(jnp.int32(P.TEXT_AUDIO_MARKER))

    # 3. control block (src/tts/prompt.rs:180-204)
    if lang_id is not None:
        ctrl = [P.THINK, P.THINK_BOS, lang_id, P.THINK_EOS]
    else:
        ctrl = [P.NOTHINK, P.THINK_BOS, P.THINK_EOS]
    parts.append(marker[None] + _codec0_rows(assets, ctrl))

    # speaker (src/tts/prompt.rs:207-222)
    if spk_id is not None:
        parts.append(marker[None] + _codec0_rows(assets, [spk_id]))
    elif spk_emb is not None:
        parts.append(marker[None] + jnp.asarray(spk_emb, jnp.float32)[None])

    # 4. clone mid-block
    if mid_embeds is not None:
        parts.append(mid_embeds)

    # 5. task text: BOS_TOKEN / ids / EOS_TOKEN each + codec0[PAD]
    #    (src/tts/prompt.rs:229-254)
    pad0 = assets.codec_embedding(jnp.int32(0), jnp.int32(P.PAD))
    task = [P.BOS_TOKEN, *text_ids, P.EOS_TOKEN]
    parts.append(_text_rows(assets, task) + pad0[None])

    # 6. activation (src/tts/prompt.rs:257-264)
    parts.append((marker + _codec0_rows(assets, [P.BOS])[0])[None])

    embeds = jnp.concatenate(parts, axis=0)
    return PromptData(
        embeds=embeds,
        text_ids=np.asarray(list(text_ids), np.int32),
        spk_emb=(
            np.asarray(spk_emb, np.float32)
            if spk_emb is not None
            else np.zeros((dim,), np.float32)
        ),
    )


def build_clone_mid_block(
    assets: Assets,
    ref_codes: np.ndarray,           # [n_frames, 16] (or flat multiple of 16)
    ref_text_ids: Sequence[int],
) -> jax.Array:
    """Clone-prompt identity overlay (src/tts/prompt.rs:28-106):
    ref text (BOS/ids/EOS each + pad0), then codec-BOS, per-frame code sums,
    and a PAD terminator — every audio row also gets the marker added."""
    marker = assets.text_embedding(jnp.int32(P.TEXT_AUDIO_MARKER))
    pad0 = assets.codec_embedding(jnp.int32(0), jnp.int32(P.PAD))

    ref_codes = np.asarray(ref_codes, np.int32).reshape(-1, P.NUM_CODEBOOKS)

    ids = [P.BOS_TOKEN, *ref_text_ids, P.EOS_TOKEN]
    text_part = _text_rows(assets, ids) + pad0[None]

    codec_bos = (marker + assets.codec_embedding(jnp.int32(0),
                                                 jnp.int32(P.CODEC_BOS)))[None]
    frames = marker[None] + assets.frame_embedding_sum(jnp.asarray(ref_codes))
    terminator = (marker + pad0)[None]

    return jnp.concatenate([text_part, codec_bos, frames, terminator], axis=0)


def build_clone_prompt(
    assets: Assets,
    text_ids: Sequence[int],
    ref_codes: np.ndarray,
    ref_text_ids: Sequence[int],
    spk_emb: np.ndarray,
    lang_id: Optional[int] = P.DEFAULT_LANG_ID,
    instruct_ids: Optional[Sequence[int]] = None,
) -> PromptData:
    """Reference `build_clone_prompt` (src/tts/prompt.rs:28-118)."""
    mid = build_clone_mid_block(assets, ref_codes, ref_text_ids)
    return build_core(
        assets, text_ids, lang_id=lang_id, spk_id=None, spk_emb=spk_emb,
        instruct_ids=instruct_ids, mid_embeds=mid,
    )


def build_custom_prompt(
    assets: Assets,
    text_ids: Sequence[int],
    spk_id: int,
    lang_id: Optional[int] = P.DEFAULT_LANG_ID,
    instruct_ids: Optional[Sequence[int]] = None,
) -> PromptData:
    """Reference `build_custom_prompt` (src/tts/prompt.rs:120-138)."""
    return build_core(
        assets, text_ids, lang_id=lang_id, spk_id=spk_id,
        instruct_ids=instruct_ids,
    )


PROMPT_BUCKET = 64


def pad_batch(prompts: Sequence[jax.Array], bucket: int = PROMPT_BUCKET,
              cap: int | None = None):
    """LEFT-pad a ragged list of [S_i, dim] prompts to one [B, S_max, dim]
    batch + pad offsets [B] (consumed by talker.prefill's kv_valid_from).

    S_max rounds up to a multiple of `bucket`, so prompts of similar length
    share one compiled prefill/generation program instead of recompiling the
    fused while_loop for every distinct text length (pad slots are fully
    masked, so results are invariant — tested). `cap` bounds S_max from above
    (but never below the longest prompt) so bucket padding cannot consume
    context slots the generation loop needs."""
    s_raw = max(int(p.shape[0]) for p in prompts)
    s_max = ((s_raw + bucket - 1) // bucket) * bucket if bucket > 1 else s_raw
    if cap is not None:
        s_max = max(s_raw, min(s_max, cap))
    dim = int(prompts[0].shape[1])
    out = np.zeros((len(prompts), s_max, dim), np.float32)
    offs = np.zeros((len(prompts),), np.int32)
    for i, p in enumerate(prompts):
        s = int(p.shape[0])
        out[i, s_max - s:] = np.asarray(p, np.float32)
        offs[i] = s_max - s
    return jnp.asarray(out), jnp.asarray(offs)
