"""TtsEngine: the public orchestration layer.

API mirror of the reference engine (`src/tts/engine.rs:74-240`):
`TtsEngine(model_dir, ...)`, `load_speakers`, `get_speaker` (vivian
fallback), `set_sampler_config`, `set_max_steps`, `generate`,
`generate_with_voice`, `generate_stream`, `create_voice_file` — re-designed
around fused TPU programs instead of per-token FFI calls.

Weight sources, resolved in order:
  * `<model_dir>/qwen3_assets.gguf` + `{talker,predictor,vocoder}.npz`
    checkpoints (convert upstream weights with tools/convert_weights.py);
  * `random_weights=True`: seeded random init (tests / benchmarks — the
    public reference weights are not redistributable and this container has
    no egress).

Generation paths:
  * offline  — `generate.generate_audio`: ONE fused device program
    (generation `lax.while_loop` -> one-shot vocoder decode), no host
    round-trip between codes and waveform;
  * stream   — jitted 4-frame step + chunked vocoder decode, emitting
    ~333 ms waveform chunks exactly like the reference decoder thread's
    64-code batching (`src/tts/engine.rs:487-543`).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..assets import checkpoint, tables
from ..core import protocol as P
from ..core.config import EngineConfig, SamplerConfig
from ..models import decoder, vocoder
from ..utils import cache as feature_cache
from ..utils.audio import AudioSample
from ..utils.tokenizer import load_tokenizer
from ..utils.voice_file import VoiceFile
from . import generate, prompt


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Persistent XLA compilation cache for the product path.

    The reference pays a dlopen at startup; our equivalent cost is the
    9-12 s jit compile+warmup of the fused programs. With a persistent
    cache a RESTARTED process deserializes the executables instead of
    recompiling, so first-request latency approaches the reference's.

    Resolution: explicit `cache_dir` > an already-configured
    jax_compilation_cache_dir (e.g. the CLI's --compile-cache, set before
    engine construction) > env QWEN3_TTS_COMPILE_CACHE ("0"/"" disables)
    > ~/.cache/qwen3_tts_tpu/xla. Returns the directory in use, or None
    when disabled or unwritable (a cache must never fail construction).
    """
    if cache_dir is None:
        configured = jax.config.jax_compilation_cache_dir
        env = os.environ.get("QWEN3_TTS_COMPILE_CACHE")
        if configured:
            cache_dir = configured
        elif env is not None:
            if env in ("", "0"):
                return None
            cache_dir = env
        else:
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "qwen3_tts_tpu", "xla")
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError as e:
        import warnings
        warnings.warn(f"compilation cache disabled: {cache_dir!r} is not "
                      f"writable ({e})")
        return None
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program (default min sizes skip small ones; the stream
    # prefill/step programs are exactly what a restart must not recompile)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir


class TtsEngine:
    def __init__(
        self,
        model_dir: Optional[str] = None,
        config: Optional[EngineConfig] = None,
        *,
        quant: str = "none",
        random_weights: bool = False,
        seed: int = 0,
        speakers_dir: Optional[str] = None,
        compile_cache: bool = True,
    ):
        if compile_cache:
            # restarted processes deserialize the fused programs instead of
            # recompiling (see enable_compilation_cache)
            enable_compilation_cache()
        self.config = config or EngineConfig()
        self.model_dir = model_dir
        self.quant = quant
        self.max_steps = self.config.max_steps
        self.sampler_config = SamplerConfig()
        self.speakers: Dict[str, VoiceFile] = {}
        self.encoder = None          # audio codec encoder (optional, like
        self.speaker_encoder = None  # the reference's .ok() loads)

        cfg = self.config
        if random_weights:
            k = jax.random.split(jax.random.key(seed), 4)
            assets = tables.random_assets(
                k[0],
                text_vocab=P.TEXT_VOCAB if cfg.talker.hidden >= 2048 else 1024,
                codec_rows=3072 if cfg.talker.hidden >= 2048 else 2176,
                dim=cfg.talker.hidden,
                proj_dim=cfg.predictor.hidden,
            )
            self.models = {
                "talker": decoder.init_decoder(k[1], cfg.talker),
                "predictor": decoder.init_decoder(k[2], cfg.predictor),
                "assets": assets,
            }
            self.vocoder_params = vocoder.init_vocoder(k[3], cfg.vocoder)
            self.tokenizer = load_tokenizer(model_dir or "")
        elif model_dir is not None:
            # per-quant subdirectory first (the downloader's layout,
            # src/download.rs:55-101), flat model_dir second
            from ..download import quant_dir
            qdir = os.path.join(model_dir, quant_dir(quant))

            def resolve(name):
                cand = os.path.join(qdir, name)
                return cand if os.path.exists(cand) \
                    else os.path.join(model_dir, name)

            assets = tables.load_assets(
                qdir if os.path.exists(
                    os.path.join(qdir, "qwen3_assets.gguf")) else model_dir)
            # a converted release persists its (possibly graph-derived)
            # vocoder architecture — e.g. the BigVGAN/DAC general upsampler
            # family — next to vocoder.npz; the engine must deserialize
            # and decode against THAT config, keeping only the caller's
            # serving dtype choice
            vcfg_path = resolve("vocoder_config.json")
            if os.path.exists(vcfg_path):
                import dataclasses

                from ..core.config import load_vocoder_config
                vcfg = dataclasses.replace(load_vocoder_config(vcfg_path),
                                           dtype=cfg.vocoder.dtype)
                if vcfg != cfg.vocoder:
                    cfg = dataclasses.replace(cfg, vocoder=vcfg)
                    self.config = cfg
            like_v = jax.eval_shape(
                lambda: vocoder.init_vocoder(jax.random.key(0), cfg.vocoder))
            self.models = {
                "talker": self._load_decoder(resolve, "talker", cfg.talker),
                "predictor": self._load_decoder(resolve, "predictor",
                                                cfg.predictor),
                "assets": assets,
            }
            self.vocoder_params = checkpoint.load_pytree(
                resolve("vocoder.npz"), like_v)
            self.tokenizer = load_tokenizer(model_dir)
            self._load_optional_encoders(model_dir)
        else:
            raise ValueError("need model_dir or random_weights=True")

        # non-f32 vocoder dtype (the TPU serving config, e.g.
        # dataclasses.replace(cfg.vocoder, dtype="bfloat16")): cast the
        # transformer trunk once at load; checkpoints always store f32
        self.vocoder_params = vocoder.with_dtype(self.vocoder_params,
                                                 cfg.vocoder)

        # speakers dir resolution mirrors src/tts/engine.rs:157-166
        sdir = speakers_dir
        if sdir is None and model_dir is not None:
            cand = os.path.join(model_dir, "preset_speakers")
            sdir = cand if os.path.isdir(cand) else "speakers"
        if sdir and os.path.isdir(sdir):
            self.load_speakers(sdir)

        # pre-projected codebook tables for the fused predictor kernel
        # (ops/fused_predictor.py); usable() gates on backend + geometry, so
        # tiny/CPU configs skip this and keep the dense XLA path
        self._fused_rows = 0
        from ..ops import fused_predictor
        if fused_predictor.usable(cfg.predictor, 1):
            ptab, rows = fused_predictor.make_ptab(
                self.models["assets"], cfg.predictor)
            self.models["pred_ptab"] = ptab
            self._fused_rows = rows

        self._stream_fns = {}

    # ------------------------------------------------------------------ setup
    @staticmethod
    def download_models(model_dir: str = "models", quant: str = "none",
                        offline: Optional[bool] = None) -> Dict[str, str]:
        """Fetch (or verify) the model manifest for `quant` into `model_dir`
        — parity with the reference's `TtsEngine::download_models`
        (src/tts/engine.rs:234, delegating to src/download.rs:41). Returns
        {relative path: exists|downloaded|missing|corrupt}; offline
        environments report instead of fetching."""
        from ..download import Downloader
        return Downloader(offline=offline).check_and_download(
            model_dir, quant)

    def _load_decoder(self, resolve, kind: str, cfg):
        """Converted .npz checkpoint first; the reference's own
        `qwen3_tts_{kind}.gguf` (llama.cpp layout) as the direct fallback,
        exactly what the downloader fetches (no conversion step needed)."""
        npz = resolve(f"{kind}.npz")
        if os.path.exists(npz):
            like = jax.eval_shape(
                lambda: decoder.init_decoder(jax.random.key(0), cfg))
            return checkpoint.load_pytree(npz, like)
        gpath = resolve(f"qwen3_tts_{kind}.gguf")
        if os.path.exists(gpath):
            from ..assets.llama_gguf import convert_llama_gguf
            gcfg, params = convert_llama_gguf(gpath, kind)
            for field in ("hidden", "n_layers", "n_q_heads", "n_kv_heads",
                          "head_dim", "ffn_dim"):
                got, want = getattr(gcfg, field), getattr(cfg, field)
                if got != want:
                    raise ValueError(
                        f"{gpath}: GGUF {field}={got} but the engine config "
                        f"says {want}")
            dt = jnp.dtype(cfg.dtype)
            return jax.tree.map(lambda a: jnp.asarray(a, dt), params)
        raise FileNotFoundError(
            f"no {kind} weights: tried {npz} and {gpath} "
            f"(run TtsEngine.download_models or tools/convert_weights.py)")

    def save_checkpoint(self, out_dir: str) -> None:
        """Persist all model weights as .npz checkpoints loadable by
        TtsEngine(model_dir=...). Assets are written as GGUF (the container
        format the reference also uses, src/assets_manager.rs:14-26)."""
        import numpy as np

        from ..assets import gguf as gguf_mod

        os.makedirs(out_dir, exist_ok=True)
        checkpoint.save_pytree(os.path.join(out_dir, "talker.npz"),
                               self.models["talker"])
        checkpoint.save_pytree(os.path.join(out_dir, "predictor.npz"),
                               self.models["predictor"])
        # checkpoints always store f32 (a bf16 serving trunk casts back)
        checkpoint.save_pytree(
            os.path.join(out_dir, "vocoder.npz"),
            jax.tree.map(
                lambda a: jnp.asarray(a, jnp.float32)
                if jnp.asarray(a).dtype == jnp.bfloat16 else a,
                self.vocoder_params))
        # persist the vocoder architecture (general-family configs cannot
        # be reconstructed from the npz alone); stored with the f32
        # checkpoint dtype — the loader re-applies its serving dtype
        import dataclasses

        from ..core.config import save_vocoder_config
        save_vocoder_config(
            os.path.join(out_dir, "vocoder_config.json"),
            dataclasses.replace(self.config.vocoder, dtype="float32"))
        a = self.models["assets"]
        tensors = {
            "proj.weight": np.asarray(a.proj_weight, np.float32),
            "proj.bias": np.asarray(a.proj_bias, np.float32),
            "text_embd": np.asarray(a.text_table, np.float32),
        }
        for i in range(a.codec_tables.shape[0]):
            tensors[f"codec_embd.{i}"] = np.asarray(a.codec_tables[i],
                                                    np.float32)
        gguf_mod.write_gguf(os.path.join(out_dir, "qwen3_assets.gguf"),
                            tensors)

    def _load_optional_encoders(self, model_dir: str) -> None:
        """Encoders are optional: preset-speaker synthesis works without
        them; cloning raises (src/tts/engine.rs:107-120, 289-295)."""
        from ..models import encoders as enc

        try:
            self.encoder, self.speaker_encoder = enc.load_encoders(
                model_dir, self.config)
        except FileNotFoundError:
            self.encoder = self.speaker_encoder = None

    def set_max_steps(self, steps: int) -> None:
        self.max_steps = int(steps)

    def warmup(self, prompt_buckets: Sequence[int] = (64,),
               batch_sizes: Sequence[int] = (1,)) -> None:
        """Precompile the generation + vocoder programs for the given prompt
        buckets (see prompt.PROMPT_BUCKET) and batch sizes, so the first real
        request doesn't pay compile latency (~10-20 s on TPU)."""
        cfg = self.config
        dim = int(self.models["assets"].text_table.shape[1])
        for b in batch_sizes:
            for s in prompt_buckets:
                if s >= cfg.talker.max_seq:
                    continue
                fake = [jnp.zeros((s, dim)) for _ in range(b)]
                batch, offsets = self._pad_prompts(fake)
                bucket, steps = self._offline_extents(int(batch.shape[1]))
                sc = self.sampler_config
                # the offline path is ONE fused program (generation ->
                # vocoder); warming it covers both stages. MUST use the
                # same (bucket, step_cap) signature as _run_inference or
                # the first real request recompiles.
                wav, n = generate.generate_audio(
                    self.models, self.vocoder_params, cfg.talker,
                    cfg.predictor, cfg.vocoder, batch, offsets,
                    jax.random.key(0), sc.temperature, sc.top_k, sc.top_p,
                    bucket, fused_rows=self._fused_rows,
                    step_cap=jnp.int32(steps))
                jax.block_until_ready((wav, n))
        # streaming path: the make_stream_fns pair used by generate_stream
        # and ServingEngine, plus the chunk-sized vocoder decode, so the
        # first streaming request runs at steady-state latency (VERDICT r1 #7)
        for b in batch_sizes:
            self.warmup_streaming(prompt_buckets, batch=b)

    def warmup_streaming(self, prompt_buckets: Sequence[int] = (64,),
                         batch: int = 1) -> None:
        """Precompile the streaming (prefill, step) pair and the chunked
        vocoder program for `batch` concurrent rows."""
        cfg = self.config
        sc = self.sampler_config
        dim = int(self.models["assets"].text_table.shape[1])
        prefill_fn, step_fn = self._get_stream_fns()
        for s in prompt_buckets:
            if s >= cfg.talker.max_seq:
                continue
            fake = [jnp.zeros((s, dim)) for _ in range(batch)]
            b_arr, offsets = self._pad_prompts(fake)
            state = prefill_fn(self.models, b_arr, offsets, jax.random.key(0),
                               sc.temperature, sc.top_p)
            state, codes, active = step_fn(self.models, state)
            jax.block_until_ready((codes, active))
        vstate = vocoder.init_state(cfg.vocoder, batch)
        wav, _, _ = vocoder.decode(
            self.vocoder_params, cfg.vocoder,
            jnp.zeros((batch, P.STREAM_CHUNK_FRAMES, P.NUM_CODEBOOKS),
                      jnp.int32), vstate, False)
        jax.block_until_ready(wav)

    def _get_stream_fns(self):
        """Memoised (prefill, step) pair for the current sampler config."""
        sc = self.sampler_config
        key = (sc.top_k, P.STREAM_CHUNK_FRAMES, self._fused_rows)
        if key not in self._stream_fns:
            self._stream_fns[key] = generate.make_stream_fns(
                self.config.talker, self.config.predictor, top_k=sc.top_k,
                frames_per_call=P.STREAM_CHUNK_FRAMES,
                fused_rows=self._fused_rows,
            )
        return self._stream_fns[key]

    def set_sampler_config(self, config: SamplerConfig) -> None:
        self.sampler_config = config

    def get_sampler_config(self) -> SamplerConfig:
        return self.sampler_config

    def load_speakers(self, speakers_dir: str) -> None:
        for name in sorted(os.listdir(speakers_dir)):
            if not name.endswith(".json") or name == "index.json":
                continue
            path = os.path.join(speakers_dir, name)
            try:
                self.speakers[name[:-5]] = VoiceFile.load(path)
            except (ValueError, KeyError, OSError):
                continue

    def get_speaker(self, id_or_name: str) -> VoiceFile:
        """Lookup with vivian fallback (src/tts/engine.rs:211-231)."""
        if id_or_name in self.speakers:
            return self.speakers[id_or_name]
        for v in self.speakers.values():
            if v.name == id_or_name:
                return v
        if "vivian" in self.speakers:
            return self.speakers["vivian"]
        if self.speakers:
            return next(iter(self.speakers.values()))
        raise RuntimeError("No speakers loaded in engine!")

    # ------------------------------------------------------------- generation
    def _prompt_for_voice(self, text: str, voice: VoiceFile,
                          instruct: Optional[str]) -> prompt.PromptData:
        ids = self.tokenizer.encode(text)
        instruct_ids = self.tokenizer.encode(instruct) if instruct else None
        lang = self.config.lang_id
        if not voice.audio_codes:
            # preset path: spk_emb-only prompt (src/tts/engine.rs:398-412)
            return prompt.build_core(
                self.models["assets"], ids, lang_id=lang,
                spk_emb=self._fit_spk(voice.spk_emb), instruct_ids=instruct_ids,
            )
        ref_ids = self.tokenizer.encode(voice.ref_text)
        return prompt.build_clone_prompt(
            self.models["assets"], ids, voice.codes_array, ref_ids,
            self._fit_spk(voice.spk_emb), lang_id=lang,
            instruct_ids=instruct_ids,
        )

    def _pad_prompts(self, embeds_list):
        """Bucket-pad prompts, clamping the bucket to the talker context and
        rejecting prompts that alone exceed it (reference n_ctx,
        src/tts/engine.rs:133)."""
        max_seq = self.config.talker.max_seq
        for e in embeds_list:
            if len(e) >= max_seq:
                raise ValueError(
                    f"prompt length {len(e)} >= talker context {max_seq}")
        bucket = min(prompt.PROMPT_BUCKET, max_seq)
        # reserve at least a chunk of context for frames after bucket padding
        cap = max_seq - min(P.STREAM_CHUNK_FRAMES * 2, max_seq // 4)
        return prompt.pad_batch(embeds_list, bucket=bucket, cap=cap)

    def _fit_spk(self, emb: np.ndarray) -> np.ndarray:
        """Truncate/zero-pad speaker embeddings to the table width (tiny test
        configs use narrow tables; production is 2048 == 2048)."""
        dim = int(self.models["assets"].text_table.shape[1])
        emb = np.asarray(emb, np.float32).reshape(-1)
        if emb.size == dim:
            return emb
        out = np.zeros(dim, np.float32)
        out[: min(dim, emb.size)] = emb[:dim]
        return out

    def _seed_key(self) -> jax.Array:
        seed = self.sampler_config.seed
        if seed is None:
            seed = time.time_ns() & 0x7FFFFFFFFFFFFFFF
        return jax.random.key(seed)

    def generate_with_voice(
        self, text: str, voice: VoiceFile, instruct: Optional[str] = None,
    ) -> AudioSample:
        data = self._prompt_for_voice(text, voice, instruct)
        return self._run_inference([data])[0]

    def generate_long(
        self,
        text: str,
        voice: VoiceFile,
        instruct: Optional[str] = None,
        max_chunk_tokens: int = 48,
        pause_s: float = 0.0,
    ) -> AudioSample:
        """Synthesize text of ARBITRARY length.

        The reference (and generate_with_voice) is bounded by the talker
        context: long text is silently truncated at --max-steps (SURVEY
        §5 long-context row — the reference has no answer beyond the
        cap). Here the text is split at sentence boundaries into chunks
        of at most `max_chunk_tokens` tokens, every chunk is synthesized
        with the SAME voice as ONE data-parallel batch through the fused
        program (ragged prompts left-padded — long text becomes a DP
        batch, the TPU-native shape for it), and the waveforms are
        concatenated in order, with `pause_s` of silence between chunks.
        """
        ids = self.tokenizer.encode(text)
        if len(ids) <= max_chunk_tokens:
            return self.generate_with_voice(text, voice, instruct)

        # split at sentence enders; fall back to hard token cuts for a
        # single run-on sentence longer than the cap
        import re
        sentences = [s for s in re.split(r"(?<=[。！？.!?;\n])\s*", text)
                     if s.strip()]
        chunks: List[str] = []
        cur = ""
        for s in sentences:
            cand = (cur + " " + s).strip() if cur else s
            if cur and len(self.tokenizer.encode(cand)) > max_chunk_tokens:
                chunks.append(cur)
                cur = s
            else:
                cur = cand
            while len(self.tokenizer.encode(cur)) > max_chunk_tokens:
                cut_ids = self.tokenizer.encode(cur)[:max_chunk_tokens]
                head = self.tokenizer.decode(cut_ids)
                # decode() of a prefix may not land on a char boundary;
                # fall back to a character split of equivalent length
                if not head or head not in cur:
                    head = cur[: max(1, len(cur) // 2)]
                chunks.append(head)
                cur = cur[len(head):].strip()
        if cur:
            chunks.append(cur)

        pieces = self.generate_batch(chunks, [voice] * len(chunks),
                                     instruct)
        pause = np.zeros(int(pause_s * P.SAMPLE_RATE), np.float32)
        wavs: List[np.ndarray] = []
        for i, p in enumerate(pieces):
            if i and pause.size:
                wavs.append(pause)
            wavs.append(np.asarray(p.samples, np.float32))
        return AudioSample(samples=np.concatenate(wavs) if wavs
                           else np.zeros(0, np.float32),
                           sample_rate=P.SAMPLE_RATE, channels=1)

    def generate_batch(
        self,
        texts: Sequence[str],
        voices: Sequence[VoiceFile],
        instruct: Optional[str] = None,
    ) -> List[AudioSample]:
        """Data-parallel batched synthesis (ragged prompts left-padded)."""
        datas = [self._prompt_for_voice(t, v, instruct)
                 for t, v in zip(texts, voices)]
        return self._run_inference(datas)

    def generate(
        self, text: str, ref_audio_path: str, ref_text: str,
        instruct: Optional[str] = None,
    ) -> AudioSample:
        """Clone from raw reference audio (src/tts/engine.rs:243-272)."""
        ref_codes, spk_emb = self.process_reference(ref_audio_path)
        ids = self.tokenizer.encode(text)
        ref_ids = self.tokenizer.encode(ref_text)
        instruct_ids = self.tokenizer.encode(instruct) if instruct else None
        data = prompt.build_clone_prompt(
            self.models["assets"], ids,
            np.asarray(ref_codes, np.int64).reshape(-1, 16), ref_ids,
            self._fit_spk(spk_emb), lang_id=self.config.lang_id,
            instruct_ids=instruct_ids,
        )
        return self._run_inference([data])[0]

    def process_reference(self, audio_path: str):
        """Encode ref audio -> (codes, spk_emb), with the TTSC sidecar cache
        short-circuit (src/tts/engine.rs:275-302)."""
        cache_path = os.path.splitext(audio_path)[0] + ".cache"
        if os.path.exists(cache_path):
            try:
                return feature_cache.load_cache(cache_path)
            except ValueError:
                pass
        if self.encoder is None or self.speaker_encoder is None:
            raise RuntimeError(
                "AudioEncoder/SpeakerEncoder not loaded (required for "
                "processing raw audio)")
        audio = AudioSample.load_wav(audio_path)
        codes = self.encoder.encode(audio.samples)
        emb = self.speaker_encoder.encode(audio.samples)
        try:
            feature_cache.save_cache(cache_path, codes, emb)
        except OSError:
            pass
        return codes, emb

    def create_voice_file(self, audio_path: str, ref_text: str) -> VoiceFile:
        """Extract a VoiceFile from 24 kHz reference audio
        (src/tts/engine.rs:324-387)."""
        if self.encoder is None or self.speaker_encoder is None:
            raise RuntimeError(
                "AudioEncoder/SpeakerEncoder not loaded. Cloning requires "
                "encoder checkpoints in <model_dir>.")
        audio = AudioSample.load_wav(audio_path)
        if audio.sample_rate != 24000:
            raise ValueError(
                f"Expected 24000Hz audio, found {audio.sample_rate}Hz")
        codes = self.encoder.encode(audio.samples)
        emb = self.speaker_encoder.encode(audio.samples)
        return VoiceFile(
            ref_text=ref_text,
            audio_codes=[int(c) for c in np.asarray(codes).reshape(-1)],
            speaker_embedding=[float(x) for x in np.asarray(emb)],
        )

    # ------------------------------------------------------------- internals
    def _offline_extents(self, prompt_cols: int):
        """(compiled bucket extent, exact per-request step cap) for the
        fused offline program. Bucketing the static extent to a few sizes
        lets distinct max-steps values share one compiled program; the
        dynamic step_cap keeps behavior exact (tested)."""
        cfg = self.config
        room = cfg.talker.max_seq - prompt_cols
        steps = min(self.max_steps, max(room, 1), cfg.vocoder.max_frames)
        bucket = steps
        for b in (16, 32, 64, 128, 256, 512, 1024):
            if steps <= b <= max(room, 1) and b <= cfg.vocoder.max_frames:
                bucket = b
                break
        return bucket, steps

    def _run_inference(self, datas: List[prompt.PromptData]) -> List[AudioSample]:
        cfg = self.config
        sc = self.sampler_config
        batch, offsets = self._pad_prompts([d.embeds for d in datas])
        # cap generation at the talker context (reference n_ctx=4096,
        # src/tts/engine.rs:133): prompt slots + frames must fit the cache
        bucket, steps = self._offline_extents(int(batch.shape[1]))
        # ONE device program end-to-end (generation while_loop -> vocoder):
        # no host round-trip between codes and waveform. Identical output
        # to the two-step bucketed path (generate.generate_audio docstring).
        wav, n_frames = generate.generate_audio(
            self.models, self.vocoder_params, cfg.talker, cfg.predictor,
            cfg.vocoder, batch, offsets, self._seed_key(),
            sc.temperature, sc.top_k, sc.top_p, bucket,
            fused_rows=self._fused_rows,
            step_cap=jnp.int32(steps),
        )
        wav = np.asarray(wav)
        n_frames = np.asarray(n_frames)
        out = []
        for b in range(wav.shape[0]):
            n = int(n_frames[b])
            out.append(AudioSample(
                samples=wav[b, : n * cfg.vocoder.frame_samples].astype(
                    np.float32),
                sample_rate=P.SAMPLE_RATE, channels=1,
            ))
        return out

    def generate_stream(
        self,
        text: str,
        voice: VoiceFile,
        instruct: Optional[str] = None,
        on_chunk: Optional[Callable[[np.ndarray], None]] = None,
    ) -> AudioSample:
        """Streaming synthesis: ~333 ms (4-frame / 64-code) waveform chunks
        delivered via `on_chunk` as soon as each chunk is vocoded, matching
        the reference's decoder-thread batching (src/tts/engine.rs:487-543)."""
        cfg = self.config
        sc = self.sampler_config
        data = self._prompt_for_voice(text, voice, instruct)
        batch, offsets = self._pad_prompts([data.embeds])
        prefill_fn, step_fn = self._get_stream_fns()

        state = prefill_fn(self.models, batch, offsets, self._seed_key(),
                           sc.temperature, sc.top_p)
        # vocoding runs on a worker thread (the TPU analog of the reference's
        # decoder thread, src/tts/engine.rs:487-543): generation keeps
        # dispatching while chunks vocode/convert/callback concurrently
        from ..parallel.pipeline import VocoderPipeline

        pipe = VocoderPipeline(self.vocoder_params, cfg.vocoder, batch=1,
                               on_chunk=on_chunk)
        # frame budget: --max-steps, the talker context room left after the
        # prompt (n_ctx, src/tts/engine.rs:133), and the vocoder's streaming
        # KV capacity — same cap the offline path applies (VERDICT r1 #5)
        budget = min(self.max_steps,
                     max(cfg.talker.max_seq - int(batch.shape[1]), 1),
                     cfg.vocoder.max_frames)
        steps = 0
        while steps < budget:
            state, codes, active = step_fn(self.models, state)
            active = np.asarray(active)[0]          # [chunk]
            n_new = min(int(active.sum()), budget - steps)
            steps += P.STREAM_CHUNK_FRAMES
            done = bool(np.asarray(state["done"])[0])
            if n_new > 0:
                # is_final on the EOS chunk flushes the vocoder lookahead
                # (src/models/onnx.rs is_last contract); a stream ending
                # with an empty chunk is drained by pipe.close()
                pipe.submit(np.asarray(codes)[:, :n_new], is_final=done)
            if done:
                break
        samples = pipe.close()
        return AudioSample(samples=samples, sample_rate=P.SAMPLE_RATE,
                           channels=1)


def cleanup() -> None:
    """API-parity no-op: the reference must free llama.cpp's backend
    (`src/lib.rs:18-20`); JAX buffers are garbage-collected."""
