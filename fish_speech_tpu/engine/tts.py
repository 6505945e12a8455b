"""Streaming TTS inference engine: request -> audio segments.

Orchestrates reference loading, LM generation and codec decoding, yielding
header/segment/final/error results (reference
`fish_speech/inference_engine/__init__.py`).

TPU-first difference: there is no model-owner thread + queue pair
(`inference.py:748-799`) — the jitted step functions are pure and the
engine serializes device access with a plain lock. Segment codec-decode is
batched per generation chunk.
"""

from __future__ import annotations

import dataclasses
import threading
from dataclasses import dataclass
from typing import Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.audio.io import load_audio, wav_chunk_header
from fish_speech_tpu.config import DACConfig
from fish_speech_tpu.engine.reference_loader import ReferenceLoader
from fish_speech_tpu.generate import GenerationSession, generate_long
from fish_speech_tpu.models.dac import dac_encode, dac_from_indices
from fish_speech_tpu.tokenizer import FishTokenizer


class _NullLock:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


@dataclass
class InferenceResult:
    code: str  # "header" | "segment" | "error" | "final"
    audio: Optional[Tuple[int, np.ndarray]]
    error: Optional[Exception] = None


@dataclass
class TTSRequest:
    """Mirror of the server schema (`utils/schema.py:81-107`)."""

    text: str
    chunk_length: int = 200
    format: str = "wav"
    references: list = dataclasses.field(default_factory=list)
    reference_id: Optional[str] = None
    seed: Optional[int] = None
    use_memory_cache: str = "off"
    normalize: bool = True
    streaming: bool = False
    max_new_tokens: int = 1024
    top_p: float = 0.8
    repetition_penalty: float = 1.1
    temperature: float = 0.8
    top_k: int = 30
    # optional () -> bool polled between decode chunks; True abandons the
    # request (server wires the client-disconnect event here)
    cancel_check: Optional[callable] = None


class TTSInferenceEngine:
    def __init__(
        self,
        session: GenerationSession,
        tokenizer: FishTokenizer,
        codec_params,
        codec_cfg: DACConfig,
        references_dir: str = "references",
    ):
        self.session = session
        self.tokenizer = tokenizer
        self.codec_params = codec_params
        self.codec_cfg = codec_cfg
        self.references = ReferenceLoader(references_dir)
        self.references.encode_reference = self.encode_reference
        self.lock = threading.Lock()
        # raw-codec endpoint cache (see encode_references_batch)
        from collections import OrderedDict

        self._vq_cache = OrderedDict()
        self._vq_cache_lock = threading.Lock()
        self.vq_cache_hits = 0
        self.vq_cache_misses = 0
        self._decode_jit = jax.jit(
            lambda p, c: dac_from_indices(p, self.codec_cfg, c),
            static_argnums=(),
        )
        self._encode_jit = jax.jit(
            lambda p, a: dac_encode(p, self.codec_cfg, a)
        )
        # code-length buckets so segment decode compiles once per bucket
        # (the codec is causal, so pad-then-slice is EXACT: padded frames
        # cannot affect earlier output samples)
        self.code_buckets = (32, 64, 128, 256, 512, 1024, 2048)

    @property
    def sample_rate(self) -> int:
        return self.codec_cfg.sample_rate

    # -- codec glue (reference `vq_manager.py`) --

    def encode_reference(self, audio_bytes: bytes) -> np.ndarray:
        """Audio bytes -> (num_codebooks, T) codes.

        Thin wrapper over the batched/cached path (ONE copy of the
        bucket/pad/trim logic; batch == single equality is pinned by
        tests): reference encodes get the LRU for free."""
        return self.encode_references_batch([audio_bytes])[0]

    def decode_vq_tokens(self, codes: np.ndarray) -> np.ndarray:
        """(num_codebooks, T) codes -> (T_samples,) float waveform."""
        return self.decode_vq_batch([np.asarray(codes, dtype=np.int32)])[0]

    # -- batched/cached raw-codec surface (reference
    #    `tools/server/model_utils.py:31-86`: 10k-entry LRU over encodes,
    #    micro-batch-8 decodes). Keying is PER AUDIO (sha256) rather than
    #    the reference's whole-request tuple, so a request repeating one
    #    known clip among new ones still hits for that clip. --

    VQ_CACHE_SIZE = 10_000  # reference model_utils.py:31
    VQ_MICRO_BATCH = 8  # reference model_utils.py:75

    def _micro_rows(self, n: int) -> int:
        """Pad a micro-batch to a power-of-two row count so each bucket
        compiles at most 4 batch signatures (1/2/4/8)."""
        for r in (1, 2, 4, 8):
            if n <= r:
                return r
        return self.VQ_MICRO_BATCH

    def encode_references_batch(self, audios) -> list:
        """[audio bytes] -> [(num_codebooks, T) codes], LRU-cached per clip
        and batch-encoded per frame-bucket for the misses."""
        import hashlib

        keys = [hashlib.sha256(a).digest() for a in audios]
        out = [None] * len(audios)
        misses = []
        with self._vq_cache_lock:
            for i, k in enumerate(keys):
                if k in self._vq_cache:
                    self._vq_cache.move_to_end(k)
                    out[i] = self._vq_cache[k]
                    self.vq_cache_hits += 1
                else:
                    misses.append(i)
                    self.vq_cache_misses += 1
        if not misses:
            return out

        frame = self.codec_cfg.frame_length
        groups = {}  # bucket -> [(idx, wav, n_frames)]
        for i in misses:
            wav = load_audio(audios[i], self.codec_cfg.sample_rate)
            n_frames = max(-(-len(wav) // frame), 1)
            bucket = next(
                (b for b in self.code_buckets if n_frames <= b), n_frames
            )
            groups.setdefault(bucket, []).append((i, wav, n_frames))

        for bucket, items in groups.items():
            for j in range(0, len(items), self.VQ_MICRO_BATCH):
                chunk = items[j : j + self.VQ_MICRO_BATCH]
                rows = self._micro_rows(len(chunk))
                padded = np.zeros((rows, 1, bucket * frame), dtype=np.float32)
                for r, (_, wav, _) in enumerate(chunk):
                    padded[r, 0, : len(wav)] = wav
                codes, _ = self._encode_jit(
                    self.codec_params, jnp.asarray(padded)
                )
                codes = np.asarray(codes)
                for r, (i, _, n_frames) in enumerate(chunk):
                    out[i] = codes[r][:, :n_frames]
        with self._vq_cache_lock:
            for i in misses:
                self._vq_cache[keys[i]] = out[i]
                self._vq_cache.move_to_end(keys[i])
            while len(self._vq_cache) > self.VQ_CACHE_SIZE:
                self._vq_cache.popitem(last=False)
        return out

    def decode_vq_batch(self, tokens_list) -> list:
        """[(num_codebooks, T_i) codes] -> [(T_samples_i,) float32], padded
        per code-bucket and decoded in micro-batches of 8 (one weight read
        per micro-batch instead of one per item)."""
        out = [None] * len(tokens_list)
        groups = {}
        for i, codes in enumerate(tokens_list):
            t = codes.shape[1]
            bucket = next((b for b in self.code_buckets if t <= b), t)
            groups.setdefault(bucket, []).append((i, codes, t))
        frame = self.codec_cfg.frame_length
        for bucket, items in groups.items():
            for j in range(0, len(items), self.VQ_MICRO_BATCH):
                chunk = items[j : j + self.VQ_MICRO_BATCH]
                rows = self._micro_rows(len(chunk))
                padded = np.zeros(
                    (rows, tokens_list[0].shape[0], bucket), dtype=np.int32
                )
                for r, (_, codes, t) in enumerate(chunk):
                    padded[r, :, :t] = codes
                audio = np.asarray(
                    self._decode_jit(self.codec_params, jnp.asarray(padded))
                )
                for r, (i, _, t) in enumerate(chunk):
                    out[i] = audio[r, 0, : t * frame].astype(np.float32)
        return out

    def _decode_vq_device(self, codes_dev):
        """Device-resident variant: dispatch the codec decode on a jax
        (num_codebooks, T) array WITHOUT any host sync (the low-TTFA
        streaming path — the LM chunk that produced `codes_dev` may still
        be in flight). Returns the device audio (1, 1, bucket*frame);
        the caller fetches and slices to the confirmed frame count."""
        import jax.lax

        t = codes_dev.shape[1]
        bucket = next((b for b in self.code_buckets if t <= b), t)
        padded = jax.lax.dynamic_update_slice(
            jnp.zeros((codes_dev.shape[0], bucket), jnp.int32),
            codes_dev.astype(jnp.int32), (0, 0),
        )
        return self._decode_jit(self.codec_params, padded[None])

    # -- main entry --

    def inference(self, req: TTSRequest) -> Generator[InferenceResult, None, None]:
        prompt_tokens: List[np.ndarray] = []
        prompt_texts: List[str] = []
        try:
            if req.reference_id is not None:
                prompt_tokens, prompt_texts = self.references.load_by_id(
                    req.reference_id, req.use_memory_cache
                )
            elif req.references:
                prompt_tokens, prompt_texts = self.references.load_by_hash(
                    req.references, req.use_memory_cache
                )
        except Exception as e:  # reference load failures -> error result
            yield InferenceResult(code="error", audio=None, error=e)
            return

        if req.streaming:
            yield InferenceResult(
                code="header",
                audio=(
                    self.sample_rate,
                    np.frombuffer(
                        wav_chunk_header(sample_rate=self.sample_rate), dtype=np.uint8
                    ),
                ),
            )

        segments: List[np.ndarray] = []
        # A continuous-batching session handles concurrency itself; only
        # serialize access for single-stream sessions.
        lock = (
            _NullLock() if getattr(self.session, "concurrent", False) else self.lock
        )
        emitted = 0  # samples of the in-progress segment already streamed
        try:
            with lock:
                for response in generate_long(
                    session=self.session,
                    tokenizer=self.tokenizer,
                    text=req.text,
                    max_new_tokens=req.max_new_tokens,
                    top_p=req.top_p,
                    top_k=req.top_k,
                    temperature=req.temperature,
                    chunk_length=req.chunk_length,
                    prompt_text=list(prompt_texts) or None,
                    prompt_tokens=list(prompt_tokens) or None,
                    seed=req.seed if req.seed is not None else 42,
                    stream_partials=req.streaming,
                    device_partials=(
                        req.streaming
                        and not getattr(self.session, "concurrent", False)
                        # multi-host leader: the device-partial codec decode
                        # would feed an LM array committed to the process-
                        # spanning mesh into the process-LOCAL codec jit
                        # (incompatible device sets); the host path streams
                        # per-chunk audio and replays identically on
                        # followers (server/multihost.py)
                        and not getattr(
                            self.session, "_multihost_leader", False
                        )
                    ),
                    cancel_check=req.cancel_check,
                ):
                    if req.cancel_check is not None and req.cancel_check():
                        return
                    if response.action == "partial":
                        # per-decode-chunk streaming: decode the cumulative
                        # prefix (the codec is causal, so earlier samples are
                        # stable to float precision as the prefix grows) and
                        # emit only the new samples
                        if response.valid_frames is not None:
                            # device partial: dispatch the codec decode
                            # FIRST (no host sync), then fetch/trim — the
                            # im_end/budget confirmation round-trip overlaps
                            # the codec compute
                            audio_dev = self._decode_vq_device(response.codes)
                            n_valid = response.valid_frames()
                            n = n_valid * self.codec_cfg.frame_length
                            full = np.asarray(
                                audio_dev[0, 0, :n], dtype=np.float32
                            )
                        else:
                            full = self.decode_vq_tokens(response.codes)
                        if len(full) > emitted:
                            yield InferenceResult(
                                code="segment",
                                audio=(self.sample_rate, full[emitted:]),
                            )
                            emitted = len(full)
                        continue
                    if response.action != "sample":
                        continue
                    segment = self.decode_vq_tokens(response.codes)
                    segments.append(segment)
                    if req.streaming and len(segment) > emitted:
                        yield InferenceResult(
                            code="segment",
                            audio=(self.sample_rate, segment[emitted:]),
                        )
                    emitted = 0  # next text segment starts fresh
        except Exception as e:
            yield InferenceResult(code="error", audio=None, error=e)
            return

        if req.cancel_check is not None and req.cancel_check():
            return  # abandoned by the client: no error, no final
        if not segments:
            yield InferenceResult(
                code="error",
                audio=None,
                error=RuntimeError("No audio generated, please check the input text."),
            )
        else:
            audio = np.concatenate(segments, axis=0)
            yield InferenceResult(code="final", audio=(self.sample_rate, audio))
