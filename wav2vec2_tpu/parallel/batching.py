"""Batched, sharded alignment — the throughput dimension the reference lacks.

The reference aligns one utterance per forward (ONNX batch dim must be 1,
model_runtime.rs:592-597; the CLI loop is sequential). Here utterances are
bucketed by (audio length, token length), padded, and pushed through ONE
jitted graph per bucket: forward → log-softmax → vmapped banded Viterbi →
per-frame evidence — with the batch axis sharded over the mesh's 'data'
axis. Only T-length vectors (path, emission lp, margin, blank prob) return
to host; grouping stays host-side per utterance (words ≤ ~100).
"""

from __future__ import annotations

import functools
import logging
import time
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..align.grouping import group_into_words
from ..align.grouping.path_to_words import FrameEvidence
from ..align.tokenization import build_token_sequence_case_aware
from ..config import AlignerHyperParams, Wav2Vec2ModelConfig
from ..models.ctc_model import frame_lengths, log_softmax_logits, wav2vec2_forward, _freeze_cfg
from ..types import AlignmentOutput

logger = logging.getLogger(__name__)


def _round_up(x: int, m: int) -> int:
    return max(-(-x // m) * m, m)


def _round_up_pow2(x: int, m: int) -> int:
    """Round x up to m·2^k — a geometric padding grid."""
    n = m
    while n < x:
        n *= 2
    return n


def _pad_len(x: int, m: int, scheme: str) -> int:
    if scheme == "pow2":
        return _round_up_pow2(x, m)
    if scheme == "linear":
        return _round_up(x, m)
    raise ValueError(f"unknown bucket scheme: {scheme!r}")


def _pad_batch_rows(b_target: int, *arrays):
    """Pad the batch dim to b_target by repeating each array's last row.

    Padded rows are real (duplicate) work whose results callers ignore —
    the same trick submit_padded_batch uses for mesh divisibility. Keeping
    the batch dim on a power-of-two grid bounds the number of distinct
    compiled program shapes: each distinct (B, N_pad, S_pad) is a separate
    XLA program, and on a fresh process every program pays a first-run
    load/compile cost that dwarfs the padded rows' FLOPs."""
    out = []
    for a in arrays:
        pad = b_target - a.shape[0]
        out.append(
            np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)
            if pad > 0 else a
        )
    return out


@dataclass
class Bucket:
    """One padded batch of utterance indices sharing (n_pad, s_pad)."""

    indices: list[int]
    n_pad: int
    s_pad: int


def bucket_utterances(
    audio_lens: Sequence[int],
    token_lens: Sequence[int],
    audio_multiple: int = 16000,
    token_multiple: int = 128,
    max_batch: int = 64,
    scheme: str = "pow2",
) -> list[Bucket]:
    """Group utterances into padded (n_pad, s_pad) buckets. Padding is exact
    (masked model + banded DP), so bucketing only trades FLOPs for fewer XLA
    compilations.

    scheme="pow2" (default) rounds lengths up on a geometric grid
    (multiple·2^k), bounding the shape vocabulary to O(log max_len) buckets
    regardless of the dataset's duration spread; "linear" rounds to the next
    multiple (tightest padding, one shape per distinct rounded length)."""
    groups: dict[tuple[int, int], list[int]] = {}
    for i, (n, s) in enumerate(zip(audio_lens, token_lens)):
        key = (_pad_len(n, audio_multiple, scheme),
               _pad_len(s, token_multiple, scheme))
        groups.setdefault(key, []).append(i)
    buckets = []
    for (n_pad, s_pad), idxs in sorted(groups.items()):
        for i in range(0, len(idxs), max_batch):
            buckets.append(Bucket(idxs[i : i + max_batch], n_pad, s_pad))
    return buckets


def _normalize_batch(audio, audio_lens):
    """On-device zero-mean/unit-variance per utterance over the valid
    samples, padded region zeroed. f32 two-pass statistics (the host path
    uses f64, runtime.rs:501-517 parity; at 16-bit audio dynamic range the
    f32/f64 difference is below quantization noise). Accepts int16 audio —
    shipping PCM to the chip halves host→device bandwidth."""
    x = audio.astype(jnp.float32)
    n_pad = x.shape[1]
    m = (jnp.arange(n_pad)[None, :] < audio_lens[:, None]).astype(jnp.float32)
    cnt = jnp.maximum(audio_lens.astype(jnp.float32), 1.0)
    mean = jnp.sum(x * m, axis=1, keepdims=True) / cnt[:, None]
    centered = (x - mean) * m
    var = jnp.sum(centered * centered, axis=1, keepdims=True) / cnt[:, None]
    std = jnp.maximum(jnp.sqrt(var), 1e-7)
    return centered / std


def _evidence_batch(log_probs, tokens, paths, blank_id):
    """[B,T,V],[B,S],[B,T] → per-frame evidence vectors [B,T]."""
    t_pad = log_probs.shape[1]
    bidx = jnp.arange(log_probs.shape[0])[:, None]
    tidx = jnp.arange(t_pad)[None, :]
    emit_lp = log_probs[bidx, tidx, jnp.take_along_axis(tokens, paths, axis=1)]
    top2 = jax.lax.top_k(log_probs, 2)[0]
    margin = jnp.where(
        jnp.isfinite(top2).all(axis=-1), top2[..., 0] - top2[..., 1], jnp.float32(0.0)
    )
    blank_prob = jnp.exp(log_probs[:, :, blank_id])
    entropy = -jnp.sum(jnp.exp(log_probs) * log_probs, axis=-1)
    return emit_lp, margin, blank_prob, entropy


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "use_pallas", "interpret",
                     "normalize", "return_log_probs"),
)
def _batch_align_kernel(
    params, audio, audio_lens, tokens, s_lens, blank_id, cfg, compute_dtype,
    use_pallas, interpret, normalize=False, return_log_probs=False,
):
    if normalize:
        audio = _normalize_batch(audio, audio_lens)
    logits = wav2vec2_forward(
        params, audio, cfg, audio_lens=audio_lens, compute_dtype=compute_dtype
    )
    log_probs = log_softmax_logits(logits)
    t_lens = frame_lengths(cfg, audio_lens)
    if use_pallas:
        from ..ops.viterbi_pallas import viterbi_pallas_batch

        # tier-aware: vmapped VMEM-resident kernel for typical shapes, a
        # grid-over-batch kernel (VMEM- or HBM-backpointer) beyond — long
        # transcripts never fall back to the scan DP
        paths = viterbi_pallas_batch(
            log_probs, tokens, t_lens, s_lens, interpret=interpret
        )
    else:
        from ..ops.viterbi_ref import viterbi_single

        paths = jax.vmap(viterbi_single)(log_probs, tokens, t_lens, s_lens)
    emit_lp, margin, blank_prob, entropy = _evidence_batch(
        log_probs, tokens, paths, blank_id
    )
    if return_log_probs:
        # correctness-audit variant (bench.py verify pass): expose the same
        # graph's log-probs so oracle comparisons are bit-meaningful —
        # a standalone forward could fuse (and round) differently
        return paths, t_lens, emit_lp, margin, blank_prob, entropy, log_probs
    return paths, t_lens, emit_lp, margin, blank_prob, entropy


class BatchAligner:
    """High-throughput batch alignment engine.

    `mesh` (optional) shards the batch over the 'data' axis; params are
    placed replicated (or TP-sharded via parallel.mesh.shard_params before
    construction).
    """

    def __init__(
        self,
        model_cfg: Wav2Vec2ModelConfig,
        params: dict,
        vocab: dict[str, int],
        compute_dtype: str = "bfloat16",
        mesh=None,
        use_pallas: bool | None = None,
        hp: AlignerHyperParams | None = None,
        sample_rate_hz: int = 16000,
        normalize_on_device: bool = False,
        quantize_int8: bool = False,
        units: str = "word",
        use_flash_attention: bool | None = None,
    ):
        from ..ops.viterbi_pallas import on_tpu

        self.normalize_on_device = normalize_on_device
        if use_flash_attention is None:
            # auto: enable the fused-attention kernel on real TPU. Dispatch
            # inside ops/flash_attention.use_flash is measurement-driven —
            # the kernel fires only for the conformer rel-pos style where
            # it measurably wins (880→1238× realtime); plain/rotary models
            # keep XLA's fused attention (reports/flash_ab_r5.jsonl). int8
            # serving keeps the XLA path everywhere (its projections feed
            # the MXU's int8 kernels, scores are unaffected but unproven —
            # opt in explicitly). Under a mesh the launch runs inside
            # jax.shard_map (batch over 'data', heads over 'model' — no
            # collectives), exercised by dryrun_multichip's flash phase.
            use_flash_attention = on_tpu() and not quantize_int8
        if isinstance(model_cfg, Wav2Vec2ModelConfig) and bool(
            getattr(model_cfg, "use_flash_attention", False)
        ) != bool(use_flash_attention):
            # symmetric override: explicit False clears a cfg that arrived
            # with the flag set, explicit/auto True sets it
            import dataclasses

            model_cfg = dataclasses.replace(
                model_cfg, use_flash_attention=bool(use_flash_attention)
            )
        flash_spmd = (
            mesh.abstract_mesh
            if use_flash_attention and mesh is not None and mesh.size > 1
            else None
        )
        self.cfg = _freeze_cfg(model_cfg, flash_spmd=flash_spmd)
        if quantize_int8:
            # opt-in int8 serving mode: encoder projections run on the MXU's
            # int8 path (~2x bf16 rate on v5e); see models/quantize.py
            from ..models.quantize import quantize_encoder_int8

            params = quantize_encoder_int8(params)
        if compute_dtype == "bfloat16" and mesh is None:
            # bf16 weight STORAGE is bit-identical under bf16 compute (every
            # consumption site casts to x.dtype) and halves weight HBM +
            # upload — 4 GB → 2 GB for mms-1b serving. Skipped with a mesh:
            # pre-sharded caller params keep their placement/dtype.
            from ..models.quantize import cast_compute_weights_bf16

            params = cast_compute_weights_bf16(params)
        self.params = params
        self.vocab = vocab
        self.blank_id = model_cfg.pad_token_id
        self.word_sep_id = vocab.get("|", 0)
        self.stride_ms = model_cfg.frame_stride_ms(sample_rate_hz)
        self.hp = hp or AlignerHyperParams()
        self.mesh = mesh
        self.compute_dtype = (
            jnp.float32 if compute_dtype == "float32" else jnp.bfloat16
        )
        self.use_pallas = on_tpu() if use_pallas is None else use_pallas
        self.interpret = not on_tpu()
        if units not in ("word", "phoneme"):
            raise ValueError(f"units must be 'word' or 'phoneme', got {units!r}")
        self.units = units

    def _tokenize(self, transcript: str):
        if self.units == "phoneme":
            from ..align.tokenization import build_token_sequence_phoneme

            return build_token_sequence_phoneme(
                transcript, self.vocab, self.blank_id, self.word_sep_id
            )
        return build_token_sequence_case_aware(
            transcript, self.vocab, self.blank_id, self.word_sep_id
        )

    def _group(self, path_states, seq, evidence):
        """Grouping dispatch: word mode runs the full grouping orchestrator
        (expansion + selection + calibration); phoneme mode emits raw
        per-state units (align/grouping/phoneme.py)."""
        if self.units == "phoneme":
            from ..align.grouping.phoneme import group_into_phonemes

            return group_into_phonemes(
                path_states, seq, evidence, self.blank_id, self.word_sep_id,
                self.stride_ms,
            )
        return group_into_words(
            path_states, seq.tokens, seq.chars, seq.normalized_words,
            evidence, self.blank_id, self.word_sep_id, self.stride_ms, self.hp,
        )

    def _device_put_batch(self, audio, audio_lens, tokens, s_lens):
        if self.mesh is None:
            return map(jnp.asarray, (audio, audio_lens, tokens, s_lens))
        from .mesh import batch_sharding

        bs = batch_sharding(self.mesh)
        return (
            jax.device_put(audio, bs),
            jax.device_put(audio_lens, bs),
            jax.device_put(tokens, bs),
            jax.device_put(s_lens, bs),
        )

    def submit_padded_batch(self, audio, audio_lens, tokens, s_lens,
                            return_log_probs=False):
        """Enqueue one padded batch; returns DEVICE handles without blocking
        (uploads and kernels run async — the double-buffering lever). With a
        mesh, the batch dim is padded to a multiple of the 'data' axis size
        (rows are replicated; callers index only their real rows)."""
        on_device = hasattr(audio, "block_until_ready")
        if not on_device:
            # host staging; device-resident inputs (pre-staged by callers)
            # must NOT round-trip through numpy
            audio = np.ascontiguousarray(audio)
            audio_lens = np.asarray(audio_lens, np.int32)
            tokens = np.asarray(tokens, np.int32)
            s_lens = np.asarray(s_lens, np.int32)
        if self.mesh is not None:
            # both host-staged and pre-staged device batches must be padded
            # to the 'data'-axis multiple — a non-divisible batch dim can't
            # shard over the mesh
            data_size = self.mesh.shape.get("data", 1)
            pad = (-audio.shape[0]) % data_size
            if pad:
                xp = jnp if on_device else np
                def _pad_rows(a):
                    return xp.concatenate([a, xp.repeat(a[-1:], pad, axis=0)], axis=0)
                audio = _pad_rows(audio)
                audio_lens = _pad_rows(audio_lens)
                tokens = _pad_rows(tokens)
                s_lens = _pad_rows(s_lens)
        audio, audio_lens, tokens, s_lens = self._device_put_batch(
            audio, audio_lens, tokens, s_lens
        )
        from ..ops.viterbi_pallas import fits_vmem, on_tpu

        t_pad = self.cfg.conv_output_length(int(audio.shape[1]))
        use_pallas = self.use_pallas
        if use_pallas and not fits_vmem(t_pad, int(tokens.shape[1])):
            # beyond the VMEM backpointer budget the vmapped kernel
            # self-delegates to the HBM-backpointer tier
            # (viterbi_pallas_single → viterbi_pallas_single_hbm) — batch
            # mode keeps full DP throughput on long transcripts instead of
            # silently downgrading to the ~70x-slower lax.scan DP
            logger.debug(
                "batch DP %dx%d exceeds the VMEM tier; HBM-backpointer "
                "kernel engaged", t_pad, int(tokens.shape[1]),
            )
        elif not use_pallas and on_tpu():
            logger.warning(
                "batch DP running the lax.scan fallback on TPU "
                "(use_pallas=False) — expect a large DP slowdown"
            )
        return _batch_align_kernel(
            self.params, audio, audio_lens, tokens, s_lens,
            jnp.int32(self.blank_id), self.cfg, self.compute_dtype,
            use_pallas, self.interpret, self.normalize_on_device,
            return_log_probs,
        )

    def align_padded_batch(self, audio, audio_lens, tokens, s_lens):
        """audio [B, N_pad] (pre-normalized f32, or raw when
        normalize_on_device), tokens [B, S_pad] int32. Returns host tuples
        (paths, t_lens, emit_lp, margin, blank_prob, entropy)."""
        out = self.submit_padded_batch(audio, audio_lens, tokens, s_lens)
        return tuple(np.asarray(x) for x in out)

    def align_stream(
        self,
        items,
        audio_multiple: int = 16000,
        token_multiple: int = 128,
        max_batch: int = 64,
        max_in_flight: int = 2,
        max_pending: int = 256,
        bucket_scheme: str = "pow2",
        pad_batch: bool = True,
    ):
        """Streaming serving API: consume an iterable of (audio, transcript)
        and yield (index, AlignmentOutput) with BOUNDED memory — audio is
        read lazily, buckets submit as they fill, and device work overlaps
        host grouping (the double-buffered pattern bench.py measures).

        Results arrive in COMPLETION order (bucketing reorders by shape);
        each is tagged with the input index. Degenerate inputs (empty audio
        or transcript) yield immediately; an utterance too short for its
        transcript raises InvalidInputError like align_utterances.

        `max_pending` bounds utterances waiting in partially-filled buckets:
        on a live feed with diverse lengths, odd shapes would otherwise wait
        for the end of the stream; when the cap is hit, the fullest pending
        bucket submits early (a partial batch trades some padding FLOPs for
        bounded latency/memory).

        The CLI's batch mode and align_utterances load everything upfront;
        this is the path for live feeds and datasets larger than RAM."""
        from ..errors import InvalidInputError
        from ..pipeline.runtime import _utterance_frame_stats, normalize_audio

        pending: dict[tuple[int, int], list[tuple[int, np.ndarray, object]]] = {}
        in_flight: list[tuple[list, tuple[int, int], tuple]] = []

        def submit(entries, key):
            n_pad, s_pad = key
            b = len(entries)
            dtype = (
                np.asarray(entries[0][1]).dtype
                if self.normalize_on_device else np.float32
            )
            audio = np.zeros((b, n_pad), dtype)
            tokens = np.zeros((b, s_pad), np.int32)
            a_l = np.zeros(b, np.int32)
            s_l = np.zeros(b, np.int32)
            for j, (_, a, seq) in enumerate(entries):
                audio[j, : len(a)] = (
                    a if self.normalize_on_device else normalize_audio(a)
                )
                tokens[j, : len(seq.tokens)] = seq.tokens
                a_l[j] = len(a)
                s_l[j] = len(seq.tokens)
            if pad_batch:
                audio, a_l, tokens, s_l = _pad_batch_rows(
                    min(max_batch, _round_up_pow2(b, 1)), audio, a_l, tokens, s_l
                )
            return self.submit_padded_batch(audio, a_l, tokens, s_l)

        def drain(entries, key, handles):
            paths, t_lens, emit_lp, margin, blank_prob, entropy = (
                np.asarray(h) for h in handles
            )
            for j, (idx, _, seq) in enumerate(entries):
                t_i = int(t_lens[j])
                ev = FrameEvidence(
                    emit_lp=emit_lp[j, :t_i],
                    margin=margin[j, :t_i],
                    blank_prob=blank_prob[j, :t_i].astype(np.float64),
                    entropy=entropy[j, :t_i],
                )
                words = self._group(paths[j, :t_i], seq, ev)
                stats = _utterance_frame_stats(
                    paths[j, :t_i], seq.tokens, self.blank_id, ev
                )
                yield idx, AlignmentOutput(words=words, frame_stats=stats)

        for idx, (audio, transcript) in enumerate(items):
            audio = np.asarray(audio)
            seq = self._tokenize(transcript)
            if len(audio) == 0 or not transcript.strip() or not seq.normalized_words:
                yield idx, AlignmentOutput(words=[])
                continue
            t_i = self.cfg.conv_output_length(len(audio))
            min_frames = -(-len(seq.tokens) // 2)
            if t_i < min_frames:
                raise InvalidInputError(
                    f"utterance {idx}: audio too short for transcript: "
                    f"{t_i} frames < {min_frames} required"
                )
            key = (_pad_len(len(audio), audio_multiple, bucket_scheme),
                   _pad_len(len(seq.tokens), token_multiple, bucket_scheme))
            entries = pending.setdefault(key, [])
            entries.append((idx, audio, seq))
            if len(entries) >= max_batch:
                del pending[key]
                in_flight.append((entries, key, submit(entries, key)))
                if len(in_flight) > max_in_flight:
                    yield from drain(*in_flight.pop(0))
            elif sum(len(v) for v in pending.values()) >= max_pending:
                # bounded wait: flush the fullest partial bucket early
                flush_key = max(pending, key=lambda k: len(pending[k]))
                flush_entries = pending.pop(flush_key)
                in_flight.append(
                    (flush_entries, flush_key, submit(flush_entries, flush_key))
                )
                if len(in_flight) > max_in_flight:
                    yield from drain(*in_flight.pop(0))

        for key in sorted(pending):
            entries = pending[key]
            in_flight.append((entries, key, submit(entries, key)))
            if len(in_flight) > max_in_flight:
                yield from drain(*in_flight.pop(0))
        while in_flight:
            yield from drain(*in_flight.pop(0))

    def align_utterances(
        self,
        audios: Sequence[np.ndarray],
        transcripts: Sequence[str],
        audio_multiple: int = 16000,
        token_multiple: int = 128,
        max_batch: int = 64,
        bucket_scheme: str = "pow2",
        pad_batch: bool = True,
    ) -> list[AlignmentOutput]:
        """Full path: normalize, tokenize, bucket, batch-align, group.

        bucket_scheme/pad_batch control the shape budget: with the defaults,
        audio/token pads sit on a geometric grid and the batch dim is padded
        up to the next power of two (≤ max_batch), so the number of distinct
        XLA programs stays O(log) in the dataset's length spread. Padding is
        exact — outputs are identical under any setting."""
        from ..pipeline.runtime import normalize_audio

        from ..errors import InvalidInputError

        seqs = [self._tokenize(t) for t in transcripts]
        lens = [len(a) for a in audios]
        s_lens = [len(s.tokens) for s in seqs]
        outputs: list[AlignmentOutput | None] = [None] * len(audios)

        active, active_lens, active_slens = [], [], []
        for i, (n, seq) in enumerate(zip(lens, seqs)):
            if n == 0 or not transcripts[i].strip() or not seq.normalized_words:
                outputs[i] = AlignmentOutput(words=[])
                continue
            t_i = self.cfg.conv_output_length(n)
            min_frames = -(-len(seq.tokens) // 2)
            if t_i < min_frames:
                # same contract as the single-utterance guard (runtime.rs:116-121)
                raise InvalidInputError(
                    f"utterance {i}: audio too short for transcript: "
                    f"{t_i} frames < {min_frames} required"
                )
            active.append(i)
            active_lens.append(n)
            active_slens.append(len(seq.tokens))

        buckets = bucket_utterances(
            active_lens, active_slens, audio_multiple, token_multiple,
            max_batch, scheme=bucket_scheme,
        )
        for bucket in buckets:
            bucket.indices = [active[j] for j in bucket.indices]

        # Two-phase pipeline: enqueue device work for up to `max_in_flight`
        # buckets ahead (async uploads + kernels), group on host as results
        # drain — transfers and TPU compute overlap host grouping.
        max_in_flight = 4
        in_flight: list[tuple[Bucket, tuple]] = []

        def submit(bucket: Bucket):
            b = len(bucket.indices)
            dtype = np.float32 if not self.normalize_on_device else np.asarray(
                audios[bucket.indices[0]]
            ).dtype
            audio = np.zeros((b, bucket.n_pad), dtype)
            tokens = np.zeros((b, bucket.s_pad), np.int32)
            a_l = np.zeros(b, np.int32)
            s_l = np.zeros(b, np.int32)
            for j, i in enumerate(bucket.indices):
                audio[j, : lens[i]] = (
                    audios[i]
                    if self.normalize_on_device
                    else normalize_audio(audios[i])
                )
                tokens[j, : s_lens[i]] = seqs[i].tokens
                a_l[j] = lens[i]
                s_l[j] = s_lens[i]
            if pad_batch:
                audio, a_l, tokens, s_l = _pad_batch_rows(
                    min(max_batch, _round_up_pow2(b, 1)), audio, a_l, tokens, s_l
                )
            return self.submit_padded_batch(audio, a_l, tokens, s_l)

        def drain(bucket: Bucket, handles: tuple):
            from ..pipeline.runtime import _utterance_frame_stats

            paths, t_lens, emit_lp, margin, blank_prob, entropy = (
                np.asarray(h) for h in handles
            )
            for j, i in enumerate(bucket.indices):
                t_i = int(t_lens[j])
                ev = FrameEvidence(
                    emit_lp=emit_lp[j, :t_i],
                    margin=margin[j, :t_i],
                    blank_prob=blank_prob[j, :t_i].astype(np.float64),
                    entropy=entropy[j, :t_i],
                )
                words = self._group(paths[j, :t_i], seqs[i], ev)
                stats = _utterance_frame_stats(
                    paths[j, :t_i], seqs[i].tokens, self.blank_id, ev
                )
                outputs[i] = AlignmentOutput(words=words, frame_stats=stats)

        t_start = time.perf_counter()
        for bucket in buckets:
            logger.debug(
                "bucket submit: %d utts, n_pad=%d, s_pad=%d",
                len(bucket.indices), bucket.n_pad, bucket.s_pad,
            )
            in_flight.append((bucket, submit(bucket)))
            if len(in_flight) >= max_in_flight:
                drain(*in_flight.pop(0))
        while in_flight:
            drain(*in_flight.pop(0))
        if buckets:
            audio_sec = sum(active_lens) / 16000.0
            elapsed = time.perf_counter() - t_start
            logger.info(
                "aligned %d utterances (%.1f s audio) in %d buckets, %.2f s "
                "(%.0fx realtime)",
                len(active), audio_sec, len(buckets), elapsed,
                audio_sec / elapsed if elapsed > 0 else 0.0,
            )
        return [o if o is not None else AlignmentOutput(words=[]) for o in outputs]
