"""ForcedAligner runtime: orchestrates normalize → forward → tokenize →
Viterbi → grouping.

Behavioral contract from /root/reference/src/pipeline/runtime.rs:76-549:

- empty samples or blank transcript short-circuit to an empty output (:77-79);
- a sample-rate mismatch only warns (:81-87);
- normalization is zero-mean/unit-variance with f64 accumulation and a 1e-7
  σ floor (:501-517), skipped when the input carries a pre-normalized buffer;
- the min-frames guard rejects T < ceil(S/2) as InvalidInput (:116-121);
- `align_profiled` brackets every stage boundary with a device sync and folds
  tokenization + residual time into group_ms so dp+conf+group == align_ms
  exactly (:274-282); total_ms is a separate sync-to-sync measurement.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass

import numpy as np

from ..align.grouping import frame_evidence_from_log_probs
from ..config import AlignerHyperParams
from ..errors import InvalidInputError
from ..types import AlignmentInput, AlignmentOutput
from .traits import ForwardOutput, RuntimeBackend, SequenceAligner, Tokenizer, WordGrouper

logger = logging.getLogger(__name__)


@dataclass
class AlignmentStageTimings:
    forward_ms: float = 0.0
    post_ms: float = 0.0
    dp_ms: float = 0.0
    group_ms: float = 0.0
    conf_ms: float = 0.0
    align_ms: float = 0.0
    total_ms: float = 0.0


@dataclass
class ProfiledAlignmentOutput:
    output: AlignmentOutput
    timings: AlignmentStageTimings
    num_frames_t: int
    state_len: int
    ts_product: int
    vocab_size: int
    dtype: str
    device: str
    frame_stride_ms: float


def normalize_audio(samples: np.ndarray) -> np.ndarray:
    """Zero-mean/unit-variance in f64 accumulation, σ floor 1e-7
    (runtime.rs:501-517).

    In-place f64 passes: the naive ``((xd-mean)**2).mean()`` /
    ``((xd-mean)/std)`` formulation allocates four full-length f64
    temporaries (~460 MB each at 60 min of 16 kHz audio) and re-computes
    the centered array twice; hour-scale host profiling showed it
    dominating long-form preprocessing. This form is bitwise-identical
    (same IEEE ops, same pairwise-reduction trees — locked by
    tests/test_pipeline.py::test_normalize_audio_bitwise_matches_naive)
    with one temporary and single passes."""
    xd = np.asarray(samples, dtype=np.float32).astype(np.float64)
    mean = xd.mean()
    xd -= mean
    var = np.square(xd).mean()
    std = max(np.sqrt(var), 1e-7)
    xd /= std
    return xd.astype(np.float32)


def _utterance_frame_stats(path_states, tokens, blank_id, evidence):
    from ..types import UtteranceFrameStats

    states = np.asarray(path_states)
    if states.size == 0:
        return None
    tok = np.asarray(tokens)
    blank_ratio = float(np.mean(tok[states] == blank_id))
    entropy_mean = (
        float(np.asarray(evidence.entropy, dtype=np.float64).mean())
        if evidence.entropy is not None and len(evidence.entropy)
        else None
    )
    return UtteranceFrameStats(
        blank_frame_ratio=blank_ratio, token_entropy_mean=entropy_mean
    )


class ForcedAligner:
    def __init__(
        self,
        runtime_backend: RuntimeBackend,
        vocab: dict[str, int],
        blank_id: int,
        word_sep_id: int,
        frame_stride_ms: float,
        expected_sample_rate_hz: int,
        tokenizer: Tokenizer,
        sequence_aligner: SequenceAligner,
        word_grouper: WordGrouper,
        hp: AlignerHyperParams | None = None,
    ):
        self.runtime_backend = runtime_backend
        self.vocab = vocab
        self.blank_id = blank_id
        self.word_sep_id = word_sep_id
        self._frame_stride_ms = frame_stride_ms
        self.expected_sample_rate_hz = expected_sample_rate_hz
        self.tokenizer = tokenizer
        self.sequence_aligner = sequence_aligner
        self.word_grouper = word_grouper
        self.hp = hp or AlignerHyperParams()

    def frame_stride_ms(self) -> float:
        return self._frame_stride_ms

    def _normalized(self, input: AlignmentInput) -> np.ndarray:
        if input.normalized is not None:
            return np.asarray(input.normalized, dtype=np.float32)
        return normalize_audio(input.samples)

    def _check_input(self, input: AlignmentInput) -> bool:
        if len(input.samples) == 0 or not input.transcript.strip():
            return False
        if input.sample_rate_hz != self.expected_sample_rate_hz:
            logger.warning(
                "wav2vec2 aligner expects %d Hz, got %d Hz; quality may degrade",
                self.expected_sample_rate_hz, input.sample_rate_hz,
            )
        return True

    def align(self, input: AlignmentInput) -> AlignmentOutput:
        if not self._check_input(input):
            return AlignmentOutput(words=[])
        normalized = self._normalized(input)
        forward_output = self.runtime_backend.infer(normalized)
        return self._align_rest(forward_output, input)[0]

    def _align_rest(self, forward_output: ForwardOutput, input: AlignmentInput):
        token_sequence = self.tokenizer.tokenize(
            input.transcript, self.vocab, self.blank_id, self.word_sep_id
        )
        if not token_sequence.tokens:
            return AlignmentOutput(words=[]), None, token_sequence

        t_len = forward_output.t_len
        s_len = len(token_sequence.tokens)
        min_frames = -(-s_len // 2)
        if t_len < min_frames:
            raise InvalidInputError(
                f"audio too short for transcript: {t_len} frames < {min_frames} required"
            )

        path_states, evidence = self._path_and_evidence(
            forward_output, token_sequence
        )
        grouped = self._group(path_states, token_sequence, evidence)
        stats = _utterance_frame_stats(
            path_states, token_sequence.tokens, self.blank_id, evidence
        )
        return (
            AlignmentOutput(words=grouped.words, frame_stats=stats),
            grouped,
            token_sequence,
        )

    def _path_and_evidence(self, forward_output, token_sequence):
        """DP + evidence with as few device syncs as possible: the default
        sequence aligner fuses both into one jitted graph + one fetch
        (latency path); other aligners (or the small-utterance host oracle)
        run the classic two-step sequence."""
        fused = getattr(self.sequence_aligner, "align_path_with_evidence", None)
        if fused is not None:
            res = fused(forward_output, token_sequence.tokens, self.blank_id)
            if res is not None:
                return res
        path_states = self.sequence_aligner.align_path(
            forward_output, token_sequence.tokens
        )
        evidence = self._frame_evidence(forward_output, token_sequence, path_states)
        return path_states, evidence

    def _group(self, path_states, token_sequence, evidence, measure=None):
        """Route through the injected WordGrouper; the default grouper
        exposes a profiled variant, custom ones are wrapped. `measure` is
        the optional memory-tracker hook for the confidence block; custom
        groupers that don't accept it are called without."""
        if hasattr(self.word_grouper, "group_words_profiled"):
            import inspect

            fn = self.word_grouper.group_words_profiled
            kwargs = {}
            if measure is not None:
                try:
                    if "measure" in inspect.signature(fn).parameters:
                        kwargs["measure"] = measure
                except (TypeError, ValueError):
                    pass
            return fn(
                path_states, token_sequence, evidence,
                self.blank_id, self.word_sep_id, self._frame_stride_ms,
                **kwargs,
            )
        from ..align.grouping import ProfiledWordGroupingOutput

        words = self.word_grouper.group_words(
            path_states, token_sequence, evidence,
            self.blank_id, self.word_sep_id, self._frame_stride_ms,
        )
        return ProfiledWordGroupingOutput(words, 0.0, 0.0, 0.0)

    def _frame_evidence(self, forward_output, token_sequence, path_states):
        lp = forward_output.log_probs
        t_len = forward_output.t_len
        if hasattr(lp, "block_until_ready"):  # device-resident fast path
            import jax.numpy as jnp

            from ..ops.evidence import compute_frame_evidence_device

            from ..parallel.batching import _round_up_pow2

            t_pad = lp.shape[0]
            path_padded = np.zeros(t_pad, dtype=np.int32)
            path_padded[:t_len] = path_states
            # pow2-pad tokens: their shape is part of the jit signature
            # (unpadded would recompile per transcript length); the valid
            # path never indexes past the true tokens
            s_pad = _round_up_pow2(len(token_sequence.tokens), 128)
            tok = np.zeros(s_pad, np.int32)
            tok[: len(token_sequence.tokens)] = token_sequence.tokens
            return compute_frame_evidence_device(
                lp,
                jnp.asarray(tok),
                jnp.asarray(path_padded),
                self.blank_id,
                t_len,
            )
        return frame_evidence_from_log_probs(
            np.asarray(lp)[:t_len], token_sequence.tokens, path_states, self.blank_id
        )

    def align_profiled(self, input: AlignmentInput) -> ProfiledAlignmentOutput:
        """Benchmark-grade instrumented pass (runtime.rs:140-303): device
        sync at every stage boundary; dp+conf+group == align_ms exactly.

        With the default sequence aligner, dp_ms covers the fused
        DP+evidence graph (one sync instead of two — on a network-attached
        TPU every extra sync costs a full host round-trip); per-substage
        attribution lives in align_profiled_with_memory, which keeps the
        stages separate."""
        backend = self.runtime_backend
        if not self._check_input(input):
            return self._empty_profiled()

        normalized = self._normalized(input)
        backend.synchronize()
        t_total0 = time.perf_counter()

        forward_output = backend.infer_profiled(normalized)

        t_align0 = time.perf_counter()
        token_sequence = self.tokenizer.tokenize(
            input.transcript, self.vocab, self.blank_id, self.word_sep_id
        )
        if not token_sequence.tokens:
            return self._empty_profiled()

        t_len = forward_output.t_len
        s_len = len(token_sequence.tokens)
        min_frames = -(-s_len // 2)
        if t_len < min_frames:
            raise InvalidInputError(
                f"audio too short for transcript: {t_len} frames < {min_frames} required"
            )

        t0 = time.perf_counter()
        path_states, evidence = self._path_and_evidence(
            forward_output, token_sequence
        )
        np.asarray(path_states)
        dp_ms = (time.perf_counter() - t0) * 1000.0

        grouped = self._group(path_states, token_sequence, evidence)
        backend.synchronize()
        align_ms = (time.perf_counter() - t_align0) * 1000.0
        total_ms = (time.perf_counter() - t_total0) * 1000.0
        conf_ms = grouped.conf_ms
        # residual (tokenization, evidence fetch) folds into group_ms so
        # dp + conf + group == align_ms exactly (runtime.rs:274-279)
        group_ms = align_ms - dp_ms - conf_ms
        stats = _utterance_frame_stats(
            path_states, token_sequence.tokens, self.blank_id, evidence
        )

        return ProfiledAlignmentOutput(
            output=AlignmentOutput(words=grouped.words, frame_stats=stats),
            timings=AlignmentStageTimings(
                forward_ms=forward_output.forward_ms,
                post_ms=forward_output.post_ms,
                dp_ms=dp_ms,
                group_ms=group_ms,
                conf_ms=conf_ms,
                align_ms=align_ms,
                total_ms=total_ms,
            ),
            num_frames_t=t_len,
            state_len=s_len,
            ts_product=t_len * s_len,
            vocab_size=forward_output.vocab_size,
            dtype=forward_output.dtype,
            device=backend.device_label(),
            frame_stride_ms=self._frame_stride_ms,
        )

    def align_profiled_with_memory(
        self, input: AlignmentInput
    ) -> tuple[ProfiledAlignmentOutput, "StageMemoryMap"]:
        """align_profiled + per-stage peak memory (runtime.rs:305-493): the
        forward, dp, and group stages run under a 5 ms RSS sampler thread
        with a device sync before each accelerator-memory read."""
        from .memory_tracker import MemoryTracker, StageMemoryMap

        backend = self.runtime_backend
        if not self._check_input(input):
            return self._empty_profiled(), StageMemoryMap()

        tracker = MemoryTracker()
        normalized = self._normalized(input)
        backend.synchronize()
        t_total0 = time.perf_counter()

        forward_output = tracker.measure(
            "forward", backend.synchronize,
            lambda: backend.infer_profiled(normalized),
        )

        t_align0 = time.perf_counter()
        token_sequence = self.tokenizer.tokenize(
            input.transcript, self.vocab, self.blank_id, self.word_sep_id
        )
        if not token_sequence.tokens:
            return self._empty_profiled(), tracker.stages

        t_len = forward_output.t_len
        s_len = len(token_sequence.tokens)
        min_frames = -(-s_len // 2)
        if t_len < min_frames:
            raise InvalidInputError(
                f"audio too short for transcript: {t_len} frames < {min_frames} required"
            )

        t0 = time.perf_counter()
        path_states = tracker.measure(
            "dp", backend.synchronize,
            lambda: self.sequence_aligner.align_path(
                forward_output, token_sequence.tokens
            ),
        )
        dp_ms = (time.perf_counter() - t0) * 1000.0

        # "post" maps to the device-side log-prob post-processing here: the
        # reference's post stage is the log-softmax (model_runtime.rs), which
        # this backend fuses into the forward graph; the remaining post-work
        # over the [T, V] log-probs is the evidence extraction.
        evidence = tracker.measure(
            "post", backend.synchronize,
            lambda: self._frame_evidence(
                forward_output, token_sequence, path_states
            ),
        )
        grouped = tracker.measure(
            "group", backend.synchronize,
            lambda: self._group(
                path_states, token_sequence, evidence,
                measure=lambda stage, fn: tracker.measure(
                    stage, backend.synchronize, fn
                ),
            ),
        )
        backend.synchronize()
        align_ms = (time.perf_counter() - t_align0) * 1000.0
        total_ms = (time.perf_counter() - t_total0) * 1000.0
        conf_ms = grouped.conf_ms
        group_ms = align_ms - dp_ms - conf_ms
        stats = _utterance_frame_stats(
            path_states, token_sequence.tokens, self.blank_id, evidence
        )

        profiled = ProfiledAlignmentOutput(
            output=AlignmentOutput(words=grouped.words, frame_stats=stats),
            timings=AlignmentStageTimings(
                forward_ms=forward_output.forward_ms,
                post_ms=forward_output.post_ms,
                dp_ms=dp_ms,
                group_ms=group_ms,
                conf_ms=conf_ms,
                align_ms=align_ms,
                total_ms=total_ms,
            ),
            num_frames_t=t_len,
            state_len=s_len,
            ts_product=t_len * s_len,
            vocab_size=forward_output.vocab_size,
            dtype=forward_output.dtype,
            device=backend.device_label(),
            frame_stride_ms=self._frame_stride_ms,
        )
        return profiled, tracker.stages

    def _empty_profiled(self) -> ProfiledAlignmentOutput:
        return ProfiledAlignmentOutput(
            output=AlignmentOutput(words=[]),
            timings=AlignmentStageTimings(),
            num_frames_t=0,
            state_len=0,
            ts_product=0,
            vocab_size=0,
            dtype="",
            device=self.runtime_backend.device_label(),
            frame_stride_ms=self._frame_stride_ms,
        )
