"""Default pipeline stage implementations.

Adapters binding the stage protocols to the L2 algorithm modules, mirroring
/root/reference/src/pipeline/defaults.rs:10-86 (CaseAwareTokenizer,
ViterbiSequenceAligner, DefaultWordGrouper).
"""

from __future__ import annotations

import numpy as np

from ..align import tokenization
from ..align.grouping import ProfiledWordGroupingOutput, group_into_words_profiled
from ..align.grouping.path_to_words import FrameEvidence
from ..config import AlignerHyperParams
from ..ops import viterbi_ref
from ..types import TokenSequence, WordTiming
from .traits import ForwardOutput


class CaseAwareTokenizer:
    def tokenize(self, transcript, vocab, blank_id, word_sep_id) -> TokenSequence:
        return tokenization.build_token_sequence_case_aware(
            transcript, vocab, blank_id, word_sep_id
        )


class ViterbiSequenceAligner:
    """Banded CTC Viterbi with backend dispatch.

    Dispatch mirrors the reference's threshold logic (viterbi.rs:9-47):
    below `kernel_dp_threshold` T·S the host numpy oracle runs (kernel
    launch overhead analog); above it the device implementation runs — the
    vectorized lax.scan DP, replaced by the Pallas kernel where available
    (ops/viterbi_pallas). All backends produce bit-identical paths.
    """

    def __init__(self, hp: AlignerHyperParams | None = None, force_backend: str | None = None):
        self.hp = hp or AlignerHyperParams()
        self.force_backend = force_backend  # None | "numpy" | "scan" | "pallas"

    def align_path(self, forward_output: ForwardOutput, tokens: list[int]) -> np.ndarray:
        import jax.numpy as jnp

        t_len = forward_output.t_len
        s_len = len(tokens)
        backend = self.force_backend
        if backend is None:
            backend = "numpy" if t_len * s_len < self.hp.kernel_dp_threshold else "device"

        if backend == "numpy":
            lp = np.asarray(forward_output.log_probs)[:t_len]
            path = viterbi_ref.viterbi_numpy(lp, np.asarray(tokens))
            return np.asarray([s for s, _ in path], dtype=np.int32)

        lp = forward_output.log_probs
        if not hasattr(lp, "block_until_ready"):  # host numpy input
            # (numpy 2.0 arrays also expose `.device`, so probe a jax-only
            # attribute)
            lp = jnp.asarray(lp, dtype=jnp.float32)
        if backend == "device":
            from ..ops.viterbi_pallas import fits_vmem, on_tpu

            if not on_tpu():
                backend = "scan"
            elif fits_vmem(t_len, s_len):
                backend = "pallas"
            else:
                backend = "pallas-hbm"  # long-form: bp streamed through HBM
        if backend in ("pallas", "pallas-hbm"):
            from ..ops.viterbi_pallas import (
                on_tpu,
                viterbi_pallas_single,
                viterbi_pallas_single_hbm,
            )

            kernel = (
                viterbi_pallas_single if backend == "pallas"
                else viterbi_pallas_single_hbm
            )
            path = kernel(
                lp,
                jnp.asarray(tokens, dtype=jnp.int32),
                jnp.int32(t_len),
                jnp.int32(s_len),
                interpret=not on_tpu(),
            )
        else:
            path = viterbi_ref.viterbi_single(
                lp,
                jnp.asarray(tokens, dtype=jnp.int32),
                jnp.int32(t_len),
                jnp.int32(s_len),
            )
        return np.asarray(path)[:t_len]


    def align_path_with_evidence(
        self, forward_output: ForwardOutput, tokens: list[int], blank_id: int
    ):
        """Latency path: DP + evidence extraction as ONE jitted graph with a
        single device fetch (each extra synced stage costs a host round-trip
        — ~30 ms through a network-attached TPU). Returns (path_states
        [t_len], FrameEvidence), or None when the dispatch picks the host
        numpy oracle (small T·S below `kernel_dp_threshold`) — the caller
        then runs the classic two-step path."""
        import jax.numpy as jnp

        t_len = forward_output.t_len
        s_len = len(tokens)
        if self.force_backend == "numpy" or (
            self.force_backend is None
            and t_len * s_len < self.hp.kernel_dp_threshold
        ):
            return None
        lp = forward_output.log_probs
        if not hasattr(lp, "block_until_ready"):
            lp = jnp.asarray(lp, dtype=jnp.float32)

        backend = self.force_backend or "device"
        if backend == "device":
            from ..ops.viterbi_pallas import fits_vmem, on_tpu

            if not on_tpu():
                backend = "scan"
            elif fits_vmem(t_len, s_len):
                backend = "pallas"
            else:
                backend = "pallas-hbm"
        from ..ops.evidence import fused_path_evidence
        from ..ops.viterbi_pallas import on_tpu as _on_tpu
        from ..parallel.batching import _round_up_pow2

        # pad tokens to a pow2 grid: their SHAPE is part of the jit
        # signature, and unpadded [S] would retrace + recompile the fused
        # kernel for every distinct transcript length (s_len stays traced,
        # so results are unchanged)
        s_pad = _round_up_pow2(s_len, 128)
        tok = np.zeros(s_pad, np.int32)
        tok[:s_len] = np.asarray(tokens, np.int32)
        return fused_path_evidence(
            lp, jnp.asarray(tok), t_len, s_len, blank_id,
            backend=backend, interpret=not _on_tpu(),
        )


class DefaultWordGrouper:
    def __init__(self, hp: AlignerHyperParams | None = None):
        self.hp = hp or AlignerHyperParams()

    def group_words(
        self,
        path_states: np.ndarray,
        token_sequence: TokenSequence,
        evidence: FrameEvidence,
        blank_id: int,
        word_sep_id: int,
        frame_stride_ms: float,
    ) -> list[WordTiming]:
        return self.group_words_profiled(
            path_states, token_sequence, evidence, blank_id, word_sep_id,
            frame_stride_ms,
        ).words

    def group_words_profiled(
        self,
        path_states: np.ndarray,
        token_sequence: TokenSequence,
        evidence: FrameEvidence,
        blank_id: int,
        word_sep_id: int,
        frame_stride_ms: float,
        measure=None,
    ) -> ProfiledWordGroupingOutput:
        path = [(int(s), t) for t, s in enumerate(path_states)]
        return group_into_words_profiled(
            path,
            token_sequence.tokens,
            token_sequence.chars,
            token_sequence.normalized_words,
            evidence,
            blank_id,
            word_sep_id,
            frame_stride_ms,
            self.hp,
            measure=measure,
        )


class PhonemeTokenizer:
    """Tokenizer for phoneme-CTC vocabs: whitespace-separated symbols looked
    up verbatim (align/tokenization.build_token_sequence_phoneme). Inject
    with ForcedAlignerBuilder.with_tokenizer(PhonemeTokenizer());
    `vocab_filter` tells the builder to keep multi-codepoint vocab symbols
    the word path's single-char rule would drop."""

    vocab_filter = "verbatim"

    def tokenize(self, transcript, vocab, blank_id, word_sep_id) -> TokenSequence:
        return tokenization.build_token_sequence_phoneme(
            transcript, vocab, blank_id, word_sep_id
        )


class PhonemeGrouper:
    """Unit-level grouping: one timing unit per non-blank, non-separator
    path span — the reference's envisioned switchable phoneme grouping mode
    (obsidian/concepts/french-phoneme-ctc-grouping.md), realized behind the
    same WordGrouper protocol. Inject with
    ForcedAlignerBuilder.with_word_grouper(PhonemeGrouper()); pairs with
    PhonemeTokenizer for phoneme vocabs, but also works with the default
    char tokenizer (emitting per-letter units)."""

    def group_words(
        self,
        path_states: np.ndarray,
        token_sequence: TokenSequence,
        evidence: FrameEvidence,
        blank_id: int,
        word_sep_id: int,
        frame_stride_ms: float,
    ) -> list[WordTiming]:
        from ..align.grouping.phoneme import group_into_phonemes

        return group_into_phonemes(
            path_states, token_sequence, evidence, blank_id, word_sep_id,
            frame_stride_ms,
        )
