"""Pipeline stage interfaces.

Python Protocol equivalents of the reference's extension traits
(/root/reference/src/pipeline/traits.rs:11-155): every pipeline stage is
swappable via the builder. `ForwardOutput` is the L3→L2 hand-off; where the
reference distinguishes Host vs CudaDevice buffers (traits.rs:6-18), here the
log-probs are a single (possibly device-resident) array — JAX unifies the
two, and the zero-copy discipline is expressed by keeping the array on
device until only T-length vectors need to cross to host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol, runtime_checkable

import numpy as np

from ..types import TokenSequence, WordTiming
from ..align.grouping.path_to_words import FrameEvidence


@dataclass
class ForwardOutput:
    """Acoustic model output: log-softmaxed log-probs.

    `log_probs` may be a device jnp array [T_pad, V] (fast path — stays on
    device through Viterbi + evidence extraction) or a host numpy array.
    `t_len` is the number of valid frames (≤ log_probs.shape[0])."""

    log_probs: "np.ndarray | object"
    t_len: int
    vocab_size: int
    dtype: str = "float32"
    forward_ms: float = 0.0
    post_ms: float = 0.0

    def metadata(self) -> tuple[int, int, str]:
        return self.t_len, self.vocab_size, self.dtype


@runtime_checkable
class RuntimeBackend(Protocol):
    """Acoustic model runtime (traits.rs:71-104 RuntimeBackend)."""

    def infer(self, normalized: np.ndarray) -> ForwardOutput: ...

    def infer_profiled(self, normalized: np.ndarray) -> ForwardOutput:
        """Like infer, but fills forward_ms/post_ms with device-synced
        wall times."""
        ...

    def synchronize(self) -> None: ...

    def device_label(self) -> str: ...


@runtime_checkable
class Tokenizer(Protocol):
    def tokenize(
        self, transcript: str, vocab: dict[str, int], blank_id: int, word_sep_id: int
    ) -> TokenSequence: ...


@runtime_checkable
class SequenceAligner(Protocol):
    """CTC DP (traits.rs SequenceAligner::align_path). Returns the state path
    [t_len] as int states plus, for device-resident inputs, leaves log_probs
    untouched for evidence extraction."""

    def align_path(
        self, forward_output: ForwardOutput, tokens: list[int]
    ) -> np.ndarray: ...


@runtime_checkable
class WordGrouper(Protocol):
    def group_words(
        self,
        path_states: np.ndarray,
        token_sequence: TokenSequence,
        evidence: FrameEvidence,
        blank_id: int,
        word_sep_id: int,
        frame_stride_ms: float,
    ) -> list[WordTiming]: ...
