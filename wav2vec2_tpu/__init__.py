"""wav2vec2_tpu — TPU-native CTC forced alignment framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Rust
reference `Djoe-Denne/wav2vec2-rs` (see SURVEY.md): 16 kHz mono audio +
transcript → per-word [start_ms, end_ms) boundaries with composite
confidence scores.

Public API mirrors the reference's re-export surface
(/root/reference/src/lib.rs:1-17).
"""

from .config import (
    AlignerHyperParams,
    ExpansionPolicyConfig,
    Wav2Vec2Config,
    Wav2Vec2ModelConfig,
    load_vocab,
)
from .errors import (
    AlignmentError,
    InvalidInputError,
    IoError,
    JsonError,
    RuntimeBackendError,
)
from .types import (
    AlignmentInput,
    AlignmentOutput,
    TokenSequence,
    WordConfidenceStats,
    WordTiming,
)
from .pipeline.builder import ForcedAlignerBuilder
from .pipeline.runtime import (
    AlignmentStageTimings,
    ForcedAligner,
    ProfiledAlignmentOutput,
    normalize_audio,
)
from .pipeline.traits import ForwardOutput


def __getattr__(name):
    # heavier subsystems load lazily so `import wav2vec2_tpu` stays light
    if name == "BatchAligner":
        from .parallel.batching import BatchAligner

        return BatchAligner
    if name == "align_longform":
        from .align.longform import align_longform

        return align_longform
    if name == "OnlineAligner":
        from .align.online import OnlineAligner

        return OnlineAligner
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "AlignerHyperParams",
    "AlignmentError",
    "AlignmentInput",
    "AlignmentOutput",
    "AlignmentStageTimings",
    "BatchAligner",
    "ForcedAligner",
    "OnlineAligner",
    "align_longform",
    "ForcedAlignerBuilder",
    "ForwardOutput",
    "ProfiledAlignmentOutput",
    "normalize_audio",
    "ExpansionPolicyConfig",
    "InvalidInputError",
    "IoError",
    "JsonError",
    "RuntimeBackendError",
    "TokenSequence",
    "Wav2Vec2Config",
    "Wav2Vec2ModelConfig",
    "WordConfidenceStats",
    "WordTiming",
    "load_vocab",
]

__version__ = "0.1.0"
