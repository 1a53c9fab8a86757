"""Property-based fuzz of the full pipeline: random transcripts, audio
lengths, and vocabularies through ForcedAligner with a tiny random model.
Asserts output invariants regardless of input (the crash-free contract the
reference gets from Rust's type system)."""

import numpy as np
import pytest

from wav2vec2_tpu import AlignmentInput, ForcedAligner
from wav2vec2_tpu.config import Wav2Vec2ModelConfig
from wav2vec2_tpu.errors import InvalidInputError
from wav2vec2_tpu.pipeline.defaults import (
    CaseAwareTokenizer,
    DefaultWordGrouper,
    ViterbiSequenceAligner,
)
from wav2vec2_tpu.pipeline.model_runtime import JaxRuntimeBackend


@pytest.fixture(scope="module")
def aligner():
    import jax

    from wav2vec2_tpu.models.params import init_params

    cfg = Wav2Vec2ModelConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=12,
        feat_extract_norm="group", conv_bias=False,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"a": 1, "b": 2, "|": 3, "c": 4, "d": 5, "'": 6}
    backend = JaxRuntimeBackend(cfg, params, compute_dtype="float32",
                                pad_multiple=500)
    return ForcedAligner(
        runtime_backend=backend, vocab=vocab, blank_id=0, word_sep_id=3,
        frame_stride_ms=cfg.frame_stride_ms(16000),
        expected_sample_rate_hz=16000,
        tokenizer=CaseAwareTokenizer(),
        sequence_aligner=ViterbiSequenceAligner(),
        word_grouper=DefaultWordGrouper(),
    )


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_invariants(aligner, seed):
    rng = np.random.default_rng(seed)
    alphabet = list("abcd'") + ["x", "9", "?"]  # includes unknown chars
    n_words = int(rng.integers(0, 6))
    words = [
        "".join(rng.choice(alphabet, size=rng.integers(1, 6)))
        for _ in range(n_words)
    ]
    transcript = " ".join(words)
    n = int(rng.integers(0, 5000))
    audio = (rng.normal(size=n) * rng.uniform(0.001, 2.0)).astype(np.float32)

    try:
        out = aligner.align(AlignmentInput(16000, audio, transcript))
    except InvalidInputError:
        return  # audio too short for transcript — contract error, not a crash

    known = set("abcd'")
    expected_words = [
        "".join(c for c in w.lower() if c in known) for w in words
    ]
    expected_words = [w for w in expected_words if w]
    # words subset/prefix of the normalized transcript, in order
    produced = [w.word for w in out.words]
    assert produced == expected_words[: len(produced)]
    for w in out.words:
        # [start, end) can collapse to zero ms at sub-ms frame strides
        # (this tiny model strides 0.625 ms; the reference's structural
        # metrics count such words rather than forbidding them)
        assert 0 <= w.start_ms <= w.end_ms
        if w.confidence is not None:
            assert 0.0 <= w.confidence <= 1.0
        assert w.confidence_stats.coverage_frame_count >= 0
    for a, b in zip(out.words, out.words[1:]):
        assert a.end_ms <= b.start_ms, "words must not overlap"
    if n == 0 or not transcript.strip():
        assert produced == []
