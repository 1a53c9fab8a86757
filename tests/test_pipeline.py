"""Pipeline tests using the mock-backend pattern — no model files needed,
mirroring the reference's MockBackend tests (builder.rs:123-199,
runtime.rs:562-716, traits.rs:226-252)."""

import json

import numpy as np
import pytest

from wav2vec2_tpu.config import Wav2Vec2Config
from wav2vec2_tpu.errors import InvalidInputError
from wav2vec2_tpu.pipeline.builder import ForcedAlignerBuilder
from wav2vec2_tpu.pipeline.runtime import normalize_audio
from wav2vec2_tpu.pipeline.traits import ForwardOutput
from wav2vec2_tpu.types import AlignmentInput

CONFIG = dict(
    hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
    intermediate_size=3072, conv_dim=[512] * 7,
    conv_kernel=[10, 3, 3, 3, 3, 2, 2], conv_stride=[5, 2, 2, 2, 2, 2, 2],
    num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
    pad_token_id=0, vocab_size=6,
)
VOCAB = {"<pad>": 0, "|": 1, "a": 2, "b": 3, "c": 4, "<unk>": 5}


class MockBackend:
    """Fixed log-probs backend (reference MockBackend, runtime.rs tests)."""

    def __init__(self, log_probs):
        self.log_probs = np.asarray(log_probs, dtype=np.float32)

    def infer(self, normalized):
        return ForwardOutput(
            log_probs=self.log_probs,
            t_len=self.log_probs.shape[0],
            vocab_size=self.log_probs.shape[1],
        )

    def infer_profiled(self, normalized):
        return self.infer(normalized)

    def synchronize(self):
        pass

    def device_label(self):
        return "mock"


@pytest.fixture
def model_dir(tmp_path):
    (tmp_path / "config.json").write_text(json.dumps(CONFIG))
    (tmp_path / "vocab.json").write_text(json.dumps(VOCAB))
    return tmp_path


def build_aligner(model_dir, backend, **kw):
    cfg = Wav2Vec2Config(
        config_path=str(model_dir / "config.json"),
        vocab_path=str(model_dir / "vocab.json"),
    )
    b = ForcedAlignerBuilder(cfg).with_runtime_backend(backend)
    return b.build()


def planted_log_probs(tokens, frames_per_state=3, vocab_size=6):
    t = len(tokens) * frames_per_state
    lp = np.full((t, vocab_size), -10.0, np.float32)
    for s, tid in enumerate(tokens):
        lp[s * frames_per_state : (s + 1) * frames_per_state, tid] = -0.01
    return lp


def test_builder_derives_ids_and_stride(model_dir):
    aligner = build_aligner(model_dir, MockBackend(np.zeros((10, 6))))
    assert aligner.blank_id == 0
    assert aligner.word_sep_id == 1
    assert aligner.frame_stride_ms() == pytest.approx(20.0)
    # vocab dropped multi-char keys
    assert set(aligner.vocab) == {"|", "a", "b", "c"}


def test_empty_input_short_circuits(model_dir):
    aligner = build_aligner(model_dir, MockBackend(np.zeros((10, 6))))
    out = aligner.align(AlignmentInput(16000, np.array([], np.float32), "ab"))
    assert out.words == []
    out = aligner.align(AlignmentInput(16000, np.ones(100, np.float32), "   "))
    assert out.words == []


def test_min_frames_guard(model_dir):
    # transcript "abc abc" → S = 15; T = 5 < ceil(15/2) = 8 → InvalidInput
    aligner = build_aligner(model_dir, MockBackend(np.zeros((5, 6))))
    with pytest.raises(InvalidInputError, match="audio too short"):
        aligner.align(AlignmentInput(16000, np.ones(1000, np.float32), "abc abc"))


def test_full_pipeline_with_planted_path(model_dir):
    # "ab c": tokens blank a blank b blank | blank c blank
    tokens = [0, 2, 0, 3, 0, 1, 0, 4, 0]
    lp = planted_log_probs(tokens)
    aligner = build_aligner(model_dir, MockBackend(lp))
    out = aligner.align(AlignmentInput(16000, np.ones(1000, np.float32), "AB C"))
    assert [w.word for w in out.words] == ["ab", "c"]
    for w in out.words:
        assert w.start_ms < w.end_ms
        assert 0.0 <= w.confidence <= 1.0
    for w1, w2 in zip(out.words, out.words[1:]):
        assert w1.end_ms <= w2.start_ms


def test_align_profiled_timing_identity(model_dir):
    tokens = [0, 2, 0, 3, 0]
    lp = planted_log_probs(tokens)
    aligner = build_aligner(model_dir, MockBackend(lp))
    p = aligner.align_profiled(AlignmentInput(16000, np.ones(1000, np.float32), "ab"))
    assert [w.word for w in p.output.words] == ["ab"]
    t = p.timings
    # dp + conf + group == align exactly (runtime.rs:274-279 contract)
    assert t.align_ms == pytest.approx(t.dp_ms + t.conf_ms + t.group_ms, abs=1e-9)
    assert p.num_frames_t == lp.shape[0]
    assert p.state_len == len(tokens)
    assert p.ts_product == lp.shape[0] * len(tokens)
    assert p.device == "mock"


def test_align_profiled_with_memory_fills_all_stages(model_dir):
    """All five reference stages (memory_tracker.rs StageMemoryMap) must be
    populated: forward/post/dp/group/conf."""
    tokens = [0, 2, 0, 3, 0]
    lp = planted_log_probs(tokens)
    aligner = build_aligner(model_dir, MockBackend(lp))
    p, stages = aligner.align_profiled_with_memory(
        AlignmentInput(16000, np.ones(1000, np.float32), "ab")
    )
    assert [w.word for w in p.output.words] == ["ab"]
    for stage in ("forward", "post", "dp", "group", "conf"):
        mem = getattr(stages, stage)
        assert mem is not None, f"stage {stage} not measured"
        assert mem.peak_rss_bytes > 0


def test_custom_component_injection(model_dir):
    """Every stage is swappable (builder.rs:39-57; examples/custom_builder_components.rs)."""
    from wav2vec2_tpu.types import TokenSequence, WordTiming

    calls = []

    class UpperTokenizer:
        def tokenize(self, transcript, vocab, blank_id, word_sep_id):
            calls.append("tokenize")
            return TokenSequence(tokens=[0, 2, 0], chars=[None, "a", None],
                                 normalized_words=["a"])

    class OneWordGrouper:
        def group_words(self, path_states, token_sequence, evidence,
                        blank_id, word_sep_id, frame_stride_ms):
            calls.append("group")
            return [WordTiming(word="custom", start_ms=0, end_ms=20)]

    cfg = Wav2Vec2Config(
        config_path=str(model_dir / "config.json"),
        vocab_path=str(model_dir / "vocab.json"),
    )
    aligner = (
        ForcedAlignerBuilder(cfg)
        .with_runtime_backend(MockBackend(planted_log_probs([0, 2, 0])))
        .with_tokenizer(UpperTokenizer())
        .with_word_grouper(OneWordGrouper())
        .build()
    )
    out = aligner.align(AlignmentInput(16000, np.ones(100, np.float32), "a"))
    assert [w.word for w in out.words] == ["custom"]
    assert calls == ["tokenize", "group"]


def test_normalize_audio_zero_mean_unit_var():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=4000) * 3 + 7).astype(np.float32)
    n = normalize_audio(x)
    assert abs(float(n.mean())) < 1e-4
    assert abs(float(n.std()) - 1.0) < 1e-4


def test_normalize_audio_bitwise_matches_naive():
    """The in-place single-temporary form must be BITWISE identical to the
    naive reference formulation (runtime.rs:501-517 semantics): same IEEE
    ops in the same order, same pairwise reduction trees. Sizes straddle
    numpy's pairwise-summation block boundaries; values include extremes."""

    def naive(samples):
        x = np.asarray(samples, dtype=np.float32)
        xd = x.astype(np.float64)
        mean = xd.mean()
        var = ((xd - mean) ** 2).mean()
        std = max(np.sqrt(var), 1e-7)
        return ((xd - mean) / std).astype(np.float32)

    rng = np.random.default_rng(42)
    for size in (1, 7, 128, 129, 8191, 8192, 8193, 100_003):
        x = (rng.normal(size=size) * 1e3).astype(np.float32)
        x[:: max(size // 7, 1)] = np.float32(3e-39)  # subnormal f32
        np.testing.assert_array_equal(
            normalize_audio(x).view(np.uint32), naive(x).view(np.uint32)
        )


def test_normalize_audio_sigma_floor():
    x = np.full(100, 5.0, np.float32)  # zero variance → σ floor 1e-7
    n = normalize_audio(x)
    assert np.all(np.isfinite(n))
    assert np.allclose(n, 0.0)


def test_prenormalized_input_skips_normalization(model_dir):
    tokens = [0, 2, 0]
    lp = planted_log_probs(tokens)

    class CaptureBackend(MockBackend):
        def infer(self, normalized):
            self.seen = np.array(normalized)
            return super().infer(normalized)

    backend = CaptureBackend(lp)
    aligner = build_aligner(model_dir, backend)
    pre = np.linspace(-1, 1, 100).astype(np.float32)
    aligner.align(AlignmentInput(16000, np.ones(100, np.float32), "a", normalized=pre))
    np.testing.assert_array_equal(backend.seen, pre)


def test_concurrent_align_thread_safety(model_dir):
    """Two threads aligning through the same ForcedAligner concurrently —
    the reference's shared-state story is a Mutex'd session + OnceLock
    contexts (SURVEY §5 race detection); here jit dispatch is thread-safe
    and the pipeline is stateless per call."""
    import threading

    tokens = [0, 2, 0, 3, 0]
    lp = planted_log_probs(tokens)
    aligner = build_aligner(model_dir, MockBackend(lp))
    results = [None] * 8
    errors = []

    def work(i):
        try:
            out = aligner.align(
                AlignmentInput(16000, np.ones(1000, np.float32), "ab")
            )
            results[i] = [w.word for w in out.words]
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert all(r == ["ab"] for r in results)


def test_custom_sequence_aligner_injection(model_dir):
    """The fourth swappable stage (SequenceAligner, builder.rs:39-57)."""
    calls = []

    class GreedyAligner:
        def align_path(self, forward_output, tokens):
            calls.append("align")
            # trivially walk states forward one per frame, clamped
            t = forward_output.t_len
            return np.minimum(np.arange(t), len(tokens) - 1).astype(np.int32)

    tokens = [0, 2, 0]
    aligner_obj = GreedyAligner()
    cfg = Wav2Vec2Config(
        config_path=str(model_dir / "config.json"),
        vocab_path=str(model_dir / "vocab.json"),
    )
    aligner = (
        ForcedAlignerBuilder(cfg)
        .with_runtime_backend(MockBackend(planted_log_probs(tokens)))
        .with_sequence_aligner(aligner_obj)
        .build()
    )
    out = aligner.align(AlignmentInput(16000, np.ones(100, np.float32), "a"))
    assert calls == ["align"]
    assert [w.word for w in out.words] == ["a"]


def test_memory_tracker_per_os_readers(monkeypatch):
    """Per-OS RSS reader selection (memory_tracker.rs:170-249 parity) and
    graceful zero-return on foreign platforms."""
    import sys

    from wav2vec2_tpu.pipeline import memory_tracker as mt

    assert mt._read_rss_linux() > 0  # this CI runs on Linux
    # the foreign readers fail their platform imports/dlopen and return 0
    assert mt._read_rss_windows() == 0
    assert mt._read_rss_macos() == 0

    monkeypatch.setattr(sys, "platform", "win32")
    assert mt._pick_rss_reader() is mt._read_rss_windows
    monkeypatch.setattr(sys, "platform", "darwin")
    assert mt._pick_rss_reader() is mt._read_rss_macos
    monkeypatch.setattr(sys, "platform", "linux")
    assert mt._pick_rss_reader() is mt._read_rss_linux
    monkeypatch.setattr(sys, "platform", "sunos5")
    assert mt._pick_rss_reader()() == 0
