"""Online (incremental) alignment (align/online.py): incremental DP parity
with the oracle, stability of finalized words, agreement with offline."""

import numpy as np
import pytest

from wav2vec2_tpu.config import Wav2Vec2ModelConfig


def test_incremental_viterbi_matches_oracle():
    from wav2vec2_tpu.align.online import IncrementalViterbi
    from wav2vec2_tpu.ops.viterbi_ref import viterbi_numpy

    rng = np.random.default_rng(0)
    for trial in range(10):
        t_len = int(rng.integers(8, 60))
        s_len = int(rng.integers(1, min(2 * t_len - 1, 20)))
        v = 8
        tokens = rng.integers(0, v, size=s_len).astype(np.int64)
        lp = np.log(rng.dirichlet(np.ones(v), size=t_len)).astype(np.float32)

        want = viterbi_numpy(lp, tokens)
        inc = IncrementalViterbi(tokens)
        for t in range(t_len):
            inc.append(lp[t])
        got = inc.backtrace()
        assert [(int(s), i) for i, s in enumerate(got)] == want, (
            trial, t_len, s_len)


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    from wav2vec2_tpu.models.params import init_params

    cfg = Wav2Vec2ModelConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"a": 1, "b": 2, "|": 3}
    return cfg, params, vocab


def test_online_matches_longform_and_is_stable(tiny_model):
    from wav2vec2_tpu.align.longform import align_longform
    from wav2vec2_tpu.align.online import OnlineAligner
    from wav2vec2_tpu.pipeline.runtime import normalize_audio

    cfg, params, vocab = tiny_model
    rng = np.random.default_rng(1)
    audio = normalize_audio(rng.normal(size=48_000).astype(np.float32))
    transcript = "ab ba ab ba ab"

    offline = align_longform(audio, transcript, params, cfg, vocab,
                             chunk_sec=1.0, overlap_sec=0.25,
                             sample_rate=16000)

    online = OnlineAligner(cfg, params, vocab, transcript,
                           chunk_sec=1.0, overlap_sec=0.25,
                           finalize_margin_sec=0.5, normalize="none")
    emitted = []
    pos = 0
    piece = 3100  # deliberately not a window multiple
    while pos < len(audio):
        emitted += online.push(audio[pos: pos + piece])
        pos += piece
    out = online.flush()

    # finalized words are a stable prefix of the final result
    assert [w.word for w in out.words][: len(emitted)] == [
        w.word for w in emitted
    ]
    for a, b in zip(emitted, out.words):
        assert (a.start_ms, a.end_ms, a.confidence) == (
            b.start_ms, b.end_ms, b.confidence)
    assert len(emitted) > 0, "nothing finalized before flush"

    # same word sequence as offline long-form. (Boundary agreement is not
    # asserted numerically here: random-weight log-probs make the Viterbi
    # path near-tied everywhere, so the last-ulp difference between the
    # offline BATCH chunk forward and the online single-window forward can
    # legally flip ties; with real acoustic models the path is decisive.)
    assert [w.word for w in out.words] == [w.word for w in offline.words]
    # boundaries monotone
    last = -1
    for w in out.words:
        assert w.start_ms >= last
        last = w.start_ms


@pytest.mark.parametrize("units", ["word", "phoneme"])
def test_online_piece_size_independent(tiny_model, units):
    """The result depends only on the audio, not on how it is sliced into
    push() calls (window layout is a function of accumulated samples) —
    for word AND phoneme finalization."""
    from wav2vec2_tpu.align.online import OnlineAligner
    from wav2vec2_tpu.pipeline.runtime import normalize_audio

    cfg, params, vocab = tiny_model
    rng = np.random.default_rng(3)
    audio = normalize_audio(rng.normal(size=40_000).astype(np.float32))
    transcript = "ab ba ab"

    outs = []
    for piece in (1000, 7777, len(audio)):
        online = OnlineAligner(cfg, params, vocab, transcript,
                               chunk_sec=1.0, overlap_sec=0.25,
                               finalize_margin_sec=0.5, normalize="none",
                               units=units)
        pos = 0
        while pos < len(audio):
            online.push(audio[pos: pos + piece])
            pos += piece
        outs.append(online.flush())
    ref = outs[0]
    for o in outs[1:]:
        assert [w.word for w in o.words] == [w.word for w in ref.words]
        for a, b in zip(o.words, ref.words):
            assert (a.start_ms, a.end_ms, a.confidence) == (
                b.start_ms, b.end_ms, b.confidence)


def test_online_tiny_tail_and_empty_transcript(tiny_model):
    from wav2vec2_tpu.align.online import OnlineAligner

    cfg, params, vocab = tiny_model
    rng = np.random.default_rng(2)
    # audio shorter than one window: only flush produces output
    online = OnlineAligner(cfg, params, vocab, "ab",
                           chunk_sec=1.0, overlap_sec=0.25,
                           finalize_margin_sec=0.2, normalize="window")
    assert online.push(rng.normal(size=4000).astype(np.float32)) == []
    out = online.flush()
    assert [w.word for w in out.words] == ["ab"]

    online2 = OnlineAligner(cfg, params, vocab, "   ",
                            chunk_sec=1.0, overlap_sec=0.25)
    online2.push(rng.normal(size=20000).astype(np.float32))
    assert online2.flush().words == []


def test_online_flush_min_frames_guard(tiny_model):
    """flush() raises InvalidInputError when the transcript cannot fit the
    streamed audio (offline min-frames guard parity, runtime.rs:116-121)."""
    from wav2vec2_tpu.align.online import OnlineAligner
    from wav2vec2_tpu.errors import InvalidInputError

    cfg, params, vocab = tiny_model
    long_transcript = " ".join(["ab ba"] * 40)
    online = OnlineAligner(cfg, params, vocab, long_transcript,
                           chunk_sec=1.0, overlap_sec=0.25)
    online.push(np.zeros(2000, np.float32))
    with pytest.raises(InvalidInputError, match="too short"):
        online.flush()


def test_online_phoneme_units(tiny_model):
    """units='phoneme': the online aligner finalizes one tight unit per
    phone, identical to the offline phoneme grouping over the same adopted
    log-probs; finalized units never change across pushes."""
    import jax

    from wav2vec2_tpu.align.online import OnlineAligner
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.pipeline.runtime import normalize_audio

    cfg, params, _ = tiny_model
    vocab = {"a": 1, "b": 2, "|": 3, "tʃ": 4, "ɛ̃": 5}
    rng = np.random.default_rng(7)
    audio = normalize_audio(rng.normal(size=32_000).astype(np.float32))
    transcript = "a tʃ ɛ̃ b | a tʃ"

    ol = OnlineAligner(cfg, params, vocab, transcript, chunk_sec=1.0,
                       overlap_sec=0.25, finalize_margin_sec=0.5,
                       normalize="none", units="phoneme")
    streamed = []
    for i in range(0, len(audio), 5000):
        streamed.extend(ol.push(audio[i: i + 5000]))
    out = ol.flush()
    assert [u.word for u in out.words] == ["a", "tʃ", "ɛ̃", "b", "a", "tʃ"]
    for u, v in zip(out.words, out.words[1:]):
        assert u.end_ms <= v.start_ms or u.start_ms <= v.start_ms
        assert u.end_ms > u.start_ms
    # finalized-units-never-change contract
    for s, w in zip(streamed, out.words):
        assert (s.word, s.start_ms, s.end_ms) == (w.word, w.start_ms, w.end_ms)
