"""Phoneme-mode alignment: tokenizer, unit grouper, pipeline injection, and
batch equivalence.

The reference models phoneme CTC as switchable grouping behavior behind the
WordGrouper trait (obsidian/concepts/french-phoneme-ctc-grouping.md — no
committed implementation there); here the mode is realized as
PhonemeTokenizer + PhonemeGrouper (pipeline/defaults.py) and
BatchAligner(units="phoneme").
"""

from __future__ import annotations

import numpy as np
import pytest

from wav2vec2_tpu.align.grouping.phoneme import group_into_phonemes
from wav2vec2_tpu.align.grouping.path_to_words import FrameEvidence
from wav2vec2_tpu.align.tokenization import build_token_sequence_phoneme

BLANK, SEP = 0, 4
VOCAB = {"<pad>": 0, "|": 4, "a": 5, "ɛ̃": 6, "tʃ": 7, "k": 8}


def test_phoneme_tokenizer_shape_and_symbols():
    seq = build_token_sequence_phoneme("a ɛ̃ tʃ", VOCAB, BLANK, SEP)
    assert seq.tokens == [BLANK, 5, BLANK, 6, BLANK, 7, BLANK]
    assert seq.chars == [None, "a", None, "ɛ̃", None, "tʃ", None]
    assert seq.normalized_words == ["a", "ɛ̃", "tʃ"]


def test_phoneme_tokenizer_drops_unknown_and_handles_separators():
    seq = build_token_sequence_phoneme("a ?? | k | | a", VOCAB, BLANK, SEP)
    # unknown '??' dropped; doubled/leading/trailing separators collapse
    assert seq.tokens == [BLANK, 5, BLANK, SEP, BLANK, 8, BLANK, SEP, BLANK,
                          5, BLANK]
    assert seq.normalized_words == ["a", "k", "a"]
    # a leading separator emits nothing
    seq2 = build_token_sequence_phoneme("| a", VOCAB, BLANK, SEP)
    assert seq2.tokens == [BLANK, 5, BLANK]


def test_group_into_phonemes_runs_and_confidence():
    # states: [blank, a, blank, ɛ̃, blank]; path spends 2f in a, 3f in ɛ̃
    seq = build_token_sequence_phoneme("a ɛ̃", VOCAB, BLANK, SEP)
    path = np.array([0, 1, 1, 2, 3, 3, 3, 4], np.int32)
    emit_lp = np.log(np.array([0.9, 0.5, 0.5, 0.8, 0.25, 0.25, 0.25, 0.9],
                              np.float64)).astype(np.float32)
    ev = FrameEvidence(emit_lp=emit_lp, margin=np.zeros(8, np.float32),
                       blank_prob=np.zeros(8))
    units = group_into_phonemes(path, seq, ev, BLANK, SEP, 20.0)
    assert [u.word for u in units] == ["a", "ɛ̃"]
    assert (units[0].start_ms, units[0].end_ms) == (20, 60)
    assert (units[1].start_ms, units[1].end_ms) == (80, 140)
    np.testing.assert_allclose(units[0].confidence, 0.5, rtol=1e-6)
    np.testing.assert_allclose(units[1].confidence, 0.25, rtol=1e-6)


def test_group_into_phonemes_repeated_symbol_two_states():
    # "a a" occupies two CTC states -> two units even when adjacent
    seq = build_token_sequence_phoneme("a a", VOCAB, BLANK, SEP)
    path = np.array([1, 1, 3, 3], np.int32)  # state 1 then state 3, no blank
    ev = FrameEvidence(emit_lp=np.zeros(4, np.float32),
                       margin=np.zeros(4, np.float32),
                       blank_prob=np.zeros(4))
    units = group_into_phonemes(path, seq, ev, BLANK, SEP, 10.0)
    assert [u.word for u in units] == ["a", "a"]
    assert [(u.start_ms, u.end_ms) for u in units] == [(0, 20), (20, 40)]


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params

    cfg = Wav2Vec2ModelConfig.from_dict(dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0,
        vocab_size=16, feat_extract_norm="group", conv_bias=False,
    ))
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"<pad>": 0, "|": 4, "a": 5, "ɛ̃": 6, "tʃ": 7, "k": 8, "u": 9}
    return cfg, params, vocab


def test_batch_aligner_phoneme_units(tiny_model):
    from wav2vec2_tpu.parallel.batching import BatchAligner

    cfg, params, vocab = tiny_model
    aligner = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                           use_pallas=False, units="phoneme")
    rng = np.random.default_rng(0)
    audios = [rng.normal(size=3000).astype(np.float32) for _ in range(3)]
    transcripts = ["a ɛ̃ tʃ", "k u | a", "tʃ tʃ u"]
    outs = aligner.align_utterances(audios, transcripts,
                                    audio_multiple=500, token_multiple=16)
    for out, t in zip(outs, transcripts):
        expect = [s for s in t.split() if s != "|"]
        assert [u.word for u in out.words] == expect
        # forced alignment: units follow the path in order (starts monotone;
        # with this toy sub-ms frame stride the 1-ms minimum unit width can
        # overlap a neighbor by a rounded frame, so only starts are checked)
        for u, v in zip(out.words, out.words[1:]):
            assert u.start_ms <= v.start_ms
        for u in out.words:
            assert u.end_ms > u.start_ms
            assert 0.0 <= u.confidence <= 1.0


def test_batch_aligner_rejects_unknown_units(tiny_model):
    from wav2vec2_tpu.parallel.batching import BatchAligner

    cfg, params, vocab = tiny_model
    with pytest.raises(ValueError, match="units"):
        BatchAligner(cfg, params, vocab, units="syllable")


def test_builder_injected_phoneme_pipeline_matches_batch(tiny_model):
    """Single-utterance pipeline with PhonemeTokenizer+PhonemeGrouper must
    produce the same units as BatchAligner(units='phoneme')."""
    import json

    from wav2vec2_tpu.config import Wav2Vec2Config
    from wav2vec2_tpu.parallel.batching import BatchAligner
    from wav2vec2_tpu.pipeline.builder import ForcedAlignerBuilder
    from wav2vec2_tpu.pipeline.defaults import PhonemeGrouper, PhonemeTokenizer

    cfg, params, vocab = tiny_model
    import tempfile
    from pathlib import Path

    from safetensors.numpy import save_file

    from wav2vec2_tpu.utils.checkpoint import params_to_hf_flat_dict

    with tempfile.TemporaryDirectory() as d:
        d = Path(d)
        save_file(params_to_hf_flat_dict(params, cfg), str(d / "model.safetensors"))
        (d / "config.json").write_text(json.dumps(dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
            conv_stride=[5, 2], num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4, pad_token_id=0,
            vocab_size=16, feat_extract_norm="group", conv_bias=False,
        )))
        (d / "vocab.json").write_text(json.dumps(vocab))
        ucfg = Wav2Vec2Config(
            model_path=str(d / "model.safetensors"),
            config_path=str(d / "config.json"),
            vocab_path=str(d / "vocab.json"),
            device="cpu",
        )
        single = (
            ForcedAlignerBuilder(ucfg)
            .with_tokenizer(PhonemeTokenizer())
            .with_word_grouper(PhonemeGrouper())
            .build()
        )
        rng = np.random.default_rng(1)
        audio = rng.normal(size=3000).astype(np.float32)
        transcript = "a ɛ̃ k u"
        from wav2vec2_tpu.types import AlignmentInput

        got = single.align(AlignmentInput(
            sample_rate_hz=16000, samples=audio, transcript=transcript,
        )).words
        batch = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                             use_pallas=False, units="phoneme")
        ref = batch.align_utterances([audio], [transcript],
                                     audio_multiple=500, token_multiple=16)[0]
        assert [u.word for u in got] == [u.word for u in ref.words]
        assert [(u.start_ms, u.end_ms) for u in got] == [
            (u.start_ms, u.end_ms) for u in ref.words]


def test_group_into_phonemes_confidence_stats():
    """Phoneme units carry per-frame acoustic stats (mean/min/p10 logp,
    mean margin, frame count, quality score) — no word calibration."""
    from wav2vec2_tpu.align.grouping import frame_evidence_from_log_probs
    from wav2vec2_tpu.align.grouping.phoneme import group_into_phonemes
    from wav2vec2_tpu.align.tokenization import build_token_sequence_phoneme

    vocab = {"<pad>": 0, "|": 4, "a": 5, "tʃ": 6}
    seq = build_token_sequence_phoneme("a tʃ", vocab, 0, 4)
    rng = np.random.default_rng(0)
    lp = np.log(rng.dirichlet(np.ones(8), size=12).astype(np.float32))
    from wav2vec2_tpu.ops.viterbi_ref import viterbi_numpy

    path = viterbi_numpy(lp, np.asarray(seq.tokens))
    states = np.asarray([s for s, _ in path])
    ev = frame_evidence_from_log_probs(lp, seq.tokens, states, 0)
    units = group_into_phonemes(states, seq, ev, 0, 4, 20.0)
    assert [u.word for u in units] == ["a", "tʃ"]
    for u in units:
        st = u.confidence_stats
        assert st.coverage_frame_count >= 1
        assert st.mean_logp is not None and st.min_logp <= st.mean_logp
        assert st.p10_logp is not None and st.mean_margin is not None
        assert 0.0 <= st.geo_mean_prob <= 1.0
        assert 0.0 <= st.quality_confidence <= 1.0
        assert st.calibrated_confidence is None  # word-fit map not applied
