"""Direct tests of the default stage adapters (defaults.rs tests:
case_aware_tokenizer_tokenize, viterbi_sequence_aligner_align_path,
default_word_grouper_group_words[_profiled], forward_output metadata)."""

import numpy as np

from wav2vec2_tpu.align.grouping import frame_evidence_from_log_probs
from wav2vec2_tpu.pipeline.defaults import (
    CaseAwareTokenizer,
    DefaultWordGrouper,
    ViterbiSequenceAligner,
)
from wav2vec2_tpu.pipeline.traits import ForwardOutput


def test_forward_output_metadata():
    fo = ForwardOutput(log_probs=np.zeros((7, 5), np.float32), t_len=7,
                       vocab_size=5, dtype="float32")
    assert fo.metadata() == (7, 5, "float32")


def test_case_aware_tokenizer_adapter():
    seq = CaseAwareTokenizer().tokenize("AB", {"a": 1, "b": 2, "|": 3}, 0, 3)
    assert seq.normalized_words == ["ab"]
    assert seq.tokens == [0, 1, 0, 2, 0]


def test_viterbi_sequence_aligner_adapter():
    lp = np.full((4, 3), -10.0, np.float32)
    lp[0, 0] = lp[1, 1] = lp[2, 1] = lp[3, 2] = -0.01
    fo = ForwardOutput(log_probs=lp, t_len=4, vocab_size=3)
    path = ViterbiSequenceAligner().align_path(fo, [0, 1, 2])
    assert list(path) == [0, 1, 1, 2]


def test_default_word_grouper_adapter():
    from wav2vec2_tpu.types import TokenSequence

    tokens = [0, 1, 0]
    seq = TokenSequence(tokens=tokens, chars=[None, "a", None],
                        normalized_words=["a"])
    lp = np.full((3, 3), -1.0, np.float32)
    path_states = np.array([0, 1, 0])
    ev = frame_evidence_from_log_probs(lp, tokens, path_states, 0)
    grouper = DefaultWordGrouper()
    words = grouper.group_words(path_states, seq, ev, 0, 2, 20.0)
    assert [w.word for w in words] == ["a"]
    profiled = grouper.group_words_profiled(path_states, seq, ev, 0, 2, 20.0)
    assert [w.word for w in profiled.words] == ["a"]
    assert profiled.collect_ms >= 0.0


def test_fused_path_evidence_matches_two_step():
    """The single-sync DP+evidence graph (latency path) must return the
    same path and evidence vectors as the classic two-step sequence."""
    from wav2vec2_tpu.align.grouping import frame_evidence_from_log_probs as fev
    from wav2vec2_tpu.ops.viterbi_ref import viterbi_numpy

    rng = np.random.default_rng(3)
    t_len, v = 60, 6
    tokens = [0, 1, 0, 2, 0, 3, 0, 4, 0]
    logits = rng.normal(size=(t_len, v)).astype(np.float64)
    lp = (logits - np.log(np.exp(logits).sum(1, keepdims=True))).astype(np.float32)

    aligner = ViterbiSequenceAligner(force_backend="scan")
    fo = ForwardOutput(log_probs=lp, t_len=t_len, vocab_size=v)
    res = aligner.align_path_with_evidence(fo, tokens, blank_id=0)
    assert res is not None
    path_fused, ev_fused = res

    ref_path = np.asarray([s for s, _ in viterbi_numpy(lp, np.asarray(tokens))])
    np.testing.assert_array_equal(path_fused, ref_path)
    ev_ref = fev(lp, tokens, ref_path, 0)
    np.testing.assert_allclose(ev_fused.emit_lp, ev_ref.emit_lp, atol=1e-6)
    np.testing.assert_allclose(ev_fused.margin, ev_ref.margin, atol=1e-6)
    np.testing.assert_allclose(ev_fused.blank_prob, ev_ref.blank_prob, atol=1e-6)


def test_fused_path_declines_small_utterances():
    """Below kernel_dp_threshold the host numpy oracle runs instead; the
    fused method signals that by returning None."""
    lp = np.full((4, 3), -1.0, np.float32)
    fo = ForwardOutput(log_probs=lp, t_len=4, vocab_size=3)
    assert ViterbiSequenceAligner().align_path_with_evidence(
        fo, [0, 1, 0], blank_id=0) is None
