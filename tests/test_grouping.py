"""Grouping tests mirroring /root/reference/src/alignment/grouping/tests.rs
and blank_expansion.rs:120-224, with the same golden frame values."""

import numpy as np

from wav2vec2_tpu.align.grouping import (
    RawWord,
    frame_evidence_from_log_probs,
    group_into_words,
    group_into_words_profiled,
)
from wav2vec2_tpu.align.grouping import blank_expansion, candidate_selector
from wav2vec2_tpu.config import AlignerHyperParams
from wav2vec2_tpu.types import WordConfidenceStats

HP = AlignerHyperParams()
BALANCED, CONSERVATIVE, AGGRESSIVE = HP.expansion_policies


def make_raw(word, start, end):
    return RawWord(
        word=word,
        start_frame=start,
        end_frame=end,
        confidence=1.0,
        confidence_stats=WordConfidenceStats(geo_mean_prob=1.0),
    )


def make_uniform_log_probs(frame_count, vocab_size):
    lp = np.full((frame_count, vocab_size), -3.0, np.float32)
    lp[:, 0] = -0.1
    return lp


def evidence_for(log_probs, tokens=None, path_states=None, blank_id=0):
    t = log_probs.shape[0]
    if tokens is None:
        tokens = [0]
    if path_states is None:
        path_states = [0] * t
    return frame_evidence_from_log_probs(log_probs, tokens, path_states, blank_id)


# --- blank expansion (golden frame values from tests.rs + blank_expansion.rs) ---

def test_expand_single_word_unchanged():
    r = blank_expansion.expand_with_policy([make_raw("HELLO", 10, 20)], 0, 30, BALANCED)
    assert (r[0].start_frame, r[0].end_frame) == (10, 20)


def test_expand_two_words_splits_gap_at_midpoint():
    words = [make_raw("A", 10, 20), make_raw("B", 30, 40)]
    r = blank_expansion.expand_with_policy(words, 0, 50, BALANCED)
    assert r[0].start_frame == 10
    assert r[0].end_frame == 25
    assert r[1].start_frame == 30
    assert r[1].end_frame == 40


def test_expand_adjacent_words_no_gap():
    words = [make_raw("A", 5, 10), make_raw("B", 11, 15)]
    for policy in HP.expansion_policies:
        r = blank_expansion.expand_with_policy(words, 0, 20, policy)
        assert [(w.start_frame, w.end_frame) for w in r] == [(5, 10), (11, 15)]


def test_expand_gap_one_unchanged():
    words = [make_raw("A", 5, 10), make_raw("B", 12, 17)]
    r = blank_expansion.expand_with_policy(words, 0, 20, BALANCED)
    assert r[0].end_frame == 10
    assert r[1].start_frame == 12


def test_expand_three_words():
    words = [make_raw("A", 10, 15), make_raw("B", 25, 30), make_raw("C", 40, 45)]
    r = blank_expansion.expand_with_policy(words, 0, 50, BALANCED)
    assert r[0].end_frame == 20
    assert r[1].start_frame == 25
    assert r[1].end_frame == 35
    assert r[2].start_frame == 40


def test_expand_large_gap_capped():
    words = [make_raw("A", 5, 10), make_raw("B", 40, 45)]
    r = blank_expansion.expand_with_policy(words, 0, 50, BALANCED)
    assert r[0].end_frame == 22  # 10 + left_take(12)
    assert r[1].start_frame == 34  # 40 - right_take(6)


def test_expand_large_gap_preserves_interior_silence():
    words = [make_raw("A", 5, 10), make_raw("B", 80, 85)]
    r = blank_expansion.expand_with_policy(words, 0, 100, BALANCED)
    assert r[1].start_frame - r[0].end_frame - 1 >= 4


def test_expand_conservative_start_large_gap_frame_bounds():
    words = [make_raw("A", 5, 10), make_raw("B", 36, 41)]
    r = blank_expansion.expand_with_policy(words, 0, 50, CONSERVATIVE)
    assert r[0].end_frame == 20
    assert r[1].start_frame == 34


def test_expand_aggressive_tail_large_gap_frame_bounds():
    words = [make_raw("A", 5, 10), make_raw("B", 36, 41)]
    r = blank_expansion.expand_with_policy(words, 0, 50, AGGRESSIVE)
    assert r[0].end_frame == 26
    assert r[1].start_frame == 32


def test_all_policies_preserve_non_overlapping_boundaries():
    words = [make_raw("A", 5, 10), make_raw("B", 40, 45), make_raw("C", 80, 90)]
    for policy in HP.expansion_policies:
        r = blank_expansion.expand_with_policy(words, 0, 120, policy)
        for a, b in zip(r, r[1:]):
            assert a.end_frame < b.start_frame, policy.name


def test_expand_does_not_mutate_input():
    words = [make_raw("A", 10, 20), make_raw("B", 30, 40)]
    blank_expansion.expand_with_policy(words, 0, 50, BALANCED)
    assert words[0].end_frame == 20 and words[1].start_frame == 30


# --- candidate selector ---

def test_selector_prefers_balanced_when_scores_tie():
    raw = [make_raw("A", 10, 20), make_raw("B", 21, 30)]
    candidates = [
        (p, blank_expansion.expand_with_policy(raw, 0, 40, p))
        for p in HP.expansion_policies
    ]
    ev = evidence_for(make_uniform_log_probs(50, 4))
    sel = candidate_selector.select_best(raw, candidates, ev, HP)
    assert sel is not None and sel.policy.name == "balanced"


def test_selector_uses_blank_boundary_evidence():
    raw = [make_raw("A", 5, 10), make_raw("B", 20, 25)]
    cand_blank_heavy = [make_raw("A", 5, 13), make_raw("B", 20, 25)]
    cand_nonblank_heavy = [make_raw("A", 5, 10), make_raw("B", 17, 25)]
    candidates = [(BALANCED, cand_blank_heavy), (CONSERVATIVE, cand_nonblank_heavy)]

    lp = np.full((32, 4), -1.0, np.float32)
    lp[11:14] = [-0.05, -4.0, -4.0, -4.0]
    lp[17:20] = [-4.0, -0.05, -3.0, -3.0]
    ev = evidence_for(lp)

    sel = candidate_selector.select_best(raw, candidates, ev, HP)
    assert sel is not None and sel.policy.name == "balanced"
    assert sel.words[0].confidence_stats.boundary_confidence is not None


def test_selector_returns_none_for_empty_candidates():
    raw = [make_raw("A", 10, 20)]
    ev = evidence_for(make_uniform_log_probs(30, 4))
    assert candidate_selector.select_best(raw, [], ev, HP) is None


def test_selector_returns_single_candidate():
    raw = [make_raw("A", 5, 10), make_raw("B", 25, 30)]
    cand = blank_expansion.expand_with_policy(raw, 0, 40, AGGRESSIVE)
    ev = evidence_for(make_uniform_log_probs(50, 4))
    sel = candidate_selector.select_best(raw, [(AGGRESSIVE, cand)], ev, HP)
    assert sel is not None and sel.policy.name == "aggressive_tail"


def test_select_best_empty_raw_scores_as_invalid():
    ev = evidence_for(make_uniform_log_probs(30, 4))
    sel = candidate_selector.select_best(
        [], [(BALANCED, [make_raw("A", 10, 20)])], ev, HP
    )
    assert sel is not None and sel.score.total_score < -1_000_000.0


def test_select_best_length_mismatch_scores_as_invalid():
    raw = [make_raw("A", 10, 20), make_raw("B", 25, 35)]
    ev = evidence_for(make_uniform_log_probs(50, 4))
    sel = candidate_selector.select_best(
        raw, [(BALANCED, [make_raw("A", 10, 20)])], ev, HP
    )
    assert sel is not None and sel.score.total_score < -1_000_000.0


# --- end-to-end grouping (golden ms values from tests.rs:179-233) ---

def _grouping_inputs_basic():
    tokens = [0, 1, 0, 2, 0, 3, 0]
    chars = [None, "A", None, "|", None, "B", None]
    path = [
        (0, 0), (0, 1), (0, 2), (1, 3), (1, 4), (0, 5), (0, 6),
        (3, 7), (0, 8), (0, 9), (5, 10), (5, 11),
    ]
    lp = np.full((12, 4), -1.0, np.float32)
    return tokens, chars, path, lp


def test_group_into_words_basic():
    tokens, chars, path, lp = _grouping_inputs_basic()
    ev = frame_evidence_from_log_probs(lp, tokens, [s for s, _ in path], 0)
    words = group_into_words(path, tokens, chars, ["A", "B"], ev, 0, 2, 20.0)
    assert [w.word for w in words] == ["A", "B"]
    assert words[0].start_ms == 60
    assert words[0].end_ms == 120
    assert words[1].start_ms == 200
    assert words[1].end_ms == 240
    assert words[0].confidence is not None
    assert words[0].confidence_stats.geo_mean_prob is not None
    assert words[0].confidence_stats.coverage_frame_count == 2


def test_confidence_is_stable_across_repeated_state_holds():
    tokens = [0, 1, 0]
    chars = [None, "A", None]
    short_path = [(0, 0), (1, 1), (0, 2)]
    long_path = [(0, 0), (1, 1), (1, 2), (1, 3), (1, 4), (1, 5), (0, 6)]

    short_lp = np.full((3, 3), -5.0, np.float32)
    short_lp[1, 1] = -0.1
    short_lp[1, 0] = -3.0

    long_lp = np.full((7, 3), -5.0, np.float32)
    long_lp[1, 1] = -0.1
    long_lp[1, 0] = -3.0
    long_lp[2:6, 1] = -4.5
    long_lp[2:6, 0] = -0.2

    ev_s = frame_evidence_from_log_probs(short_lp, tokens, [s for s, _ in short_path], 0)
    ev_l = frame_evidence_from_log_probs(long_lp, tokens, [s for s, _ in long_path], 0)
    short_words = group_into_words(short_path, tokens, chars, ["A"], ev_s, 0, 2, 20.0)
    long_words = group_into_words(long_path, tokens, chars, ["A"], ev_l, 0, 2, 20.0)

    assert abs(short_words[0].confidence - long_words[0].confidence) < 1e-6
    assert short_words[0].confidence_stats.coverage_frame_count == 1
    assert long_words[0].confidence_stats.coverage_frame_count == 5


def test_group_profiled_empty_when_no_raw_words():
    path = [(0, 0), (0, 1), (0, 2)]
    lp = make_uniform_log_probs(4, 2)
    ev = frame_evidence_from_log_probs(lp, [0], [0, 0, 0, 0], 0)
    out = group_into_words_profiled(path, [0], [None], [], ev, 0, 1, 20.0)
    assert out.words == []
    assert out.expand_select_ms == 0.0


def test_group_profiled_full_confidence_stats():
    tokens = [0, 1, 0, 2, 0, 3, 0]
    chars = [None, "A", None, "|", None, "B", None]
    path = [(0, 0), (0, 1), (1, 2), (1, 3), (0, 4), (3, 5), (3, 6), (0, 7), (5, 8), (5, 9)]
    lp = np.full((10, 4), -1.0, np.float32)
    ev = frame_evidence_from_log_probs(lp, tokens, [s for s, _ in path], 0)
    out = group_into_words_profiled(path, tokens, chars, ["A", "B"], ev, 0, 2, 20.0)
    assert len(out.words) == 2
    assert out.words[0].confidence is not None
    assert out.words[0].confidence_stats.quality_confidence is not None
    assert out.words[0].confidence_stats.calibrated_confidence is not None


def test_separator_flush_guard_blocks_partial_word():
    """A separator frame must not flush a word that doesn't match the next
    expected word (path_to_words.rs:59-84)."""
    # tokens: blank A blank | blank B blank; expected word is "AB" — a sep
    # arriving while cur_word == "A" must not flush.
    tokens = [0, 1, 0, 2, 0, 3, 0]
    chars = [None, "A", None, "|", None, "B", None]
    # path hits A, then sep (premature), then B, then end
    path = [(1, 0), (3, 1), (5, 2)]
    lp = np.full((3, 4), -1.0, np.float32)
    ev = frame_evidence_from_log_probs(lp, tokens, [s for s, _ in path], 0)
    words = group_into_words(path, tokens, chars, ["AB"], ev, 0, 2, 20.0)
    assert [w.word for w in words] == ["AB"]


def test_calibration_knots_golden_values():
    from wav2vec2_tpu.align.grouping.confidence import calibrate_quality_confidence

    assert abs(calibrate_quality_confidence(0.0, HP) - 0.02) < 1e-6
    assert abs(calibrate_quality_confidence(0.5, HP) - 0.50) < 1e-6
    assert abs(calibrate_quality_confidence(1.0, HP) - 0.99) < 1e-6
    # midpoint of (0.20,0.12)-(0.35,0.28)
    x = 0.275
    expected = 0.12 + ((x - 0.20) / 0.15) * (0.28 - 0.12)
    assert abs(calibrate_quality_confidence(x, HP) - expected) < 1e-5
