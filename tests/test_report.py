"""Report subsystem tests mirroring /root/reference/src/alignment/report.rs:1041-1515
(golden values included)."""

import pytest

from wav2vec2_tpu.align.report import (
    EPS_DURATION_SEC,
    ConfidenceMetrics,
    EndpointMetrics,
    ReferenceWord,
    SentenceReport,
    Split,
    StructuralMetrics,
    TimingMetrics,
    _checked,
    _percentile_sorted,
    aggregate_reports,
    attach_outlier_traces,
    compute_sentence_report,
    infer_split,
)
from wav2vec2_tpu.errors import InvalidInputError
from wav2vec2_tpu.types import WordConfidenceStats, WordTiming


def word_timing(word, start_ms, end_ms, confidence, coverage):
    return WordTiming(
        word=word, start_ms=start_ms, end_ms=end_ms, confidence=confidence,
        confidence_stats=WordConfidenceStats(
            geo_mean_prob=confidence, coverage_frame_count=coverage,
        ),
    )


def sample_sentence(id, split, duration_ms, word_count_ref, abs_err_ms_p90,
                    drift_ms_per_sec, low_conf_word_ratio, word_abs_errors_ms):
    duration_sec = max(duration_ms / 1000.0, EPS_DURATION_SEC)
    drift_delta_ms = drift_ms_per_sec * duration_sec
    return SentenceReport(
        id=id, split=split, has_reference=True, duration_ms=duration_ms,
        word_count_pred=word_count_ref, word_count_ref=word_count_ref,
        structural=StructuralMetrics(),
        confidence=ConfidenceMetrics(
            word_conf_mean=0.8, word_conf_min=0.8, low_conf_threshold_used=0.5,
            avg_word_margin=4.0, avg_boundary_confidence=0.8,
            low_conf_word_ratio=low_conf_word_ratio,
        ),
        timing=TimingMetrics(
            start=EndpointMetrics(0.0, abs_err_ms_p90 / 2, abs_err_ms_p90, abs_err_ms_p90),
            end=EndpointMetrics(drift_delta_ms, abs_err_ms_p90 / 2, abs_err_ms_p90, abs_err_ms_p90),
            abs_err_ms_median=abs_err_ms_p90 / 2,
            abs_err_ms_p90=abs_err_ms_p90,
            trimmed_mean_abs_err_ms=abs_err_ms_p90 / 2,
            offset_ms=0.0,
            drift_ms_per_sec=drift_ms_per_sec,
            drift_delta_ms=drift_delta_ms,
        ),
        per_word=None, notes=[], word_abs_errors_ms=word_abs_errors_ms,
    )


def test_infer_split():
    assert infer_split("path/test-clean/123") is Split.CLEAN
    assert infer_split("TEST-CLEAN") is Split.CLEAN
    assert infer_split("path/test-other/456") is Split.OTHER
    assert infer_split("other") is Split.UNKNOWN
    assert infer_split("") is Split.UNKNOWN


def test_sentence_report_with_reference_one_word():
    r = compute_sentence_report(
        "id1", Split.CLEAN, [word_timing("Hello", 0, 100, 0.9, 5)],
        [ReferenceWord("Hello", 0, 100)], 1000,
    )
    assert r.has_reference
    assert r.structural.negative_duration_word_count == 0
    assert r.confidence is not None
    assert r.timing is not None


def test_sentence_report_notes():
    r = compute_sentence_report("id2", Split.OTHER, [word_timing("Hi", 0, 50, 0.8, 3)], None, 1000)
    assert "reference_missing" in r.notes
    r = compute_sentence_report("id3", Split.CLEAN, [], None, 1000)
    assert "no_predicted_words" in r.notes
    r = compute_sentence_report("id4", Split.CLEAN, [word_timing("Hi", 0, 50, 0.8, 3)], [], 1000)
    assert "empty_reference_words" in r.notes
    r = compute_sentence_report(
        "id5", Split.CLEAN,
        [word_timing("A", 0, 50, 0.8, 2), word_timing("B", 50, 100, 0.8, 2)],
        [ReferenceWord("A", 0, 50)], 1000,
    )
    assert any(n.startswith("word_count_mismatch") for n in r.notes)
    r = compute_sentence_report(
        "id6", Split.CLEAN, [word_timing("Hi", 0, 50, 0.8, 2)],
        [ReferenceWord("Bye", 0, 50)], 1000,
    )
    assert any(n.startswith("word_label_mismatches") for n in r.notes)


def test_sentence_report_structural_counters():
    r = compute_sentence_report("id7", Split.CLEAN, [word_timing("Hi", 0, 50, None, 0)], None, 1000)
    assert r.structural.invalid_confidence_word_count > 0
    assert any(n.startswith("invalid_confidence_words") for n in r.notes)
    r = compute_sentence_report("id8", Split.CLEAN, [word_timing("Hi", 50, 50, 0.8, 2)], None, 1000)
    assert r.structural.negative_duration_word_count > 0
    r = compute_sentence_report(
        "id9", Split.CLEAN,
        [word_timing("A", 0, 100, 0.8, 2), word_timing("B", 50, 150, 0.8, 2)],
        None, 1000,
    )
    assert r.structural.overlap_word_count > 0
    assert r.structural.overlap_ratio == pytest.approx(50 / 1000)


def test_timing_paired_len_zero():
    r = compute_sentence_report("id10", Split.CLEAN, [], [], 1000)
    assert "no_aligned_word_pairs_for_timing" in r.notes
    assert r.timing is not None
    assert r.timing.abs_err_ms_median == 0.0
    assert r.timing.abs_err_ms_p90 == 0.0


def test_timing_metrics_hand_computed():
    pred = [word_timing("A", 10, 110, 0.9, 3), word_timing("B", 200, 320, 0.9, 3)]
    ref = [ReferenceWord("A", 0, 100), ReferenceWord("B", 210, 300)]
    r = compute_sentence_report("t", Split.CLEAN, pred, ref, 2000)
    t = r.timing
    # start errs: +10, -10; end errs: +10, +20
    assert t.start.mean_signed_ms == pytest.approx(0.0)
    assert t.end.mean_signed_ms == pytest.approx(15.0)
    assert t.drift_delta_ms == pytest.approx(15.0)
    assert t.drift_ms_per_sec == pytest.approx(15.0 / 2.0)
    # abs_all = [10,10,10,20]
    assert t.abs_err_ms_median == pytest.approx(10.0)
    assert sorted(r.word_abs_errors_ms) == [10.0, 10.0, 10.0, 20.0]


def test_percentile_interpolates_linearly():
    sorted_v = [10.0, 20.0, 30.0, 40.0]
    assert _percentile_sorted(sorted_v, 0.0) == pytest.approx(10.0)
    assert _percentile_sorted(sorted_v, 0.25) == pytest.approx(17.5)
    assert _percentile_sorted(sorted_v, 0.5) == pytest.approx(25.0)
    assert _percentile_sorted(sorted_v, 0.9) == pytest.approx(37.0)
    assert _percentile_sorted(sorted_v, 1.0) == pytest.approx(40.0)
    assert _percentile_sorted([], 0.5) == 0.0
    assert _percentile_sorted([42.0], 0.5) == 42.0


def test_checked_rejects_non_finite():
    with pytest.raises(InvalidInputError):
        _checked(float("nan"), "x")
    with pytest.raises(InvalidInputError):
        _checked(float("inf"), "y")


def test_drift_outliers_abs_value_and_tiny_utterance_filter():
    sentences = [
        sample_sentence("short-neg", Split.OTHER, 1_000, 1, 90.0, -120.0, 0.2, [30.0, 80.0]),
        sample_sentence("long-pos", Split.OTHER, 6_000, 8, 95.0, 30.0, 0.2, [40.0, 70.0]),
        sample_sentence("long-neg", Split.OTHER, 6_000, 8, 100.0, -40.0, 0.2, [40.0, 70.0]),
        sample_sentence("long-small", Split.OTHER, 7_000, 10, 80.0, 10.0, 0.2, [35.0, 50.0]),
    ]
    report = aggregate_reports(sentences)
    drift = report.outliers.worst_drift_ms_per_sec
    assert drift[0].id == "long-neg"
    assert drift[0].value == pytest.approx(-40.0)
    assert drift[1].id == "long-pos"
    assert not any(e.id == "short-neg" for e in drift)


def test_low_conf_outliers_use_abs_err_tiebreak():
    sentences = [
        sample_sentence("tie-low-err", Split.CLEAN, 5_000, 8, 80.0, 2.0, 1.0, [40.0, 50.0]),
        sample_sentence("tie-high-err", Split.CLEAN, 5_000, 8, 160.0, 2.0, 1.0, [80.0, 90.0]),
        sample_sentence("lower-ratio", Split.CLEAN, 5_000, 8, 300.0, 2.0, 0.9, [110.0, 120.0]),
    ]
    report = aggregate_reports(sentences)
    low_conf = report.outliers.worst_low_conf_word_ratio
    assert low_conf[0].id == "tie-high-err"
    assert low_conf[1].id == "tie-low-err"


def test_aggregate_word_error_distribution_and_pass_rates():
    sentences = [
        sample_sentence("a", Split.CLEAN, 5_000, 6, 80.0, 2.0, 0.2,
                        [30.0, 60.0, 110.0, 160.0]),
        sample_sentence("b", Split.CLEAN, 6_000, 6, 120.0, -1.0, 0.4, [40.0, 70.0]),
    ]
    report = aggregate_reports(sentences)
    g = report.global_
    assert g.word_abs_err_ms.mean == pytest.approx(78.333336, abs=1e-4)
    assert g.word_abs_err_ms.p50 == pytest.approx(65.0, abs=1e-4)
    assert g.word_abs_err_ms.p90 == pytest.approx(135.0, abs=1e-4)
    assert g.word_abs_err_pass_rate.le_50_ms == pytest.approx(2 / 6)
    assert g.word_abs_err_pass_rate.le_100_ms == pytest.approx(4 / 6)
    assert g.word_abs_err_pass_rate.le_150_ms == pytest.approx(5 / 6)
    assert g.abs_err_ms_p90_pass_rate.le_50_ms == pytest.approx(0.0)
    assert g.abs_err_ms_p90_pass_rate.le_100_ms == pytest.approx(0.5)
    assert g.abs_err_ms_p90_pass_rate.le_150_ms == pytest.approx(1.0)
    assert g.drift_delta_ms.p50 == pytest.approx(2.0, abs=1e-4)
    assert report.counts.total == 2
    assert report.counts.with_reference == 2


def test_attach_outlier_traces_populates_top_only():
    sentences = [
        sample_sentence("a", Split.CLEAN, 5_000, 2, 200.0, 2.0, 0.2, [100.0, 150.0]),
        sample_sentence("b", Split.CLEAN, 5_000, 2, 50.0, 2.0, 0.2, [20.0, 30.0]),
    ]
    predicted = {
        "a": [word_timing("one", 0, 100, 0.9, 2), word_timing("two", 100, 200, 0.9, 2)],
        "b": [word_timing("one", 0, 80, 0.9, 2), word_timing("two", 80, 180, 0.9, 2)],
    }
    references = {
        "a": [ReferenceWord("one", 0, 100), ReferenceWord("two", 100, 200)],
        "b": [ReferenceWord("one", 0, 80), ReferenceWord("two", 80, 180)],
    }
    attach_outlier_traces(sentences, predicted, references, 1)
    a = next(s for s in sentences if s.id == "a")
    b = next(s for s in sentences if s.id == "b")
    assert a.per_word is not None and len(a.per_word) == 2
    assert b.per_word is None


def test_adaptive_low_conf_threshold():
    import math

    # high margins + strong boundary evidence pull the threshold down
    words = [
        WordTiming("w", i * 100, i * 100 + 90, 0.45,
                   WordConfidenceStats(geo_mean_prob=0.45, coverage_frame_count=3,
                                       mean_margin=10.0, boundary_confidence=1.0))
        for i in range(5)
    ]
    r = compute_sentence_report("x", Split.CLEAN, words, None, 1000)
    sig = 1.0 / (1.0 + math.exp(-(10.0 - 3.0) / 1.5))
    expected = 0.50 + (0.5 - sig) * 0.12 - (1.0 - 0.5) * 0.06
    assert r.confidence.low_conf_threshold_used == pytest.approx(expected, abs=1e-6)
    # low margins + weak boundary push it up
    words = [
        WordTiming("w", i * 100, i * 100 + 90, 0.55,
                   WordConfidenceStats(geo_mean_prob=0.55, coverage_frame_count=3,
                                       mean_margin=-5.0, boundary_confidence=0.0))
        for i in range(5)
    ]
    r = compute_sentence_report("y", Split.CLEAN, words, None, 1000)
    sig = 1.0 / (1.0 + math.exp(-(-5.0 - 3.0) / 1.5))
    expected = min(0.50 + (0.5 - sig) * 0.12 + 0.5 * 0.06, 0.60)
    assert r.confidence.low_conf_threshold_used == pytest.approx(expected, abs=1e-6)
    # all words below a ~0.59 threshold are low-confidence
    assert r.confidence.low_conf_word_ratio == pytest.approx(1.0)
