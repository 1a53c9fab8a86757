"""Native C++ grouping engine vs the Python oracle: outputs must be
BIT-IDENTICAL (same f32 accumulation orders, f64 widenings, tie-breaking).
Covers the golden corpus, randomized cases, and the fallback contract."""

import sys
from pathlib import Path

import numpy as np
import pytest

from wav2vec2_tpu.align import grouping
from wav2vec2_tpu.align.grouping import native as native_mod
from wav2vec2_tpu.align.grouping import (
    frame_evidence_from_log_probs,
    group_into_words_profiled,
)
from wav2vec2_tpu.align.tokenization import build_token_sequence_case_aware
from wav2vec2_tpu.config import AlignerHyperParams
from wav2vec2_tpu.ops.viterbi_ref import viterbi_numpy

sys.path.insert(0, str(Path(__file__).parent / "golden"))
from generate_golden import CASES, CASE_EXTRAS, SEP_ID, BLANK_ID, STRIDE_MS, VOCAB, synth_log_probs  # noqa: E402

pytestmark = pytest.mark.skipif(
    not native_mod.native_available(), reason="native grouping lib unavailable"
)


def _both_paths(transcript, lp, hp=None):
    hp = hp or AlignerHyperParams()
    seq = build_token_sequence_case_aware(transcript, VOCAB, BLANK_ID, SEP_ID)
    path = viterbi_numpy(lp, np.asarray(seq.tokens))
    states = [s for s, _ in path]
    ev = frame_evidence_from_log_probs(lp, seq.tokens, states, BLANK_ID)

    prev = grouping.NATIVE_GROUPING
    try:
        grouping.NATIVE_GROUPING = "require"
        nat = group_into_words_profiled(
            path, seq.tokens, seq.chars, seq.normalized_words, ev,
            BLANK_ID, SEP_ID, STRIDE_MS, hp,
        )
        grouping.NATIVE_GROUPING = "off"
        py = group_into_words_profiled(
            path, seq.tokens, seq.chars, seq.normalized_words, ev,
            BLANK_ID, SEP_ID, STRIDE_MS, hp,
        )
    finally:
        grouping.NATIVE_GROUPING = prev
    return nat.words, py.words


def _assert_identical(nat, py, ctx):
    assert len(nat) == len(py), ctx
    for wn, wp in zip(nat, py):
        assert wn.word == wp.word, ctx
        assert wn.start_ms == wp.start_ms, (ctx, wn.word)
        assert wn.end_ms == wp.end_ms, (ctx, wn.word)
        assert wn.confidence == wp.confidence, (ctx, wn.word)
        sn, sp = wn.confidence_stats, wp.confidence_stats
        for f in ("mean_logp", "geo_mean_prob", "quality_confidence",
                  "calibrated_confidence", "min_logp", "p10_logp",
                  "mean_margin", "coverage_frame_count",
                  "boundary_confidence"):
            assert getattr(sn, f) == getattr(sp, f), (ctx, wn.word, f)


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_native_matches_python_on_golden_corpus(case):
    case_id, transcript, t_len, seed, noise, signal, smear = case
    seq = build_token_sequence_case_aware(transcript, VOCAB, BLANK_ID, SEP_ID)
    lp = synth_log_probs(seq.tokens, t_len, seed, noise, signal, smear,
                         **CASE_EXTRAS.get(case_id, {}))
    nat, py = _both_paths(transcript, lp)
    _assert_identical(nat, py, case_id)


def test_native_matches_python_randomized():
    rng = np.random.default_rng(42)
    words = ["THE", "CAT", "SAT", "ON", "A", "MAT", "BOOKKEEPER", "LLAMA"]
    for trial in range(30):
        n_words = int(rng.integers(1, 7))
        transcript = " ".join(rng.choice(words, size=n_words))
        seq = build_token_sequence_case_aware(transcript, VOCAB, BLANK_ID, SEP_ID)
        t_len = int(rng.integers(len(seq.tokens) // 2 + 1, 200))
        logits = rng.normal(0, rng.uniform(0.5, 3.0), size=(t_len, 33))
        lp = (logits - np.log(np.exp(logits).sum(1, keepdims=True))).astype(np.float32)
        nat, py = _both_paths(transcript, lp)
        _assert_identical(nat, py, f"trial {trial}: {transcript} T={t_len}")


def test_native_off_switch_forces_python(monkeypatch):
    monkeypatch.setattr(grouping, "NATIVE_GROUPING", "off")
    called = {"native": False}
    monkeypatch.setattr(
        native_mod, "group_into_words_native",
        lambda *a, **k: called.__setitem__("native", True),
    )
    seq = build_token_sequence_case_aware("THE CAT", VOCAB, BLANK_ID, SEP_ID)
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(60, 33))
    lp = (logits - np.log(np.exp(logits).sum(1, keepdims=True))).astype(np.float32)
    path = viterbi_numpy(lp, np.asarray(seq.tokens))
    ev = frame_evidence_from_log_probs(lp, seq.tokens, [s for s, _ in path], 0)
    out = group_into_words_profiled(
        path, seq.tokens, seq.chars, seq.normalized_words, ev,
        BLANK_ID, SEP_ID, STRIDE_MS,
    )
    assert not called["native"]
    assert [w.word for w in out.words] == ["THE", "CAT"]


def test_native_declines_nonstandard_frames():
    """A path whose frames aren't 0..T-1 must run the Python oracle."""
    seq = build_token_sequence_case_aware("AB", VOCAB, BLANK_ID, SEP_ID)
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(40, 33))
    lp = (logits - np.log(np.exp(logits).sum(1, keepdims=True))).astype(np.float32)
    path = viterbi_numpy(lp, np.asarray(seq.tokens))
    ev = frame_evidence_from_log_probs(lp, seq.tokens, [s for s, _ in path], 0)
    # reversed frame order: contract violation for the native path
    weird = [(s, t) for (s, t) in reversed(path)]
    out = group_into_words_profiled(
        weird, seq.tokens, seq.chars, seq.normalized_words, ev,
        BLANK_ID, SEP_ID, STRIDE_MS,
    )
    assert isinstance(out.words, list)  # served (by the Python path), no crash


def test_native_measure_hook_uses_python(monkeypatch):
    called = {"native": False}
    monkeypatch.setattr(
        native_mod, "group_into_words_native",
        lambda *a, **k: called.__setitem__("native", True),
    )
    seq = build_token_sequence_case_aware("A", VOCAB, BLANK_ID, SEP_ID)
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(20, 33))
    lp = (logits - np.log(np.exp(logits).sum(1, keepdims=True))).astype(np.float32)
    path = viterbi_numpy(lp, np.asarray(seq.tokens))
    ev = frame_evidence_from_log_probs(lp, seq.tokens, [s for s, _ in path], 0)
    stages = []
    out = group_into_words_profiled(
        path, seq.tokens, seq.chars, seq.normalized_words, ev,
        BLANK_ID, SEP_ID, STRIDE_MS,
        measure=lambda name, fn: (stages.append(name), fn())[1],
    )
    assert not called["native"]
    assert stages == ["conf"]
    assert [w.word for w in out.words] == ["A"]


def _run_direct(path_states, tokens, chars, expected, lp, hp=None):
    """Drive both paths with a HAND-BUILT state path (not Viterbi) so
    guard branches that forced alignment rarely hits get exercised."""
    hp = hp or AlignerHyperParams()
    ev = frame_evidence_from_log_probs(lp, tokens, path_states, BLANK_ID)
    path = [(int(s), t) for t, s in enumerate(path_states)]
    prev = grouping.NATIVE_GROUPING
    try:
        grouping.NATIVE_GROUPING = "require"
        nat = group_into_words_profiled(
            path, tokens, chars, expected, ev, BLANK_ID, SEP_ID, STRIDE_MS, hp)
        grouping.NATIVE_GROUPING = "off"
        py = group_into_words_profiled(
            path, tokens, chars, expected, ev, BLANK_ID, SEP_ID, STRIDE_MS, hp)
    finally:
        grouping.NATIVE_GROUPING = prev
    return nat.words, py.words


def test_native_sep_flush_guard_matches():
    """A path that visits the separator while the accumulated word does NOT
    match the expected word must keep accumulating (path_to_words.rs:59-84)
    identically in both implementations."""
    seq = build_token_sequence_case_aware("AB BA", VOCAB, BLANK_ID, SEP_ID)
    rng = np.random.default_rng(9)
    logits = rng.normal(size=(24, 33))
    lp = (logits - np.log(np.exp(logits).sum(1, keepdims=True))).astype(np.float32)
    # states: [blank A blank B blank | blank B blank A blank]
    # visit: A, sep-cluster early (word "A" != expected "AB"), B, sep, ...
    a_state, b_state = 1, 3
    sep_state = 5
    path_states = ([0] * 2 + [a_state] * 3 + [sep_state] * 2 +  # early sep: "a" != "ab"
                   [b_state] * 3 + [sep_state] * 3 +            # now "ab" matches
                   [7] * 3 + [8] * 0 + [9] * 4 + [10] * 4)
    path_states = path_states[:24]
    nat, py = _run_direct(path_states, seq.tokens, seq.chars,
                          seq.normalized_words, lp)
    _assert_identical(nat, py, "sep flush guard")
    assert [w.word for w in py][:1] == ["AB"]


def test_native_words_beyond_expected_permissive():
    """Once produced >= expected, the guard is permissive and extra words
    flush freely — both paths must agree."""
    seq = build_token_sequence_case_aware("AB", VOCAB, BLANK_ID, SEP_ID)
    # force a path that produces "AB" then revisits nothing more — then
    # append synthetic extra chars via a longer token sequence
    tokens = list(seq.tokens) + [SEP_ID, 0, VOCAB["C"], 0]
    chars = list(seq.chars) + ["|", None, "C", None]
    rng = np.random.default_rng(10)
    logits = rng.normal(size=(20, 33))
    lp = (logits - np.log(np.exp(logits).sum(1, keepdims=True))).astype(np.float32)
    path_states = ([1] * 3 + [3] * 3 + [5] * 2 +   # AB then sep
                   [7] * 4 + [8] * 8)               # extra "C" word beyond expected
    path_states = path_states[:20]
    nat, py = _run_direct(path_states, tokens, chars,
                          seq.normalized_words, lp)
    _assert_identical(nat, py, "beyond expected")
    assert [w.word for w in py] == ["AB", "C"]


def test_native_no_final_sep_flush():
    """Final flush after the loop (no trailing separator) must agree."""
    seq = build_token_sequence_case_aware("AB", VOCAB, BLANK_ID, SEP_ID)
    rng = np.random.default_rng(11)
    logits = rng.normal(size=(12, 33))
    lp = (logits - np.log(np.exp(logits).sum(1, keepdims=True))).astype(np.float32)
    path_states = [0] * 2 + [1] * 4 + [3] * 6
    nat, py = _run_direct(path_states, seq.tokens, seq.chars,
                          seq.normalized_words, lp)
    _assert_identical(nat, py, "final flush")
    assert [w.word for w in py] == ["AB"]


# --- property-based equivalence (hypothesis) ---

from hypothesis import given, settings, strategies as st  # noqa: E402

from wav2vec2_tpu.config import ExpansionPolicyConfig  # noqa: E402

_WORD = st.text(alphabet="ETAONIHS'", min_size=1, max_size=8)


@settings(max_examples=60, deadline=None)
@given(
    words=st.lists(_WORD, min_size=1, max_size=6),
    seed=st.integers(0, 2**31 - 1),
    t_extra=st.integers(0, 150),
    scale=st.floats(0.3, 4.0),
    budgets=st.tuples(st.integers(0, 20), st.integers(0, 20),
                      st.integers(0, 20)),
)
def test_native_matches_python_property(words, seed, t_extra, scale, budgets):
    """For arbitrary transcripts, logit scales, and expansion budgets the
    native engine must equal the Python oracle bit-for-bit."""
    transcript = " ".join(words)
    seq = build_token_sequence_case_aware(transcript, VOCAB, BLANK_ID, SEP_ID)
    if not seq.tokens:
        return
    t_len = -(-len(seq.tokens) // 2) + 1 + t_extra
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, scale, size=(t_len, 33))
    lp = (logits - np.log(np.exp(logits).sum(1, keepdims=True))).astype(np.float32)
    hp = AlignerHyperParams(
        expansion_policies=(
            ExpansionPolicyConfig("balanced", *budgets),
            ExpansionPolicyConfig("conservative_start", 10, 2, 6),
            ExpansionPolicyConfig("aggressive_tail", 16, 4, 2),
        )
    )
    nat, py = _both_paths(transcript, lp, hp=hp)
    _assert_identical(nat, py, f"{transcript!r} seed={seed} budgets={budgets}")


def test_grouping_installed_layout_fallback(monkeypatch, tmp_path):
    """Installed-wheel layout: loader falls back to the in-package
    setup.py-built extension when native/ is absent."""
    import subprocess as sp
    import sys as _sys

    repo = Path(native_mod.__file__).resolve().parents[3]
    if not list((repo / "wav2vec2_tpu").glob("_grouping*.so")):
        r = sp.run([_sys.executable, "setup.py", "build_ext", "--inplace"],
                   cwd=repo, capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"cannot build in-package extension: {r.stderr[-200:]}")

    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_lib_failed", False)
    monkeypatch.setattr(native_mod, "_NATIVE_DIR", tmp_path / "no_native")
    monkeypatch.setattr(native_mod, "_LIB_PATH", tmp_path / "no_native" / "x.so")
    assert native_mod.native_available()
    # run an alignment through the fallback engine and cross-check
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(60, 33))
    lp = (logits - np.log(np.exp(logits).sum(1, keepdims=True))).astype(np.float32)
    nat, py = _both_paths("THE CAT", lp)
    _assert_identical(nat, py, "installed layout")
    monkeypatch.setattr(native_mod, "_lib", None)


def test_native_declines_context_sensitive_lowercasing():
    """Unicode Final_Sigma ('ΘΕΟΣ'.lower() ends in 'ς' but per-char lower
    gives 'σ'): the C++ engine lowercases per char, so such transcripts
    must fall back to the Python oracle instead of diverging."""
    from wav2vec2_tpu.align.grouping.native import group_into_words_native
    from wav2vec2_tpu.align.grouping.path_to_words import FrameEvidence
    from wav2vec2_tpu.align.tokenization import build_token_sequence_case_aware
    from wav2vec2_tpu.config import AlignerHyperParams

    vocab = {"Θ": 1, "Ε": 2, "Ο": 3, "Σ": 4, "|": 5}
    seq = build_token_sequence_case_aware("ΘΕΟΣ", vocab, 0, 5)
    assert seq.normalized_words == ["ΘΕΟΣ"]
    t = 2 * len(seq.tokens)
    path = np.repeat(np.arange(len(seq.tokens)), 2)
    ev = FrameEvidence(
        emit_lp=np.full(t, -0.1, np.float32),
        margin=np.ones(t, np.float32),
        blank_prob=np.full(t, 0.2, np.float64),
    )
    out = group_into_words_native(path, seq.tokens, seq.chars,
                                  seq.normalized_words, ev, 0, 5, 20.0,
                                  AlignerHyperParams())
    assert out is None  # declined → oracle path runs instead
