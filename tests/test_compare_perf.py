"""Tests for the cross-implementation perf comparator
(scripts/compare_perf_jsonl.py) — the comparison half of the reference's
Python-driver protocol (its TorchAudio driver emits the same schema-v1
records; see /root/reference/scripts/wav2vec2aligner_librispeech_textgrids.py).
"""

import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).parent.parent
SAMPLES = Path(__file__).parent / "perf_samples"

spec = importlib.util.spec_from_file_location(
    "compare_perf_jsonl", REPO / "scripts" / "compare_perf_jsonl.py"
)
cpj = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cpj)


def test_sample_pair_compares(tmp_path, capsys):
    out_json = tmp_path / "cmp.json"
    rc = cpj.main([
        str(SAMPLES / "reference_cpu.jsonl"),
        str(SAMPLES / "tpu_bf16.jsonl"),
        "--json", str(out_json),
    ])
    assert rc == 0
    result = json.loads(out_json.read_text())
    assert result["common_utterances"] == 12
    assert result["baseline_only"] == ["1089-134686-9998"]
    assert result["ours_only"] == ["1089-134686-9999"]
    fwd = result["stages"]["forward_ms"]
    # the sample pair encodes a known ~48x forward gap
    assert 30 < fwd["speedup_of_medians"] < 70
    assert fwd["baseline"]["n"] == 12
    # distribution fields present and ordered
    for side in ("baseline", "ours"):
        d = fwd[side]
        assert d["p10"] <= d["p50"] <= d["p90"]
    table = capsys.readouterr().out
    assert "forward_ms" in table and "speedup" in table


def test_no_common_ids_is_error(tmp_path):
    a = tmp_path / "a.jsonl"
    b = tmp_path / "b.jsonl"
    a.write_text(json.dumps({"utterance_id": "x", "forward_ms": 1.0}) + "\n")
    b.write_text(json.dumps({"utterance_id": "y", "forward_ms": 1.0}) + "\n")
    assert cpj.main([str(a), str(b), "--quiet"]) == 2


def test_bad_lines_skipped(tmp_path):
    a = tmp_path / "a.jsonl"
    a.write_text(
        json.dumps({"utterance_id": "x", "forward_ms": 2.0}) + "\nnot json\n"
    )
    b = tmp_path / "b.jsonl"
    b.write_text(json.dumps({"utterance_id": "x", "forward_ms": 1.0}) + "\n")
    rc = cpj.main([str(a), str(b), "--quiet"])
    assert rc == 0


def test_duplicate_ids_last_wins(tmp_path):
    recs = [
        {"utterance_id": "x", "forward_ms": 100.0},
        {"utterance_id": "x", "forward_ms": 2.0},
    ]
    a = tmp_path / "a.jsonl"
    a.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    loaded = cpj.load_records(a)
    assert loaded["x"]["forward_ms"] == 2.0
