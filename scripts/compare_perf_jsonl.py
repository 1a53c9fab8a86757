#!/usr/bin/env python
"""Cross-implementation perf comparison over schema-v1 JSONL records.

Plays the comparison role of the reference's Python (TorchAudio) benchmark
driver (/root/reference/scripts/wav2vec2aligner_librispeech_textgrids.py:
1-621 + wav2vec2aligner-main.perf-monitoring.patch): that driver exists so
reference-vs-other perf runs share one schema and are turnkey to compare.
TorchAudio is not installable in this environment, so the comparison half is
implemented directly: ingest TWO perf JSONL files (any schema-v1 producer —
the Rust reference, its patched Python driver, or this repo's
`--output-format perf`), align records by utterance id, and report
per-stage ratios and distribution shifts.

Usage:
    python scripts/compare_perf_jsonl.py BASELINE.jsonl OURS.jsonl \
        [--stages forward_ms,dp_ms,...] [--json out.json] [--quiet]

Exit codes: 0 = compared fine; 2 = no common utterances / unreadable input.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

DEFAULT_STAGES = [
    "forward_ms", "post_ms", "dp_ms", "group_ms", "conf_ms",
    "align_ms", "total_ms", "align_ms_per_ts", "align_ms_per_t",
]


def load_records(path: Path) -> dict[str, dict]:
    """utterance_id -> record. Later duplicates win (matches --perf-append
    semantics where reruns append fresher rows)."""
    records: dict[str, dict] = {}
    try:
        text = path.read_text()
    except OSError as e:
        print(f"error: cannot read {path}: {e}", file=sys.stderr)
        return {}
    for line_no, line in enumerate(text.splitlines(), 1):
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError as e:
            print(f"warning: {path}:{line_no}: bad JSON skipped ({e})",
                  file=sys.stderr)
            continue
        uid = rec.get("utterance_id")
        if uid:
            records[uid] = rec
    return records


def percentile(sorted_vals: list[float], q: float) -> float:
    if not sorted_vals:
        return 0.0
    idx = q * (len(sorted_vals) - 1)
    lo = int(idx)
    hi = min(lo + 1, len(sorted_vals) - 1)
    frac = idx - lo
    return sorted_vals[lo] * (1 - frac) + sorted_vals[hi] * frac


def dist(vals: list[float]) -> dict:
    s = sorted(vals)
    return {
        "n": len(s),
        "p10": percentile(s, 0.10),
        "p50": percentile(s, 0.50),
        "p90": percentile(s, 0.90),
        "mean": sum(s) / len(s) if s else 0.0,
    }


def compare(base: dict[str, dict], ours: dict[str, dict],
            stages: list[str]) -> dict:
    common = sorted(set(base) & set(ours))
    result = {
        "common_utterances": len(common),
        "baseline_only": sorted(set(base) - set(ours)),
        "ours_only": sorted(set(ours) - set(base)),
        "stages": {},
    }
    for stage in stages:
        b_vals, o_vals, ratios = [], [], []
        for uid in common:
            b = base[uid].get(stage)
            o = ours[uid].get(stage)
            if not isinstance(b, (int, float)) or not isinstance(o, (int, float)):
                continue
            b_vals.append(float(b))
            o_vals.append(float(o))
            if o > 0:
                ratios.append(b / o)  # >1 means ours is faster
        if not b_vals:
            continue
        entry = {
            "baseline": dist(b_vals),
            "ours": dist(o_vals),
            "speedup_of_medians": (
                dist(b_vals)["p50"] / dist(o_vals)["p50"]
                if dist(o_vals)["p50"] > 0 else None
            ),
            "median_per_utterance_speedup": (
                dist(ratios)["p50"] if ratios else None
            ),
        }
        result["stages"][stage] = entry
    return result


def print_table(result: dict) -> None:
    print(f"common utterances: {result['common_utterances']}  "
          f"(baseline-only: {len(result['baseline_only'])}, "
          f"ours-only: {len(result['ours_only'])})")
    hdr = (f"{'stage':<16} {'base p50':>10} {'ours p50':>10} "
           f"{'speedup':>8} {'base p90':>10} {'ours p90':>10}")
    print(hdr)
    print("-" * len(hdr))
    for stage, e in result["stages"].items():
        sp = e["speedup_of_medians"]
        print(f"{stage:<16} {e['baseline']['p50']:>10.3f} "
              f"{e['ours']['p50']:>10.3f} "
              f"{(f'{sp:.2f}x' if sp else 'n/a'):>8} "
              f"{e['baseline']['p90']:>10.3f} {e['ours']['p90']:>10.3f}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("baseline", type=Path,
                    help="reference-implementation perf JSONL")
    ap.add_argument("ours", type=Path, help="this implementation's perf JSONL")
    ap.add_argument("--stages", default=",".join(DEFAULT_STAGES),
                    help="comma-separated stage fields to compare")
    ap.add_argument("--json", type=Path, default=None,
                    help="also write the full comparison as JSON")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    base = load_records(args.baseline)
    ours = load_records(args.ours)
    if not base or not ours:
        print("error: empty or unreadable input", file=sys.stderr)
        return 2
    result = compare(base, ours, [s for s in args.stages.split(",") if s])
    if result["common_utterances"] == 0:
        print("error: no common utterance ids between the two files",
              file=sys.stderr)
        return 2
    if not args.quiet:
        print_table(result)
    if args.json:
        args.json.write_text(json.dumps(result, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
