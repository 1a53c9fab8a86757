"""Cross-implementation quality sweep over every supported model family.

Runs scripts/quality_report.py (independent torch CPU driver vs the real
TPU CLI, reference 5 ms median gates) once per family and aggregates the
per-family summaries into reports/quality_families.json plus a markdown
table on stdout. Restartable: families whose summary file already exists
are skipped unless --force.

Case counts scale with model cost (torch CPU is the bottleneck; the 200-case
wav2vec2-base run from round 2 remains the flagship artifact). The
add_adapter family aligns at 160 ms frames, so its corpus uses longer
utterances with sparser transcripts to respect the T >= (S+1)/2 trellis
feasibility bound every implementation shares (viterbi.rs:71-77).

Usage:
    python scripts/quality_families.py [--only fam1,fam2] [--force]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "scripts"))

# family -> (cases, dur_lo, dur_hi, words_per_sec, max_batch)
# max_batch bounds f32 activation memory for the 600M+ geometries and pins
# one compiled batch shape (compile time dominates through the axon tunnel).
SWEEP: dict[str, tuple[int, float, float, float, int]] = {
    "wav2vec2-large-960h-lv60": (16, 4.0, 8.0, 2.0, 8),
    "hubert-base-ls960": (64, 4.0, 8.0, 2.0, 64),
    "mhubert-147": (64, 4.0, 8.0, 2.0, 64),
    "data2vec-audio-base-960h": (64, 4.0, 8.0, 2.0, 64),
    "wavlm-base-plus": (64, 4.0, 8.0, 2.0, 64),
    "sew-base": (64, 4.0, 8.0, 2.0, 64),
    "sew-d-base": (64, 4.0, 8.0, 2.0, 64),
    "unispeech-sat-base-100h": (64, 4.0, 8.0, 2.0, 64),
    "wav2vec2-conformer-rope-large-960h": (16, 4.0, 8.0, 2.0, 8),
    "wav2vec2-conformer-rel-pos-large-960h": (16, 4.0, 8.0, 2.0, 8),
    "w2v-bert-2.0": (16, 4.0, 8.0, 2.0, 8),
    "wav2vec2-large-adapter": (16, 10.0, 14.0, 0.35, 8),
    "mms-1b": (8, 4.0, 8.0, 2.0, 4),
}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--only", default=None,
                   help="comma-separated family subset")
    p.add_argument("--cpu", action="store_true",
                   help="pass --cpu through to quality_report")
    p.add_argument("--force", action="store_true")
    p.add_argument("--out-dir", default="reports")
    p.add_argument("--work-dir", default="/tmp/quality_families")
    args = p.parse_args(argv)

    import quality_report

    out_dir = Path(args.out_dir)
    families = list(SWEEP)
    if args.only:
        families = [f.strip() for f in args.only.split(",") if f.strip()]

    results: dict[str, dict] = {}
    overall_rc = 0
    for fam in families:
        cases, dur_lo, dur_hi, wps, max_batch = SWEEP[fam]
        summary_path = out_dir / f"quality_summary_{fam}.json"
        if summary_path.exists() and not args.force:
            print(f"[families] {fam}: reusing {summary_path}", flush=True)
            results[fam] = json.loads(summary_path.read_text())
            continue
        print(f"[families] {fam}: {cases} cases ...", flush=True)
        t0 = time.perf_counter()
        rc = quality_report.main([
            "--family", fam,
            "--cases", str(cases),
            "--dur-lo", str(dur_lo),
            "--dur-hi", str(dur_hi),
            "--words-per-sec", str(wps),
            "--max-batch", str(max_batch),
            "--keep", f"{args.work_dir}/{fam}",
            "--out-dir", str(out_dir),
            "--skip-bf16", "--skip-json-report",
            *(["--cpu"] if args.cpu else []),
        ])
        print(f"[families] {fam}: rc={rc} "
              f"({time.perf_counter() - t0:.0f} s)", flush=True)
        if rc != 0:
            overall_rc = rc
            results[fam] = {"failed_rc": rc}
            continue
        results[fam] = json.loads(summary_path.read_text())

    # merge into the existing aggregate so a --only subset run refreshes
    # those families without dropping the rest
    agg_path = out_dir / "quality_families.json"
    merged: dict[str, dict] = {}
    if agg_path.exists():
        try:
            merged = json.loads(agg_path.read_text())
        except ValueError:
            merged = {}
    merged.update(results)
    agg_path.write_text(json.dumps(merged, indent=2) + "\n")

    print("\n| family | cases | word pairs | median Δstart/end/mid (ms) | "
          "p99 |Δmid| | max |Δmid| |")
    print("|---|---|---|---|---|---|")
    for fam, res in results.items():
        m = res.get("comparisons", {}).get("float32")
        if not m:
            print(f"| {fam} | — | — | FAILED rc={res.get('failed_rc')} "
                  "| — | — |")
            continue
        print(
            f"| {fam} | {res['cases']} | {m['word_pairs']} "
            f"| {m['median_start_diff_ms']:.1f} / {m['median_end_diff_ms']:.1f}"
            f" / {m['median_word_middle_diff_ms']:.1f} "
            f"| {m['abs_middle_ms']['p99']:.1f} "
            f"| {m['abs_middle_ms']['max']:.1f} |"
        )
    return overall_rc


if __name__ == "__main__":
    raise SystemExit(main())
