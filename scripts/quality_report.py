"""Dataset-scale cross-implementation quality proof (VERDICT r2 items 1+5).

The reference's acceptance gate is |median Δstart/end/middle| ≤ 5 ms over
LibriSpeech between its implementation and an independent Python aligner
(/root/reference/scripts/compare_textgrids.py:37-38). This script runs the
same protocol at dataset scale in this environment:

1. build a full-geometry model dir (--family picks any supported family;
   default wav2vec2-base) + an N-case synthetic LibriSpeech-layout corpus
   (soak_cli / family_model_dirs helpers; no pretrained checkpoints exist
   here — zero egress — so weights are seeded-random; both implementations
   consume the identical checkpoint, which is exactly what a
   cross-IMPLEMENTATION comparison needs);
2. align every case with the INDEPENDENT torch CPU driver
   (scripts/torch_reference_driver.py) → baseline `stem.TextGrid`s;
3. align every case with the real CLI on TPU, f32 (`_tpu` suffix) and
   bf16 (`_tpu_bf16`, the serving mode);
4. compare with the turnkey comparator (median Δstart/end/middle; the
   reference's 5 ms thresholds enforced on the f32 run) plus extended
   distribution stats (p50/p90/p99/max |Δ|);
5. emit the CLI's full json-mode `Report` against the torch TextGrids as
   references (aggregate distributions, pass rates, outlier traces).

Artifacts land in --out-dir (default reports/): quality_summary.json,
quality_report.json (the full Report). Exit 0 only if the f32 medians
pass the 5 ms gates.

Usage:
    python scripts/quality_report.py [--cases 200] [--keep DIR]
        [--out-dir reports] [--skip-bf16] [--seed 0]
        [--family wavlm-base-plus]  # any scripts/family_model_dirs.py key;
                                    # scripts/quality_families.py sweeps all
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

from wav2vec2_tpu.cli.compare_textgrids import (  # noqa: E402
    extended_abs_stats,
    find_pairs,
    load_word_pairs,
    metrics_from_word_pairs,
)

ABS_THRESHOLD_MS = 5.0  # reference compare_textgrids.py:37-38


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--cases", type=int, default=200)
    p.add_argument("--dur-lo", type=float, default=4.0)
    p.add_argument("--dur-hi", type=float, default=8.0)
    p.add_argument("--words-per-sec", type=float, default=2.0,
                   help="transcript density (lower it for coarse-frame "
                        "models like add_adapter's 160 ms rate)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--family", default="wav2vec2-base-960h",
                   help="model family (scripts/family_model_dirs.py key)")
    p.add_argument("--keep", default=None,
                   help="reuse/keep corpus+model under this dir")
    p.add_argument("--out-dir", default="reports")
    p.add_argument("--max-batch", type=int, default=0,
                   help="cap the CLI's device batch (0 = CLI default); "
                        "bounds f32 activation memory for the 600M+ "
                        "families and pins the compiled batch shape")
    p.add_argument("--cpu", action="store_true",
                   help="run the CLI side on JAX-CPU instead of TPU (the "
                        "cross-implementation comparison is platform-"
                        "independent; use when the TPU is unavailable)")
    p.add_argument("--skip-bf16", action="store_true")
    p.add_argument("--skip-json-report", action="store_true")
    p.add_argument("--skip-torch", action="store_true",
                   help="assume baseline TextGrids already exist")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import family_model_dirs
    import soak_cli
    import torch_reference_driver

    from wav2vec2_tpu.cli.alignment_report import run as cli_run

    default_family = args.family == "wav2vec2-base-960h"
    root = Path(args.keep) if args.keep else Path("/tmp/quality_corpus")
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    t0 = time.perf_counter()
    if default_family:
        model_dir = soak_cli.make_model_dir(root)  # r2 artifact continuity
    else:
        model_dir = family_model_dirs.build_model_dir(args.family, root)
    dataset_root, audio_s = soak_cli.make_dataset(
        root, args.cases, args.dur_lo, args.dur_hi, args.seed,
        words_per_sec=args.words_per_sec,
    )
    print(f"[quality] corpus: {args.cases} cases / {audio_s:.0f} s audio, "
          f"setup {time.perf_counter() - t0:.0f} s", flush=True)

    stages: dict[str, float] = {}

    if not args.skip_torch:
        t0 = time.perf_counter()
        rc = torch_reference_driver.run([
            "--model-dir", str(model_dir),
            "--dataset-root", str(dataset_root),
            "--output-format", "textgrid",
            "--progress-every", "50",
        ])
        stages["torch_driver_s"] = round(time.perf_counter() - t0, 1)
        if rc != 0:
            print(f"[quality] torch driver failed rc={rc}", file=sys.stderr)
            return rc

    runs = [("float32", "_tpu")]
    if not args.skip_bf16:
        runs.append(("bfloat16", "_tpu_bf16"))
    batch_args = (
        ["--max-batch", str(args.max_batch)] if args.max_batch else []
    )
    for dtype, suffix in runs:
        t0 = time.perf_counter()
        rc = cli_run([
            "--model-dir", str(model_dir),
            "--dataset-root", str(dataset_root),
            "--compute-dtype", dtype,
            "--output-format", "textgrid",
            "--textgrid-suffix", suffix,
            *batch_args,
        ])
        stages[f"cli_{dtype}_s"] = round(time.perf_counter() - t0, 1)
        if rc != 0:
            print(f"[quality] CLI {dtype} failed rc={rc}", file=sys.stderr)
            return rc

    summary = {
        "cases": args.cases,
        "audio_seconds": round(audio_s, 1),
        "family": args.family,
        "model": f"{args.family} geometry, seeded-random weights",
        "baseline": "independent torch CPU driver "
                    "(scripts/torch_reference_driver.py)",
        "cli_platform": "cpu" if args.cpu else "tpu",
        "threshold_ms": ABS_THRESHOLD_MS,
        "stages": stages,
        "comparisons": {},
    }
    failed = False
    for dtype, suffix in runs:
        parsed, failures = load_word_pairs(find_pairs(dataset_root, suffix))
        metrics = metrics_from_word_pairs(parsed)
        metrics["pair_failures"] = failures
        metrics.update(extended_abs_stats(parsed))
        summary["comparisons"][dtype] = metrics
        gate = (dtype == "float32")
        for key in ("median_start_diff_ms", "median_end_diff_ms",
                    "median_word_middle_diff_ms"):
            if gate and abs(metrics[key]) > ABS_THRESHOLD_MS:
                print(f"[quality] FAIL {dtype}: |{key}| = "
                      f"{abs(metrics[key]):.3f} > {ABS_THRESHOLD_MS} ms",
                      file=sys.stderr)
                failed = True
        print(f"[quality] {dtype}: {json.dumps(metrics)}", flush=True)

    # full json-mode Report vs the torch TextGrids as references
    if not args.skip_json_report:
        t0 = time.perf_counter()
        report_path = out_dir / (
            "quality_report.json" if default_family
            else f"quality_report_{args.family}.json"
        )
        rc = cli_run([
            "--model-dir", str(model_dir),
            "--dataset-root", str(dataset_root),
            "--compute-dtype", "float32",
            "--output-format", "json",
            "--out", str(report_path),
            *batch_args,
        ])
        summary["stages"]["cli_json_report_s"] = round(
            time.perf_counter() - t0, 1
        )
        if rc != 0:
            print(f"[quality] json report failed rc={rc}", file=sys.stderr)
            return rc
        rep = json.loads(report_path.read_text())
        agg = rep.get("aggregates", {}).get("global", {})
        summary["report_pass_rates"] = {
            k: v for k, v in agg.items()
            if isinstance(v, dict) and "pass" in k
        }

    summary_path = out_dir / (
        "quality_summary.json" if default_family
        else f"quality_summary_{args.family}.json"
    )
    summary_path.write_text(json.dumps(summary, indent=2) + "\n")
    print(json.dumps({"metric": "quality_dataset_scale",
                      "family": args.family,
                      "passed": not failed,
                      "summary": str(summary_path)}))
    return 2 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
