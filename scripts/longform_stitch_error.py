"""Quantify long-form stitching error (VERDICT r2 item 7).

On audio where the UNCHUNKED forward still fits (2–4 min), align the same
utterance twice with `align_longform`: once as a single forward
(chunk_sec > duration) and once chunked with the production 30 s / 5 s
overlap — and report the word-boundary delta distribution
(median/p90/p99/max |Δ|ms). Previously only monotonicity was asserted.

Weights are seeded-random (no pretrained checkpoints in this zero-egress
environment). Interpretation caveat (measured, BENCHMARKS.md round 3):
at minutes-scale with random weights the logits are near-uniform and the
band leaves word placement acoustically unpinned, so chunked and
unchunked runs disagree wholesale (p50 ≈ 45 s at 3 min) — that regime
characterizes missing signal, not the stitcher. The implementation-level
stitching property is gated at band-tight scales by
tests/test_longform.py (median identical, ≥75 % within one frame), and
trained models pin boundaries acoustically (train→align e2e). This
script exists to (re-)measure the distribution wherever real checkpoints
are available.

Run: python scripts/longform_stitch_error.py [--minutes 3]
     [--chunk-sec 30] [--overlap-sec 5] [--words-per-min 100]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--minutes", type=float, default=3.0)
    p.add_argument("--chunk-sec", type=float, default=30.0)
    p.add_argument("--overlap-sec", type=float, default=5.0)
    p.add_argument("--words-per-min", type=int, default=100)
    p.add_argument("--compute-dtype", default="bfloat16")
    args = p.parse_args(argv)

    import jax

    from wav2vec2_tpu.align.longform import align_longform
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.models.presets import wav2vec2_base_960h

    cfg = wav2vec2_base_960h()
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4}
    for i, c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ"):
        vocab[c] = 5 + i

    rng = np.random.default_rng(0)
    n = int(args.minutes * 60 * 16000)
    audio = rng.normal(size=n).astype(np.float32)
    words = [
        "".join(rng.choice(list("ETAONIHSRD"), size=int(rng.integers(2, 7))))
        for _ in range(int(args.minutes * args.words_per_min))
    ]
    transcript = " ".join(words)

    t0 = time.perf_counter()
    full = align_longform(
        audio, transcript, params, cfg, vocab,
        chunk_sec=args.minutes * 60 + 1, overlap_sec=args.overlap_sec,
        compute_dtype=args.compute_dtype,
    )
    full_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    chunked = align_longform(
        audio, transcript, params, cfg, vocab,
        chunk_sec=args.chunk_sec, overlap_sec=args.overlap_sec,
        compute_dtype=args.compute_dtype,
    )
    chunked_s = time.perf_counter() - t0

    assert [w.word for w in full.words] == [w.word for w in chunked.words]
    deltas = np.asarray([
        max(abs(a.start_ms - b.start_ms), abs(a.end_ms - b.end_ms))
        for a, b in zip(full.words, chunked.words)
    ], dtype=np.float64)
    within_frame = float((deltas <= cfg.frame_stride_ms(16000)).mean())
    print(json.dumps({
        "metric": "longform_stitch_error_ms",
        "minutes": args.minutes,
        "chunk_sec": args.chunk_sec,
        "overlap_sec": args.overlap_sec,
        "words": len(deltas),
        "p50": float(np.percentile(deltas, 50)),
        "p90": float(np.percentile(deltas, 90)),
        "p99": float(np.percentile(deltas, 99)),
        "max": float(deltas.max()),
        "within_one_frame": round(within_frame, 4),
        "single_forward_s": round(full_s, 1),
        "chunked_s": round(chunked_s, 1),
        "compute_dtype": args.compute_dtype,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
