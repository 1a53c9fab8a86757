#!/usr/bin/env python3
"""Convert an HF audio dataset to the LibriSpeech directory layout.

Equivalent of the reference's converters
(scripts/export_hf_to_librispeech_layout.py and
convert_voxpopuli_to_librispeech_layout.py): emits
`<out>/<subset>/<chapter>/<id>.flac` (16 kHz mono, via the framework's own
FLAC encoder) plus `*.trans.txt` files so `alignment_report` can consume
any HF speech dataset (MLS, VoxPopuli, African-Accented French, ...).

Requires the `datasets` library (not part of this image) — gated import, so
the script documents the workflow and fails with a clear message offline.

Usage:
    python scripts/convert_hf_dataset_to_librispeech_layout.py \
        --dataset facebook/voxpopuli --config en --split test \
        --audio-column audio --text-column normalized_text \
        --out datasets/voxpopuli-en
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def resample_to_16k(samples: np.ndarray, rate: int) -> np.ndarray:
    if rate == 16000:
        return samples.astype(np.float32)
    from math import gcd

    import scipy.signal

    g = gcd(rate, 16000)
    return scipy.signal.resample_poly(samples, 16000 // g, rate // g).astype(
        np.float32
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--split", default="test")
    p.add_argument("--audio-column", default="audio")
    p.add_argument("--text-column", default="text")
    p.add_argument("--id-column", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--chapter-size", type=int, default=100,
                   help="utterances per chapter directory")
    args = p.parse_args(argv)

    try:
        import datasets
    except ImportError:
        print(
            "error: the `datasets` library is not installed in this "
            "environment. Run this converter on a machine with network "
            "access: pip install datasets soundfile",
            file=sys.stderr,
        )
        return 1

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from wav2vec2_tpu.data.flac_encoder import write_flac

    ds = datasets.load_dataset(args.dataset, args.config, split=args.split)
    if args.limit:
        ds = ds.select(range(min(args.limit, len(ds))))

    out_root = Path(args.out)
    subset = args.split.replace("_", "-")
    trans_lines: dict[Path, list[str]] = {}
    written = 0

    for idx, row in enumerate(ds):
        audio = row[args.audio_column]
        text = str(row[args.text_column]).strip().upper()
        if not text:
            continue
        samples = resample_to_16k(
            np.asarray(audio["array"], np.float32), int(audio["sampling_rate"])
        )
        pcm = np.clip(samples * 32768.0, -32768, 32767).astype(np.int64)

        speaker = "0"
        chapter = str(idx // args.chapter_size)
        uid = (
            str(row[args.id_column])
            if args.id_column
            else f"{speaker}-{chapter}-{idx % args.chapter_size:04d}"
        )
        chapter_dir = out_root / subset / speaker / chapter
        chapter_dir.mkdir(parents=True, exist_ok=True)
        write_flac(chapter_dir / f"{uid}.flac", pcm, 16000)
        trans_path = chapter_dir / f"{speaker}-{chapter}.trans.txt"
        trans_lines.setdefault(trans_path, []).append(f"{uid} {text}")
        written += 1

    for path, lines in trans_lines.items():
        path.write_text("\n".join(lines) + "\n")
    print(f"wrote {written} utterances to {out_root}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
