#!/usr/bin/env python3
"""Convert a VoxPopuli `transcribed_data` tree (TSV + audio) to the
LibriSpeech directory layout the CLI consumes.

Dedicated analog of the reference's converter
(/root/reference/scripts/convert_voxpopuli_to_librispeech_layout.py:1-120):
reads `transcribed_data/<lang>/asr_{split}.tsv` (column-resolved header —
`id` + `normalized_text`, falling back to `raw_text`), locates each
utterance's audio under the digit-named year directories, and emits
`<out>/VoxPopuli/<lang>/<split>/` with 16 kHz mono FLAC (the framework's
own encoder) plus `<split>.trans.txt`.

Differences from the reference, deliberate:
  * audio decode uses the in-repo wav/flac codecs (`data/audio.py`,
    `data/flac.py` — no soundfile requirement); `.ogg` inputs (VoxPopuli's
    native format) are decoded through `soundfile` only if that library is
    installed, with a clear error otherwise — this image has no ogg codec.
  * the audio file index over the year directories is built once per split
    (the reference rescans every year directory per utterance).
  * resampling is polyphase (`scipy.signal.resample_poly`) instead of FFT
    `resample` — no spectral leakage at the 48 kHz→16 kHz integer ratio.

Run after the upstream VoxPopuli download steps (reference docstring):
    python -m voxpopuli.download_audios --root ROOT --subset asr
    python -m voxpopuli.get_asr_data --root ROOT --lang fr
Then:
    python scripts/convert_voxpopuli_to_librispeech_layout.py \
        --voxpopuli-root ROOT --lang fr --output-dir test-data

Round-trip through the aligner is proven by
tests/test_voxpopuli_converter.py (synthetic fixture → converter → CLI).
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

AUDIO_SUFFIXES = (".ogg", ".flac", ".wav")
TARGET_SR = 16000


def sanitize_id(raw: str) -> str:
    """Filesystem-safe utterance id (reference sanitize_id, :38-39)."""
    return re.sub(r"[^\w\-.]", "_", raw)


def read_any_mono(path: Path) -> tuple[np.ndarray, int]:
    """float32 mono in [-1, 1] + sample rate, any supported container."""
    if path.suffix.lower() == ".ogg":
        try:
            import soundfile as sf
        except ImportError as e:
            raise SystemExit(
                f"{path}: .ogg decode requires the `soundfile` library "
                "(pip install soundfile); alternatively pre-convert the "
                "VoxPopuli audio to wav/flac"
            ) from e
        arr, sr = sf.read(str(path), dtype="float32", always_2d=False)
        if arr.ndim > 1:
            arr = arr.mean(axis=1)
        return arr.astype(np.float32), int(sr)
    from wav2vec2_tpu.data.audio import read_audio_mono

    return read_audio_mono(path)


def resample_to_16k(x: np.ndarray, sr: int) -> np.ndarray:
    if sr == TARGET_SR:
        return x.astype(np.float32)
    from math import gcd

    import scipy.signal

    g = gcd(sr, TARGET_SR)
    return scipy.signal.resample_poly(x, TARGET_SR // g, sr // g).astype(
        np.float32
    )


def index_audio(transcribed: Path) -> dict[str, Path]:
    """One pass over the digit-named year directories → {stem: path}."""
    idx: dict[str, Path] = {}
    for year_dir in sorted(transcribed.iterdir()):
        if not (year_dir.is_dir() and year_dir.name.isdigit()):
            continue
        for f in sorted(year_dir.iterdir()):
            if f.suffix.lower() in AUDIO_SUFFIXES:
                # first suffix in AUDIO_SUFFIXES order wins per stem
                idx.setdefault(f.stem, f)
    return idx


def parse_tsv(tsv_path: Path) -> list[tuple[str, str]]:
    """[(raw_id, transcript)] with header-resolved columns (reference
    :69-84: `id` defaults to col 0, text prefers normalized_text, then
    raw_text, then col 1)."""
    rows: list[tuple[str, str]] = []
    with open(tsv_path, "r", encoding="utf-8") as f:
        header = f.readline()
        col = {name: i for i, name in enumerate(header.strip().split("\t"))}
        id_idx = col.get("id", 0)
        text_idx = col.get("normalized_text", col.get("raw_text", 1))
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) <= max(id_idx, text_idx):
                continue
            transcript = parts[text_idx].strip()
            if transcript:
                rows.append((parts[id_idx], transcript))
    return rows


def convert_split(transcribed: Path, split: str, out_split: Path,
                  limit: int | None = None) -> int:
    """Convert one split; returns the utterance count (0 = TSV missing)."""
    from wav2vec2_tpu.data.flac_encoder import write_flac

    tsv_path = transcribed / f"asr_{split}.tsv"
    if not tsv_path.is_file():
        print(f"Skip {split}: {tsv_path} not found.", file=sys.stderr)
        return 0
    audio_idx = index_audio(transcribed)
    rows = parse_tsv(tsv_path)
    if limit is not None:
        rows = rows[:limit]
    out_split.mkdir(parents=True, exist_ok=True)
    lines: list[str] = []
    for raw_id, transcript in rows:
        src = audio_idx.get(raw_id)
        if src is None:
            print(f"Warning: audio not found for {raw_id}", file=sys.stderr)
            continue
        x, sr = read_any_mono(src)
        x = resample_to_16k(x, sr)
        utt_id = sanitize_id(raw_id)
        pcm = np.clip(np.round(x.astype(np.float64) * 32768.0),
                      -32768, 32767).astype(np.int64)
        write_flac(out_split / f"{utt_id}.flac", pcm, TARGET_SR)
        lines.append(f"{utt_id} {transcript}\n")
    if lines:
        (out_split / f"{split}.trans.txt").write_text(
            "".join(lines), encoding="utf-8"
        )
        print(f"{split}: wrote {len(lines)} utterances to {out_split}")
    return len(lines)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--voxpopuli-root", type=Path, required=True,
                   help="root containing transcribed_data/<lang>/")
    p.add_argument("--lang", required=True, help="language code (fr, de, …)")
    p.add_argument("--output-dir", type=Path, default=Path("test-data"))
    p.add_argument("--splits", default="train,dev,test",
                   help="comma list of VoxPopuli splits to convert")
    p.add_argument("--limit", type=int, default=None,
                   help="max utterances per split")
    args = p.parse_args(argv)

    lang = args.lang.strip().lower()
    transcribed = args.voxpopuli_root.resolve() / "transcribed_data" / lang
    if not transcribed.is_dir():
        print(f"Error: {transcribed} not found. Run voxpopuli get_asr_data "
              "first.", file=sys.stderr)
        return 1

    out_root = args.output_dir.resolve()
    total = 0
    for split in [s for s in args.splits.split(",") if s]:
        total += convert_split(
            transcribed, split, out_root / "VoxPopuli" / lang / split,
            limit=args.limit,
        )
    print(f"Total: {total} utterances under {out_root}/VoxPopuli/{lang}/")
    return 0 if total else 1


if __name__ == "__main__":
    sys.exit(main())
