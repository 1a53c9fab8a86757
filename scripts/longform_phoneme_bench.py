"""Hour-scale phoneme-CTC long-form alignment, end to end (VERDICT r4
item 5; completes r3 item 5's done criterion).

The round-4 cap lift (ops/viterbi_pallas.py in-kernel one-hot emission
gather, now V-unbounded) exists for exactly this combination: phoneme
vocabularies (V≈392, e.g. MMS phoneme heads) at hour-scale audio, where
the pre-gathered [T, S] f32 emission matrix (~8 GB at T=180 000,
S≈12 000) plus HBM backpointers would overflow the chip. This script
measures that combination END TO END — chunked encoder forward +
stitched single DP (HBM backpointers + in-kernel gather from the raw
[T, V] log-probs) + grouping — and records throughput, the analytic DP
HBM traffic, and the device memory high-water mark next to the char-vocab
row (BENCHMARKS.md long-form table).

Vocabulary: 387 distinct single-codepoint IPA-range symbols — the char
tokenizer (align/tokenization.py) handles any single-codepoint unit, so
the end-to-end path is identical to a real phoneme head of the same V
(multi-codepoint symbols only change host-side tokenization, covered by
the CLI's --units phoneme mode). Words are 6 phonemes each (~the reference
MMS phonemizer's mean), 15 words/min of audio scales the transcript.

Run: python scripts/longform_phoneme_bench.py [--minutes 60]
Writes reports/longform_phoneme_60min.json (or --out).
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


def build_phoneme_vocab(n_units: int = 387) -> dict[str, int]:
    """'|' + n_units single-codepoint symbols → ids (V = n_units + 5)."""
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4}
    # IPA block + Greek + Cyrillic + Latin-ext: plenty of distinct,
    # case-stable codepoints
    cp = 0x0250
    while len(vocab) < n_units + 5:
        ch = chr(cp)
        cp += 1
        if not ch.isalpha() or ch.upper() != ch.lower() and ch != ch.lower():
            continue  # case-stable only: the tokenizer lowercases
        if ch not in vocab:
            vocab[ch] = len(vocab)
    return vocab


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--minutes", type=float, default=60.0)
    p.add_argument("--words-per-min", type=int, default=15)
    p.add_argument("--phones-per-word", type=int, default=6)
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="reports/longform_phoneme_60min.json")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from wav2vec2_tpu.align.longform import align_longform
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.models.presets import PRESETS

    vocab = build_phoneme_vocab()
    v = max(vocab.values()) + 1
    cfg = PRESETS["wav2vec2-base-960h"](vocab_size=v)
    params = init_params(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    units = [u for u in vocab if len(u) == 1 and u != "|"]
    n_words = int(args.minutes * args.words_per_min)
    words = ["".join(rng.choice(units, size=args.phones_per_word))
             for _ in range(n_words)]
    transcript = " ".join(words)
    n = int(args.minutes * 60 * 16000)
    audio = rng.normal(size=n).astype(np.float32)

    t_frames = cfg.conv_output_length(n)
    tokens = n_words * args.phones_per_word + (n_words - 1)
    s = 2 * tokens + 1

    t0 = time.perf_counter()
    out = align_longform(audio, transcript, params, cfg, vocab,
                         compute_dtype=args.compute_dtype)
    wall = time.perf_counter() - t0

    got = [w.word for w in out.words]
    assert got == words, (
        f"word mismatch: {len(got)} recovered vs {len(words)}"
    )
    starts = [w.start_ms for w in out.words]
    assert all(b >= a for a, b in zip(starts, starts[1:])), "non-monotone"

    # analytic DP HBM traffic for the gather tier (mfu_report.py's model):
    # raw [T, V] f32 emissions in + [T, S] i32 backpointers out + in
    gb = (t_frames * v * 4 + 2 * t_frames * s * 4) / 1e9
    try:
        stats = jax.devices()[0].memory_stats() or {}
        peak_gb = round(stats.get("peak_bytes_in_use", 0) / 1e9, 2)
    except Exception:
        peak_gb = None

    result = {
        "metric": "longform_phoneme_e2e",
        "platform": jax.devices()[0].platform,
        "minutes": args.minutes,
        "vocab_size": v,
        "words": n_words,
        "dp_shape": {"T": int(t_frames), "S": int(s)},
        "dp_cells_e9": round(t_frames * s / 1e9, 2),
        "dp_hbm_traffic_gb": round(gb, 1),
        "wall_s": round(wall, 1),
        "realtime_factor": round(args.minutes * 60 / wall, 1),
        "device_peak_gb": peak_gb,
        "compute_dtype": args.compute_dtype,
        "all_words_recovered_monotone": True,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
