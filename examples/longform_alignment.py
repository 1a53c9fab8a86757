#!/usr/bin/env python3
"""Long-form alignment — runnable example.

Aligns minutes-long audio: the encoder runs over overlapping 30 s chunks in
one padded batch, the per-frame log-probs are stitched at overlap midpoints,
and one banded Viterbi (HBM-streamed backpointers when T·S exceeds VMEM)
aligns the whole transcript.

Run:  python examples/longform_alignment.py [minutes]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    from wav2vec2_tpu.align.longform import align_longform
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.models.presets import wav2vec2_base_960h

    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    cfg = wav2vec2_base_960h()
    vocab = {"|": 4}
    for i, c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ"):
        vocab[c] = 5 + i
    params = init_params(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    n = int(minutes * 60 * 16000)
    audio = rng.normal(size=n).astype(np.float32)
    words = ["THE", "QUICK", "BROWN", "FOX", "JUMPS", "OVER", "LAZY", "DOG"]
    transcript = " ".join(words * max(1, int(minutes * 15)))

    print(f"aligning {minutes:g} min of audio, "
          f"{len(transcript.split())} words (random weights)...")
    t0 = time.time()
    out = align_longform(audio, transcript, params, cfg, vocab,
                         chunk_sec=30.0, overlap_sec=5.0,
                         compute_dtype="bfloat16")
    dt = time.time() - t0
    print(f"{len(out.words)} words in {dt:.1f}s "
          f"({minutes * 60 / dt:.0f}x realtime, incl. compile)")
    for w in out.words[:5]:
        print(f"  {w.word:8s} [{w.start_ms:6d}, {w.end_ms:6d}) ms")
    print("  ...")
    for w in out.words[-2:]:
        print(f"  {w.word:8s} [{w.start_ms:6d}, {w.end_ms:6d}) ms")


if __name__ == "__main__":
    main()
