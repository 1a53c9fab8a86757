#!/usr/bin/env python3
"""Batched, bucketed alignment serving — runnable example.

Demonstrates the throughput path: many utterances of mixed lengths are
bucketed by (audio length, token length), pushed through one jitted graph
per bucket (forward → log-softmax → banded Viterbi → evidence), and grouped
on host — optionally sharded over every available device ('data' axis).

Run:  python examples/batch_serving.py      (random weights; any backend)
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.models.presets import wav2vec2_base_960h
    from wav2vec2_tpu.parallel.batching import BatchAligner

    cfg = wav2vec2_base_960h()
    vocab = {"|": 4}
    for i, c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ"):
        vocab[c] = 5 + i

    print("initializing wav2vec2-base (random weights — swap in "
          "load_safetensors_params for a real checkpoint)...")
    params = init_params(cfg, jax.random.PRNGKey(0))

    mesh = None
    if len(jax.devices()) > 1:
        from wav2vec2_tpu.parallel.mesh import make_mesh, replicated

        mesh = make_mesh(model=1)
        params = jax.device_put(params, replicated(mesh))
        print(f"data-parallel over {len(jax.devices())} devices")

    aligner = BatchAligner(
        cfg, params, vocab, compute_dtype="bfloat16",
        normalize_on_device=True, mesh=mesh,
    )

    rng = np.random.default_rng(0)
    texts = ["HELLO WORLD", "THE QUICK BROWN FOX", "GOOD DAY", "OVER AND OUT"]
    audios = [
        (rng.normal(size=int(rng.uniform(1.0, 3.0) * 16000)) * 4000)
        .astype(np.int16)
        for _ in texts
    ]

    outputs = aligner.align_utterances(audios, texts, audio_multiple=16000)
    for text, out in zip(texts, outputs):
        print(f"\n{text!r}:")
        for w in out.words:
            print(f"  {w.word:8s} [{w.start_ms:5d}, {w.end_ms:5d}) ms "
                  f"conf={w.confidence:.2f}")
        fs = out.frame_stats
        if fs:
            print(f"  blank_frame_ratio={fs.blank_frame_ratio:.2f} "
                  f"entropy={fs.token_entropy_mean:.2f}")


if __name__ == "__main__":
    main()
