"""Benchmark: end-to-end batched forced alignment throughput on one chip.

Metric: real-time factor (audio-seconds aligned per wall-clock second per
chip) through the FULL pipeline — normalize → wav2vec2-base forward (bf16)
→ log-softmax → fused Pallas Viterbi → device evidence extraction → host
grouping/confidence. Random weights (no checkpoints in this environment);
compute shape/work is identical to real weights.

Baseline: the north-star target from BASELINE.md — ≥ 500× real-time per
TPU v5e chip (the reference's illustrative GPU number is ~2280× forward-only
on a 12.48 s utterance, BENCHMARKS.md:287-302). vs_baseline = value / 500.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner

    cfg = Wav2Vec2ModelConfig.from_dict(
        dict(
            hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, conv_dim=[512] * 7,
            conv_kernel=[10, 3, 3, 3, 3, 2, 2],
            conv_stride=[5, 2, 2, 2, 2, 2, 2],
            num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
            pad_token_id=0, vocab_size=32, do_stable_layer_norm=False,
            feat_extract_norm="group", conv_bias=False,
        )
    )
    # LibriSpeech-style vocab: blank/pad=0, '|'=4 word sep, letters
    vocab = {"|": 4}
    for i, c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ"):
        vocab[c] = 5 + i

    params = init_params(cfg, jax.random.PRNGKey(0))
    aligner = BatchAligner(cfg, params, vocab, compute_dtype="bfloat16")

    rng = np.random.default_rng(0)
    batch = 32
    audio_sec = 10.0
    n = int(audio_sec * 16000)
    words = ["THE", "QUICK", "BROWN", "FOX", "JUMPS", "OVER", "LAZY", "DOG",
             "WHILE", "SINGING", "ANCIENT", "MELODIES", "UNDER", "BRIGHT",
             "WINTER", "STARS", "NEAR", "FROZEN", "RIVERS", "TONIGHT"]
    audios = [rng.normal(size=n).astype(np.float32) for _ in range(batch)]
    transcripts = [" ".join(rng.permutation(words)) for _ in range(batch)]

    # warmup: compile every graph in the path
    aligner.align_utterances(audios, transcripts)

    repeats = 5
    t0 = time.perf_counter()
    for _ in range(repeats):
        outs = aligner.align_utterances(audios, transcripts)
    elapsed = time.perf_counter() - t0

    total_audio = batch * audio_sec * repeats
    rtf = total_audio / elapsed
    assert all(len(o.words) > 0 for o in outs)

    print(json.dumps({
        "metric": "realtime_factor_e2e_align",
        "value": round(rtf, 1),
        "unit": "x_realtime_audio_sec_per_chip",
        "vs_baseline": round(rtf / 500.0, 3),
    }))


if __name__ == "__main__":
    main()
