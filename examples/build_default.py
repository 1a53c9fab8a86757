#!/usr/bin/env python3
"""Build a ForcedAligner with all defaults — runnable example.

Mirrors the reference's examples/build_default.rs: builder + default
tokenizer / sequence aligner / word grouper, loading a model dir of
model.safetensors + config.json + vocab.json. Pass your own model dir as
argv[1]; without one, a tiny random-weight model dir is generated so the
example runs anywhere.

Run:  python examples/build_default.py [model_dir] [audio.wav|flac] [transcript]
"""

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wav2vec2_tpu import AlignmentInput, ForcedAlignerBuilder, Wav2Vec2Config


def make_demo_model_dir() -> Path:
    import jax

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.utils.checkpoint import save_safetensors

    d = Path(tempfile.mkdtemp()) / "model"
    d.mkdir()
    cfg_dict = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=32,
        feat_extract_norm="group", conv_bias=False,
    )
    cfg = Wav2Vec2ModelConfig.from_dict(cfg_dict)
    save_safetensors(d / "model.safetensors", init_params(cfg, jax.random.PRNGKey(0)), cfg)
    (d / "config.json").write_text(json.dumps(cfg_dict))
    vocab = {"<pad>": 0, "|": 4}
    for i, c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ"):
        vocab[c] = 5 + i
    (d / "vocab.json").write_text(json.dumps(vocab))
    print(f"(no model dir given — generated a random-weight demo at {d})")
    return d


def main():
    model_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else make_demo_model_dir()

    aligner = ForcedAlignerBuilder(
        Wav2Vec2Config(
            model_path=str(model_dir / "model.safetensors"),
            config_path=str(model_dir / "config.json"),
            vocab_path=str(model_dir / "vocab.json"),
        )
    ).build()

    if len(sys.argv) > 2:
        from wav2vec2_tpu.data.audio import read_audio_mono

        samples, rate = read_audio_mono(sys.argv[2])
        transcript = sys.argv[3] if len(sys.argv) > 3 else "HELLO WORLD"
    else:
        rng = np.random.default_rng(0)
        samples = rng.normal(size=24_000).astype(np.float32)
        rate = 16_000
        transcript = "HELLO WORLD"

    out = aligner.align(AlignmentInput(rate, samples, transcript))
    for w in out.words:
        print(f"{w.word:10s} [{w.start_ms:6d}, {w.end_ms:6d}) ms "
              f"confidence={w.confidence:.3f}")
    if out.frame_stats:
        print(f"blank_frame_ratio={out.frame_stats.blank_frame_ratio:.3f} "
              f"token_entropy_mean={out.frame_stats.token_entropy_mean:.3f}")


if __name__ == "__main__":
    main()
