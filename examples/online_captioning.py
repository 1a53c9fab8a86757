"""Online alignment example: words appear as the audio 'arrives'.

Simulates a live feed by pushing a FLAC file into OnlineAligner in
200 ms pieces and printing each word the moment it is finalized —
the captioning/karaoke pattern with a known script.

Usage:
    python examples/online_captioning.py MODEL_DIR AUDIO.flac "TRANSCRIPT"
    python examples/online_captioning.py            # synthetic demo
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from wav2vec2_tpu import OnlineAligner  # noqa: E402
from wav2vec2_tpu.config import Wav2Vec2ModelConfig, load_vocab  # noqa: E402


def synthetic_demo():
    import jax

    from wav2vec2_tpu.models.params import init_params

    cfg = Wav2Vec2ModelConfig.from_dict(dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    ))
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"a": 1, "b": 2, "|": 3}
    audio = np.random.default_rng(0).normal(size=48_000).astype(np.float32)
    return cfg, params, vocab, audio, "ab ba ab ba ab"


def main() -> int:
    if len(sys.argv) == 4:
        model_dir = Path(sys.argv[1])
        from wav2vec2_tpu.data.audio import read_audio_mono
        from wav2vec2_tpu.models.params import load_safetensors_params

        cfg = Wav2Vec2ModelConfig.load(model_dir / "config.json")
        vocab = load_vocab(model_dir / "vocab.json")
        params = load_safetensors_params(model_dir / "model.safetensors", cfg)
        audio, _sr = read_audio_mono(sys.argv[2])
        transcript = sys.argv[3]
    else:
        cfg, params, vocab, audio, transcript = synthetic_demo()

    session = OnlineAligner(cfg, params, vocab, transcript,
                            chunk_sec=2.0, overlap_sec=0.5,
                            finalize_margin_sec=1.0)
    session.warmup()

    piece = 3200  # 200 ms per push
    pos = 0
    while pos < len(audio):
        for w in session.push(audio[pos: pos + piece]):
            t = pos / 16000.0
            print(f"[feed at {t:5.1f}s] {w.word:12s} "
                  f"{w.start_ms:6d}–{w.end_ms:6d} ms  conf={w.confidence:.2f}")
        pos += piece
    out = session.flush()
    print(json.dumps({
        "words": len(out.words),
        "last_end_ms": out.words[-1].end_ms if out.words else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
