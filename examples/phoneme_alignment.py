#!/usr/bin/env python3
"""Phoneme-CTC alignment — runnable example.

For checkpoints whose CTC vocab is a phoneme set (e.g. the
microsoft/unispeech-1350-en-* multilingual phoneme fine-tunes), transcripts
are whitespace-separated vocab symbols (multi-codepoint IPA included) and
the output is one tight timing unit per phone with per-frame acoustic
confidence stats. The same mode is available on the CLI
(`--units phoneme`), the serving daemon (`serve --units phoneme`, both
/align and /stream), and the batch engine (`BatchAligner(units=...)`).

Pass your own model dir as argv[1]; without one, a tiny random-weight
model with an IPA-flavored vocab is generated so the example runs
anywhere.

Run:  python examples/phoneme_alignment.py [model_dir] [audio] [transcript]
"""

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wav2vec2_tpu import AlignmentInput, ForcedAlignerBuilder, Wav2Vec2Config
from wav2vec2_tpu.pipeline.defaults import PhonemeGrouper, PhonemeTokenizer


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
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=16,
        feat_extract_norm="group", conv_bias=False,
    )
    cfg = Wav2Vec2ModelConfig.from_dict(cfg_dict)
    params = init_params(cfg, jax.random.PRNGKey(0))
    save_safetensors(d / "model.safetensors", params, cfg)
    (d / "config.json").write_text(json.dumps(cfg_dict))
    vocab = {"<pad>": 0, "|": 4, "a": 5, "b": 6, "k": 7, "u": 8,
             "ə": 9, "ɛ̃": 10, "tʃ": 11}
    (d / "vocab.json").write_text(json.dumps(vocab))
    return d


def main() -> int:
    model_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else make_demo_model_dir()
    transcript = sys.argv[3] if len(sys.argv) > 3 else "a tʃ ɛ̃ | b ə k u"

    if len(sys.argv) > 2:
        from wav2vec2_tpu.data.audio import read_audio_mono

        samples, sr = read_audio_mono(sys.argv[2])
    else:
        samples = np.random.default_rng(0).normal(size=32000).astype(np.float32)
        sr = 16000

    cfg = Wav2Vec2Config(
        model_path=str(model_dir / "model.safetensors"),
        config_path=str(model_dir / "config.json"),
        vocab_path=str(model_dir / "vocab.json"),
    )
    aligner = (
        ForcedAlignerBuilder(cfg)
        .with_tokenizer(PhonemeTokenizer())    # verbatim multi-codepoint vocab
        .with_word_grouper(PhonemeGrouper())   # one tight unit per phone
        .build()
    )
    out = aligner.align(AlignmentInput(
        sample_rate_hz=sr, samples=samples, transcript=transcript,
    ))
    for u in out.words:
        st = u.confidence_stats
        print(f"{u.word:>4s}  [{u.start_ms:6d}, {u.end_ms:6d}) ms  "
              f"conf={u.confidence:.3f}  frames={st.coverage_frame_count}  "
              f"quality={st.quality_confidence:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
