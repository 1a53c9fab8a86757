#!/usr/bin/env python3
"""Swappable pipeline components — runnable example.

Mirrors the reference's examples/custom_builder_components.rs:126-163: every
pipeline stage (runtime backend, tokenizer, sequence aligner, word grouper)
is injectable through the builder. Here a mock backend produces synthetic
log-probs (no model files needed), a custom tokenizer forces lowercase, and
a custom word grouper adds a marker to each word.

Run:  python examples/custom_builder_components.py
"""

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wav2vec2_tpu import AlignmentInput, ForcedAlignerBuilder, Wav2Vec2Config
from wav2vec2_tpu.align.grouping import group_into_words
from wav2vec2_tpu.align.tokenization import build_token_sequence_case_aware
from wav2vec2_tpu.pipeline.traits import ForwardOutput

CONFIG = dict(
    hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
    intermediate_size=3072, conv_dim=[512] * 7,
    conv_kernel=[10, 3, 3, 3, 3, 2, 2], conv_stride=[5, 2, 2, 2, 2, 2, 2],
    num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
    pad_token_id=0, vocab_size=8,
)
VOCAB = {"<pad>": 0, "|": 1, "h": 2, "i": 3, "y": 4, "o": 5}


class SyntheticBackend:
    """RuntimeBackend returning planted log-probs — the reference's
    MockBackend pattern (traits.rs:226-252)."""

    def __init__(self, tokens, frames_per_state=4):
        t = len(tokens) * frames_per_state
        lp = np.full((t, 8), -10.0, np.float32)
        for s, tid in enumerate(tokens):
            lp[s * frames_per_state : (s + 1) * frames_per_state, tid] = -0.01
        self.lp = lp

    def infer(self, normalized):
        return ForwardOutput(log_probs=self.lp, t_len=self.lp.shape[0],
                             vocab_size=8)

    def infer_profiled(self, normalized):
        return self.infer(normalized)

    def synchronize(self):
        pass

    def device_label(self):
        return "synthetic"


class LoudTokenizer:
    def tokenize(self, transcript, vocab, blank_id, word_sep_id):
        print(f"  [tokenizer] tokenizing {transcript!r}")
        return build_token_sequence_case_aware(
            transcript, vocab, blank_id, word_sep_id
        )


class MarkingWordGrouper:
    def group_words(self, path_states, token_sequence, evidence,
                    blank_id, word_sep_id, frame_stride_ms):
        words = group_into_words(
            [(int(s), t) for t, s in enumerate(path_states)],
            token_sequence.tokens, token_sequence.chars,
            token_sequence.normalized_words, evidence,
            blank_id, word_sep_id, frame_stride_ms,
        )
        for w in words:
            w.word = f"<{w.word}>"
        return words


def main():
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        (td / "config.json").write_text(json.dumps(CONFIG))
        (td / "vocab.json").write_text(json.dumps(VOCAB))

        # tokens for "hi yo": blank h blank i blank | blank y blank o blank
        tokens = [0, 2, 0, 3, 0, 1, 0, 4, 0, 5, 0]
        aligner = (
            ForcedAlignerBuilder(
                Wav2Vec2Config(config_path=str(td / "config.json"),
                               vocab_path=str(td / "vocab.json"))
            )
            .with_runtime_backend(SyntheticBackend(tokens))
            .with_tokenizer(LoudTokenizer())
            .with_word_grouper(MarkingWordGrouper())
            .build()
        )
        out = aligner.align(
            AlignmentInput(16000, np.ones(14_000, np.float32), "HI YO")
        )
        for w in out.words:
            print(f"  {w.word:6s} [{w.start_ms:4d} ms, {w.end_ms:4d} ms) "
                  f"confidence={w.confidence:.3f}")
        assert [w.word for w in out.words] == ["<hi>", "<yo>"]
        print("custom components example: OK")


if __name__ == "__main__":
    main()
