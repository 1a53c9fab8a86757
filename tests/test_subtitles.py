"""Subtitle formatter (data/subtitles.py): cue grouping rules, SRT/VTT
syntax, CLI integration."""

import numpy as np
import pytest

from wav2vec2_tpu.data.subtitles import (
    Cue,
    format_srt,
    format_vtt,
    words_to_cues,
    write_subtitles,
)
from wav2vec2_tpu.types import WordTiming


def w(word, start, end):
    return WordTiming(word=word, start_ms=start, end_ms=end, confidence=0.9)


def test_cue_break_on_gap():
    words = [w("hello", 0, 400), w("world", 500, 900),
             w("again", 2500, 3000)]  # 1.6 s gap
    cues = words_to_cues(words, max_gap_ms=1000)
    assert [(c.text, c.start_ms, c.end_ms) for c in cues] == [
        ("hello world", 0, 900), ("again", 2500, 3000),
    ]


def test_cue_break_on_line_length():
    words = [w("aaaaaaaaaa", i * 500, i * 500 + 400) for i in range(6)]
    cues = words_to_cues(words, max_chars=42)
    # 10-char words: 3 fit in 42 chars ("a...a a...a a...a" = 32, +11 = 43 > 42)
    assert [len(c.text.split()) for c in cues] == [3, 3]


def test_cue_break_on_duration():
    words = [w(f"w{i}", i * 2000, i * 2000 + 1800) for i in range(4)]
    cues = words_to_cues(words, max_duration_ms=5000, max_gap_ms=5000)
    assert all(c.end_ms - c.start_ms <= 5000 for c in cues)
    assert sum(len(c.text.split()) for c in cues) == 4


def test_srt_and_vtt_syntax():
    cues = [Cue(0, 1234, "hello world"), Cue(3_600_000 + 61_789, 3_700_000, "next")]
    srt = format_srt(cues)
    assert "1\n00:00:00,000 --> 00:00:01,234\nhello world" in srt
    assert "2\n01:01:01,789 --> 01:01:40,000\nnext" in srt
    vtt = format_vtt(cues)
    assert vtt.startswith("WEBVTT\n")
    assert "00:00:00.000 --> 00:00:01.234\nhello world" in vtt
    assert "," not in vtt.splitlines()[2]


def test_write_subtitles_placement(tmp_path):
    words = [w("hi", 0, 300)]
    p = write_subtitles(tmp_path / "utt.flac", words, "srt", suffix="_x")
    assert p.name == "utt_x.srt" and "hi" in p.read_text()
    p2 = write_subtitles(tmp_path / "utt.flac", words, "vtt")
    assert p2.name == "utt.vtt"
    with pytest.raises(ValueError):
        write_subtitles(tmp_path / "utt.flac", words, "ass")


def test_cli_srt_mode(tmp_path):
    """End-to-end: the CLI writes .srt next to each audio file."""
    import json

    import jax

    from wav2vec2_tpu.cli.alignment_report import run as cli_run
    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.data.flac_encoder import write_flac
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.utils.checkpoint import save_safetensors

    cfgd = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
                conv_stride=[5, 2], num_conv_pos_embeddings=16,
                num_conv_pos_embedding_groups=4, pad_token_id=0,
                vocab_size=32, feat_extract_norm="group", conv_bias=False)
    cfg = Wav2Vec2ModelConfig.from_dict(cfgd)
    md = tmp_path / "model"
    md.mkdir()
    save_safetensors(md / "model.safetensors",
                     init_params(cfg, jax.random.PRNGKey(0)), cfg)
    (md / "config.json").write_text(json.dumps(cfgd))
    vocab = {"<pad>": 0, "|": 4}
    for i, c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ"):
        vocab[c] = 5 + i
    (md / "vocab.json").write_text(json.dumps(vocab))

    base = tmp_path / "data" / "sub" / "1" / "1"
    base.mkdir(parents=True)
    rng = np.random.default_rng(0)
    x = np.clip(np.cumsum(rng.integers(-80, 80, 16000)), -30000, 30000)
    write_flac(base / "1-1-0000.flac", x.astype(np.int64), 16000)
    (base / "1-1.trans.txt").write_text("1-1-0000 THE CAT SAT")

    rc = cli_run(["--model-dir", str(md),
                  "--dataset-root", str(tmp_path / "data"),
                  "--device", "cpu", "--output-format", "srt"])
    assert rc == 0
    srt = (base / "1-1-0000.srt").read_text()
    assert "-->" in srt and srt.strip().startswith("1")

    # vtt + no-overwrite resume path
    rc = cli_run(["--model-dir", str(md),
                  "--dataset-root", str(tmp_path / "data"),
                  "--device", "cpu", "--output-format", "vtt"])
    assert rc == 0 and (base / "1-1-0000.vtt").read_text().startswith("WEBVTT")
