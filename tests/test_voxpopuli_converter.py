"""VoxPopuli → LibriSpeech-layout converter: fixture conversion + CLI
round-trip (VERDICT r4 item 8; reference analog:
scripts/convert_voxpopuli_to_librispeech_layout.py:1-120).

Builds a synthetic VoxPopuli `transcribed_data` tree — header-resolved TSV
(extra columns, raw vs normalized text, ids needing sanitization, a row
whose audio is missing), audio spread over digit-named year directories at
48 kHz/44.1 kHz in wav and flac containers — converts it, and drives the
alignment CLI over the converted output.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"
if str(SCRIPTS) not in sys.path:
    sys.path.insert(0, str(SCRIPTS))

import convert_voxpopuli_to_librispeech_layout as vox  # noqa: E402

from wav2vec2_tpu.data.audio import write_wav_mono  # noqa: E402
from wav2vec2_tpu.data.flac import read_flac_mono  # noqa: E402
from wav2vec2_tpu.data.flac_encoder import write_flac  # noqa: E402


def _tone(sr: int, seconds: float, f: float) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    return (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)


@pytest.fixture
def vox_root(tmp_path):
    """Synthetic transcribed_data/fr with TSV + year-dir audio."""
    trans = tmp_path / "vox" / "transcribed_data" / "fr"
    (trans / "2019").mkdir(parents=True)
    (trans / "2020").mkdir(parents=True)
    # wav at 48 kHz exercises the resampler; flac at 44.1 kHz exercises the
    # non-integer-ratio path + the in-repo decoder
    write_wav_mono(trans / "2019" / "20190101-0900-PLENARY-fr_1.wav",
                   _tone(48000, 1.2, 440.0), 48000)
    pcm = np.clip(np.round(_tone(44100, 1.0, 330.0).astype(np.float64)
                           * 32768.0), -32768, 32767).astype(np.int64)
    write_flac(trans / "2020" / "20200202-0900-PLENARY-fr_2.flac",
               pcm, 44100)
    rows = [
        "id\traw_text\tnormalized_text\tspeaker_id",          # header
        "20190101-0900-PLENARY-fr_1\tBonjour!\tbonjour\ts1",  # wav, 48 k
        "20200202-0900-PLENARY-fr_2\tMerci.\tmerci\ts2",      # flac, 44.1 k
        "20210303-0900-PLENARY-fr_9\tPerdu\tperdu\ts3",       # audio missing
        "20190101-0900-PLENARY-fr_1\t \t \ts1",               # empty text
    ]
    (trans / "asr_test.tsv").write_text("\n".join(rows) + "\n",
                                        encoding="utf-8")
    return tmp_path / "vox"


def test_convert_layout_and_contents(vox_root, tmp_path, capsys):
    out = tmp_path / "out"
    rc = vox.main(["--voxpopuli-root", str(vox_root), "--lang", "fr",
                   "--output-dir", str(out), "--splits", "test"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "audio not found for 20210303-0900-PLENARY-fr_9" in err

    split = out / "VoxPopuli" / "fr" / "test"
    flacs = sorted(p.name for p in split.glob("*.flac"))
    assert flacs == ["20190101-0900-PLENARY-fr_1.flac",
                     "20200202-0900-PLENARY-fr_2.flac"]
    trans = (split / "test.trans.txt").read_text().splitlines()
    # normalized_text preferred over raw_text; missing-audio + empty rows
    # dropped
    assert trans == ["20190101-0900-PLENARY-fr_1 bonjour",
                     "20200202-0900-PLENARY-fr_2 merci"]

    # 16 kHz mono, duration preserved through the resampler, tone intact
    x, sr = read_flac_mono(split / flacs[0])
    assert sr == 16000 and abs(len(x) - 19200) <= 1
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    assert abs(np.fft.rfftfreq(len(x), 1 / sr)[spec.argmax()] - 440.0) < 2.0
    x2, sr2 = read_flac_mono(split / flacs[1])
    assert sr2 == 16000 and abs(len(x2) - 16000) <= 2


def test_sanitize_and_column_fallback(tmp_path):
    trans = tmp_path / "transcribed_data" / "de"
    (trans / "2021").mkdir(parents=True)
    write_wav_mono(trans / "2021" / "weird id&co.wav", _tone(16000, 0.5, 200),
                   16000)
    # no normalized_text column → raw_text; id needs sanitization
    (trans / "asr_dev.tsv").write_text(
        "id\traw_text\nweird id&co\tHALLO WELT\n", encoding="utf-8")
    out = tmp_path / "out"
    n = vox.convert_split(trans, "dev", out)
    assert n == 1
    assert (out / "weird_id_co.flac").exists()
    assert (out / "dev.trans.txt").read_text() == "weird_id_co HALLO WELT\n"


def test_missing_root_is_error(tmp_path, capsys):
    assert vox.main(["--voxpopuli-root", str(tmp_path), "--lang", "fr",
                     "--output-dir", str(tmp_path / "o")]) == 1
    assert "not found" in capsys.readouterr().err


def test_cli_round_trip(vox_root, tmp_path):
    """Converted output drives the alignment CLI end-to-end (the reference
    feeds its converter's output to wav2vec2aligner the same way)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.numpy import save_file

    from wav2vec2_tpu.cli.alignment_report import run

    out = tmp_path / "converted"
    assert vox.main(["--voxpopuli-root", str(vox_root), "--lang", "fr",
                     "--output-dir", str(out), "--splits", "test"]) == 0

    cfg = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
               intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
               conv_stride=[5, 2], num_conv_pos_embeddings=16,
               num_conv_pos_embedding_groups=4, pad_token_id=0,
               vocab_size=32, do_stable_layer_norm=False,
               feat_extract_norm="group", conv_bias=False)
    d = tmp_path / "model"
    d.mkdir()
    torch.manual_seed(0)
    tm = transformers.Wav2Vec2ForCTC(
        transformers.Wav2Vec2Config(**cfg)).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("wav2vec2.masked_spec_embed", None)
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(cfg))
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4}
    for i, c in enumerate("etaonihsrdlumwcfgypbvkxjqz"):
        vocab[c] = 5 + i
    (d / "vocab.json").write_text(json.dumps(vocab))

    rc = run(["--model-dir", str(d), "--dataset-root", str(out),
              "--compute-dtype", "float32", "--output-format", "textgrid"])
    assert rc == 0
    tgs = sorted((out / "VoxPopuli").rglob("*.TextGrid"))
    assert [t.stem for t in tgs] == ["20190101-0900-PLENARY-fr_1",
                                     "20200202-0900-PLENARY-fr_2"]
