"""Dataset converter (scripts/convert_hf_dataset_to_librispeech_layout.py)
driven through a stub `datasets` module: layout, transcripts, resampling,
and discoverability by the CLI's dataset resolver."""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent

spec = importlib.util.spec_from_file_location(
    "convert_hf_dataset",
    REPO / "scripts" / "convert_hf_dataset_to_librispeech_layout.py",
)
conv = importlib.util.module_from_spec(spec)
spec.loader.exec_module(conv)


class _FakeDs(list):
    def select(self, idxs):
        return _FakeDs(self[i] for i in idxs)


def _fake_datasets(rows):
    mod = types.ModuleType("datasets")
    mod.load_dataset = lambda *a, **k: _FakeDs(rows)
    return mod


def test_converter_builds_librispeech_layout(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(5):
        n = 8000 + 1000 * i
        rows.append({
            "audio": {"array": rng.normal(0, 0.05, size=n).astype(np.float32),
                      "sampling_rate": 16000},
            "text": f"hello world {i}",
        })
    # one empty-text row must be skipped
    rows.append({"audio": {"array": np.zeros(4000, np.float32),
                           "sampling_rate": 16000}, "text": "  "})
    monkeypatch.setitem(sys.modules, "datasets", _fake_datasets(rows))

    out = tmp_path / "converted"
    rc = conv.main([
        "--dataset", "fake/ds", "--split", "test", "--out", str(out),
        "--chapter-size", "3",
    ])
    assert rc == 0

    flacs = sorted(out.rglob("*.flac"))
    assert len(flacs) == 5
    trans = sorted(out.rglob("*.trans.txt"))
    assert len(trans) == 2  # chapter size 3 -> chapters 0 and 1
    lines = [ln for t in trans for ln in t.read_text().splitlines()]
    assert len(lines) == 5
    assert all(ln.split(" ", 1)[1].startswith("HELLO WORLD") for ln in lines)

    # audio round-trips through the framework's own decoder
    from wav2vec2_tpu.data.flac import read_flac_mono

    got, rate = read_flac_mono(flacs[0])
    assert rate == 16000 and len(got) > 0

    # the CLI's dataset resolver + case loader consume the layout
    from wav2vec2_tpu.data.librispeech import (
        load_cases_from_transcripts,
        resolve_dataset_base_and_subsets,
    )

    base, subsets = resolve_dataset_base_and_subsets(str(out))
    existing = [s for s in subsets if s.exists()]
    assert existing, (base, subsets)
    cases = load_cases_from_transcripts(base, existing)
    assert len(cases) == 5
    assert all((base / c.audio_path).exists() for c in cases)


def test_converter_resamples_to_16k(tmp_path, monkeypatch):
    rng = np.random.default_rng(1)
    rows = [{
        "audio": {"array": rng.normal(0, 0.05, size=48_000).astype(np.float32),
                  "sampling_rate": 48_000},
        "text": "resample me",
    }]
    monkeypatch.setitem(sys.modules, "datasets", _fake_datasets(rows))
    out = tmp_path / "resampled"
    assert conv.main(["--dataset", "x", "--out", str(out)]) == 0
    from wav2vec2_tpu.data.flac import read_flac_mono

    got, rate = read_flac_mono(next(out.rglob("*.flac")))
    assert rate == 16000
    assert len(got) == 16_000  # 1 second at 48k -> 1 second at 16k


def test_converter_gated_without_datasets(tmp_path, monkeypatch):
    monkeypatch.delitem(sys.modules, "datasets", raising=False)
    import builtins

    real_import = builtins.__import__

    def no_datasets(name, *a, **k):
        if name == "datasets":
            raise ImportError("nope")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_datasets)
    assert conv.main(["--dataset", "x", "--out", str(tmp_path / "o")]) == 1
