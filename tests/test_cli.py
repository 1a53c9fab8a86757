"""End-to-end CLI tests: tiny random model + synthetic FLAC dataset →
json / textgrid / perf outputs (mirrors the reference CLI's surface,
alignment_report.rs)."""

import json

import numpy as np
import pytest

from wav2vec2_tpu.cli.alignment_report import run
from wav2vec2_tpu.data.flac_encoder import write_flac

CONFIG = dict(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
    conv_stride=[5, 2], num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=32,
    do_stable_layer_norm=False, feat_extract_norm="group", conv_bias=False,
)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("model")
    hf_cfg = transformers.Wav2Vec2Config(**CONFIG)
    torch.manual_seed(0)
    tm = transformers.Wav2Vec2ForCTC(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("wav2vec2.masked_spec_embed", None)
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(CONFIG))
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4}
    for i, c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ"):
        vocab[c] = 5 + i
    (d / "vocab.json").write_text(json.dumps(vocab))
    return d


def _make_dataset(root):
    base = root / "LibriSpeech" / "test-clean" / "1" / "2"
    base.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i, text in enumerate(["HELLO WORLD", "THE CAT", "GOOD DAY TO YOU"]):
        uid = f"1-2-{i:04d}"
        x = np.clip(np.cumsum(rng.integers(-80, 80, size=16000)), -30000, 30000)
        write_flac(base / f"{uid}.flac", x.astype(np.int64), 16000)
        lines.append(f"{uid} {text}")
    (base / "1-2.trans.txt").write_text("\n".join(lines))
    return root


@pytest.fixture
def dataset_root(tmp_path):
    return _make_dataset(tmp_path / "data")


def common_args(model_dir, dataset_root):
    return [
        "--model-dir", str(model_dir),
        "--dataset-root", str(dataset_root),
        "--compute-dtype", "float32",
    ]


def test_cli_textgrid_mode(model_dir, dataset_root):
    rc = run(common_args(model_dir, dataset_root) + ["--output-format", "textgrid"])
    assert rc == 0
    tg_files = sorted((dataset_root / "LibriSpeech").rglob("*.TextGrid"))
    assert len(tg_files) == 3
    text = tg_files[0].read_text()
    assert '"words"' in text and '"words-confidence"' in text and '"transcript"' in text


def test_cli_json_mode(model_dir, dataset_root, tmp_path):
    out = tmp_path / "report.json"
    rc = run(common_args(model_dir, dataset_root) + ["--output-format", "json", "--out", str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["schema_version"] == 1
    assert report["meta"]["case_count"] == 3
    assert len(report["sentences"]) == 3
    s = report["sentences"][0]
    assert s["split"] == "clean"
    assert "structural" in s and "confidence" in s
    # trans.txt fallback → no references
    assert "reference_missing" in s["notes"]
    assert report["aggregates"]["counts"]["total"] == 3
    assert "global" in report["aggregates"]


def test_cli_perf_mode(model_dir, dataset_root, tmp_path):
    out = tmp_path / "perf.jsonl"
    rc = run(
        common_args(model_dir, dataset_root)
        + ["--output-format", "perf", "--perf-out", str(out),
           "--perf-warmup", "1", "--perf-repeats", "2", "--limit", "2",
           "--perf-append", "--perf-scaling-report", "--no-batch"]
    )
    assert rc == 0
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 2
    r = lines[0]
    for key in ("utterance_id", "num_frames_t", "state_len", "ts_product",
                "forward_ms", "post_ms", "dp_ms", "group_ms", "conf_ms",
                "align_ms", "align_ms_per_ts", "align_ms_per_t", "total_ms"):
        assert key in r, key
    assert len(r["align_ms_repeats"]) == 2
    assert abs(r["align_ms_repeats"][0] - (
        r["dp_ms_repeats"][0] + r["conf_ms_repeats"][0] + r["group_ms_repeats"][0]
    )) < 1e-6
    summary = json.loads((tmp_path / "perf.jsonl.summary.json").read_text())
    assert summary["aggregate"]["utterance_count"] == 2
    assert summary["config"]["repeats"] == 2


def test_cli_cases_file_filter(model_dir, dataset_root, tmp_path):
    cases_file = tmp_path / "cases.txt"
    cases_file.write_text("1-2-0001.flac\n")
    out = tmp_path / "filtered.json"
    rc = run(
        common_args(model_dir, dataset_root)
        + ["--output-format", "json", "--out", str(out),
           "--cases-file", str(cases_file)]
    )
    assert rc == 0
    report = json.loads(out.read_text())
    assert [s["id"] for s in report["sentences"]] == ["1-2-0001"]


def test_cli_missing_model_dir(dataset_root, tmp_path):
    with pytest.raises(SystemExit):
        run(["--model-dir", str(tmp_path / "nope"),
             "--dataset-root", str(dataset_root)])


def test_cli_batch_and_single_paths_agree(model_dir, dataset_root, tmp_path):
    """The default bucketed batch path and --no-batch per-utterance path
    must produce identical TextGrids (CLI-level wiring equivalence)."""
    rc = run(common_args(model_dir, dataset_root)
             + ["--output-format", "textgrid", "--textgrid-suffix", "_batch"])
    assert rc == 0
    rc = run(common_args(model_dir, dataset_root)
             + ["--output-format", "textgrid", "--textgrid-suffix", "_single",
                "--no-batch"])
    assert rc == 0
    from wav2vec2_tpu.cli.compare_textgrids import compare_pairs

    pairs = []
    for batch_tg in sorted((dataset_root / "LibriSpeech").rglob("*_batch.TextGrid")):
        single_tg = batch_tg.with_name(
            batch_tg.name.replace("_batch", "_single")
        )
        assert single_tg.exists()
        pairs.append((batch_tg, single_tg))
    assert len(pairs) == 3
    metrics, compared, failures = compare_pairs(pairs, strict=True)
    assert failures == 0 and compared == 3
    assert metrics["median_start_diff_ms"] == 0.0
    assert metrics["median_end_diff_ms"] == 0.0


def test_cli_missing_dataset_errors_cleanly(model_dir, tmp_path):
    with pytest.raises((SystemExit, FileNotFoundError)):
        run(["--model-dir", str(model_dir),
             "--dataset-root", str(tmp_path / "nodata"),
             "--output-format", "json"])


def test_cli_empty_filter_errors_cleanly(model_dir, dataset_root, tmp_path):
    cases_file = tmp_path / "cases.txt"
    cases_file.write_text("does-not-exist\n")
    with pytest.raises(SystemExit, match="no cases"):
        run(common_args(model_dir, dataset_root)
            + ["--output-format", "json", "--cases-file", str(cases_file)])


def test_cli_skips_too_short_audio_cases(model_dir, tmp_path, capsys):
    """One unalignable case (transcript longer than audio) must be skipped
    with a warning, not abort the batch run."""
    root = tmp_path / "data2"
    base = root / "LibriSpeech" / "test-clean" / "1" / "2"
    base.mkdir(parents=True)
    rng = np.random.default_rng(0)
    x = np.clip(np.cumsum(rng.integers(-80, 80, size=8000)), -30000, 30000)
    write_flac(base / "1-2-0000.flac", x.astype(np.int64), 16000)
    write_flac(base / "1-2-0001.flac", x.astype(np.int64), 16000)
    long_text = " ".join(["EXTRAORDINARILY"] * 60)
    (base / "1-2.trans.txt").write_text(
        f"1-2-0000 HELLO WORLD\n1-2-0001 {long_text}"
    )
    out = tmp_path / "r.json"
    rc = run(common_args(model_dir, root)
             + ["--output-format", "json", "--out", str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    assert [s["id"] for s in report["sentences"]] == ["1-2-0000"]


def test_compare_textgrids_cli_paths(tmp_path, capsys):
    """compare_textgrids run(): pair discovery, threshold pass/fail,
    no-pairs and strict exit codes (the reference comparator's CI exit-code
    contract, compare_textgrids.py:37-38)."""
    from wav2vec2_tpu.cli.compare_textgrids import (
        EXIT_ABS_THRESHOLD,
        EXIT_NO_PAIRS,
        EXIT_SUCCESS,
        run,
    )
    from wav2vec2_tpu.data.textgrid import write_textgrid
    from wav2vec2_tpu.types import WordTiming

    assert run([str(tmp_path / "missing")]) == EXIT_NO_PAIRS
    assert run([str(tmp_path)]) == EXIT_NO_PAIRS  # dir, no pairs

    base_words = [WordTiming(word="HI", start_ms=100, end_ms=400, confidence=0.9),
                  WordTiming(word="YOU", start_ms=500, end_ms=900, confidence=0.8)]
    write_textgrid(tmp_path / "u1.flac", "HI YOU", base_words, 1000)
    write_textgrid(tmp_path / "u1.flac", "HI YOU", base_words, 1000,
                   suffix="_x")
    assert run([str(tmp_path), "--suffix", "_x",
                "--enforce-thresholds"]) == EXIT_SUCCESS
    out = json.loads(capsys.readouterr().out)
    assert out["median_start_diff_ms"] == 0.0 and out["pairs_compared"] == 1

    # shifted boundaries beyond 5 ms → threshold failure; --extended adds
    # the |Δ| distribution view
    shifted = [WordTiming(word="HI", start_ms=120, end_ms=420, confidence=0.9),
               WordTiming(word="YOU", start_ms=520, end_ms=920, confidence=0.8)]
    write_textgrid(tmp_path / "u1.flac", "HI YOU", shifted, 1000, suffix="_y")
    assert run([str(tmp_path), "--suffix", "_y", "--extended",
                "--enforce-thresholds"]) == EXIT_ABS_THRESHOLD
    out = json.loads(capsys.readouterr().out)
    assert out["word_pairs"] == 2
    assert out["abs_start_ms"]["max"] == pytest.approx(20.0)
    assert out["abs_middle_ms"]["p50"] == pytest.approx(20.0)


def test_all_presets_build_and_run_forward():
    """Every preset constructs and its tiny-audio forward has the right
    output vocab (guards preset geometry for all five families)."""
    import numpy as np

    from wav2vec2_tpu.models.presets import PRESETS

    for name, fn in PRESETS.items():
        cfg = fn(vocab_size=12)
        assert cfg.vocab_size == 12, name
        # conv stack emits 20 ms frames; add_adapter models downsample a
        # further adapter_stride**num_adapter_layers (config.py:159-171)
        expect_ms = 20.0
        if getattr(cfg, "add_adapter", False):
            expect_ms *= cfg.adapter_stride ** cfg.num_adapter_layers
        assert cfg.frame_stride_ms(16000) == pytest.approx(expect_ms), name
        assert cfg.conv_output_length(16000) > 0, name


def test_cli_perf_mode_skips_unalignable_case(model_dir, dataset_root, tmp_path):
    """Perf mode skips a too-short case per-case (warning) instead of
    aborting and losing the aggregate/summary for measured cases."""
    import numpy as np

    from wav2vec2_tpu.data.flac_encoder import write_flac

    from pathlib import Path

    # add a case whose transcript cannot fit its audio
    base = next(Path(dataset_root).rglob("*.trans.txt")).parent
    bad = np.zeros(900, np.int64)
    write_flac(base / "9-9-9999.flac", bad, 16000)
    trans = base / "9-9.trans.txt"
    trans.write_text("9-9-9999 " + " ".join(["SUPERCALIFRAGILISTIC"] * 30))
    try:
        out = tmp_path / "perf_skip.jsonl"
        rc = run(
            common_args(model_dir, dataset_root)
            + ["--output-format", "perf", "--perf-out", str(out),
               "--perf-warmup", "1", "--perf-repeats", "2",
               "--perf-append", "--no-batch"]
        )
        assert rc == 0
        lines = [json.loads(l) for l in out.read_text().splitlines()]
        ids = {r["utterance_id"] for r in lines}
        assert "9-9-9999" not in ids and len(ids) >= 1
        summary = json.loads((tmp_path / "perf_skip.jsonl.summary.json").read_text())
        assert summary["aggregate"]["utterance_count"] == len(ids)
    finally:
        (base / "9-9-9999.flac").unlink()
        trans.unlink()


def test_cli_phoneme_units_mode(model_dir, tmp_path):
    """--units phoneme: transcripts are whitespace-separated vocab symbols;
    the TextGrid carries one tight interval per phone (both the batch path
    and, via --no-batch, the builder-injected single path)."""
    root = tmp_path / "data"
    base = root / "LibriSpeech" / "test-clean" / "1" / "2"
    base.mkdir(parents=True)
    rng = np.random.default_rng(3)
    lines = []
    for i, text in enumerate(["H E L O", "T A | C A T"]):
        uid = f"1-2-{i:04d}"
        x = np.clip(np.cumsum(rng.integers(-80, 80, size=16000)), -30000, 30000)
        write_flac(base / f"{uid}.flac", x.astype(np.int64), 16000)
        lines.append(f"{uid} {text}")
    (base / "1-2.trans.txt").write_text("\n".join(lines))

    for extra in (["--batch"], ["--no-batch"]):
        rc = run([
            "--model-dir", str(model_dir), "--dataset-root", str(root),
            "--compute-dtype", "float32", "--output-format", "textgrid",
            "--units", "phoneme", *extra,
        ])
        assert rc == 0
        tg_files = sorted((root / "LibriSpeech").rglob("*.TextGrid"))
        assert len(tg_files) == 2
        text0 = tg_files[0].read_text()
        for sym in ["H", "E", "L", "O"]:
            assert f'"{sym.lower()}"' in text0 or f'"{sym}"' in text0
        # 4 phones => 4 word-tier intervals at minimum (plus gaps)
        for f in tg_files:
            f.unlink()


def test_cli_phoneme_json_report(model_dir, tmp_path):
    """--units phoneme + json report: per-unit rows flow through the report
    subsystem with the per-frame acoustic stats populated."""
    root = tmp_path / "data"
    base = root / "LibriSpeech" / "test-clean" / "1" / "3"
    base.mkdir(parents=True)
    rng = np.random.default_rng(5)
    uid = "1-3-0000"
    x = np.clip(np.cumsum(rng.integers(-80, 80, size=16000)), -30000, 30000)
    write_flac(base / f"{uid}.flac", x.astype(np.int64), 16000)
    (base / "1-3.trans.txt").write_text(f"{uid} H E L O")

    # baseline TextGrids first, so json mode has references to score against
    rc = run([
        "--model-dir", str(model_dir), "--dataset-root", str(root),
        "--compute-dtype", "float32", "--output-format", "textgrid",
        "--units", "phoneme",
    ])
    assert rc == 0
    tg = next((root / "LibriSpeech").rglob("*.TextGrid")).read_text()
    for sym in ("h", "e", "l", "o"):
        assert f'"{sym}"' in tg.lower()

    out = tmp_path / "phoneme_report.json"
    rc = run([
        "--model-dir", str(model_dir), "--dataset-root", str(root),
        "--compute-dtype", "float32", "--output-format", "json",
        "--units", "phoneme", "--out", str(out),
    ])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["aggregates"]["counts"]["with_reference"] == 1
    agg = rep["aggregates"]["global"]
    # self-reference, same units -> zero error across the distribution
    assert agg["abs_err_ms_median"]["p50"] == 0.0
    assert agg["abs_err_ms_median"]["p95"] == 0.0
    (sent,) = rep["sentences"]
    assert sent["word_count_pred"] == 4  # one unit per phone
