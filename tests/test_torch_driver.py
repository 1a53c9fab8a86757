"""Cross-implementation validation via the torch second-implementation
driver (scripts/torch_reference_driver.py) — the analog of the reference's
Python-reference benchmark driver + instrumentation patch
(wav2vec2aligner_librispeech_textgrids.py, *.perf-monitoring.patch).

Proof chain:
1. the torch trellis DP produces the identical path to the numpy oracle
   (both implement viterbi.rs:50-156 independently);
2. same tiny weights → torch forward and JAX forward log-probs agree;
3. end-to-end: torch driver baseline TextGrids vs the JAX CLI's `_tpu`
   TextGrids pass the comparator's pairing and land within one frame;
4. the driver's perf JSONL is schema-v1 and feeds compare_perf_jsonl.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from torch_reference_driver import TorchForcedAligner, run as driver_run  # noqa: E402

from wav2vec2_tpu.data.flac_encoder import write_flac  # noqa: E402
from wav2vec2_tpu.ops.viterbi_ref import viterbi_numpy  # noqa: E402

CONFIG = dict(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
    conv_stride=[5, 2], num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=32,
    do_stable_layer_norm=False, feat_extract_norm="group", conv_bias=False,
)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    import transformers
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("torch_driver_model")
    hf_cfg = transformers.Wav2Vec2Config(**CONFIG)
    torch.manual_seed(7)
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


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("torch_driver_data")
    base = root / "LibriSpeech" / "test-clean" / "9" / "9"
    base.mkdir(parents=True)
    rng = np.random.default_rng(42)
    lines = []
    for i, text in enumerate(["HELLO WORLD", "SHE SELLS SEA SHELLS",
                              "A QUICK BROWN FOX"]):
        uid = f"9-9-{i:04d}"
        x = np.clip(np.cumsum(rng.integers(-80, 80, size=24000)), -30000, 30000)
        write_flac(base / f"{uid}.flac", x.astype(np.int64), 16000)
        lines.append(f"{uid} {text}")
    (base / "9-9.trans.txt").write_text("\n".join(lines))
    return root


def test_torch_trellis_matches_numpy_oracle(model_dir):
    """Independent torch DP vs the numpy scalar oracle: identical paths."""
    aligner = TorchForcedAligner(model_dir)
    rng = np.random.default_rng(3)
    for t_len, text in [(40, "HELLO"), (120, "THE CAT SAT"), (9, "AB")]:
        tokens, _, _ = aligner.tokenize(text)
        lp = np.log(
            rng.dirichlet(np.ones(32), size=t_len).astype(np.float32)
        )
        oracle = viterbi_numpy(lp, np.array(tokens))
        got = aligner.trellis_align(torch.from_numpy(lp), tokens)
        assert got == oracle, (t_len, text)


def test_torch_forward_matches_jax_forward(model_dir, dataset_root):
    """Same weights → the two implementations' log-probs agree (f32)."""
    from wav2vec2_tpu.config import Wav2Vec2Config
    from wav2vec2_tpu.pipeline.builder import ForcedAlignerBuilder

    aligner_t = TorchForcedAligner(model_dir)
    rng = np.random.default_rng(0)
    samples = rng.standard_normal(8000).astype(np.float32)
    normalized = aligner_t.normalize(samples)

    lp_torch = (
        aligner_t.log_softmax(aligner_t.forward(normalized)).cpu().numpy()
    )

    cfg = Wav2Vec2Config(
        model_path=str(model_dir / "model.safetensors"),
        config_path=str(model_dir / "config.json"),
        vocab_path=str(model_dir / "vocab.json"),
    )
    jax_aligner = (
        ForcedAlignerBuilder(cfg)
        .with_backend_options(compute_dtype="float32")
        .build()
    )
    fwd = jax_aligner.runtime_backend.infer(normalized)
    lp_jax = np.asarray(fwd.log_probs)[: lp_torch.shape[0]]

    assert lp_torch.shape == lp_jax.shape
    np.testing.assert_allclose(lp_jax, lp_torch, atol=2e-4, rtol=0)


def test_cross_implementation_textgrids(model_dir, dataset_root):
    """Driver baseline TextGrids vs JAX CLI `_tpu` TextGrids through the
    comparator — the reference's Rust-vs-Python comparison protocol."""
    from wav2vec2_tpu.cli.alignment_report import run as cli_run

    rc = driver_run([
        "--model-dir", str(model_dir), "--dataset-root", str(dataset_root),
        "--output-format", "textgrid", "--progress-every", "0",
    ])
    assert rc == 0

    rc = cli_run([
        "--model-dir", str(model_dir), "--dataset-root", str(dataset_root),
        "--compute-dtype", "float32", "--output-format", "textgrid",
        "--textgrid-suffix", "_tpu",
    ])
    assert rc == 0

    out = subprocess.run(
        [sys.executable, "-m", "wav2vec2_tpu.cli.compare_textgrids",
         str(dataset_root), "--suffix", "_tpu"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    stats = json.loads(out.stdout)
    assert stats["pairs_compared"] == 3
    # Same weights → identical DP paths → the reference's own 5 ms median
    # acceptance gates hold (compare_textgrids.py:37-38). Measured at
    # dataset scale too: 200 cases / 2305 word pairs, medians 0.0 ms and
    # p99 |Δ| = 0 (scripts/quality_report.py → BENCHMARKS.md).
    for key in ("median_start_diff_ms", "median_end_diff_ms",
                "median_word_middle_diff_ms"):
        assert abs(stats[key]) <= 5.0, stats


def test_driver_perf_jsonl_schema_and_comparator(model_dir, dataset_root,
                                                 tmp_path):
    """Perf mode: schema-v1 JSONL + summary; feeds compare_perf_jsonl
    against a JAX-side perf run (the turnkey perf comparison protocol)."""
    from wav2vec2_tpu.cli.alignment_report import run as cli_run

    torch_out = tmp_path / "torch.jsonl"
    rc = driver_run([
        "--model-dir", str(model_dir), "--dataset-root", str(dataset_root),
        "--output-format", "perf", "--perf-out", str(torch_out),
        "--perf-warmup", "1", "--perf-repeats", "2", "--limit", "2",
        "--perf-append", "--progress-every", "0",
    ])
    assert rc == 0
    records = [json.loads(l) for l in torch_out.read_text().splitlines()]
    assert len(records) == 2
    for key in ("utterance_id", "num_frames_t", "state_len", "ts_product",
                "forward_ms", "post_ms", "dp_ms", "group_ms", "conf_ms",
                "align_ms", "align_ms_per_ts", "align_ms_per_t", "total_ms"):
        assert key in records[0], key
    assert abs(records[0]["align_ms"] - (
        records[0]["dp_ms"] + records[0]["group_ms"] + records[0]["conf_ms"]
    )) < 0.5  # medians of independent repeats need not sum exactly
    assert (tmp_path / "torch.jsonl.summary.json").exists()

    jax_out = tmp_path / "jax.jsonl"
    rc = cli_run([
        "--model-dir", str(model_dir), "--dataset-root", str(dataset_root),
        "--compute-dtype", "float32", "--output-format", "perf",
        "--perf-out", str(jax_out), "--perf-warmup", "1",
        "--perf-repeats", "2", "--limit", "2", "--perf-append", "--no-batch",
    ])
    assert rc == 0

    cmp_json = tmp_path / "cmp.json"
    out = subprocess.run(
        [sys.executable, "scripts/compare_perf_jsonl.py",
         str(torch_out), str(jax_out), "--json", str(cmp_json)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    cmp = json.loads(cmp_json.read_text())
    assert cmp["common_utterances"] == 2


_TINY = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
             intermediate_size=64)
_TINY_CONV = dict(conv_dim=[16] * 7, num_conv_pos_embeddings=16,
                  num_conv_pos_embedding_groups=4, **_TINY)

FAMILY_OVERRIDES = {
    "mhubert-147": _TINY_CONV,
    "sew-d-base": dict(conv_dim=[16] * 13, num_conv_pos_embeddings=16,
                       num_conv_pos_embedding_groups=4, position_buckets=16,
                       max_position_embeddings=64, **_TINY),
    "wav2vec2-conformer-rel-pos-large-960h": dict(
        _TINY_CONV, conv_depthwise_kernel_size=7, max_source_positions=500),
    "w2v-bert-2.0": dict(_TINY, conv_depthwise_kernel_size=7,
                         left_max_position_embeddings=8,
                         right_max_position_embeddings=2),
}


@pytest.mark.parametrize("family", sorted(FAMILY_OVERRIDES))
def test_cross_implementation_textgrids_per_family(
    family, dataset_root, tmp_path_factory
):
    """The generalized driver (AutoModelForCTC + mel frontend + family-aware
    frame stride) vs the CLI on the structurally distinct families: BN
    pos-conv, squeezed DeBERTa-v2 encoder, Transformer-XL conformer, and the
    log-mel w2v-BERT (40 ms adapter frames). Same protocol + 5 ms gates as
    the wav2vec2 test above; full-geometry sweeps live in
    scripts/quality_families.py -> reports/quality_families.json."""
    from family_model_dirs import build_model_dir

    from wav2vec2_tpu.cli.alignment_report import run as cli_run

    root = tmp_path_factory.mktemp(f"family_{family}")
    model_dir = build_model_dir(family, root,
                                overrides=FAMILY_OVERRIDES[family])

    suffix = "_tpu"
    rc = driver_run([
        "--model-dir", str(model_dir), "--dataset-root", str(dataset_root),
        "--output-format", "textgrid", "--progress-every", "0",
        "--textgrid-suffix", f"_torch_{family}",
    ])
    assert rc == 0
    rc = cli_run([
        "--model-dir", str(model_dir), "--dataset-root", str(dataset_root),
        "--compute-dtype", "float32", "--output-format", "textgrid",
        "--textgrid-suffix", f"{suffix}_{family}",
    ])
    assert rc == 0

    from wav2vec2_tpu.cli.compare_textgrids import (
        load_word_pairs, metrics_from_word_pairs,
    )

    # pair torch-suffixed baselines with CLI-suffixed candidates directly
    baselines = sorted(Path(dataset_root).rglob(f"*_torch_{family}.TextGrid"))
    pairs = [
        (b, b.with_name(b.name.replace(f"_torch_{family}",
                                       f"{suffix}_{family}")))
        for b in baselines
    ]
    assert len(pairs) == 3 and all(c.exists() for _, c in pairs)
    parsed, failures = load_word_pairs(pairs)
    assert failures == 0
    stats = metrics_from_word_pairs(parsed)
    for key in ("median_start_diff_ms", "median_end_diff_ms",
                "median_word_middle_diff_ms"):
        assert abs(stats[key]) <= 5.0, (family, stats)


def test_cross_implementation_phoneme_units(tmp_path):
    """Driver --units phoneme vs the CLI's --units phoneme: same tight
    per-phone units (fresh torch implementations of the phoneme tokenize +
    unit-grouping contracts vs align/tokenization.py +
    align/grouping/phoneme.py)."""
    import transformers
    from safetensors.numpy import save_file

    from wav2vec2_tpu.cli.alignment_report import run as cli_run
    from wav2vec2_tpu.data.flac_encoder import write_flac

    mdir = tmp_path / "model"
    mdir.mkdir()
    hf_cfg = transformers.Wav2Vec2Config(**{**CONFIG, "vocab_size": 16})
    torch.manual_seed(11)
    tm = transformers.Wav2Vec2ForCTC(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("wav2vec2.masked_spec_embed", None)
    save_file(sd, str(mdir / "model.safetensors"))
    (mdir / "config.json").write_text(json.dumps(
        {**CONFIG, "vocab_size": 16}))
    vocab = {"<pad>": 0, "|": 4, "a": 5, "ɛ̃": 6, "tʃ": 7, "k": 8, "u": 9}
    (mdir / "vocab.json").write_text(json.dumps(vocab))

    root = tmp_path / "data"
    base = root / "LibriSpeech" / "test-clean" / "7" / "7"
    base.mkdir(parents=True)
    rng = np.random.default_rng(5)
    lines = []
    for i, text in enumerate(["a ɛ̃ tʃ u", "k u | a a", "tʃ ɛ̃ k"]):
        uid = f"7-7-{i:04d}"
        x = np.clip(np.cumsum(rng.integers(-80, 80, size=16000)),
                    -30000, 30000)
        write_flac(base / f"{uid}.flac", x.astype(np.int64), 16000)
        lines.append(f"{uid} {text}")
    (base / "7-7.trans.txt").write_text("\n".join(lines))

    rc = driver_run([
        "--model-dir", str(mdir), "--dataset-root", str(root),
        "--output-format", "textgrid", "--units", "phoneme",
        "--progress-every", "0",
    ])
    assert rc == 0
    rc = cli_run([
        "--model-dir", str(mdir), "--dataset-root", str(root),
        "--compute-dtype", "float32", "--output-format", "textgrid",
        "--textgrid-suffix", "_tpu", "--units", "phoneme",
    ])
    assert rc == 0

    from wav2vec2_tpu.data.textgrid import parse_textgrid_file

    n_units = 0
    for b in sorted(root.rglob("*[0-9].TextGrid")):
        ref = parse_textgrid_file(b).tier("words")
        got = parse_textgrid_file(
            b.with_name(b.stem + "_tpu.TextGrid")).tier("words")
        ref_iv = [iv for iv in ref.intervals if iv.text.strip()]
        got_iv = [iv for iv in got.intervals if iv.text.strip()]
        assert [iv.text for iv in ref_iv] == [iv.text for iv in got_iv]
        for r, g in zip(ref_iv, got_iv):
            mid_r = (r.xmin + r.xmax) / 2
            mid_g = (g.xmin + g.xmax) / 2
            assert abs(mid_r - mid_g) * 1000 <= 5.0
            n_units += 1
    assert n_units >= 10  # phones actually flowed through both paths


def test_family_registry_consistency():
    """The sweep table, the fixture specs, and the model presets must stay
    in sync: every swept family has a fixture spec, and every spec's
    geometry keys parse through the production config loader."""
    from family_model_dirs import FAMILY_SPECS
    from quality_families import SWEEP

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig

    for fam in SWEEP:
        assert fam in FAMILY_SPECS, fam
    for fam, spec in FAMILY_SPECS.items():
        d = {**spec, "pad_token_id": 0, "vocab_size": 32}
        cfg = Wav2Vec2ModelConfig.from_dict(d)
        assert cfg.frame_stride_samples() > 0, fam


# --- property-based cross-implementation equivalence (hypothesis) ---

from hypothesis import given, settings, strategies as st  # noqa: E402

_PHONE_SYMBOLS = ["a", "b", "k", "u", "ə", "ɛ̃", "ɔ̃", "tʃ", "ʃː", "xx"]


@settings(max_examples=40, deadline=None)
@given(
    syms=st.lists(st.sampled_from(_PHONE_SYMBOLS + ["|"]),
                  min_size=1, max_size=12),
    seed=st.integers(0, 10_000),
    t_extra=st.integers(0, 40),
)
def test_phoneme_contracts_agree_across_implementations(syms, seed, t_extra):
    """Fuzz the independence claim directly: the repo's phoneme tokenizer +
    unit grouping and the torch driver's fresh implementations must agree
    on (tokens, chars) and on the grouped units for ANY vocab subset,
    transcript, and Viterbi path. 'xx' is deliberately missing from the
    vocab (unknown-symbol drop rule)."""
    vocab = {"<pad>": 0, "|": 4, "a": 5, "b": 6, "k": 7, "u": 8,
             "ə": 9, "ɛ̃": 10, "ɔ̃": 11, "tʃ": 12, "ʃː": 13}
    transcript = " ".join(syms)

    from wav2vec2_tpu.align.grouping import frame_evidence_from_log_probs
    from wav2vec2_tpu.align.grouping.phoneme import group_into_phonemes
    from wav2vec2_tpu.align.tokenization import build_token_sequence_phoneme

    seq = build_token_sequence_phoneme(transcript, vocab, 0, 4)

    class _Driver(TorchForcedAligner):  # bypass model loading
        def __init__(self):
            self.vocab = dict(vocab)
            self.blank_id = 0
            self.sep_id = 4
            self.units = "phoneme"
            self.frame_stride_ms = 20.0059
            self.torch = torch

    drv = _Driver()
    d_tokens, d_chars = drv.tokenize_phoneme(transcript)
    assert d_tokens == list(seq.tokens)
    assert d_chars == list(seq.chars)

    if not seq.normalized_words:
        return  # transcript had no known phones; nothing to align
    rng = np.random.default_rng(seed)
    t_len = (len(seq.tokens) + 1) // 2 + t_extra
    lp = np.log(rng.dirichlet(np.ones(16), size=t_len).astype(np.float64))
    path = viterbi_numpy(lp.astype(np.float32), np.asarray(seq.tokens))
    states = [s for s, _ in path]

    ev = frame_evidence_from_log_probs(
        lp.astype(np.float32), seq.tokens, states, 0
    )
    ours = group_into_phonemes(
        np.asarray(states), seq, ev, 0, 4, drv.frame_stride_ms
    )
    theirs = drv.group_phonemes(path, lp.astype(np.float32),
                                d_tokens, d_chars)
    assert [u.word for u in ours] == [u.word for u in theirs]
    assert [(u.start_ms, u.end_ms) for u in ours] == [
        (u.start_ms, u.end_ms) for u in theirs]
    for a, b in zip(ours, theirs):
        assert abs(a.confidence - b.confidence) < 1e-9
