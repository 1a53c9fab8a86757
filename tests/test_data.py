"""Data layer tests: WAV reader, native FLAC decoder round-trips, TextGrid
read/write, LibriSpeech discovery."""

import numpy as np
import pytest

from wav2vec2_tpu.data.audio import read_audio_mono, read_wav_mono, write_wav_mono
from wav2vec2_tpu.data.flac import read_flac_mono, read_flac_mono_int16
from wav2vec2_tpu.data.flac_encoder import write_flac
from wav2vec2_tpu.data.librispeech import (
    extract_audio_id,
    filter_cases,
    load_cases_from_transcripts,
    resolve_dataset_base_and_subsets,
)
from wav2vec2_tpu.data.textgrid import (
    build_textgrid,
    parse_textgrid_file,
    reference_words_from_textgrid,
    write_textgrid,
)
from wav2vec2_tpu.types import WordConfidenceStats, WordTiming


def rand_pcm(n, seed=0, scale=2000):
    rng = np.random.default_rng(seed)
    # low-pass-ish signal so fixed predictors have small residuals
    x = np.cumsum(rng.integers(-scale // 20, scale // 20, size=n))
    return np.clip(x, -32768, 32767).astype(np.int64)


# --- WAV ---

def test_wav_roundtrip(tmp_path):
    x = rand_pcm(12_345).astype(np.int16)
    p = tmp_path / "a.wav"
    write_wav_mono(p, x, 16000)
    got, rate = read_wav_mono(p)
    assert rate == 16000
    np.testing.assert_allclose(got, x.astype(np.float32) / 32768.0, atol=1e-7)


# --- FLAC (native decoder vs Python encoder round-trip) ---

@pytest.mark.parametrize(
    "strategy", ["verbatim", "constant", "fixed0", "fixed1", "fixed2", "lpc1"]
)
def test_flac_mono_roundtrip(tmp_path, strategy):
    n = 10_000
    if strategy == "constant":
        x = np.full(n, 123, np.int64)
    else:
        x = rand_pcm(n, seed=hash(strategy) % 100)
    p = tmp_path / "a.flac"
    write_flac(p, x, 16000, strategy=strategy)
    got, rate = read_flac_mono(p)
    assert rate == 16000
    np.testing.assert_allclose(got, x.astype(np.float32) / 32768.0, atol=1e-7)


@pytest.mark.parametrize("stereo_mode", ["independent", "mid-side"])
def test_flac_stereo_roundtrip_averages_channels(tmp_path, stereo_mode):
    n = 5_000
    left = rand_pcm(n, seed=1)
    right = rand_pcm(n, seed=2)
    x = np.stack([left, right], axis=1)
    p = tmp_path / "s.flac"
    write_flac(p, x, 16000, strategy="fixed1", stereo_mode=stereo_mode)
    got, rate = read_flac_mono(p)
    expected = ((left + right).astype(np.float32) / 2.0) / 32768.0
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_flac_int16_path(tmp_path):
    x = rand_pcm(3_000, seed=3)
    p = tmp_path / "i.flac"
    write_flac(p, x, 16000, strategy="fixed1")
    got, rate = read_flac_mono_int16(p)
    assert got.dtype == np.int16
    np.testing.assert_array_equal(got, x.astype(np.int16))


def test_flac_partial_final_block(tmp_path):
    x = rand_pcm(4096 + 137, seed=4)
    p = tmp_path / "p.flac"
    write_flac(p, x, 16000, strategy="fixed2")
    got, _ = read_flac_mono(p)
    assert len(got) == len(x)


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _streaminfo(total_samples=192, channels=1, bits=16, rate=16000):
    b = bytearray(34)
    b[10] = rate >> 12
    b[11] = (rate >> 4) & 0xFF
    b[12] = ((rate & 0xF) << 4) | ((channels - 1) << 1) | ((bits - 1) >> 4)
    b[13] = (((bits - 1) & 0xF) << 4) | ((total_samples >> 32) & 0xF)
    b[14:18] = (total_samples & 0xFFFFFFFF).to_bytes(4, "big")
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(b)


def test_flac_rejects_order_exceeding_partition_length(tmp_path):
    """Regression: FIXED order 4 with partition_order 6 on a 192-sample block
    gives part_len=3 < order — the residual count underflowed uint32 and the
    write loop ran off the end of the block buffer (heap overflow / segfault).
    Must now return a decoder error."""
    w = _BitWriter()
    w.write(0x3FFE, 14)  # frame sync
    w.write(0, 2)  # reserved + blocking strategy
    w.write(1, 4)  # bs_code 1 -> block_size 192
    w.write(5, 4)  # sr_code 5 -> 16000
    w.write(0, 4)  # ch_code 0 -> mono
    w.write(4, 3)  # ss_code 4 -> 16-bit
    w.write(0, 1)  # reserved
    w.write(0, 8)  # UTF-8 frame number 0
    w.write(0, 8)  # header CRC-8 (not verified)
    w.write(0, 1)  # subframe zero pad
    w.write(12, 6)  # FIXED order 4
    w.write(0, 1)  # no wasted bits
    for _ in range(4):
        w.write(0, 16)  # warmup samples
    w.write(0, 2)  # residual method 0 (4-bit Rice)
    w.write(6, 4)  # partition_order 6 -> part_len 3 < order 4
    w.write(0, 4)  # first Rice parameter
    data = _streaminfo() + w.bytes() + b"\x00" * 64
    p = tmp_path / "evil.flac"
    p.write_bytes(data)
    from wav2vec2_tpu.errors import RuntimeBackendError

    with pytest.raises(RuntimeBackendError):
        read_flac_mono(p)


def test_flac_huge_total_samples_header_does_not_allocate(tmp_path):
    """A crafted 36-bit total_samples must not trigger a multi-GB reserve or
    let bad_alloc cross the C ABI."""
    p = tmp_path / "huge.flac"
    p.write_bytes(_streaminfo(total_samples=(1 << 36) - 1, channels=8))
    # header-only stream: decodes to zero frames without a giant allocation
    got, _ = read_flac_mono(p)
    assert len(got) == 0


def test_flac_random_garbage_frames_error_cleanly(tmp_path):
    rng = np.random.default_rng(7)
    from wav2vec2_tpu.errors import RuntimeBackendError

    for seed in range(8):
        data = _streaminfo() + bytes(rng.integers(0, 256, size=256, dtype=np.uint8))
        p = tmp_path / f"g{seed}.flac"
        p.write_bytes(data)
        try:
            read_flac_mono(p)  # either decodes garbage or errors — no crash
        except RuntimeBackendError:
            pass


def test_read_audio_mono_dispatch(tmp_path):
    x = rand_pcm(1000, seed=5)
    write_flac(tmp_path / "x.flac", x)
    write_wav_mono(tmp_path / "x.wav", x.astype(np.int16))
    f, _ = read_audio_mono(tmp_path / "x.flac")
    w, _ = read_audio_mono(tmp_path / "x.wav")
    np.testing.assert_allclose(f, w, atol=1e-7)


# --- TextGrid ---

def make_word(word, start, end, conf=0.9):
    return WordTiming(word, start, end, conf, WordConfidenceStats(geo_mean_prob=conf))


def test_textgrid_roundtrip(tmp_path):
    words = [make_word("hello", 100, 500), make_word("world", 600, 1100)]
    p = write_textgrid(tmp_path / "utt.flac", "hello world", words, 2000)
    assert p.name == "utt.TextGrid"
    tg = parse_textgrid_file(p)
    assert [t.name for t in tg.tiers] == ["words", "words-confidence", "transcript"]
    wt = tg.tier("words")
    assert [(iv.text, iv.xmin, iv.xmax) for iv in wt.intervals] == [
        ("hello", 0.1, 0.5), ("world", 0.6, 1.1),
    ]
    conf = tg.tier("words-confidence")
    assert conf.intervals[0].text == "0.90"
    assert tg.tier("transcript").intervals[0].text == "hello world"
    refs = reference_words_from_textgrid(p)
    assert [(r.word, r.start_ms, r.end_ms) for r in refs] == [
        ("hello", 100, 500), ("world", 600, 1100),
    ]


def test_textgrid_clamps_and_enforces_monotone(tmp_path):
    # overlapping + out-of-range words are clamped/sorted/dropped
    words = [
        make_word("b", 600, 900),
        make_word("a", 100, 700),   # overlaps b → b start clamped to 700
        make_word("zero", 2500, 2500),  # zero-length after clamp → dropped
    ]
    tg = build_textgrid("t", words, 2000)
    wt = tg.tier("words")
    texts = [iv.text for iv in wt.intervals]
    assert texts == ["a", "b"]
    assert wt.intervals[1].xmin >= wt.intervals[0].xmax - 1e-9
    # duration extends to the max word end (text_grid_report_formatter.rs)
    tg2 = build_textgrid("t", [make_word("late", 2500, 3000)], 2000)
    assert tg2.xmax == pytest.approx(3.0)
    assert [iv.text for iv in tg2.tier("words").intervals] == ["late"]


def test_textgrid_suffix(tmp_path):
    p = write_textgrid(tmp_path / "utt.flac", "x", [make_word("x", 0, 100)], 500,
                       suffix="_tpu")
    assert p.name == "utt_tpu.TextGrid"


# --- LibriSpeech layout ---

def make_dataset(tmp_path, layout="librispeech"):
    if layout == "librispeech":
        base = tmp_path / "LibriSpeech" / "test-clean" / "19" / "198"
    else:
        base = tmp_path / "mysubset" / "19" / "198"
    base.mkdir(parents=True)
    trans = base / "19-198.trans.txt"
    lines = []
    for i in range(3):
        uid = f"19-198-{i:04d}"
        x = rand_pcm(2000, seed=i)
        write_flac(base / f"{uid}.flac", x)
        lines.append(f"{uid} HELLO WORLD NUMBER {i}")
    trans.write_text("\n".join(lines))
    return tmp_path


def test_resolve_librispeech_layout(tmp_path):
    make_dataset(tmp_path, "librispeech")
    root, subsets = resolve_dataset_base_and_subsets(tmp_path)
    assert root == tmp_path
    assert [s.name for s in subsets] == ["test-clean", "test-other"]


def test_resolve_generic_layout(tmp_path):
    make_dataset(tmp_path, "generic")
    root, subsets = resolve_dataset_base_and_subsets(tmp_path)
    assert [s.name for s in subsets] == ["mysubset"]


def test_load_cases_and_filter(tmp_path):
    make_dataset(tmp_path, "librispeech")
    subset = tmp_path / "LibriSpeech" / "test-clean"
    cases = load_cases_from_transcripts(tmp_path, [subset])
    assert len(cases) == 3
    assert cases[0].id == "19-198-0000"
    assert cases[0].transcript == "HELLO WORLD NUMBER 0"
    assert cases[0].audio_path.endswith("19-198-0000.flac")

    filtered = filter_cases(cases, case_ids={"19-198-0001"})
    assert [c.id for c in filtered] == ["19-198-0001"]
    assert [c.id for c in filter_cases(cases, offset=1, limit=1)] == ["19-198-0001"]


def test_extract_audio_id_fuzzy():
    assert extract_audio_id("path/to/19-198-0001.flac") == "19-198-0001"
    assert extract_audio_id("19-198-0001.TextGrid") == "19-198-0001"
    assert extract_audio_id("19-198-0001") == "19-198-0001"
    assert extract_audio_id("a\\b\\x.wav") == "x"


def test_flac_installed_layout_fallback(monkeypatch, tmp_path):
    """When the repo's native/ dir is absent (installed wheel), the loader
    must pick up the setup.py-built in-package extension."""
    import subprocess as sp
    import sys as _sys
    from pathlib import Path as _P

    import wav2vec2_tpu.data.flac as flac

    repo = _P(flac.__file__).resolve().parents[2]
    if not list((repo / "wav2vec2_tpu").glob("_flacdec*.so")):
        r = sp.run([_sys.executable, "setup.py", "build_ext", "--inplace"],
                   cwd=repo, capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"cannot build in-package extension: {r.stderr[-200:]}")

    monkeypatch.setattr(flac, "_lib", None)
    monkeypatch.setattr(flac, "_NATIVE_DIR", tmp_path / "no_native_dir")
    monkeypatch.setattr(flac, "_LIB_PATH", tmp_path / "no_native_dir" / "x.so")
    lib = flac._load_library()
    assert lib is not None
    # round-trip through the fallback library
    x = rand_pcm(2000, seed=9)
    p = tmp_path / "f.flac"
    write_flac(p, x, 16000)
    got, rate = read_flac_mono(p)
    assert rate == 16000 and len(got) == 2000
    monkeypatch.setattr(flac, "_lib", None)  # restored by monkeypatch teardown


# -- WAV format matrix + error branches (read_wav_mono parity with the
# reference's bit-depth scaling + channel averaging, alignment_report.rs:1405-1445)

def _wav_bytes(audio_format, channels, sample_rate, bits, body):
    import struct

    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(body), b"WAVE", b"fmt ", 16, audio_format,
        channels, sample_rate, sample_rate * channels * bits // 8,
        channels * bits // 8, bits, b"data", len(body),
    )
    return header + body


def test_wav_float32_and_int32(tmp_path):
    from wav2vec2_tpu.data.audio import read_wav_mono

    x = np.array([0.5, -0.25, 1.0], np.float32)
    p = tmp_path / "f32.wav"
    p.write_bytes(_wav_bytes(3, 1, 16000, 32, x.astype("<f4").tobytes()))
    got, sr = read_wav_mono(p)
    assert sr == 16000 and np.allclose(got, x)

    xi = np.array([1 << 30, -(1 << 30)], "<i4")
    p2 = tmp_path / "i32.wav"
    p2.write_bytes(_wav_bytes(1, 1, 8000, 32, xi.tobytes()))
    got, sr = read_wav_mono(p2)
    assert sr == 8000 and np.allclose(got, [0.5, -0.5])


def test_wav_24bit_and_stereo_average(tmp_path):
    from wav2vec2_tpu.data.audio import read_wav_mono

    # 24-bit: +2^22 encodes 0.5, sign extension for negatives
    vals = [1 << 22, -(1 << 22)]
    raw = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    p = tmp_path / "i24.wav"
    p.write_bytes(_wav_bytes(1, 1, 16000, 24, raw))
    got, _ = read_wav_mono(p)
    assert np.allclose(got, [0.5, -0.5])

    # stereo 16-bit averages channels
    inter = np.array([16384, -16384, 8192, 8192], "<i2")  # L,R,L,R
    p2 = tmp_path / "st.wav"
    p2.write_bytes(_wav_bytes(1, 2, 16000, 16, inter.tobytes()))
    got, _ = read_wav_mono(p2)
    assert np.allclose(got, [0.0, 0.25])


def test_wav_error_branches(tmp_path):
    from wav2vec2_tpu.data.audio import read_audio_mono, read_wav_mono
    from wav2vec2_tpu.errors import InvalidInputError, IoError

    with pytest.raises(IoError):
        read_wav_mono(tmp_path / "missing.wav")
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"NOTRIFF" + b"\x00" * 64)
    with pytest.raises(InvalidInputError, match="RIFF"):
        read_wav_mono(bad)
    nodata = tmp_path / "nodata.wav"
    nodata.write_bytes(b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE" + b"\x00" * 32)
    with pytest.raises(InvalidInputError, match="fmt/data"):
        read_wav_mono(nodata)
    weird = tmp_path / "weird.wav"
    weird.write_bytes(_wav_bytes(1, 1, 16000, 8, b"\x00\x01"))
    with pytest.raises(InvalidInputError, match="unsupported wav encoding"):
        read_wav_mono(weird)
    with pytest.raises(InvalidInputError, match="unsupported audio format"):
        read_audio_mono(tmp_path / "x.mp3")


def test_load_cases_from_textgrids(tmp_path):
    """json-mode case loading: words tier → reference words, transcript tier
    fallback, TextGrids without sibling audio skipped
    (alignment_report.rs:1042-1059)."""
    from wav2vec2_tpu.data.flac_encoder import write_flac
    from wav2vec2_tpu.data.librispeech import load_cases_from_textgrids
    from wav2vec2_tpu.data.textgrid import write_textgrid
    from wav2vec2_tpu.types import WordTiming

    sub = tmp_path / "sub"
    sub.mkdir()
    words = [
        WordTiming(word="HELLO", start_ms=0, end_ms=400, confidence=0.9),
        WordTiming(word="WORLD", start_ms=420, end_ms=900, confidence=0.8),
    ]
    write_flac(sub / "utt1.flac", np.zeros(16000, np.int64), 16000)
    write_textgrid(sub / "utt1.flac", "HELLO WORLD", words, duration_ms=1000)
    # no sibling audio → skipped
    write_textgrid(sub / "orphan.flac", "X", words, duration_ms=1000)

    cases = load_cases_from_textgrids(tmp_path, [sub])
    assert [c.id for c in cases] == ["utt1"]
    c = cases[0]
    assert c.has_reference and c.transcript == "HELLO WORLD"
    assert [(w.word, w.start_ms, w.end_ms) for w in c.reference_words] == [
        ("HELLO", 0, 400), ("WORLD", 420, 900)
    ]

    with pytest.raises(FileNotFoundError, match="Missing subset"):
        load_cases_from_textgrids(tmp_path, [tmp_path / "nope"])
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="No TextGrid"):
        load_cases_from_textgrids(tmp_path, [empty])


def test_load_case_filter_and_offsets(tmp_path):
    from wav2vec2_tpu.data.librispeech import (
        Case,
        filter_cases,
        load_case_filter,
    )

    f = tmp_path / "cases.txt"
    f.write_text("# comment\n\na/b/utt1.flac\nutt2.TextGrid\nutt3\n")
    ids = load_case_filter(f)
    assert ids == {"utt1", "utt2", "utt3"}

    cases = [Case(id=f"utt{i}", audio_path=f"d/utt{i}.flac", transcript="x")
             for i in range(5)]
    assert [c.id for c in filter_cases(cases, ids)] == ["utt1", "utt2", "utt3"]
    assert [c.id for c in filter_cases(cases, None, offset=3)] == ["utt3", "utt4"]
    assert [c.id for c in filter_cases(cases, None, offset=1, limit=2)] == [
        "utt1", "utt2"
    ]


def test_wav_fuzz_no_uncontrolled_errors(tmp_path):
    """Garbage and truncated WAV bytes must raise AlignmentError subclasses,
    never segfault or leak foreign exceptions (the FLAC decoder has the same
    guarantee, tested above)."""
    from wav2vec2_tpu.data.audio import read_wav_mono
    from wav2vec2_tpu.errors import AlignmentError

    rng = np.random.default_rng(0)
    p = tmp_path / "fuzz.wav"
    good = _wav_bytes(1, 1, 16000, 16,
                      np.zeros(64, "<i2").tobytes())
    for i in range(60):
        if i % 3 == 0:
            blob = rng.bytes(int(rng.integers(0, 256)))
        elif i % 3 == 1:
            blob = good[: int(rng.integers(0, len(good)))]
        else:
            b = bytearray(good)
            for _ in range(8):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
            blob = bytes(b)
        p.write_bytes(blob)
        try:
            x, sr = read_wav_mono(p)
            assert np.all(np.isfinite(x)) or x.dtype == np.float32
        except AlignmentError:
            pass  # controlled rejection


def test_textgrid_parser_fuzz(tmp_path):
    """Garbage TextGrid bytes must parse to empty/partial structures or
    raise controlled errors, never crash the json-mode case loader."""
    from wav2vec2_tpu.data.textgrid import parse_textgrid_file
    from wav2vec2_tpu.errors import AlignmentError

    rng = np.random.default_rng(3)
    p = tmp_path / "f.TextGrid"
    good = (tmp_path / "good.TextGrid")
    words = [WordTiming(word="HI", start_ms=0, end_ms=300, confidence=0.5)]
    write_textgrid(tmp_path / "good.flac", "HI", words, duration_ms=400)
    base = good.read_bytes()
    for i in range(40):
        if i % 3 == 0:
            blob = rng.bytes(int(rng.integers(0, 300)))
        elif i % 3 == 1:
            blob = base[: int(rng.integers(0, len(base)))]
        else:
            b = bytearray(base)
            for _ in range(6):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(32, 127))
            blob = bytes(b)
        p.write_bytes(blob)
        try:
            tg = parse_textgrid_file(p)
            assert tg is not None
        except (AlignmentError, ValueError, UnicodeDecodeError):
            pass
