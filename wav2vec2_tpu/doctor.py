"""Environment diagnostics: `python -m wav2vec2_tpu.doctor [--model-dir D]`.

Operational triage for deployments — answers "why is alignment slow /
failing here" in one command: accelerator visibility, compile-cache
health, native components, optional dependencies, and (optionally) a model
dir's integrity. Prints one line per check and exits non-zero if any
required check fails.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

OK, WARN, FAIL = "ok", "warn", "FAIL"


def _line(status: str, name: str, detail: str) -> None:
    print(f"[{status:>4s}] {name}: {detail}")


def check_jax(timeout_s: float = 90.0) -> bool:
    # a WEDGED remote TPU worker makes jax.devices() hang rather than
    # error — probe in a daemon thread so doctor itself stays responsive
    # and can report the hang (the situation doctor exists to diagnose)
    import threading

    result: dict = {}

    def probe():
        try:
            import jax

            devs = jax.devices()
            result["devs"] = (len(devs), devs[0].platform,
                              devs[0].device_kind)
        except Exception as e:  # report any init failure verbatim
            result["err"] = e

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        _line(FAIL, "accelerator",
              f"device initialization still blocked after {timeout_s:.0f}s "
              "— the remote TPU worker is likely wedged (it hangs instead "
              "of erroring). Run with --device cpu, or retry once the "
              "worker is recycled")
        return False
    if "err" in result:
        _line(FAIL, "accelerator", f"jax backend failed: {result['err']}")
        return False
    n, plat, kind = result["devs"]
    status = OK if plat != "cpu" else WARN
    _line(status, "accelerator",
          f"{n} × {plat} ({kind})"
          + ("" if plat != "cpu" else " — CPU only: alignment works but "
             "throughput targets assume a TPU"))
    return True


def check_compile_cache() -> bool:
    cache_dir = Path(os.environ.get(
        "WAV2VEC2_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/wav2vec2_tpu/jax_cache"),
    ))
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        probe = cache_dir / ".doctor_probe"
        probe.write_text("x")
        probe.unlink()
        n = len(list(cache_dir.glob("*-cache")))
        _line(OK, "compile cache", f"{cache_dir} writable, {n} entries")
        return True
    except OSError as e:
        _line(WARN, "compile cache",
              f"{cache_dir} not writable ({e}) — every process recompiles")
        return True  # degraded, not fatal


def check_native() -> bool:
    ok = True
    try:
        from .data.flac import read_flac_mono  # noqa: F401
        from .data import flac

        flac._load_library()
        _line(OK, "native flac decoder", "loaded")
    except Exception as e:
        _line(FAIL, "native flac decoder", f"{e} (run `make -C native`)")
        ok = False
    try:
        from .align.grouping.native import native_available

        if native_available():
            _line(OK, "native grouping engine", "loaded")
        else:
            _line(WARN, "native grouping engine",
                  "unavailable — Python fallback is ~4× slower per utterance")
    except Exception as e:
        _line(WARN, "native grouping engine", f"{e}")
    return ok


def check_optional_deps() -> bool:
    for mod, why in [("torch", "checkpoint export"),
                     ("transformers", "checkpoint export / parity tests"),
                     ("onnxruntime", "the optional ONNX backend")]:
        try:
            __import__(mod)
            _line(OK, f"optional: {mod}", "importable")
        except ImportError:
            _line(WARN, f"optional: {mod}", f"absent — needed only for {why}")
    return True


def check_model_dir(model_dir: str) -> bool:
    from .config import Wav2Vec2ModelConfig, load_vocab

    d = Path(model_dir)
    ok = True
    for name in ("model.safetensors", "config.json", "vocab.json"):
        if not (d / name).exists():
            _line(FAIL, "model dir", f"missing {d / name}")
            ok = False
    if not ok:
        return False
    try:
        cfg = Wav2Vec2ModelConfig.load(d / "config.json")
        _line(OK, "config.json",
              f"hidden={cfg.hidden_size} layers={cfg.num_hidden_layers} "
              f"vocab={cfg.vocab_size} stride="
              f"{cfg.frame_stride_ms(16000):.0f}ms "
              f"pos_conv={cfg.pos_conv_style} attn={cfg.attention_style}")
    except Exception as e:
        _line(FAIL, "config.json", str(e))
        return False
    try:
        vocab = load_vocab(d / "vocab.json")
        sep = "|" in vocab
        _line(OK if sep else WARN, "vocab.json",
              f"{len(vocab)} single-char entries"
              + ("" if sep else " — no '|' separator: word_sep falls back to 0"))
    except Exception as e:
        _line(FAIL, "vocab.json", str(e))
        return False
    try:
        from safetensors import safe_open

        with safe_open(str(d / "model.safetensors"), framework="numpy") as f:
            keys = list(f.keys())
        prefixes = {k.split(".", 1)[0] for k in keys}
        fam = (prefixes & {"wav2vec2", "hubert", "data2vec_audio", "wavlm"})
        _line(OK, "model.safetensors",
              f"{len(keys)} tensors, family prefix: "
              f"{', '.join(sorted(fam)) or 'custom'}")
    except Exception as e:
        _line(FAIL, "model.safetensors", str(e))
        return False
    return True


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model-dir", default=None)
    args = p.parse_args(argv)

    checks = [check_jax(), check_compile_cache(), check_native(),
              check_optional_deps()]
    if args.model_dir:
        checks.append(check_model_dir(args.model_dir))
    healthy = all(checks)
    print("healthy" if healthy else "PROBLEMS FOUND")
    return 0 if healthy else 1


if __name__ == "__main__":
    sys.exit(main())
