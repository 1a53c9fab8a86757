"""Device/backend resolution with graceful degradation.

The reference degrades wgpu → CUDA → CPU when an accelerator is unavailable
(viterbi.rs:13-30, SURVEY.md §5 failure-detection). The JAX analog: if the
configured platform (e.g. a TPU plugin) fails to initialize, fall back to
the CPU backend with a warning instead of crashing — alignment still works,
just slower.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

_checked = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache — first-run CLI compiles
    (one per bucket shape, 30-250 s each over this TPU's remote-compile
    tunnel) become one-time costs across processes."""
    import os

    import jax

    cache_dir = path or os.environ.get(
        "WAV2VEC2_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/wav2vec2_tpu/jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        logger.debug("compilation cache unavailable: %s", e)


def _init_watchdog(warn_after: float = 120.0):
    """Backend init can HANG (not error) when a remote TPU worker is wedged
    — seen in production: a program load that never returns leaves every
    subsequent device call blocked. Warn the operator with a remediation
    hint, and hard-abort if WAV2VEC2_DEVICE_INIT_TIMEOUT_S is set and
    exceeded (for unattended runs that must fail fast). Returns a cancel
    callable."""
    import os
    import sys
    import threading

    done = threading.Event()
    deadline = float(os.environ.get("WAV2VEC2_DEVICE_INIT_TIMEOUT_S", "0"))

    def fire():
        if done.wait(warn_after):
            return
        logger.warning(
            "device initialization has not returned after %.0f s — the "
            "TPU worker may be unresponsive (a wedged worker hangs "
            "instead of erroring). Pass --device cpu (or set "
            "JAX_PLATFORMS=cpu via jax.config) to run on CPU, or set "
            "WAV2VEC2_DEVICE_INIT_TIMEOUT_S to abort unattended runs.",
            warn_after,
        )
        if deadline > warn_after and not done.wait(deadline - warn_after):
            print(
                f"device init watchdog: no backend after {deadline:.0f}s — "
                "aborting (WAV2VEC2_DEVICE_INIT_TIMEOUT_S)",
                file=sys.stderr,
            )
            sys.stderr.flush()
            os._exit(3)

    threading.Thread(target=fire, daemon=True).start()
    return done.set


def ensure_backend() -> str:
    """Initialize the JAX backend, falling back to CPU if the configured
    platform fails. Returns the active platform name."""
    global _checked
    import jax

    cancel = _init_watchdog()
    try:
        platform = jax.devices()[0].platform
        _checked = True
        return platform
    except RuntimeError as e:
        if _checked:
            raise
        logger.warning(
            "configured JAX platform failed to initialize (%s); "
            "falling back to CPU", e,
        )
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        platform = jax.devices()[0].platform
        _checked = True
        return platform
    finally:
        cancel()
