"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

Tests must run anywhere (CI, CPU-only machines) — the reference's
"skip gracefully when no device" discipline (SURVEY.md §4) becomes
"run everything on the CPU backend with forced host device count".
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This image registers a TPU ("axon") PJRT plugin from sitecustomize, which
# pre-imports jax and wins over the JAX_PLATFORMS env var — force CPU via the
# config API instead (must run before any backend initialization).
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
