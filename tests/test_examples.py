"""Execute every runnable example end-to-end (the reference ships runnable
examples/*.rs; compile-checking alone would let them rot). Each example
generates its own tiny model dir and audio, so they run anywhere; the
subprocess env drops the TPU plugin registration (PALLAS_AXON_POOL_IPS) and
forces CPU so a wedged/absent remote worker cannot hang the suite."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = sorted((REPO / "examples").glob("*.py"))


@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(script):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no remote-TPU claim
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, str(script)], cwd=str(REPO),
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert r.returncode == 0, (
        script.name, r.stdout[-800:], r.stderr[-800:],
    )
    assert r.stdout.strip(), f"{script.name} produced no output"
