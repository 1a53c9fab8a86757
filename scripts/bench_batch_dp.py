"""Batch-mode DP tier benchmark on TPU (VERDICT r2 item 2).

Measures the vmapped Viterbi at a batch shape BEYOND the VMEM backpointer
budget (the 30 s-audio / long-transcript case that used to silently
downgrade to lax.scan): HBM-backpointer Pallas tier vs the scan DP, plus
the VMEM tier at a typical in-budget shape for reference.

Run: python scripts/bench_batch_dp.py  (real TPU; ~3 programs compiled)
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from wav2vec2_tpu.ops.viterbi_pallas import (
    fits_vmem,
    viterbi_pallas_batch,
)
from wav2vec2_tpu.ops.viterbi_ref import viterbi_single


def time_fn(fn, *args, warmup=2, repeats=5):
    out = None
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(out[0])  # force a fetch through the tunnel
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")

    # 30 s audio (T=1504 padded) x long transcript (S=2048) — the shape the
    # fits_vmem gate used to downgrade
    for name, (B, T, V, S) in {
        "long (HBM tier)": (8, 1600, 32, 2048),
        "typical (VMEM tier)": (8, 504, 32, 256),
    }.items():
        assert (name.startswith("typical")) == fits_vmem(T, S)
        lp = rng.normal(size=(B, T, V)).astype(np.float32)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        toks = rng.integers(0, V, size=(B, S)).astype(np.int32)
        t_lens = np.full(B, T, np.int32)
        s_lens = np.full(B, S, np.int32)
        args = tuple(map(jnp.asarray, (lp, toks, t_lens, s_lens)))
        jax.block_until_ready(args)

        pallas_fn = functools.partial(viterbi_pallas_batch, interpret=False)
        scan_fn = jax.jit(jax.vmap(viterbi_single))

        tp, outp = time_fn(pallas_fn, *args)
        print(f"{name}: B={B} T={T} S={S}  pallas {tp*1e3:.1f} ms/batch")
        if name.startswith("long"):
            ts, outs = time_fn(scan_fn, *args, warmup=1, repeats=2)
            print(f"{name}: scan   {ts*1e3:.1f} ms/batch "
                  f"({ts/tp:.1f}x slower)")
            assert np.array_equal(np.asarray(outp), np.asarray(outs)), \
                "pallas HBM tier != scan paths"
            print("paths bit-identical: True")


if __name__ == "__main__":
    main()
