"""Microbenchmark: int8 MXU rate vs bf16 on this chip (v5e int8 ≈ 2× bf16
peak on paper). Decides whether a quantized serving mode is worth plumbing.

Protocol matches scripts/profile_forward.py: chained dispatches, single
forced fetch, wall/K. Run: PYTHONPATH=. python scripts/probe_int8.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from wav2vec2_tpu.utils.device import ensure_backend

    print(f"platform: {ensure_backend()}", flush=True)
    rng = np.random.default_rng(0)

    def bench(name, fn, *args, k=20):
        fn_j = jax.jit(fn)
        out = fn_j(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)[:8, :8]))
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn_j(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)[:8, :8]))
        dt = (time.perf_counter() - t0) / k
        return dt

    # encoder-shaped: [B*T, H] x [H, FF] (the down/up projection shapes)
    for m, kk, n in [(15968, 768, 3072), (15968, 3072, 768), (4096, 4096, 4096)]:
        a8 = jnp.asarray(rng.integers(-127, 127, (m, kk)), dtype=jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 127, (kk, n)), dtype=jnp.int8)
        abf = jnp.asarray(rng.normal(size=(m, kk)), dtype=jnp.bfloat16)
        bbf = jnp.asarray(rng.normal(size=(kk, n)), dtype=jnp.bfloat16)

        def chain_i8(a, b, w=b8):
            x = a
            y = None
            for i in range(8):
                wi = w if i % 2 == 0 else w.T  # alternate so shapes close
                y = jax.lax.dot_general(
                    x, wi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                # re-quantize so the chain stays int8 (simulates epilogue)
                x = (y >> 8).astype(jnp.int8)
            return y

        def chain_bf(a, b, w=bbf):
            x = a
            y = None
            for i in range(8):
                wi = w if i % 2 == 0 else w.T
                y = jax.lax.dot_general(
                    x, wi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.bfloat16,
                )
                x = y
            return y

        flop = 2.0 * m * kk * n * 8
        t_i8 = bench(f"i8 {m}x{kk}x{n}", chain_i8, a8, b8)
        t_bf = bench(f"bf {m}x{kk}x{n}", chain_bf, abf, bbf)
        print(
            f"{m}x{kk}x{n}: int8 {flop / t_i8 / 1e12:7.1f} TOP/s  "
            f"bf16 {flop / t_bf / 1e12:7.1f} TF/s  "
            f"speedup {t_bf / t_i8:4.2f}x",
            flush=True,
        )

    # dynamic-quant overhead: bf16 in → quantize → int8 matmul → dequant
    m, kk, n = 15968, 768, 3072
    xbf = jnp.asarray(rng.normal(size=(m, kk)), dtype=jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 127, (kk, n)), dtype=jnp.int8)
    wsc = jnp.asarray(rng.uniform(0.01, 0.02, (n,)), dtype=jnp.float32)
    wbf = jnp.asarray(rng.normal(size=(kk, n)), dtype=jnp.bfloat16)

    def qdq_chain(x0, w, ws):
        x = x0
        for _ in range(8):
            amax = jnp.max(jnp.abs(x).astype(jnp.float32), axis=1, keepdims=True)
            xsc = amax / 127.0
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / xsc), -127, 127
            ).astype(jnp.int8)
            y32 = jax.lax.dot_general(
                xq, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (y32.astype(jnp.float32) * xsc * ws[None, :]).astype(jnp.bfloat16)
            x = y[:, : x0.shape[1]]
        return y

    def bf_chain(x0, w):
        x = x0
        for _ in range(8):
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            x = y[:, : x0.shape[1]]
        return y

    flop = 2.0 * m * kk * n * 8
    t_q = bench("qdq", qdq_chain, xbf, w8, wsc)
    t_b = bench("bf", bf_chain, xbf, wbf)
    print(
        f"dynamic-quant e2e {m}x{kk}x{n}: qdq {flop / t_q / 1e12:7.1f} TF-equiv/s  "
        f"bf16 {flop / t_b / 1e12:7.1f} TF/s  speedup {t_b / t_q:4.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    sys.exit(main())
