"""Head-to-head probe: w2v-BERT relative_key position-term formulations.

Round-3 follow-up to the per-diagonal rewrite (BENCHMARKS.md): the family
re-measure showed w2v-bert-2.0 at 578x vs 1447x before the rewrite, so this
probe times the two formulations in isolation at the serving shape to
attribute the regression.

  gather:   posemb[T, T, hd] (B-independent gather of the small clamped-
            distance table) + einsum "bhld,lrd->bhlr"  (HF torch layout)
  diagonal: e_diag[2T-1, hd] + einsum "bhld,ed->bhle" + _rel_shift skew
            (the round-3 rewrite)

Usage: python scripts/probe_relative_key.py [--batch 32] [--t 499]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--t", type=int, default=499)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--hd", type=int, default=64)
    p.add_argument("--left", type=int, default=64)
    p.add_argument("--right", type=int, default=8)
    p.add_argument("--layers", type=int, default=24,
                   help="chain N applications in one jit (amortizes dispatch)")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from wav2vec2_tpu.models.encoder import _rel_shift

    b, t, nh, hd = args.batch, args.t, args.heads, args.hd
    left, right = args.left, args.right
    dt = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, nh, t, hd), dt)
    table = jax.random.normal(key, (left + right + 1, hd), dt)

    def gather_form(q, table):
        def one(q, _):
            dist = jnp.clip(
                jnp.arange(t)[None, :] - jnp.arange(t)[:, None], -left, right
            )
            posemb = table[dist + left]
            rel = jnp.einsum("bhld,lrd->bhlr", q, posemb,
                             preferred_element_type=dt)
            # consume EVERY output column (a mean over the key axis) so XLA
            # cannot dead-code-eliminate most of the score grid, then fold
            # back into q's shape so layers chain
            return q + rel.mean(-1, keepdims=True) * 1e-3, None
        out, _ = jax.lax.scan(one, q, None, length=args.layers)
        return out

    def diagonal_form(q, table):
        def one(q, _):
            diag = jnp.clip(jnp.arange(-(t - 1), t), -left, right)
            e_diag = table[diag + left]
            rel_wide = jnp.einsum("bhld,ed->bhle", q, e_diag,
                                  preferred_element_type=dt)
            rel = _rel_shift(rel_wide)
            return q + rel.mean(-1, keepdims=True) * 1e-3, None
        out, _ = jax.lax.scan(one, q, None, length=args.layers)
        return out

    def small_table_form(q, table):
        # contract q against the raw 73-row table first ([B, H, T, E] —
        # tiny), then gather that onto the (l, r) grid with the clamped
        # distance index; the only wide tensor is the score-grid-sized
        # gather output itself
        def one(q, _):
            dist = jnp.clip(
                jnp.arange(t)[None, :] - jnp.arange(t)[:, None], -left, right
            )
            qe = jnp.einsum("bhld,ed->bhle", q, table,
                            preferred_element_type=dt)
            rel = jnp.take_along_axis(
                qe, (dist + left)[None, None, :, :], axis=-1
            )
            return q + rel.mean(-1, keepdims=True) * 1e-3, None
        out, _ = jax.lax.scan(one, q, None, length=args.layers)
        return out

    for name, fn in [("gather", gather_form), ("diagonal", diagonal_form),
                     ("smalltab", small_table_form)]:
        jf = jax.jit(fn)
        jf(q, table).block_until_ready()
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            r = jf(q, table)
        r.block_until_ready()
        ms = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:9s} {ms:8.2f} ms / {args.layers} layers "
              f"({ms / args.layers:6.3f} ms/layer)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
