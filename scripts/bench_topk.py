"""Microbenchmark: exact top-k strategies for cluster_knn's hot loop.

cluster_knn (ops/knn.py) spends most of its time in `lax.top_k` over the
(row_block=1024, w=9216) window distance matrix. This times, on the real
chip, with the repetition loop INSIDE one jitted program (per-call axon
tunnel latency is ~30-50 ms and would otherwise swamp the measurement):

  a) the current single exact top_k over the full window;
  b) hierarchical exact top-k (per-chunk top_k + top_k of merged candidates);
  c) lax.approx_max_k (the opt-in fast path, for reference).

Run: python scripts/bench_topk.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

RB, W, K = 1024, 9216, 20
INNER = 24  # top_k calls per jitted program


def run(selector, d):
    """Chain INNER dependent top-k calls so per-call dispatch amortizes."""

    def body(i, carry):
        dd, acc = carry
        neg, idx = selector(dd + i * 1e-6)  # data-dependent: no CSE
        return dd, acc + idx.astype(jnp.int32).sum() + neg.sum().astype(jnp.int32)

    _, acc = jax.lax.fori_loop(0, INNER, body, (d, jnp.int32(0)))
    return acc


def timeit(fn, d, iters=3):
    f = jax.jit(fn)
    _ = int(f(d))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        _ = int(f(d))
    return (time.time() - t0) / (iters * INNER)


def main():
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(RB, W)).astype(np.float32))
    n_blocks = 147  # 150528 / 1024

    def flat(dd):
        return jax.lax.top_k(-dd, K)

    def approx(dd):
        return jax.lax.approx_max_k(-dd, K, recall_target=0.95)

    def make_hier(chunk):
        n_chunks = W // chunk

        def hier(dd):
            dc = dd[:, : n_chunks * chunk].reshape(RB, n_chunks, chunk)
            negc, idxc = jax.lax.top_k(-dc, K)
            base = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[None, :, None]
            cand_idx = (idxc + base).reshape(RB, n_chunks * K)
            cand_neg = negc.reshape(RB, n_chunks * K)
            neg, sel = jax.lax.top_k(cand_neg, K)
            return neg, jnp.take_along_axis(cand_idx, sel, axis=1)

        return hier

    t = timeit(lambda dd: run(flat, dd), d)
    print(f"flat top_k  (w={W}):  {t*1e3:7.2f} ms/block "
          f"-> {t*n_blocks*1e3:7.1f} ms/scene-call")
    for chunk in (512, 768, 1024, 1536, 2304):
        t = timeit(lambda dd, c=chunk: run(make_hier(c), dd), d)
        print(f"hier chunk={chunk:5d}:    {t*1e3:7.2f} ms/block "
              f"-> {t*n_blocks*1e3:7.1f} ms/scene-call")
    t = timeit(lambda dd: run(approx, dd), d)
    print(f"approx_max_k:        {t*1e3:7.2f} ms/block "
          f"-> {t*n_blocks*1e3:7.1f} ms/scene-call")


if __name__ == "__main__":
    main()
