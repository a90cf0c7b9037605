"""Microbenchmark gather-GEMM strategies for the subm conv hot loop."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

M = 131072
K = 27
CIN = 96
COUT = 96


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.sum(out))
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(M + 1, CIN)).astype(np.float32))
    featsb = feats.astype(jnp.bfloat16)
    # realistic rulebook: mostly-local neighbor indices (sorted coords make
    # neighbor rows near the query row)
    base = np.arange(M)[:, None]
    jitter = rng.integers(-600, 600, size=(M, K))
    rb = np.clip(base + jitter, 0, M - 1)
    absent = rng.random((M, K)) < 0.25
    rb = np.where(absent, M, rb).astype(np.int32)
    rb = jnp.asarray(rb)
    w = jnp.asarray(rng.normal(size=(K, CIN, COUT)).astype(np.float32) * 0.05)
    wb = w.astype(jnp.bfloat16)

    bytes_ideal = M * K * CIN * 2  # bf16 gather traffic
    print(f"ideal gather traffic: {bytes_ideal/1e6:.0f} MB -> "
          f"{bytes_ideal/819e9*1e3:.2f} ms at 819 GB/s")

    @jax.jit
    def mono(featsb, rb, wb):
        g = featsb[rb]  # (M, K, CIN)
        return jnp.einsum("mkc,kco->mo", g, wb,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def mono_chunk(featsb, rb, wb):
        def tile(r):
            return jnp.einsum("mkc,kco->mo", featsb[r], wb,
                              preferred_element_type=jnp.float32)
        out = jax.lax.map(tile, rb.reshape(8, M // 8, K))
        return out.reshape(M, -1)

    @jax.jit
    def per_offset(featsb, rb, wb):
        out = jnp.zeros((M, COUT), jnp.float32)
        for k in range(K):
            g = featsb[rb[:, k]]  # (M, CIN)
            out = out + jnp.dot(g, wb[k], preferred_element_type=jnp.float32)
        return out

    @jax.jit
    def take_rows(featsb, rb):
        # pure gather, no matmul: isolates gather cost
        return jnp.sum(featsb[rb], axis=1)

    print(f"monolithic gather+einsum: {timeit(mono, featsb, rb, wb)*1e3:.1f} ms")
    print(f"chunked (lax.map x8):     {timeit(mono_chunk, featsb, rb, wb)*1e3:.1f} ms")
    print(f"per-offset 27x dot:       {timeit(per_offset, featsb, rb, wb)*1e3:.1f} ms")
    print(f"pure gather (sum axis 1): {timeit(take_rows, featsb, rb)*1e3:.1f} ms")

    flops = 2 * M * K * CIN * COUT
    print(f"matmul flops: {flops/1e12:.2f} TF -> {flops/197e12*1e3:.2f} ms at 197 TFLOPs")


if __name__ == "__main__":
    main()
