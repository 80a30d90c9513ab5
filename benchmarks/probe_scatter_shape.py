#!/usr/bin/env python
"""Bulk scatter-add cost model: per-ROW or per-BYTE?

The tape backward's floor is ONE bulk scatter-add of ~1.57M gradient
rows (width n_cc+1 = 28 f32 on the headline SH9 scene) into the (M, D)
feature-grad table (~16-18 ns/row, docs/PERFORMANCE.md "Backward
through the tape"). Whether that 16 ns is row-count-bound or
byte-bound decides the next move:

- byte-bound  -> emit FACTORED rows (the color block is the rank-1
  outer product a(3) x basis(9) when no per-voxel rotation —
  ops/render._round_grad_rows) and expand after a narrow flush, or
  bf16 rows: up to ~2-7x.
- row-bound   -> only fewer rows help; factored emission buys nothing
  at the flush (the expansion must materialize wide rows again).

Also measured here: indices_are_sorted/unique_indices flags, bf16 row
payloads, and a two-level sorted-segment reduction (static per-block
one-hot matmul partials + short scatter) as the sorted-emission bound.

MEASURED (v5e, T=1.57M rows, M=88008, sustained N=8 per dispatch,
best-of-3): see the table printed by this script / committed in the
probe's commit message once run on hardware.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

T = int(os.environ.get("PROBE_T", 1_570_000))
M = int(os.environ.get("PROBE_M", 88_008))
N_SUSTAIN = int(os.environ.get("PROBE_N", 8))


@functools.partial(jax.jit, static_argnames=("w", "n", "sorted_", "unique"))
def scatter_sustained(rows, idx, w, n, sorted_=False, unique=False):
    def one(i, acc):
        r = rows * (1.0 + 1e-7 * i)
        g = jnp.zeros((M, w), rows.dtype).at[idx].add(
            r, mode="drop", indices_are_sorted=sorted_,
            unique_indices=unique)
        return acc + jnp.sum(g[0])
    return jax.lax.fori_loop(0, n, one, jnp.zeros((), rows.dtype))


def timed(fn, *a, **k):
    _ = float(fn(*a, **k))
    ts = []
    for _i in range(3):
        t0 = time.time()
        _ = float(fn(*a, **k))
        ts.append(time.time() - t0)
    return min(ts) / N_SUSTAIN


def main():
    rng = np.random.RandomState(0)
    idx_np = rng.randint(0, M, size=T).astype(np.int32)
    idx = jnp.asarray(idx_np)
    print(f"T={T} M={M} sustained N={N_SUSTAIN}")

    for w in (28, 16, 8, 4, 1):
        rows = jnp.asarray(rng.randn(T, w).astype(np.float32))
        dt = timed(scatter_sustained, rows, idx, w, N_SUSTAIN)
        print(f"w={w:3d} f32      {dt*1e3:7.1f} ms  {dt/T*1e9:5.1f} ns/row")

    rows28 = jnp.asarray(rng.randn(T, 28).astype(np.float32))
    dt = timed(scatter_sustained, rows28.astype(jnp.bfloat16), idx, 28,
               N_SUSTAIN)
    print(f"w=28 bf16      {dt*1e3:7.1f} ms  {dt/T*1e9:5.1f} ns/row")

    sidx = jnp.asarray(np.sort(idx_np))
    dt = timed(scatter_sustained, rows28, sidx, 28, N_SUSTAIN)
    print(f"w=28 f32 sorted-idx      {dt*1e3:7.1f} ms")
    dt = timed(scatter_sustained, rows28, sidx, 28, N_SUSTAIN, sorted_=True)
    print(f"w=28 f32 sorted-idx+flag {dt*1e3:7.1f} ms")

    # permutation scatter: unique destinations (pure reorder)
    perm = jnp.asarray(rng.permutation(T).astype(np.int32))
    rows4 = jnp.asarray(rng.randn(T, 4).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("n",))
    def perm_scatter(rows, p, n):
        def one(i, acc):
            r = rows * (1.0 + 1e-7 * i)
            g = jnp.zeros((T, 4), rows.dtype).at[p].set(
                r, mode="drop", unique_indices=True)
            return acc + jnp.sum(g[0])
        return jax.lax.fori_loop(0, n, one, 0.0)

    dt = timed(perm_scatter, rows4, perm, N_SUSTAIN)
    print(f"w=4 f32 permutation-set  {dt*1e3:7.1f} ms  {dt/T*1e9:5.1f} ns/row")

    # Two-level sorted-segment reduction bound: rows arrive SORTED by
    # destination; blocks of 128 rows reduce to <=32 per-block segment
    # partials via a static one-hot matmul, partials scatter-add.
    Tb = (T // 128) * 128
    sid_np = np.sort(idx_np)[:Tb]
    blocks = Tb // 128
    local = np.zeros((blocks, 128), np.int32)
    part_dest = np.full((blocks, 32), M, np.int32)
    overflow = 0
    for b in range(blocks):
        seg = sid_np[b * 128:(b + 1) * 128]
        uniq, inv = np.unique(seg, return_inverse=True)
        k = min(len(uniq), 32)
        overflow += max(0, len(uniq) - 32)
        local[b] = np.minimum(inv, 31)
        part_dest[b, :k] = uniq[:k]
    onehot = np.zeros((blocks, 128, 32), np.float32)
    onehot[np.arange(blocks)[:, None], np.arange(128)[None], local] = 1.0
    print(f"blocks={blocks} overflow_segments={overflow}")
    oh = jnp.asarray(onehot)
    pd = jnp.asarray(part_dest.reshape(-1))
    rows_s = jnp.asarray(rng.randn(Tb, 28).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("n",))
    def two_level(rows, n):
        def one(i, acc):
            r = (rows * (1.0 + 1e-7 * i)).reshape(blocks, 128, 28)
            parts = jnp.einsum("brs,brw->bsw", oh, r).reshape(-1, 28)
            g = jnp.zeros((M, 28), jnp.float32).at[pd].add(
                parts, mode="drop")
            return acc + jnp.sum(g[0])
        return jax.lax.fori_loop(0, n, one, 0.0)

    dt = timed(two_level, rows_s, N_SUSTAIN)
    print(f"two-level sorted bound   {dt*1e3:7.1f} ms "
          f"(partials={blocks*32})")


if __name__ == "__main__":
    main()
