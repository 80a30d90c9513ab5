#!/usr/bin/env python
"""Minimal repro probe for the K=8 dependent-gather anomaly.

A while loop runs `rounds` iterations; each iteration performs K
dependent row-gathers from the REAL headline baked top table (the
gather result feeds the next index — same dependency structure as the
march's phase 1, no radiometry). Total gather steps is fixed at
rounds*K = 32 for every K, so slower K=8 timings can only come from the
in-round chain depth, not from work volume.

Honest timing per CLAUDE.md: perturb inputs per frame, N frames per
dispatch, fetch a value, best-of-n.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import functools

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.scenes import build_shell_tree
from svox_t_tpu.ops.bake import _row_gather

TOTAL_STEPS = 32
B = 1024
N_CHUNKS = 64
N_FRAMES = 8


def main():
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    top = baked.top  # (rows, width) int
    n_cells = top.shape[0] * top.shape[1]
    print(f"top table: {top.shape} {top.dtype} "
          f"({top.size * top.dtype.itemsize / 1e6:.1f} MB)", flush=True)

    rng = np.random.RandomState(0)
    coherent = os.environ.get("COHERENT", "0") == "1"
    window = int(os.environ.get("WINDOW", "2048"))
    if coherent:
        # March-like indices: rays in a chunk cluster in a small window
        # of cells (tile coherence), advancing slowly.
        base = rng.randint(0, n_cells - 2 * window, size=(N_CHUNKS, 1))
        idx0 = jnp.asarray(
            (base + rng.randint(0, window, size=(N_CHUNKS, B))).astype(np.int32)
        )
    else:
        idx0 = jnp.asarray(
            rng.randint(0, n_cells, size=(N_CHUNKS, B)).astype(np.int32)
        )

    def make_fn(K):
        rounds = TOTAL_STEPS // K

        @jax.jit
        def run(idx0_all, salt):
            def chunk_body(carry, idx0_c):
                def cond(c):
                    return c[0] < rounds

                def body(c):
                    r, idx, acc = c
                    for _ in range(K):
                        e = _row_gather(top, idx)
                        if coherent:
                            # advance a few cells, stay in the window
                            idx = (
                                idx + 1 + jnp.abs(e.astype(jnp.int32) + salt) % 3
                            ) % n_cells
                        else:
                            idx = jnp.abs(
                                e.astype(jnp.int32)
                                + idx * jnp.int32(-1640531527) + salt
                            ) % n_cells
                        acc = acc + e.astype(jnp.float32)
                    return r + 1, idx, acc

                _, _, acc = jax.lax.while_loop(
                    cond, body,
                    (jnp.zeros((), jnp.int32), idx0_c,
                     jnp.zeros((B,), jnp.float32)),
                )
                return carry + jnp.sum(acc), None

            def frame(i, tot):
                s, _ = jax.lax.scan(chunk_body, 0.0, idx0_all + i)
                return tot + s

            return jax.lax.fori_loop(0, N_FRAMES, frame, 0.0)

        return run

    results = {}
    for K in (1, 2, 4, 8, 16):
        fn = make_fn(K)
        _ = float(fn(idx0, jnp.int32(0)))  # compile
        times = []
        for it in range(4):
            t0 = time.time()
            _ = float(fn(idx0, jnp.int32(it + 1)))
            times.append(time.time() - t0)
        best = min(times)
        per_idx = best / (N_FRAMES * N_CHUNKS * B * TOTAL_STEPS) * 1e9
        results[K] = per_idx
        print(f"K={K:2d} rounds={TOTAL_STEPS//K:2d}  best={best*1e3:7.2f} ms"
              f"  per-gather-index={per_idx:6.2f} ns", flush=True)


if __name__ == "__main__":
    main()
