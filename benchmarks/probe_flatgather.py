#!/usr/bin/env python
"""Probe A: flat 1-D gather vs row-gather + one-hot lane select.

The march's phase-1 structure lookup (`ops/bake._row_gather`) costs
~1.71 ns/idx for the row gather plus ~0.92 ns/idx for the one-hot lane
select (docs/PERFORMANCE.md "Forward budget").  A flat 1-D table of the
same bytes would skip the select entirely IF XLA still VMEM-pins it and
the 1-D gather lowers at row-gather speed.  Same dependent-chain
structure as probe_kchain.py (K=4 design point).

Probe B: chained scatter-add rate vs TARGET table size.  The backward's
per-round scatter runs ~71-142 ns/row into the (88k, 29) grad
accumulator; if a small (VMEM-resident) target scatters much faster, a
two-level gradient accumulation becomes interesting.

Honest timing per CLAUDE.md: perturb per frame, N frames per dispatch,
fetch a value, best-of-n.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.scenes import build_shell_tree
from svox_t_tpu.ops.bake import _row_gather

K = 4
TOTAL_STEPS = 32
B = 1024
N_CHUNKS = 64
N_FRAMES = 8


def time_best(fn, *args, n=4):
    _ = float(fn(*args, jnp.int32(0)))
    times = []
    for it in range(n):
        t0 = time.time()
        _ = float(fn(*args, jnp.int32(it + 1)))
        times.append(time.time() - t0)
    return min(times)


def probe_gather():
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    top = baked.top  # (rows, width) int32
    n_cells = top.shape[0] * top.shape[1]
    top_flat = jnp.reshape(top, (-1,))
    print(f"top table: {top.shape} -> flat ({top_flat.shape[0]},) "
          f"({top.size * 4 / 1e6:.1f} MB)", flush=True)

    rng = np.random.RandomState(0)
    idx0 = jnp.asarray(
        rng.randint(0, n_cells, size=(N_CHUNKS, B)).astype(np.int32))

    def make(kind):
        rounds = TOTAL_STEPS // K

        @jax.jit
        def run(idx0_all, salt):
            def chunk_body(carry, idx0_c):
                def cond(c):
                    return c[0] < rounds

                def body(c):
                    r, idx, acc = c
                    for _ in range(K):
                        if kind == "row":
                            e = _row_gather(top, idx)
                        else:
                            e = top_flat[idx]
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

    for kind in ("row", "flat"):
        fn = make(kind)
        best = time_best(fn, idx0)
        per_idx = best / (N_FRAMES * N_CHUNKS * B * TOTAL_STEPS) * 1e9
        print(f"gather {kind:5s}  best={best*1e3:7.2f} ms  "
              f"per-index={per_idx:6.2f} ns", flush=True)
    # Check S(1) placement of the flat table in a single-dispatch HLO.
    import re
    fn = make("flat")
    txt = fn.lower(idx0, jnp.int32(0)).compile().as_text()
    s1 = len(re.findall(r"S\(1\)", txt))
    print(f"flat variant: {s1} S(1) buffer refs in compiled HLO", flush=True)


def probe_scatter():
    rng = np.random.RandomState(1)
    ROWS_PER_CALL = 4096
    CALLS = 128
    D = 32
    for M in (8192, 32768, 88064, 1048576):
        idx0 = jnp.asarray(
            rng.randint(0, M, size=(CALLS, ROWS_PER_CALL)).astype(np.int32))
        rows = jnp.asarray(
            rng.randn(ROWS_PER_CALL, D).astype(np.float32))

        @jax.jit
        def run(idx_all, rows_, salt, M=M):
            acc0 = jnp.zeros((M, D), jnp.float32)

            def body(acc, idx_c):
                upd = rows_ * (1.0 + 1e-7 * salt)
                acc = acc.at[idx_c].add(upd, mode="drop")
                return acc, None

            acc, _ = jax.lax.scan(body, acc0, idx_all)
            return jnp.sum(acc)

        best = time_best(run, idx0, rows)
        per_row = best / (CALLS * ROWS_PER_CALL) * 1e9
        print(f"scatter target M={M:8d} ({M*D*4/1e6:7.1f} MB)  "
              f"best={best*1e3:7.2f} ms  per-row={per_row:6.1f} ns",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("gather", "both"):
        probe_gather()
    if which in ("scatter", "both"):
        probe_scatter()
