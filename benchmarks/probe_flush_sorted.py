#!/usr/bin/env python
"""Destination-sorted gradient flush: static perm gather + two-level.

probe_flush_combine.py killed the NATURAL-order block combine (96-124
distinct destinations per 128-row block on the real headline training
tape — rays rarely share leaves within a round). But the ys destination
stream is STATIC at record time, so the recorder can precompute a
DESTINATION-SORT permutation and the flush becomes

  rows_s = ys[perm_live]          (static gather, drops dead rows too)
  parts  = one_hot(slot) @ rows_s (per-128-block einsum; sorted blocks
                                   have ~T_live/M ~ 14 rows/dest so
                                   CAP=32 overflows never)
  grad   = scatter_add(parts, slot_dest)   (~0.39M rows vs 1.57M)

measured bounds (probe_scatter_shape.py, v5e, T=1.57M M=88k N=8):
  baseline bulk scatter 28.7 ms (row-bound: width 4..28 identical)
  two-level on pre-sorted rows 9.8 ms
This probe measures the missing piece — the static row gather — and the
end-to-end sorted flush on the REAL tape stream, numerics vs baseline.

MEASURED (v5e, headline training tape, T_alloc=1.57M live=1.26M M=88k):
  baseline bulk scatter     28.58 ms
  static live-row gather    32.57 ms (25.8 ns/row)  <- kills the idea
  sorted two-level flush    40.09 ms  (0.71x)  max_rel_err=1.9e-07
  sorted flagged scatter    44.28 ms  (0.65x)
NEGATIVE RESULT: a 1.57M-row permutation gather costs MORE than the
scatter it feeds (HBM row gathers at this size are permutation-hostile,
same mechanism as the render-path reorder finding in CLAUDE.md). The
two-level 9.8 ms bound from probe_scatter_shape.py is only reachable if
rows are PRODUCED in sorted order, which the replay cannot do. The
surviving lever is width-invariance: combine N frames' ys into one
(T, N*(D+1)) scatter — see probe_flush_wide.py / bwd_combine_frames.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import functools

import jax

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from probe_flush_combine import dest_stream

W = H = int(os.environ.get("PROBE_WH", 800))
DEPTH = int(os.environ.get("PROBE_DEPTH", 7))
N_SUSTAIN = int(os.environ.get("PROBE_N", 8))
WIDTH = 28
BS = 128


def build_sorted(dests, M, cap):
    """Static sorted-combine structure. Returns (perm_live, slots,
    slot_dest, over_pos_in_sorted, over_dest, n_blocks)."""
    order = np.argsort(dests, kind="stable")
    live = order[dests[order] < M]          # dead rows dropped
    d = dests[live]
    T = d.size
    nb = -(-T // BS)
    Tp = nb * BS
    dp = np.concatenate([d, np.full(Tp - T, M, np.int32)])
    # block-local slot = rank of destination within its block
    db = dp.reshape(nb, BS)
    slots = np.full((nb, BS), cap, np.int32)
    slot_dest = np.full((nb, cap), M, np.int32)
    over_pos, over_dest = [], []
    for b in range(nb):
        seg = db[b]
        uniq, inv = np.unique(seg[seg < M], return_inverse=True)
        n_live = int((seg < M).sum())
        k = min(len(uniq), cap)
        slot_dest[b, :k] = uniq[:k]
        s = np.minimum(inv, cap - 1) if len(uniq) > cap else inv
        slots[b, :n_live] = s
        if len(uniq) > cap:
            bad = inv >= cap
            over_pos.extend(b * BS + np.nonzero(bad)[0])
            over_dest.extend(seg[:n_live][bad])
    return (live.astype(np.int32), slots, slot_dest.reshape(-1),
            np.asarray(over_pos, np.int64),
            np.asarray(over_dest, np.int32), nb)


def main():
    tree, feats = build_shell_tree(depth=DEPTH, data_format="SH9",
                                   data_dim=28)
    r = st.VolumeRenderer(tree, step_size=1e-3)
    c2w = orbit_camera()
    M = feats.shape[0]
    tape = r.record_persp(c2w, W, H, fx=W * 1.1, features=feats,
                          group_size=1)
    dests = dest_stream(tape, M)
    T = dests.size

    rng = np.random.RandomState(0)
    rows_np = rng.randn(T, WIDTH).astype(np.float32)
    rows_np[dests >= M] = 0.0
    rows = jnp.asarray(rows_np)
    didx = jnp.asarray(dests)

    def timed(fn, *a, **k):
        _ = float(fn(*a, N_SUSTAIN, **k))
        ts = []
        for _i in range(3):
            t0 = time.time()
            _ = float(fn(*a, N_SUSTAIN, **k))
            ts.append(time.time() - t0)
        return min(ts) / N_SUSTAIN

    @functools.partial(jax.jit, static_argnames=("n",))
    def baseline(rows_, idx_, n):
        def one(i, acc):
            rr = rows_ * (1.0 + 1e-7 * i)
            g = jnp.zeros((M, WIDTH), jnp.float32).at[idx_].add(
                rr, mode="drop")
            return acc + jnp.sum(g[0])
        return jax.lax.fori_loop(0, n, one, 0.0)

    dt0 = timed(baseline, rows, didx)
    print(f"baseline bulk scatter   {dt0*1e3:7.2f} ms")
    g_ref = np.asarray(
        jnp.zeros((M, WIDTH), jnp.float32).at[didx].add(rows, mode="drop"))

    t0 = time.time()
    cap = int(os.environ.get("PROBE_CAP", 32))
    perm, slots, sd, op, od, nb = build_sorted(dests, M, cap)
    print(f"sorted build: live={perm.size} blocks={nb} "
          f"partials={nb*cap} overflow={op.size} "
          f"(host {time.time()-t0:.1f}s)")
    permj = jnp.asarray(perm)
    sl = jnp.asarray(slots)
    sdj = jnp.asarray(sd)
    Tl = perm.size
    Tp = nb * BS
    has_over = op.size > 0
    opj = jnp.asarray(op) if has_over else None
    odj = jnp.asarray(od) if has_over else None

    # (a) the static live-row gather alone
    @functools.partial(jax.jit, static_argnames=("n",))
    def gather_only(rows_, n):
        def one(i, acc):
            rr = rows_ * (1.0 + 1e-7 * i)
            g = rr[permj]
            return acc + jnp.sum(g[0])
        return jax.lax.fori_loop(0, n, one, 0.0)

    dtg = timed(gather_only, rows)
    print(f"static live-row gather  {dtg*1e3:7.2f} ms "
          f"({dtg/Tl*1e9:4.1f} ns/row)")

    # (b) gather -> two-level combine end-to-end
    def flush(rr):
        g0 = rr[permj]
        gp = jnp.pad(g0, ((0, Tp - Tl), (0, 0)))
        rb = gp.reshape(nb, BS, WIDTH)
        oh = (sl[:, :, None] == jnp.arange(cap, dtype=jnp.int32)).astype(
            jnp.float32)
        parts = jnp.einsum("brc,brw->bcw", oh, rb,
                           precision=jax.lax.Precision.HIGHEST
                           ).reshape(-1, WIDTH)
        g = jnp.zeros((M, WIDTH), jnp.float32).at[sdj].add(
            parts, mode="drop")
        if has_over:
            g = g.at[odj].add(gp[opj], mode="drop")
        return g

    @functools.partial(jax.jit, static_argnames=("n",))
    def sorted_combine(rows_, n):
        def one(i, acc):
            return acc + jnp.sum(flush(rows_ * (1.0 + 1e-7 * i))[0])
        return jax.lax.fori_loop(0, n, one, 0.0)

    g_c = np.asarray(jax.jit(flush)(rows))
    err = np.abs(g_c - g_ref).max() / (np.abs(g_ref).max() + 1e-30)
    dt1 = timed(sorted_combine, rows)
    print(f"sorted two-level flush  {dt1*1e3:7.2f} ms  ({dt0/dt1:.2f}x)  "
          f"max_rel_err={err:.2e}")

    # (c) gather -> scatter with indices_are_sorted (no combine)
    sidx = jnp.asarray(dests[np.asarray(perm)])

    @functools.partial(jax.jit, static_argnames=("n",))
    def sorted_scatter(rows_, n):
        def one(i, acc):
            rr = (rows_ * (1.0 + 1e-7 * i))[permj]
            g = jnp.zeros((M, WIDTH), jnp.float32).at[sidx].add(
                rr, mode="drop", indices_are_sorted=True)
            return acc + jnp.sum(g[0])
        return jax.lax.fori_loop(0, n, one, 0.0)

    dt2 = timed(sorted_scatter, rows)
    print(f"sorted flagged scatter  {dt2*1e3:7.2f} ms  ({dt0/dt2:.2f}x)")


if __name__ == "__main__":
    main()
