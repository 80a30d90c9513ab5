#!/usr/bin/env python
"""Tape-backward FLUSH strategies in isolation (realistic shapes).

The bulk ys flush (`bwd_bulk_scatter=1`) lands ~1.6M allocated
(K*C x rounds) gradient rows with one scatter-add. But the scatter
DESTINATIONS are static at record time (tape idx + slot validity); the
only runtime-dependent part is the sigma>0 contrib mask, which can be
applied by ZEROING rows instead of redirecting them to the drop index.
A static destination map admits a sort-free alternative:

  sorted_rows = rows[P]            # P = record-time perm by destination
  tot = cumsum(sorted_rows, 0)     # one pass
  grad = tot[ends] - tot[starts]   # (M, D+1) boundary gathers

i.e. pay a 1.6M-row GATHER + a cumsum instead of a 1.6M-row SCATTER
(~18 ns/row). This probe times both flushes (and the scan-only
baseline) on the headline tape's real index distribution.

MEASURED (v5e, headline tape S=1.57M alloc / 1.26M live, M=88k, D+1=29):
  rows-only loop floor                1.63 ms/frame
  bulk scatter-add                   26.97 ms  (~16.1 ns/alloc row)
  perm-gather + cumsum segdiff       75.72 ms  — DEAD: a 29-wide-row
      gather by a random-source perm costs ~47 ns/row at this size,
      3x the scatter it replaces (the 1.7/11.5 ns table-gather rates
      do not apply to MB-scale wide-row reorders)
  cumsum segdiff, gather-free bound  14.75 ms  — even if rows arrived
      pre-sorted (they cannot: ys order is the radiometry chain), the
      ideal sorted reduction wins only 1.7x, and difference-of-prefix
      sums over 1.6M rows carries f32 cancellation the scatter does
      not. The ~16 ns/row bulk scatter is the flush floor.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays
from svox_t_tpu.ops import tape as tape_ops

W = H = 800
N = 16


def bench(fn, rows):
    # Perturb the input per timed call (and per frame inside the fori
    # body) — identical repeat dispatches can be served from the relay
    # cache (CLAUDE.md benchmark-honesty rule).
    _ = float(fn(rows))
    ts = []
    for i in range(3):
        r_i = rows * (1.0 + 1e-6 * (i + 1))
        _ = float(jnp.sum(r_i[0]))
        t0 = time.time()
        _ = float(fn(r_i))
        ts.append(time.time() - t0)
    return min(ts) / N


def main():
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    r = st.VolumeRenderer(tree, step_size=1e-3)
    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]

    opt = dataclasses.replace(
        r._get_options(False), chunk_size=2048, bwd_round_size=8
    )
    tp = tape_ops.record_tape(baked, feats.shape[0], origins, dirs, dirs,
                              opt, compact=True)
    K, C = tp.bwd_prog_K, tp.C
    M, D = feats.shape

    # Static per-ys-position destination: round r -> (chunk c, s0),
    # position (r, k, cc) reads idx_t[c, s0+k, cc].
    idx_t, _, _, _ = tape_ops._pad_tape_to_round(tp, K)
    nz = int(tp.n_zero)
    idx_t = np.asarray(idx_t[nz:])
    counts = np.asarray(tp.counts[nz:])
    rc = np.asarray(tp.bwd_round_chunk)
    rs = np.asarray(tp.bwd_round_s0)
    R = rc.shape[0]
    k = np.arange(K)[:, None]
    slot = rs[:, None, None] + k[None]                      # (R, K, 1)
    valid = slot < counts[rc][:, None, :]                   # (R, K, C)
    # Padded no-op rounds can carry s0 past the tape width (valid is
    # all-false there); clamp for the numpy read.
    slot_c = np.minimum(slot, idx_t.shape[1] - 1)
    idx = idx_t[rc[:, None, None], slot_c, np.arange(C)[None, None, :]]
    dest = np.where(valid & (idx < M), idx, M).reshape(-1)  # (R*K*C,)
    S = dest.shape[0]
    P = np.argsort(dest, kind="stable").astype(np.int32)
    dsort = dest[P]
    starts = np.searchsorted(dsort, np.arange(M)).astype(np.int32)
    ends = np.searchsorted(dsort, np.arange(M), side="right").astype(np.int32)
    live = int((dest < M).sum())
    print(f"S={S/1e6:.2f}M alloc rows, live {live/1e6:.2f}M, M={M}, "
          f"D+1={D + 1}", flush=True)

    dest_d = jnp.asarray(dest)
    P_d = jnp.asarray(P)
    st_d, en_d = jnp.asarray(starts), jnp.asarray(ends)
    rows0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((S, D + 1), np.float32))

    @jax.jit
    def rows_only(rows):
        def one(i, a):
            return a + jnp.sum(rows * (1.0 + 1e-7 * i))
        return jax.lax.fori_loop(0, N, one, 0.0)

    @jax.jit
    def flush_scatter(rows):
        def one(i, a):
            g = jnp.zeros((M, D + 1), jnp.float32).at[dest_d].add(
                rows * (1.0 + 1e-7 * i), mode="drop")
            return a + jnp.sum(g)
        return jax.lax.fori_loop(0, N, one, 0.0)

    @jax.jit
    def flush_segsum(rows):
        def one(i, a):
            srt = (rows * (1.0 + 1e-7 * i))[P_d]
            tot = jnp.cumsum(srt, axis=0, dtype=jnp.float32)
            tot = jnp.concatenate(
                [jnp.zeros((1, D + 1), jnp.float32), tot], axis=0)
            g = tot[en_d] - tot[st_d]
            return a + jnp.sum(g)
        return jax.lax.fori_loop(0, N, one, 0.0)

    @jax.jit
    def flush_segsum_nogather(rows):
        # Upper bound if the perm gather were free: cumsum + boundary
        # diff on rows as-is (wrong values, right cost shape).
        def one(i, a):
            tot = jnp.cumsum(rows * (1.0 + 1e-7 * i), axis=0,
                             dtype=jnp.float32)
            tot = jnp.concatenate(
                [jnp.zeros((1, D + 1), jnp.float32), tot], axis=0)
            g = tot[en_d] - tot[st_d]
            return a + jnp.sum(g)
        return jax.lax.fori_loop(0, N, one, 0.0)

    for name, fn in [("rows-only (loop floor)", rows_only),
                     ("bulk scatter-add", flush_scatter),
                     ("perm-gather + cumsum segdiff", flush_segsum),
                     ("cumsum segdiff, NO gather (bound)",
                      flush_segsum_nogather)]:
        s = bench(fn, rows0)
        print(f"{name}: {s * 1e3:.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
