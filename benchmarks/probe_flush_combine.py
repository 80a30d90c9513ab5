#!/usr/bin/env python
"""Static block-combine gradient flush for the tape backward.

The tape backward's bulk flush (ONE scatter-add of ~1.57M 28-wide rows,
~16 ns/row) is ~2/3 of the 35 ms fwd+bwd frame and was declared the
floor (docs/PERFORMANCE.md "Backward through the tape"). But the flush
cost is per-ROW (probe_scatter_shape.py), and the ys destination stream
is STATIC at record time for direct tapes once the sigma>0 test moves
from the index side to the row side (a zero row scattered to its true
destination sums identically to a dropped row): the recorder can
pre-group the stream into fixed blocks of BS consecutive ys rows,
assign each row a block-local slot (rows sharing a destination share a
slot), and the flush becomes

  partials = one_hot(slots) @ ys_rows      (per-block einsum, MXU)
  grad     = scatter_add(partials, slot_dest)   (nb*CAP rows << T)
  (+ a tiny static-overflow gather+scatter for blocks with > CAP
   distinct destinations)

Row coherence is REAL on the training tape: consecutive ys rows are
adjacent chunk lanes at one round step; the count sort is stable, so
lanes keep raster adjacency within count classes, and neighboring rays
cross the same leaves.

This probe records the REAL headline training tape (group_size=1, the
bench fwd+bwd configuration), reconstructs the exact static destination
stream the backward scan would emit, prints the block-coherence stats,
and times baseline-vs-combine on the real stream with random row data
(numerics checked allclose — summation order differs, same license as
ladder<->bulk).

MEASURED (v5e): see the committed numbers in the probe's commit
message / docs/PERFORMANCE.md once run on hardware.
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

import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.ops import tape as tape_ops

W = H = int(os.environ.get("PROBE_WH", 800))
DEPTH = int(os.environ.get("PROBE_DEPTH", 7))
N_SUSTAIN = int(os.environ.get("PROBE_N", 8))
WIDTH = 28  # n_cc + 1 on the SH9 headline scene


def dest_stream(tape, M):
    """The exact static ys destination stream of _replay_bwd_impl
    (row -> feature row, M = dropped) in emission order."""
    K = tape.bwd_prog_K
    idx = np.asarray(tape.idx)  # (n_chunks, S, C)
    S = idx.shape[1]
    counts = np.asarray(tape.counts)
    nz = tape.n_zero
    brc = np.asarray(tape.bwd_round_chunk)
    brs = np.asarray(tape.bwd_round_s0)
    Sp = max(K, -(-S // K) * K, int(brs.max()) + K if brs.size else K)
    if Sp != S:
        idx = np.pad(idx, ((0, 0), (0, Sp - S), (0, 0)),
                     constant_values=M)
    idx_t = idx[nz:]
    counts_t = counts[nz:]
    # per round: (K, C) slice, valid = s0 + k < count[lane]
    k = np.arange(K)[:, None]
    dests = []
    for c, s0 in zip(brc, brs):
        sl = idx_t[c, s0:s0 + K, :]
        valid = (s0 + k) < counts_t[c][None, :]
        live = valid & (sl < M) & (sl >= 0)
        dests.append(np.where(live, sl, M).reshape(-1))
    return np.concatenate(dests).astype(np.int32)


def build_combine(dests, M, BS, CAP):
    """Static combine structure: block-local slots, slot destinations,
    overflow row positions."""
    T = dests.size
    Tp = -(-T // BS) * BS
    d = np.concatenate([dests, np.full(Tp - T, M, np.int32)])
    nb = Tp // BS
    d = d.reshape(nb, BS)
    slots = np.full((nb, BS), CAP, np.int32)
    slot_dest = np.full((nb, CAP), M, np.int32)
    over_pos, over_dest = [], []
    distinct = np.zeros(nb, np.int32)
    for b in range(nb):
        seen = {}
        for r in range(BS):
            f = d[b, r]
            if f == M:
                continue
            s = seen.get(f)
            if s is None:
                s = len(seen)
                seen[f] = s
                if s < CAP:
                    slot_dest[b, s] = f
            if s < CAP:
                slots[b, r] = s
            else:
                over_pos.append(b * BS + r)
                over_dest.append(f)
        distinct[b] = len(seen)
    return (slots, slot_dest.reshape(-1),
            np.asarray(over_pos, np.int64), np.asarray(over_dest, np.int32),
            distinct)


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
    live = int((dests < M).sum())
    print(f"T_alloc={T} live={live} M={M} "
          f"(K={tape.bwd_prog_K}, C={tape.C}, rounds={T // (tape.bwd_prog_K * tape.C)})")

    rng = np.random.RandomState(0)
    rows_np = rng.randn(T, WIDTH).astype(np.float32)
    rows_np[dests >= M] = 0.0  # backward zeroes non-contrib rows
    rows = jnp.asarray(rows_np)
    didx = jnp.asarray(dests)

    @functools.partial(jax.jit, static_argnames=("n",))
    def baseline(rows_, idx_, n):
        def one(i, acc):
            rr = rows_ * (1.0 + 1e-7 * i)
            g = jnp.zeros((M, WIDTH), jnp.float32).at[idx_].add(
                rr, mode="drop")
            return acc + jnp.sum(g[0])
        return jax.lax.fori_loop(0, n, one, 0.0)

    def timed(fn, *a, **k):
        _ = float(fn(*a, N_SUSTAIN, **k))
        ts = []
        for _i in range(3):
            t0 = time.time()
            _ = float(fn(*a, N_SUSTAIN, **k))
            ts.append(time.time() - t0)
        return min(ts) / N_SUSTAIN

    dt0 = timed(baseline, rows, didx)
    print(f"baseline bulk scatter  {dt0*1e3:7.2f} ms  "
          f"{dt0/T*1e9:5.1f} ns/alloc-row")
    g_ref = np.asarray(
        jnp.zeros((M, WIDTH), jnp.float32).at[didx].add(rows, mode="drop"))

    for BS in (128, 256):
        for CAP in (8, 16, 32):
            t0 = time.time()
            slots, sd, op, od, distinct = build_combine(dests, M, BS, CAP)
            build_s = time.time() - t0
            nb = slots.shape[0]
            n_over = op.size
            print(f"BS={BS} CAP={CAP}: blocks={nb} partial_rows={nb*CAP} "
                  f"overflow={n_over} "
                  f"distinct p50/p95/max={int(np.percentile(distinct,50))}/"
                  f"{int(np.percentile(distinct,95))}/{distinct.max()} "
                  f"(host build {build_s:.1f}s)")
            if n_over > T // 20:
                print("   -> overflow too large, skip timing")
                continue
            Tp = nb * BS
            sl = jnp.asarray(slots)
            sdj = jnp.asarray(sd)
            opj = jnp.asarray(op) if n_over else None
            odj = jnp.asarray(od) if n_over else None

            @functools.partial(jax.jit, static_argnames=("n", "cap"))
            def combine(rows_, n, cap):
                oh_iota = jnp.arange(cap, dtype=jnp.int32)

                def one(i, acc):
                    rr = rows_ * (1.0 + 1e-7 * i)
                    rp = jnp.pad(rr, ((0, Tp - T), (0, 0)))
                    rb = rp.reshape(nb, BS, WIDTH)
                    oh = (sl[:, :, None] == oh_iota).astype(jnp.float32)
                    parts = jnp.einsum(
                        "brc,brw->bcw", oh, rb,
                        precision=jax.lax.Precision.HIGHEST,
                    ).reshape(-1, WIDTH)
                    g = jnp.zeros((M, WIDTH), jnp.float32).at[sdj].add(
                        parts, mode="drop")
                    if opj is not None:
                        g = g.at[odj].add(rp[opj], mode="drop")
                    return acc + jnp.sum(g[0])
                return jax.lax.fori_loop(0, n, one, 0.0)

            g_c = np.asarray(jax.jit(
                lambda rr: jnp.zeros((M, WIDTH), jnp.float32).at[sdj].add(
                    jnp.einsum(
                        "brc,brw->bcw",
                        (sl[:, :, None] == jnp.arange(CAP)).astype(
                            jnp.float32),
                        jnp.pad(rr, ((0, Tp - T), (0, 0))).reshape(
                            nb, BS, WIDTH),
                        precision=jax.lax.Precision.HIGHEST,
                    ).reshape(-1, WIDTH), mode="drop"
                ).at[odj].add(jnp.pad(rr, ((0, Tp - T), (0, 0)))[opj],
                              mode="drop")
                if n_over else
                jnp.zeros((M, WIDTH), jnp.float32).at[sdj].add(
                    jnp.einsum(
                        "brc,brw->bcw",
                        (sl[:, :, None] == jnp.arange(CAP)).astype(
                            jnp.float32),
                        jnp.pad(rr, ((0, Tp - T), (0, 0))).reshape(
                            nb, BS, WIDTH),
                        precision=jax.lax.Precision.HIGHEST,
                    ).reshape(-1, WIDTH), mode="drop")
            )(rows))
            err = np.abs(g_c - g_ref)
            rel = err.max() / (np.abs(g_ref).max() + 1e-30)
            dt = timed(combine, rows, cap=CAP)
            print(f"   combine flush       {dt*1e3:7.2f} ms  "
                  f"({dt0/dt:.2f}x)  max_rel_err={rel:.2e}")


if __name__ == "__main__":
    main()
