#!/usr/bin/env python
"""Probe: random-pixel minibatch training through row-subset tapes.

The canonical NeRF/Artemis loop samples random rays across a FIXED
camera set each SGD step. ops/tape_subset.py serves it: per step an
in-graph row gather pulls the batch from a ray-major tape source, the
standard tape VJP runs, SGD updates in-dispatch (a true sequential
chain). This probe measures, on the headline shell scene:

  1. per-step cost of train_minibatches at B in {16k, 64k} over a
     4-camera rig source, N steps/dispatch — the VERDICT r05 metric
     (target >= 25 Mrays/s fwd+bwd);
  2. a cost breakdown: subset gather alone, subset fwd alone, fwd+bwd
     (no update), to locate the floor (expected: the bulk gradient
     flush at ~20-45 ns/row);
  3. recompile stability: a second call with FRESH random batches must
     hit the executable cache (r_quant bucketing).

Honesty: the SGD chain is data-dependent (step n+1 replays against
step n's update), so nothing hoists; we fetch the final features' sum.
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
from svox_t_tpu.ops import tape_subset as tsub

W = H = int(os.environ.get("PROBE_WH", 800))
V = int(os.environ.get("PROBE_V", 4))          # cameras in the rig
B = int(os.environ.get("PROBE_B", 65536))      # minibatch rays
N = int(os.environ.get("PROBE_N", 16))         # SGD steps per dispatch
CHUNK = int(os.environ.get("PROBE_CHUNK", 1024))
DEPTH = int(os.environ.get("PROBE_DEPTH", 7))


def main():
    t0 = time.time()
    tree, feats = build_shell_tree(depth=DEPTH, data_format="SH9",
                                   data_dim=28)
    r = st.VolumeRenderer(tree)
    print(f"scene: {time.time()-t0:.1f}s  M={feats.shape[0]}")

    c2ws = np.stack([orbit_camera(theta=0.9 * v, phi=0.3 + 0.1 * v)
                     for v in range(V)])
    t0 = time.time()
    tape = r.record_persp_rig(c2ws, W, H, fx=W * 1.1, features=feats,
                              group_size=1)
    jax.block_until_ready(tape.idx)
    print(f"rig record ({V}x{W}x{H}): {time.time()-t0:.1f}s  "
          f"S={tape.S} C={tape.C} chunks={tape.n_chunks} "
          f"n_zero={tape.n_zero} samples={tape.n_samples}")

    t0 = time.time()
    src = tsub.TapeRowSource(tape)
    jax.block_until_ready(src.packed)
    print(f"row source (packed): {time.time()-t0:.1f}s")

    opt = r._get_options(False)
    spec = tree._baked_spec()
    n_rays = tape.n_rays
    rng = np.random.RandomState(0)

    # Ground-truth targets: replay under the true features (device).
    tgt = tape_ops.replay_render(tape, feats, opt, spec)
    n_color = tgt.shape[1] - 1
    tgt = tgt[:, :n_color]
    jax.block_until_ready(tgt)
    f0 = feats * 0.85

    def batches():
        return np.stack([rng.choice(n_rays, size=B, replace=False)
                         for _ in range(N)])

    # --- 1. full training chain -------------------------------------
    ids = batches()
    t0 = time.time()
    f_out, losses, _ = tsub.train_minibatches(
        src, ids, tgt, f0, opt, lr=0.05, spec=spec, chunk_size=CHUNK,
    )
    _ = float(jnp.sum(f_out))
    print(f"first call (compile + host prep): {time.time()-t0:.1f}s  "
          f"loss {float(losses[0]):.5f} -> {float(losses[-1]):.5f}")

    ts = []
    for it in range(4):
        ids = batches()
        th0 = time.time()
        f_out, losses, _ = tsub.train_minibatches(
            src, ids, tgt, f0 * (1.0 + 1e-6 * it), opt, lr=0.05,
            spec=spec, chunk_size=CHUNK,
        )
        _ = float(jnp.sum(f_out))
        ts.append(time.time() - th0)
    step_s = min(ts) / N
    print(f"train chain: {min(ts)*1e3:.1f} ms / {N} steps = "
          f"{step_s*1e3:.2f} ms/step -> {B/step_s/1e6:.1f} Mrays/s "
          f"(all-call times {[f'{x*1e3:.0f}' for x in ts]})")

    # --- 2. breakdown ------------------------------------------------
    plans = [src.prep(ids[n], chunk_size=CHUNK, r_quant=16)
             for n in range(N)]
    p0 = plans[0]
    n_zero = min(p.n_zero for p in plans)
    print(f"subset layout: S={p0.S} n_chunks={p0.n_chunks} "
          f"n_zero={p0.n_zero} rounds={len(tape_ops._round_program(p0.caps_nz, src.bwd_prog_K, p0.S, 16)[0])} "
          f"(bwd K={src.bwd_prog_K})")

    meta = tsub._SrcMeta.of(src)

    def stack_pos(plns):
        return jnp.asarray(np.stack(
            [p.pos_p[n_zero * p0.C:] for p in plns]).astype(np.int32))

    pos_all = stack_pos(plans)

    @functools.partial(jax.jit,
                       static_argnames=("S", "C", "NC", "nz", "m"))
    def gather_only(pk, pos, S, C, NC, nz, m):
        def one(carry, p):
            arrays = tsub._gather_subset(pk, m, p, S, C, NC, nz, False)
            return carry + jnp.sum(arrays[1]), None
        s, _ = jax.lax.scan(one, 0.0, pos)
        return s

    _ = float(gather_only(src.packed, pos_all, S=p0.S, C=p0.C,
                          NC=p0.n_chunks, nz=n_zero, m=meta))
    ts = []
    for it in range(3):
        pos_i = stack_pos([src.prep(batches()[n], chunk_size=CHUNK,
                                    r_quant=16) for n in range(N)])
        th0 = time.time()
        _ = float(gather_only(src.packed, pos_i, S=p0.S, C=p0.C,
                              NC=p0.n_chunks, nz=n_zero, m=meta))
        ts.append(time.time() - th0)
    print(f"gather only (packed, non-zero suffix): "
          f"{min(ts)/N*1e3:.2f} ms/step")

    # fwd-only and fwd+bwd (no update): one subset tape, scanned replay
    sub = tsub.subset_tape(src, ids[0], chunk_size=CHUNK, r_quant=16)

    @functools.partial(jax.jit, static_argnames=("opt_", "n"))
    def fwd_n(tp, f, opt_, n):
        def one(i, acc):
            out = tape_ops.replay_render(tp, f * (1.0 + 1e-7 * i), opt_,
                                         unsort=False)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, n, one, 0.0)

    @functools.partial(jax.jit, static_argnames=("opt_", "n"))
    def fwdbwd_n(tp, f, opt_, n):
        def one(i, acc):
            g = jax.grad(lambda ff: jnp.sum(tape_ops.replay_render(
                tp, ff, opt_, unsort=False)))(f * (1.0 + 1e-7 * i))
            return acc + jnp.sum(g)
        return jax.lax.fori_loop(0, n, one, 0.0)

    for name, fn in [("fwd", fwd_n), ("fwd+bwd", fwdbwd_n)]:
        _ = float(fn(sub, feats, opt, N))
        ts = []
        for it in range(3):
            f_i = feats * (1.0 + 1e-7 * (it + 1))
            _ = float(jnp.sum(f_i))
            th0 = time.time()
            _ = float(fn(sub, f_i, opt, N))
            ts.append(time.time() - th0)
        print(f"subset {name}: {min(ts)/N*1e3:.2f} ms/step -> "
              f"{B/(min(ts)/N)/1e6:.1f} Mrays/s")

    # round-size / chunk sweep (subset override knobs; regroup license)
    for C in (256, 512, 1024):
        for K in (8, 16, 32):
            subk = tsub.subset_tape(src, ids[0], chunk_size=C,
                                    r_quant=16, prog_K=K, bwd_prog_K=K)
            line = (f"C={C} K={K}: "
                    f"bwdR={int(subk.bwd_round_chunk.shape[0])}")
            for name, fn in [("fwd", fwd_n), ("fwd+bwd", fwdbwd_n)]:
                _ = float(fn(subk, feats, opt, N))
                ts = []
                for it in range(3):
                    f_i = feats * (1.0 + 1e-7 * (it + 1))
                    _ = float(jnp.sum(f_i))
                    th0 = time.time()
                    _ = float(fn(subk, f_i, opt, N))
                    ts.append(time.time() - th0)
                line += f"  {name} {min(ts)/N*1e3:.2f} ms"
            print(line)


if __name__ == "__main__":
    main()
