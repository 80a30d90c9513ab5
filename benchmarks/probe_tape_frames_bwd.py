#!/usr/bin/env python
"""End-to-end N-frame batched tape backward (`replay_render_frames`).

The combined wide flush (`_replay_bwd_frames_impl`) batches N frames'
gradient rows into ONE (T, N, D) scatter. This probe measures the real
headline training tape: per-frame fwd+bwd ms for the batched path at
N in {4, 8, 16} vs the sequential per-frame loop, plus a numerics
check (batched grad == per-frame grad).

MEASURED (v5e, headline shell scene, group_size=1 training tape,
K=8/C=2048): see printed table / commit message.
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


@functools.partial(jax.jit, static_argnames=("opt_", "n"))
def fwdbwd_seq(tp, f, opt_, n):
    def one(i, acc):
        g = jax.grad(lambda ff: jnp.sum(tape_ops.replay_render(
            tp, ff, opt_, unsort=False)))(f * (1.0 + 1e-7 * i))
        return acc + jnp.sum(g)
    return jax.lax.fori_loop(0, n, one, 0.0)


@functools.partial(jax.jit, static_argnames=("opt_", "n"))
def fwdbwd_frames(tp, f, opt_, n):
    scales = 1.0 + 1e-7 * jnp.arange(n, dtype=f.dtype)
    fs = f[None] * scales[:, None, None]
    g = jax.grad(lambda ffs: jnp.sum(tape_ops.replay_render_frames(
        tp, ffs, opt_, unsort=False)))(fs)
    return jnp.sum(g)


def bench(fn, tp, feats, opt, n):
    _ = float(fn(tp, feats, opt, n))
    ts = []
    for i in range(3):
        f_i = feats * (1.0 + 1e-7 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        _ = float(fn(tp, f_i, opt, n))
        ts.append(time.time() - t0)
    return min(ts) / n


def main():
    tree, feats = build_shell_tree(depth=7, data_format="SH9",
                                   data_dim=28)
    baked = tree._baked_spec()
    r = st.VolumeRenderer(tree, step_size=1e-3)
    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]
    B = origins.shape[0]

    opt = dataclasses.replace(r._get_options(False), chunk_size=2048,
                              bwd_round_size=8)
    tp = tape_ops.record_tape(baked, feats.shape[0], origins, dirs,
                              dirs, opt, compact=True)
    R = int(tp.bwd_round_chunk.shape[0])
    print(f"B={B} alloc_rows={R * 8 * 2048} "
          f"ys/frame={R * 8 * 2048 * 28 * 4 / 1e6:.0f} MB")

    # numerics: batched == per-frame
    fs = jnp.stack([feats * (1.0 + 1e-4 * i) for i in range(3)])
    gb = jax.grad(lambda ffs: jnp.sum(tape_ops.replay_render_frames(
        tp, ffs, opt, unsort=False)))(fs)
    g0 = jax.grad(lambda f: jnp.sum(tape_ops.replay_render(
        tp, f, opt, unsort=False)))(fs[1])
    err = float(jnp.max(jnp.abs(gb[1] - g0)) /
                jnp.maximum(jnp.max(jnp.abs(g0)), 1e-9))
    print(f"batched-vs-single grad max_rel_err={err:.2e}")

    for n in (4, 8, 16):
        dt_b = bench(fwdbwd_frames, tp, feats, opt, n)
        print(f"N={n:2d} batched    {dt_b*1e3:7.1f} ms/frame  "
              f"{B/dt_b/1e6:6.1f} Mrays/s")
    for n in (8,):
        dt_s = bench(fwdbwd_seq, tp, feats, opt, n)
        print(f"N={n:2d} sequential {dt_s*1e3:7.1f} ms/frame  "
              f"{B/dt_s/1e6:6.1f} Mrays/s")


if __name__ == "__main__":
    main()
