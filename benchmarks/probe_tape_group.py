#!/usr/bin/env python
"""Sweep the tape's output-order GROUP size G on the headline scene.

The ray-level count sort makes chunks length-homogeneous but turns the
output unsort into a 640k-row gather (~3 ms/frame at N=4 — the
difference between probe_tape_real's sorted and unsorted columns).
Sorting GROUPS of G consecutive scanline pixels instead keeps the
unsort a gather of B/G contiguous blocks; the cost is whatever chunk
padding the group-max count key adds. This sweeps G for: allocated
program rounds (padding proxy), sustained replay with and without the
output unsort, and output parity vs the G=1 tape.

Run on the TPU: python benchmarks/probe_tape_group.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.ops import tape as tape_ops
from svox_t_tpu.ops.render import cam2world_rays

W = H = 800
N_SUSTAIN = 4


@functools.partial(jax.jit, static_argnames=("opt", "unsort"))
def replay_sustained(tp, feats, opt, unsort):
    def one(i, acc):
        out = tape_ops.replay_render(
            tp, feats * (1.0 + 1e-7 * i), opt, unsort=unsort)
        return acc + jnp.sum(out)
    return jax.lax.fori_loop(0, N_SUSTAIN, one, 0.0)


def bench(tp, feats, opt, unsort, n_iter=4):
    times = []
    for i in range(n_iter):
        f_i = feats * (1.0 + 1e-6 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        _ = float(replay_sustained(tp, f_i, opt, unsort))
        times.append(time.time() - t0)
    return min(times) / N_SUSTAIN


def main():
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    r = st.VolumeRenderer(tree, step_size=1e-3, chunk_size=2048)
    c2w = orbit_camera()
    B = W * H
    opt = dataclasses.replace(r._get_options(False), chunk_size=2048)

    ref = None
    for G in (1, 8, 16, 32, 64):
        tp = r.record_persp(c2w, W, H, fx=W * 1.1, features=feats,
                            group_size=G)
        jax.block_until_ready(tp.idx)
        rounds = int(tp.round_chunk.shape[0])
        out = np.asarray(tape_ops.replay_render(tp, feats, opt, unsort=True))
        if ref is None:
            ref = out
            dev = 0.0
        else:
            dev = float(np.abs(out - ref).max())
        s_sorted = bench(tp, feats, opt, False)
        s_unsort = bench(tp, feats, opt, True)
        print(f"G={G:4d} blocks={tp.out_blocks[2:]}  "
              f"chunks={tp.n_chunks} (zero {tp.n_zero})  "
              f"rounds={rounds}  live={tp.n_samples}  "
              f"replay {s_sorted*1e3:5.1f} ms ({B/s_sorted/1e6:5.1f} Mrays/s)"
              f"  +unsort {s_unsort*1e3:5.1f} ms ({B/s_unsort/1e6:5.1f})"
              f"  max_dev_vs_G1 {dev:.2e}")


if __name__ == "__main__":
    main()
