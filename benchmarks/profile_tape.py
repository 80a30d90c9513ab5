#!/usr/bin/env python
"""Device-trace the headline tape replay: where do the ~4.9 ms/frame go?

The flat-program replay's lower bound is the feature gather (~1.6 ns x
1.26M live samples ~= 2 ms). This profiles a sustained 32-frame replay
and aggregates per-op device time to account for the rest (phase-2
radiometry, scan plumbing, finalize/unsort).

Run on the TPU: python benchmarks/profile_tape.py
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import functools

import jax
import jax.numpy as jnp

import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays
from svox_t_tpu.ops import tape as tape_ops
from svox_t_tpu.utils.profiling import device_trace

W = H = 800
N = 32


def main():
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    r = st.VolumeRenderer(tree, step_size=1e-3)
    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]

    opt = dataclasses.replace(r._get_options(False), chunk_size=2048)
    tp = tape_ops.record_tape(baked, feats.shape[0], origins, dirs, dirs,
                              opt, compact=True)
    print(f"tape: {tp.n_chunks} chunks (n_zero {tp.n_zero}), "
          f"{tp.n_samples/1e6:.2f}M live samples, K={tp.prog_K}")

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def sustained(tp_, f, opt_):
        def one(i, acc):
            out = tape_ops.replay_render(
                tp_, f * (1.0 + 1e-7 * i), opt_, unsort=False)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, N, one, 0.0)

    _ = float(sustained(tp, feats, opt))  # warm
    with device_trace("/tmp/tape_trace") as t:
        _ = float(sustained(tp, feats * (1.0 + 1e-8), opt))
    print(t.summary(top=25))
    print(f"total device ms over {N} frames: {t.total_ms:.2f} "
          f"({t.total_ms / N:.3f} ms/frame)")


if __name__ == "__main__":
    main()
