#!/usr/bin/env python
"""Probe: chunk-size sweep for FAST-mode rendering.

The exact-path measurement (docs/PERFORMANCE.md) found C=1024 optimal:
smaller chunks trade slot waste (~1.6x mid-round) for round plumbing
1:1. Fast mode changes that balance — early ray termination
(stop_thresh) makes per-chunk round counts track the SLOWEST ray in the
chunk, so waste can far exceed 1.6x on opaque scenes. This sweeps
chunk_size (with the matching image tile) over the fast and opaque-fast
workloads to see whether a smaller chunk is the fast-mode design point.

Run on the TPU: python benchmarks/probe_fastchunk.py
"""

import dataclasses
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import svox_t_tpu as st
from benchmarks.scenes import build_opaque_tree, build_shell_tree, orbit_camera
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays, volume_render

N_SUSTAIN = 4
W = H = 800


def sustained_ms(baked, feats, origins, dirs, opt):
    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd_sustained(sp, f, o, d, v, opt_):
        def one(i, acc):
            out = volume_render(sp, f * (1.0 + 1e-7 * i), o, d, v, opt_)
            return acc + jnp.sum(out)

        return jax.lax.fori_loop(0, N_SUSTAIN, one, 0.0)

    _ = float(fwd_sustained(baked, feats, origins, dirs, dirs, opt))  # compile
    times = []
    for i in range(4):
        f_i = feats * (1.0 + 1e-7 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        _ = float(fwd_sustained(baked, f_i, origins, dirs, dirs, opt))
        times.append(time.time() - t0)
    return min(times) / N_SUSTAIN * 1e3


def main():
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    otree, ofeats = build_opaque_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    obaked = otree._baked_spec()
    r = st.VolumeRenderer(tree, step_size=1e-3)
    opt_fast = r._get_options(True)
    c2w = orbit_camera()
    origins0, dirs0 = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    n_rays = origins0.shape[0]

    results = []
    for chunk in (1024, 512, 256, 128):
        tile = max(8, int(np.sqrt(chunk)))
        perm, _ = _tile_perm(W, H, tile)
        origins, dirs = origins0[perm], dirs0[perm]
        opt_c = dataclasses.replace(opt_fast, chunk_size=chunk)
        fast_ms = sustained_ms(baked, feats, origins, dirs, opt_c)
        opaque_ms = sustained_ms(obaked, ofeats, origins, dirs, opt_c)
        rec = {
            "chunk": chunk,
            "tile": tile,
            "fast_ms": round(fast_ms, 1),
            "fast_mrays_s": round(n_rays / fast_ms / 1e3, 2),
            "opaque_ms": round(opaque_ms, 1),
            "opaque_mrays_s": round(n_rays / opaque_ms / 1e3, 2),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)
    best_o = max(results, key=lambda r: r["opaque_mrays_s"])
    best_f = max(results, key=lambda r: r["fast_mrays_s"])
    print(
        json.dumps({"best_fast": best_f["chunk"], "best_opaque": best_o["chunk"]})
    )


if __name__ == "__main__":
    main()
