#!/usr/bin/env python
"""Deep-scene (depth-9) tape replay: the march there is 60% structure
gathers from HBM (brick atlas + big top) — exactly what the tape
removes. Remaining: the feature-pool gather (78 MB bf16 / 39 MB int8,
HBM-resident) + radiometry."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from benchmarks.probe_tape_real import replay_sustained, bench_sustained
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays, quantize_features
from svox_t_tpu.ops import tape as tape_ops

W = H = 800


def main():
    tree, dfeats = build_shell_tree(depth=9, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    feats_bf16 = dfeats.astype(jnp.bfloat16)
    r = st.VolumeRenderer(tree, step_size=1e-3)
    opt = dataclasses.replace(r._get_options(False), chunk_size=2048)
    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]
    B = origins.shape[0]

    t0 = time.time()
    tp = tape_ops.record_tape(baked, dfeats.shape[0], origins, dirs, dirs,
                              opt, compact=True)
    jax.block_until_ready(tp.idx)
    rec_s = time.time() - t0
    print(f"record {rec_s:.1f} s (incl. compile)  S={tp.S} "
          f"live={tp.n_samples} ({tp.n_samples/B:.2f}/ray)")

    for label, f in (("bf16", feats_bf16), ("int8", quantize_features(
            dfeats.astype(jnp.float32)))):
        _ = float(replay_sustained(tp, f, opt, False))
        s = bench_sustained(replay_sustained, tp, f, opt, unsort=False)
        print(f"[deep9 {label}] tape replay {s*1e3:.1f} ms "
              f"({B/s/1e6:.1f} Mrays/s)")


if __name__ == "__main__":
    main()
