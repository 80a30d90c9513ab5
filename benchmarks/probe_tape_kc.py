#!/usr/bin/env python
"""Replay round/chunk sweep: the VMEM cliff that pinned the MARCH at
K=4 came from its structure tables; the replay has none (only the
feature pool), so re-sweep K and C for replay fwd and fwd+bwd."""
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
from benchmarks.probe_tape_real import (replay_sustained,
                                        replay_fwdbwd_sustained,
                                        bench_sustained, N_SUSTAIN)
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays
from svox_t_tpu.ops import tape as tape_ops

W = H = 800


def main():
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    r = st.VolumeRenderer(tree, step_size=1e-3)
    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]
    B = origins.shape[0]

    for K, C in ((4, 2048), (8, 2048), (16, 2048), (8, 4096), (4, 1024),
                 (8, 1024)):
        opt = dataclasses.replace(r._get_options(False), chunk_size=C,
                                  round_size=K)
        tp = tape_ops.record_tape(baked, feats.shape[0], origins, dirs,
                                  dirs, opt, compact=True)
        _ = float(replay_sustained(tp, feats, opt, False))
        s = bench_sustained(replay_sustained, tp, feats, opt, unsort=False)
        _ = float(replay_fwdbwd_sustained(tp, feats, opt))
        fb = bench_sustained(replay_fwdbwd_sustained, tp, feats, opt,
                             n_iter=3)
        print(f"K={K} C={C}: fwd {s*1e3:.1f} ms ({B/s/1e6:.1f} Mrays/s)  "
              f"fwd+bwd {fb*1e3:.1f} ms ({B/fb/1e6:.2f})")


if __name__ == "__main__":
    main()
