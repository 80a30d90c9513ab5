#!/usr/bin/env python
"""Probe: union-occupancy schedule + warm record for the dynamic loop.

Replicates bench.py's dynamic scene (20k-point cloud, 4-frame rotation,
800x800) and measures:
  1. fused loop per-frame ms: tile vs union schedule, exact and fast —
     the round-5 verdict #3 ask (target: exact below ~80 ms/frame);
  2. dynamic tape record cold vs WARM (cache cleared, executables warm)
     — verdict #2 (target: warm <= ~2x the 0.6 s static record, or a
     measured floor);
  3. union plan build time (the extra pre-pass + cost march + argsort).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from benchmarks.scenes import orbit_camera

W = H = int(os.environ.get("PROBE_WH", 800))


def main():
    drng = np.random.RandomState(1)
    Q = 20000
    pts = np.clip(
        (0.5 + 0.15 * drng.randn(Q, 3)), 0.2, 0.8
    ).astype(np.float32)
    dfeats = jnp.asarray(
        np.concatenate(
            [drng.rand(Q, 3), 8.0 + drng.rand(Q, 1)], axis=1
        ).astype(np.float32)
    )
    sw = np.stack([1.0 - pts[:, 2], pts[:, 2]], axis=1).astype(np.float32)
    ji = np.tile(np.array([0, 1], np.int32), (Q, 1))
    dt_tree = st.N3Tree(N=2, data_dim=4, depth_limit=6)
    dt_tree.refine(repeats=5)
    dt_tree.construct_tree(jnp.asarray(pts))
    dt_tree.features = dfeats
    dr = st.VolumeRenderer(dt_tree)
    n_frames = 4
    poses = []
    for i in range(n_frames):
        a = 0.5 * np.sin(2 * np.pi * i / n_frames)
        c_, s_ = np.cos(a), np.sin(a)
        rot = np.array(
            [[c_, -s_, 0, 0], [s_, c_, 0, 0], [0, 0, 1, 0],
             [0, 0, 0, 1]], np.float32,
        )
        poses.append(np.stack([np.eye(4, dtype=np.float32), rot]))
    poses = np.stack(poses)
    src = np.stack([np.eye(4, dtype=np.float32)] * 2)
    c2w = orbit_camera()
    print("scene ready")

    def run(i, fast, schedule):
        outs = dr.render_dynamic_frames(
            dfeats * (1.0 + 1e-3 * i), poses, src, pts, sw, ji,
            c2w=c2w, width=W, height=H, fx=W * 1.1,
            update_tree=False, fast=fast, schedule=schedule,
        )
        return float(jnp.sum(outs))

    for schedule in ("tile", "union"):
        for fast in (False, True):
            t0 = time.time()
            _ = run(0, fast, schedule)
            warm = time.time() - t0
            dts = []
            for i in range(3):
                t0 = time.time()
                _ = run(i + 1, fast, schedule)
                dts.append(time.time() - t0)
            ms = min(dts) / n_frames * 1e3
            print(f"{schedule:6s} fast={int(fast)}: {ms:6.1f} ms/frame "
                  f"({1e3/ms:.1f} fps)  first-call {warm:.1f}s")

    # union plan build time alone (fresh cache)
    dr._plan_cache.clear()
    t0 = time.time()
    _ = dr._plan_dyn_union(c2w, W, H, W * 1.1, W * 1.1, False, poses,
                           src, pts, sw, ji, dfeats)
    print(f"union plan build (warm executables): {time.time()-t0:.2f}s")

    # dynamic tape record: cold then WARM
    t0 = time.time()
    _ = dr.record_dynamic_persp(c2w, poses, src, pts, sw, ji, W, H,
                                fx=W * 1.1)
    print(f"dyn tape record cold: {time.time()-t0:.1f}s")
    dr._tape_cache.clear()
    t0 = time.time()
    _ = dr.record_dynamic_persp(c2w, poses, src, pts, sw, ji, W, H,
                                fx=W * 1.1)
    print(f"dyn tape record WARM: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
