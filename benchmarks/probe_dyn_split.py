#!/usr/bin/env python
"""Dynamic tape loop: where does the per-frame time go?

`render_dynamic_tape_frames` = per frame: LBS warp + construct_tree +
points_leaf_aabb + pack_index_table + indirect replay. Measured
~36.8 ms/frame exact on the bench scene (goal <= 30). This probe times
the components in isolation on the EXACT bench dynamic scene:

  A. full fused dynamic-tape loop (the bench number)
  B. structure-only loop (warp + construct + aabb + pack, no replay)
  C. replay-only loop (fixed table, perturbed features)
  D. replay-only with a DIRECT (non-indirect) tape of the same rays
     against frame-0 occupancy (cost of the resolve gather + union
     occupancy excess)

MEASURED (v5e): printed table; committed in the commit message.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from svox_t_tpu.ops import query as query_ops
from svox_t_tpu.ops import tape as tape_ops
from svox_t_tpu.ops import warp as warp_ops

W = H = 800
N_FRAMES = 4


def main():
    drng = np.random.RandomState(1)
    Q = 20000
    pts = np.clip((0.5 + 0.15 * drng.randn(Q, 3)), 0.2, 0.8).astype(
        np.float32)
    dfeats = jnp.asarray(np.concatenate(
        [drng.rand(Q, 3), 8.0 + drng.rand(Q, 1)], axis=1
    ).astype(np.float32))
    sw = np.stack([1.0 - pts[:, 2], pts[:, 2]], axis=1).astype(np.float32)
    ji = np.tile(np.array([0, 1], np.int32), (Q, 1))
    tree = st.N3Tree(N=2, data_dim=4, depth_limit=6)
    tree.refine(repeats=5)
    tree.construct_tree(jnp.asarray(pts))
    tree.features = dfeats
    dr = st.VolumeRenderer(tree)
    poses = []
    for i in range(N_FRAMES):
        a = 0.5 * np.sin(2 * np.pi * i / N_FRAMES)
        c_, s_ = np.cos(a), np.sin(a)
        rot = np.array([[c_, -s_, 0, 0], [s_, c_, 0, 0], [0, 0, 1, 0],
                        [0, 0, 0, 1]], np.float32)
        poses.append(np.stack([np.eye(4, dtype=np.float32), rot]))
    poses = np.stack(poses)
    src = np.stack([np.eye(4, dtype=np.float32)] * 2)
    c2w = np.array(
        [[-0.8975, 0.1519, -0.4140, 0.5],
         [-0.4393, -0.3582, 0.8237, -0.7],
         [-0.0232, 0.9212, 0.3883, 1.2],
         [0, 0, 0, 1]], np.float32)
    c2w[:3, 3] = np.array([0.5, 0.5, 0.5]) - 2.2 * c2w[:3, 2]

    def timeit(fn, n_iter=3, div=N_FRAMES):
        _ = fn(0)
        ts = []
        for i in range(n_iter):
            t0 = time.time()
            _ = fn(i + 1)
            ts.append(time.time() - t0)
        return min(ts) / div

    # A. full loop
    dt = timeit(lambda i: float(jnp.sum(dr.render_dynamic_tape_frames(
        dfeats * (1.0 + 1e-3 * i), poses, src, pts, sw, ji,
        c2w=c2w, width=W, height=H, fx=W * 1.1, update_tree=False))))
    print(f"A full dyn-tape loop      {dt*1e3:7.1f} ms/frame", flush=True)

    tape = dr.record_dynamic_persp(c2w, poses, src, pts, sw, ji, W, H,
                                   fx=W * 1.1)
    opt = dr._dyn_geom_options(False)
    tree_spec = tree._spec()

    # B. structure-only loop
    @jax.jit
    def structure_only(feats_seed, tgt_poses):
        def body(carry, tgt):
            data_flat, lo, hi = carry
            T = warp_ops.get_transformation_matrix(src, tgt)
            warped, _ = warp_ops.warp_vertices(T, pts, sw, ji)
            spec_t = tree_spec.with_(data_flat=data_flat)
            new_flat = query_ops.construct_tree(spec_t, warped)
            plo, phi = query_ops.points_leaf_aabb(spec_t, warped)
            lo = jnp.minimum(lo, plo)
            hi = jnp.maximum(hi, phi)
            table = tape_ops.pack_index_table(new_flat)
            return (new_flat, lo, hi), jnp.sum(table)

        carry0 = (tree_spec.data_flat + jnp.int32(feats_seed * 0),
                  jnp.ones(3, jnp.float32), jnp.zeros(3, jnp.float32))
        _, s = jax.lax.scan(body, carry0, tgt_poses)
        return jnp.sum(s)

    dt = timeit(lambda i: float(structure_only(
        jnp.float32(i), jnp.asarray(poses) * (1.0 + 1e-6 * i))))
    print(f"B structure-only loop     {dt*1e3:7.1f} ms/frame", flush=True)

    # C. replay-only loop (fixed table)
    table0 = tape_ops.pack_index_table(tree_spec.data_flat)

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def replay_only(f, opt_):
        def one(i, acc):
            out = tape_ops.replay_render(
                tape, f * (1.0 + 1e-5 * i), opt_, tree_spec,
                unsort=True, index_table=table0)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, N_FRAMES, one, 0.0)

    dt = timeit(lambda i: float(replay_only(
        dfeats * (1.0 + 1e-3 * i), opt)))
    print(f"C indirect replay only    {dt*1e3:7.1f} ms/frame  "
          f"(chunks={tape.n_chunks} C={tape.C} S={tape.S})", flush=True)

    # D. direct tape on frame-0 occupancy, same camera
    dr._tape_cache.clear()
    tape_d = dr.record_persp(c2w, W, H, fx=W * 1.1, features=dfeats)

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def replay_direct(f, opt_):
        def one(i, acc):
            out = tape_ops.replay_render(
                tape_d, f * (1.0 + 1e-5 * i), opt_, unsort=True)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, N_FRAMES, one, 0.0)

    opt_d = dr._sched_options(dr._get_options(False)) \
        if hasattr(dr, "_sched_options") else opt
    dt = timeit(lambda i: float(replay_direct(
        dfeats * (1.0 + 1e-3 * i), dr._get_options(False))))
    print(f"D direct replay frame-0   {dt*1e3:7.1f} ms/frame  "
          f"(chunks={tape_d.n_chunks} C={tape_d.C} S={tape_d.S})",
          flush=True)


if __name__ == "__main__":
    main()
