#!/usr/bin/env python
"""Deep-scene (depth-9) bake-layout sweep under the round-3 VMEM cost
model: a dense 64 MB top cannot be VMEM-pinned (HBM gathers ~11.5
ns/idx); a smaller top (the D>=9 default cap is 2**18 cells -> top=6;
top_levels=7 -> 8 MB also probed here) plus a sparse brick atlas
(surface cells only) can pin BOTH structure stages and leave only the
feature pool in HBM.

Usage: python benchmarks/probe_deep.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import dataclasses
import functools

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops import bake as bake_mod
from svox_t_tpu.ops.render import cam2world_rays, volume_render

N_FRAMES = 4


def main():
    W = H = 800
    tree, feats = build_shell_tree(depth=9, data_format="SH9", data_dim=28)
    spec = tree._spec()
    r = st.VolumeRenderer(tree, step_size=1e-3)
    c2w = orbit_camera()
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    origins, dirs = origins[perm], dirs[perm]
    vdirs = dirs
    n_rays = origins.shape[0]
    print(f"scene: {tree.n_internal} internal, {tree.n_leaves} leaves, "
          f"{feats.shape[0]} features", flush=True)

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd_sustained(sp, f, o, d, v, opt_):
        def one(i, acc):
            out = volume_render(sp, f * (1 + 1e-7 * i), o, d, v, opt_)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, N_FRAMES, one, 0.0)

    def run(tag, top_levels, K, use_bf16):
        baked = bake_mod.bake(spec, top_levels=top_levels)
        f = feats.astype(jnp.bfloat16) if use_bf16 else feats
        opt = dataclasses.replace(r._get_options(False), round_size=K)
        t0 = time.time()
        _ = float(fwd_sustained(baked, f, origins, dirs, vdirs, opt))
        c = time.time() - t0
        ts = []
        for i in range(3):
            fi = f * (1 + 1e-7 * (i + 1))
            _ = float(jnp.sum(fi))
            t0 = time.time()
            _ = float(fwd_sustained(baked, fi, origins, dirs, vdirs, opt))
            ts.append(time.time() - t0)
        best = min(ts) / N_FRAMES
        top_mb = baked.top.size * 4 / 1e6
        brick_mb = baked.brick.size * 4 / 1e6
        print(
            f"{tag:34s} {best*1e3:7.1f} ms {n_rays/best/1e6:6.2f} Mrays/s"
            f"  (top {top_mb:5.1f} MB, brick {brick_mb:5.1f} MB,"
            f" compile {c:.0f}s)",
            flush=True,
        )

    # NOTE: pass top_levels explicitly — with the D>=9 cap (2**18 cells)
    # the default now bakes top=6, so `None` is no longer the round-2
    # top=8 baseline this sweep originally compared against.
    run("default (now top=6 cap) K=2 bf16", None, 2, True)
    run("top=8 K=2 bf16 (round-2 baseline)", 8, 2, True)
    run("top=7 K=2 bf16", 7, 2, True)
    run("top=7 K=4 bf16", 7, 4, True)
    run("top=6 K=4 bf16", 6, 4, True)
    run("top=7 K=4 f32", 7, 4, False)


if __name__ == "__main__":
    main()
