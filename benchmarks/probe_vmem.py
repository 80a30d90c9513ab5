#!/usr/bin/env python
"""Round-3 experiments around the VMEM-pinning discovery.

The round-2 cost model attributed gather speed to operand ROW COUNT; the
HLO shows the truth: XLA pins small loop-invariant tables into scoped
memory space 1 (VMEM) and those gathers run ~1.7 ns/idx, while HBM
gathers run ~11.5 ns/idx (benchmarks/probe_kchain.py). The "K=8
anomaly" is a VMEM-capacity cliff (bigger round tapes evict the
tables). These experiments re-sweep layout knobs under that model:

  E1: width-1 top table (kills the one-hot lane select per march step)
  E2: unpacked feature pool G=1 (kills the phase-2 lane select)
  E3: K=8 with minimized VMEM scratch
  E4: combinations, sustained-throughput measured

Usage: python benchmarks/probe_vmem.py
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
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops import bake as bake_mod
from svox_t_tpu.ops import render as render_mod
from svox_t_tpu.ops.render import cam2world_rays, volume_render

N_FRAMES = 4


def main():
    W = H = 800
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    r = st.VolumeRenderer(tree, step_size=1e-3)
    opt0 = r._get_options(False)
    c2w = orbit_camera()
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    origins, dirs = origins[perm], dirs[perm]
    vdirs = dirs
    n_rays = origins.shape[0]

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd_sustained(sp, f, o, d, v, opt_):
        def one(i, acc):
            out = volume_render(sp, f * (1.0 + 1e-7 * i), o, d, v, opt_)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, N_FRAMES, one, 0.0)

    baked_cache = {}

    def get_baked(max_rows):
        if max_rows not in baked_cache:
            old = bake_mod.MAX_TABLE_ROWS
            bake_mod.MAX_TABLE_ROWS = max_rows
            try:
                baked_cache[max_rows] = bake_mod.bake(tree._spec())
            finally:
                bake_mod.MAX_TABLE_ROWS = old
        return baked_cache[max_rows]

    def run(tag, max_rows, K, C, feat_rows=None):
        baked = get_baked(max_rows)
        old_fr = render_mod._MAX_FEATURE_ROWS
        if feat_rows is not None:
            render_mod._MAX_FEATURE_ROWS = feat_rows
        try:
            opt = dataclasses.replace(opt0, round_size=K, chunk_size=C)
            t0 = time.time()
            _ = float(fwd_sustained(baked, feats, origins, dirs, vdirs, opt))
            compile_s = time.time() - t0
            times = []
            for i in range(4):
                f_i = feats * (1.0 + 1e-7 * (i + 1))
                _ = float(jnp.sum(f_i))
                t0 = time.time()
                _ = float(fwd_sustained(baked, f_i, origins, dirs, vdirs, opt))
                times.append(time.time() - t0)
            best = min(times) / N_FRAMES
            mrays = n_rays / best / 1e6
            print(
                f"{tag:44s} {best*1e3:7.1f} ms {mrays:7.2f} Mrays/s  "
                f"(top {baked.top.shape}, compile {compile_s:.0f}s)",
                flush=True,
            )
        finally:
            render_mod._MAX_FEATURE_ROWS = old_fr

    run("base: K=4 C=1024 top-w32 feat-G2", 1 << 16, 4, 1024)
    run("E1: top width-1", 1 << 22, 4, 1024)
    run("E2: feat G=1", 1 << 16, 4, 1024, feat_rows=1 << 20)
    run("E1+E2", 1 << 22, 4, 1024, feat_rows=1 << 20)
    run("E3: K=8 (w32/G2)", 1 << 16, 8, 1024)
    run("E4: K=8 + w1 + G1", 1 << 22, 8, 1024, feat_rows=1 << 20)
    run("E5: K=6 + w1 + G1", 1 << 22, 6, 1024, feat_rows=1 << 20)
    run("E6: K=4 + w1 + G1 C=2048", 1 << 22, 4, 2048, feat_rows=1 << 20)


if __name__ == "__main__":
    main()
