#!/usr/bin/env python
"""Probe: raise the XLA scoped-VMEM budget so the baked tables stay
VMEM-pinned at K=8 (the round-2 'K=8 anomaly' = the top table losing its
S(1) placement). Also re-sweeps chunk size under the raised budget.

Usage: XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=<n>" python benchmarks/probe_vmem2.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import dataclasses
import functools
import re

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays, volume_render

N_FRAMES = 4


def main():
    W = H = 800
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
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

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd1(sp, f, o, d, v, opt_):
        return volume_render(sp, f, o, d, v, opt_)

    def pinned(opt):
        txt = fwd1.lower(baked, feats, origins, dirs, vdirs, opt).compile().as_text()
        top_pin = len(re.findall(r"s32\[65536,32\]\{1,0:T\(8,128\)S\(1\)\}", txt))
        ft_pin = len(re.findall(r"f32\[44004,56\]\{1,0:T\(8,128\)S\(1\)\}", txt))
        return top_pin > 0, ft_pin > 0

    def run(tag, K, C):
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
        tp, fp = pinned(opt)
        print(
            f"{tag:28s} {best*1e3:7.1f} ms {n_rays/best/1e9*1e3:7.2f} Mrays/s"
            f"  top-vmem={tp} feat-vmem={fp} (compile {compile_s:.0f}s)",
            flush=True,
        )

    print("XLA_FLAGS:", os.environ.get("XLA_FLAGS", "<none>"), flush=True)
    run("K=4 C=1024", 4, 1024)
    run("K=8 C=1024", 8, 1024)
    run("K=8 C=512", 8, 512)
    run("K=4 C=2048", 4, 2048)
    run("K=6 C=1024", 6, 1024)


if __name__ == "__main__":
    main()
