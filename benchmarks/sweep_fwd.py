#!/usr/bin/env python
"""Sweep render-loop parameters on the real TPU: baked-table row width,
round_size, chunk_size, feature packing. Prints one line per config.

Honest-timing rules per CLAUDE.md: perturb inputs every iteration, fetch
a value depending on the whole result, best-of-n.

Usage: python benchmarks/sweep_fwd.py [fwd|bwd] [n_iter]
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
from svox_t_tpu.ops.render import cam2world_rays, volume_render


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    W = H = 800
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    r = st.VolumeRenderer(tree, step_size=1e-3)
    opt0 = r._get_options(False)
    c2w = orbit_camera()

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd(sp, f, o, d, v, opt_):
        return volume_render(sp, f, o, d, v, opt_)

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwdbwd(sp, f, o, d, v, opt_):
        return jax.grad(
            lambda ff: jnp.sum(volume_render(sp, ff, o, d, v, opt_))
        )(f)

    fn = fwdbwd if mode == "bwd" else fwd

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

    def run(tag, max_rows, round_size, chunk_size, tile=32):
        baked = get_baked(max_rows)
        opt = dataclasses.replace(
            opt0, round_size=round_size, chunk_size=chunk_size
        )
        perm, _ = _tile_perm(W, H, tile)
        origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
        origins, dirs = origins[perm], dirs[perm]
        vdirs = dirs
        t0 = time.time()
        out = fn(baked, feats, origins, dirs, vdirs, opt)
        _ = float(jnp.sum(out))
        compile_s = time.time() - t0
        times = []
        for i in range(n_iter):
            f_i = feats * (1.0 + 1e-7 * (i + 1))
            _ = float(jnp.sum(f_i))
            t0 = time.time()
            res = fn(baked, f_i, origins, dirs, vdirs, opt)
            _ = float(jnp.sum(res))
            times.append(time.time() - t0)
        best = min(times)
        mrays = origins.shape[0] / best / 1e6
        print(
            f"{tag:42s} rows<=2^{max_rows.bit_length()-1} K={round_size:<3d} "
            f"C={chunk_size:<6d} {best*1e3:8.1f} ms {mrays:7.2f} Mrays/s "
            f"(compile {compile_s:.0f}s, top {baked.top.shape}, "
            f"brick {baked.brick.shape})",
            flush=True,
        )
        return best

    configs = [
        ("K=4 C=1024 (default)", 1 << 16, 4, 1024),
        ("K=4 C=2048", 1 << 16, 4, 2048),
        ("K=4 C=4096", 1 << 16, 4, 4096),
        ("K=2 C=1024", 1 << 16, 2, 1024),
        ("K=2 C=2048", 1 << 16, 2, 2048),
        ("K=4 C=2048 tile16", 1 << 16, 4, 2048, 16),
        ("K=6 C=1024", 1 << 16, 6, 1024),
    ]
    for cfg in configs:
        run(*cfg)


def extra_experiments():
    """Follow-ups: relay fixed-overhead quantification (multi-frame calls)
    and width-1 top tables (no one-hot lane select)."""
    W = H = 800
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    r = st.VolumeRenderer(tree, step_size=1e-3)
    opt = dataclasses.replace(r._get_options(False), round_size=4)
    c2w = orbit_camera()
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    origins, dirs = origins[perm], dirs[perm]
    vdirs = dirs
    n_rays = origins.shape[0]

    @functools.partial(jax.jit, static_argnames=("opt_", "k"))
    def fwd_k(sp, f, o, d, v, opt_, k):
        def one(i, acc):
            out = volume_render(sp, f * (1.0 + 1e-7 * i), o, d, v, opt_)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, k, one, 0.0)

    def timed(fn, *args):
        ts = []
        for i in range(4):
            f_i = feats * (1.0 + 1e-7 * (i + 1))
            _ = float(jnp.sum(f_i))
            t0 = time.time()
            _ = float(fn(*args[:1], f_i, *args[2:]))
            ts.append(time.time() - t0)
        return min(ts)

    baked = tree._baked_spec()
    for k in (1, 2, 4):
        dt = timed(fwd_k, baked, feats, origins, dirs, vdirs, opt, k)
        print(
            f"multi-frame x{k}: {dt*1e3:8.1f} ms total, {dt/k*1e3:8.1f} ms/frame,"
            f" {n_rays*k/dt/1e6:7.2f} Mrays/s sustained", flush=True,
        )

    # width-1 top table: no lane select, 2M-row gather operand
    import svox_t_tpu.ops.bake as bake_mod2
    spec = tree._spec()
    import numpy as _np
    old = bake_mod2.bake_arrays
    def baked_w1():
        import types
        src = bake_mod2.bake(spec)
        top_flat = _np.asarray(jax.device_get(src.top)).reshape(-1, 1)
        import dataclasses as _dc
        return _dc.replace(
            src, top=jnp.asarray(top_flat), top_width=1,
        )
    b1 = baked_w1()
    dt = timed(fwd_k, b1, feats, origins, dirs, vdirs, opt, 1)
    print(f"width-1 top ({b1.top.shape}): {dt*1e3:8.1f} ms, {n_rays/dt/1e6:7.2f} Mrays/s", flush=True)
    dt = timed(fwd_k, b1, feats, origins, dirs, vdirs, opt, 4)
    print(f"width-1 top x4: {dt/4*1e3:8.1f} ms/frame, {n_rays*4/dt/1e6:7.2f} Mrays/s sustained", flush=True)


if __name__ == "__main__":
    if os.environ.get("SWEEP_EXTRA"):
        extra_experiments()
    else:
        main()
