#!/usr/bin/env python
"""Probe: backward-only round/chunk sizing (RenderOptions.bwd_round_size /
bwd_chunk_size).

Hypothesis: the backward march's per-round fixed costs (compaction map +
scatter dispatch, ~90us/round) dominate its 198 ms, and its large live
gradient-row buffers have already evicted the VMEM-pinned tables — so a
larger backward round/chunk should amortize the fixed costs without the
forward's K=8 VMEM cliff. Measures sustained fwd+bwd on the headline
scene across (K_bwd, C_bwd) configs; honest relay methodology.
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


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import svox_t_tpu as st
    from benchmarks.scenes import build_shell_tree, orbit_camera
    from svox_t_tpu.models.renderer import _tile_perm
    from svox_t_tpu.ops.render import cam2world_rays, volume_render

    W = H = 800
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    r = st.VolumeRenderer(tree, step_size=1e-3)
    opt0 = r._get_options(False)

    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]
    vdirs = dirs
    n_rays = origins.shape[0]
    NS = 4

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwdbwd_sustained(sp, f, o, d, v, opt_):
        def one(i, acc):
            g = jax.grad(
                lambda ff: jnp.sum(volume_render(sp, ff, o, d, v, opt_))
            )(f * (1.0 + 1e-7 * i))
            return acc + jnp.sum(g)
        return jax.lax.fori_loop(0, NS, one, 0.0)

    def bench(opt_, n_iter=3):
        _ = float(fwdbwd_sustained(baked, feats, origins, dirs, vdirs, opt_))
        times = []
        for i in range(n_iter):
            f_i = feats * (1.0 + 1e-7 * (i + 1))
            _ = float(jnp.sum(f_i))
            t0 = time.time()
            _ = float(fwdbwd_sustained(baked, f_i, origins, dirs, vdirs, opt_))
            times.append(time.time() - t0)
        return round(min(times) / NS * 1e3, 1)

    configs = [
        ("base_k4_c1024", {}),
        ("k8", {"bwd_round_size": 8}),
        ("k16", {"bwd_round_size": 16}),
        ("k8_c2048", {"bwd_round_size": 8, "bwd_chunk_size": 2048}),
        ("c2048", {"bwd_chunk_size": 2048}),
        ("k16_c2048", {"bwd_round_size": 16, "bwd_chunk_size": 2048}),
    ]
    res = {}
    # gradient-parity guard: every config must match the baseline grads
    g_ref = None
    for name, kw in configs:
        opt_ = dataclasses.replace(opt0, **kw)
        g = jax.jit(
            lambda f, o=opt_: jax.grad(
                lambda ff: jnp.sum(
                    volume_render(baked, ff, origins[:4096], dirs[:4096],
                                  vdirs[:4096], o)
                )
            )(f),
        )(feats)
        if g_ref is None:
            g_ref = g
        else:
            d = float(jnp.max(jnp.abs(g - g_ref)))
            res[name + "_grad_diff"] = d
        res[name + "_ms"] = bench(opt_)
        print(json.dumps({name: res[name + "_ms"]}), file=sys.stderr, flush=True)
    for name, _ in configs:
        res[name + "_mrays"] = round(n_rays / res[name + "_ms"] / 1e3, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
