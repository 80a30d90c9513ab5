#!/usr/bin/env python
"""Probe: fast-mode directed empty-skip boxes (RenderOptions.skip_boxes).

Measures sustained fast / opaque-fast throughput on the headline shell
scene with and without the skip, plus the exact path as a control
(skip must not change it at all). Honest relay methodology: perturbed
inputs per frame, value fetch, best-of-n.
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
    from benchmarks.scenes import build_shell_tree, build_opaque_tree, orbit_camera
    from svox_t_tpu.models.renderer import _tile_perm
    from svox_t_tpu.ops.render import cam2world_rays, volume_render

    W = H = 800
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    print("skip_base:", baked.skip_base, file=sys.stderr)

    r = st.VolumeRenderer(tree, step_size=1e-3)
    opt_fast = r._get_options(True)
    assert opt_fast.skip_boxes == 1
    opt_fast_ns = dataclasses.replace(opt_fast, skip_boxes=0)
    opt_exact = r._get_options(False)

    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]
    vdirs = dirs
    n_rays = origins.shape[0]
    NS = 4

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd_sustained(sp, f, o, d, v, opt_):
        def one(i, acc):
            out = volume_render(sp, f * (1.0 + 1e-7 * i), o, d, v, opt_)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, NS, one, 0.0)

    def bench(sp, f, opt_, n_iter=4):
        _ = float(fwd_sustained(sp, f, origins, dirs, vdirs, opt_))
        times = []
        for i in range(n_iter):
            f_i = f * (1.0 + 1e-7 * (i + 1))
            _ = float(jnp.sum(f_i))
            t0 = time.time()
            _ = float(fwd_sustained(sp, f_i, origins, dirs, vdirs, opt_))
            times.append(time.time() - t0)
        return min(times) / NS

    res = {}
    res["fast_skip_ms"] = round(bench(baked, feats, opt_fast) * 1e3, 1)
    res["fast_noskip_ms"] = round(bench(baked, feats, opt_fast_ns) * 1e3, 1)
    res["exact_ms"] = round(bench(baked, feats, opt_exact) * 1e3, 1)

    otree, ofeats = build_opaque_tree(depth=7, data_format="SH9", data_dim=28)
    obaked = otree._baked_spec()
    print("opaque skip_base:", obaked.skip_base, file=sys.stderr)
    res["opaque_skip_ms"] = round(bench(obaked, ofeats, opt_fast) * 1e3, 1)
    res["opaque_noskip_ms"] = round(bench(obaked, ofeats, opt_fast_ns) * 1e3, 1)

    for k in list(res):
        if k.endswith("_ms"):
            res[k.replace("_ms", "_mrays")] = round(n_rays / res[k] / 1e3, 2)
    # Output agreement check (license: small deviation).
    a = volume_render(baked, feats, origins, dirs, vdirs, opt_fast)
    b = volume_render(baked, feats, origins, dirs, vdirs, opt_fast_ns)
    res["fast_skip_max_diff"] = round(float(jnp.max(jnp.abs(a - b))), 5)
    res["fast_skip_mean_diff"] = float(jnp.mean(jnp.abs(a - b)))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
