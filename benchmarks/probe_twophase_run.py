#!/usr/bin/env python
"""Measure the two-phase straggler march (RenderOptions.straggler_rounds)
on the real TPU: sustained ms for exact / fast / opaque-fast at SR in
{0, 2, 3}. Companion to probe_twophase.py (which sized the round-count
bound host-side)."""
import dataclasses, functools, json, os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, build_opaque_tree, orbit_camera
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays, volume_render

N_SUSTAIN = 4
W = H = 800


@functools.partial(jax.jit, static_argnames=("opt_",))
def fwd_sustained(sp, f, o, d, v, opt_):
    def one(i, acc):
        out = volume_render(sp, f * (1.0 + 1e-7 * i), o, d, v, opt_)
        return acc + jnp.sum(out)
    return jax.lax.fori_loop(0, N_SUSTAIN, one, 0.0)


def sustained_ms(baked, feats, origins, dirs, opt, n_iter=4):
    _ = float(fwd_sustained(baked, feats, origins, dirs, dirs, opt))
    times = []
    for i in range(n_iter):
        f_i = feats * (1.0 + 1e-7 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        _ = float(fwd_sustained(baked, f_i, origins, dirs, dirs, opt))
        times.append(time.time() - t0)
    return min(times) / N_SUSTAIN * 1e3


def main():
    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]
    n_rays = origins.shape[0]

    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    otree, ofeats = build_opaque_tree(depth=7, data_format="SH9", data_dim=28)
    obaked = otree._baked_spec()
    r = st.VolumeRenderer(tree, step_size=1e-3)

    res = {}
    for mode, sp, ft, fast in (
        ("exact", baked, feats, False),
        ("fast", baked, feats, True),
        ("opaque_fast", obaked, ofeats, True),
    ):
        base = r._get_options(fast)
        for sr in (0, 2, 3):
            opt = dataclasses.replace(base, straggler_rounds=sr)
            ms = sustained_ms(sp, ft, origins, dirs, opt)
            key = f"{mode}_sr{sr}"
            res[key] = {"ms": round(ms, 1),
                        "mrays_s": round(n_rays / ms / 1e3, 2)}
            print(json.dumps({key: res[key]}), file=sys.stderr, flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
