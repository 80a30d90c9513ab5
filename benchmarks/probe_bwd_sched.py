#!/usr/bin/env python
"""Probe: fwd+bwd chunk-size sweep UNDER the cost-ordered schedule.

Tile-order data (probe_bwd.py) showed C=2048 losing badly (399 vs
240 ms) — but that predates the schedule. Cost-homogeneous chunks halve
the scan steps and amortize per-round fixed costs, while the backward's
scatter tiers grow with C; measure which effect wins. Also tries the
mixed design point (fwd chunks 2048, backward march forced back to
1024 via bwd_chunk_size).
"""
import dataclasses, functools, json, os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays, volume_render
from svox_t_tpu.ops.schedule import cost_order

W = H = 800
N_SUSTAIN = 4


def sustained_bwd_ms(sp, feats, o, d, opt):
    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwdbwd_sustained(sp_, f, o_, d_, opt_):
        def one(i, acc):
            g = jax.grad(
                lambda ff: jnp.sum(volume_render(sp_, ff, o_, d_, d_, opt_))
            )(f * (1.0 + 1e-7 * i))
            return acc + jnp.sum(g)
        return jax.lax.fori_loop(0, N_SUSTAIN, one, 0.0)

    _ = float(fwdbwd_sustained(sp, feats, o, d, opt))
    times = []
    for i in range(3):
        f_i = feats * (1.0 + 1e-7 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        _ = float(fwdbwd_sustained(sp, f_i, o, d, opt))
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
    r = st.VolumeRenderer(tree, step_size=1e-3)
    base = r._get_options(False)
    order = cost_order(baked, origins, dirs, base, feats.shape[0],
                       jnp.asarray(feats)[:, -1])
    o_s, d_s = origins[order], dirs[order]

    res = {}
    for name, kw in (
        ("C1024", {}),
        ("C2048", {"chunk_size": 2048}),
        ("C2048_bwd1024", {"chunk_size": 2048, "bwd_chunk_size": 1024}),
    ):
        opt = dataclasses.replace(base, **kw)
        ms = sustained_bwd_ms(baked, feats, o_s, d_s, opt)
        res[name] = {"ms": round(ms, 1),
                     "mrays_s": round(n_rays / ms / 1e3, 2)}
        print(json.dumps({name: res[name]}), file=sys.stderr, flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
