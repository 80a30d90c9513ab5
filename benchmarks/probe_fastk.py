#!/usr/bin/env python
"""Probe: round size K under fast+skip-box modes.

With skip boxes, the opaque-fast march's p95 step count is 7
(probe_slots.py) and per-round fixed costs (~45us: op dispatches +
while bookkeeping) dominate over slot work — so a larger K could
finish most chunks in one round. The exact-path K=8 VMEM cliff was
measured with the exact forward's larger live set; fast mode's differs.
"""
import dataclasses, functools, json, os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax, jax.numpy as jnp, numpy as np

def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import svox_t_tpu as st
    from benchmarks.scenes import build_shell_tree, build_opaque_tree, orbit_camera
    from svox_t_tpu.models.renderer import _tile_perm
    from svox_t_tpu.ops.render import cam2world_rays, volume_render

    W = H = 800
    NS = 4
    c2w = orbit_camera()
    o, d = cam2world_rays(c2w, W, H, fx=W*1.1, fy=W*1.1)
    perm, _ = _tile_perm(W, H, 32)
    o, d = o[perm], d[perm]

    t1, f1 = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    b1 = t1._baked_spec()
    t2, f2 = build_opaque_tree(depth=7, data_format="SH9", data_dim=28)
    b2 = t2._baked_spec()
    r = st.VolumeRenderer(t1, step_size=1e-3)
    opt_fast = r._get_options(True)

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd_sustained(sp, f, o_, d_, v, opt_):
        def one(i, acc):
            out = volume_render(sp, f * (1.0 + 1e-7 * i), o_, d_, v, opt_)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, NS, one, 0.0)

    def bench(sp, f, opt_, n_iter=4):
        _ = float(fwd_sustained(sp, f, o, d, d, opt_))
        ts = []
        for i in range(n_iter):
            f_i = f * (1.0 + 1e-7 * (i + 1)); _ = float(jnp.sum(f_i))
            t0 = time.time()
            _ = float(fwd_sustained(sp, f_i, o, d, d, opt_))
            ts.append(time.time() - t0)
        return round(min(ts) / NS * 1e3, 1)

    res = {}
    for K in (4, 6, 8, 12, 16):
        opt_ = dataclasses.replace(opt_fast, round_size=K)
        res[f"shell_fast_k{K}_ms"] = bench(b1, f1, opt_)
        res[f"opaque_fast_k{K}_ms"] = bench(b2, f2, opt_)
        print(json.dumps({f"k{K}": [res[f"shell_fast_k{K}_ms"],
                                    res[f"opaque_fast_k{K}_ms"]]}),
              file=sys.stderr, flush=True)
    print(json.dumps(res))

if __name__ == "__main__":
    main()
