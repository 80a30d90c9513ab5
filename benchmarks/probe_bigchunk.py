#!/usr/bin/env python
"""Probe: LARGER chunks under fast+skip-box modes.

probe_slots.py showed the skip-box march leaves ~8 ms of slot work in
an 18 ms opaque-fast render — per-chunk fixed costs (scan plumbing,
while bookkeeping) now rival the slots. Smaller chunks were measured
dead (probe_fastchunk.py); this sweeps LARGER ones (2048/4096, with
matching square-ish tiles) where straggler waste rises but chunk count
halves/quarters. Exact mode re-checked as a control.
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
    scenes = {}
    t1, f1 = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    scenes["shell"] = (t1._baked_spec(), f1, st.VolumeRenderer(t1, step_size=1e-3))
    t2, f2 = build_opaque_tree(depth=7, data_format="SH9", data_dim=28)
    scenes["opaque"] = (t2._baked_spec(), f2, None)

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd_sustained(sp, f, o, d, v, opt_):
        def one(i, acc):
            out = volume_render(sp, f * (1.0 + 1e-7 * i), o, d, v, opt_)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, NS, one, 0.0)

    def bench(sp, f, o, d, opt_, n_iter=4):
        _ = float(fwd_sustained(sp, f, o, d, d, opt_))
        ts = []
        for i in range(n_iter):
            f_i = f * (1.0 + 1e-7 * (i + 1)); _ = float(jnp.sum(f_i))
            t0 = time.time()
            _ = float(fwd_sustained(sp, f_i, o, d, d, opt_))
            ts.append(time.time() - t0)
        return round(min(ts) / NS * 1e3, 1)

    r = scenes["shell"][2]
    opt_fast = r._get_options(True)
    opt_exact = r._get_options(False)
    res = {}
    for C, tile in [(1024, 32), (2048, 45), (4096, 64), (8192, 90)]:
        perm, _ = _tile_perm(W, H, tile)
        o, d = cam2world_rays(c2w, W, H, fx=W*1.1, fy=W*1.1)
        o, d = o[perm], d[perm]
        for scene in ("shell", "opaque"):
            sp, f, _ = scenes[scene]
            opt_ = dataclasses.replace(opt_fast, chunk_size=C)
            res[f"{scene}_fast_c{C}_ms"] = bench(sp, f, o, d, opt_)
            print(json.dumps({f"{scene}_fast_c{C}": res[f"{scene}_fast_c{C}_ms"]}),
                  file=sys.stderr, flush=True)
        if C in (2048, 4096):
            opt_ = dataclasses.replace(opt_exact, chunk_size=C)
            res[f"shell_exact_c{C}_ms"] = bench(scenes["shell"][0], scenes["shell"][1], o, d, opt_)
            print(json.dumps({f"shell_exact_c{C}": res[f"shell_exact_c{C}_ms"]}),
                  file=sys.stderr, flush=True)
    print(json.dumps(res))

if __name__ == "__main__":
    main()
