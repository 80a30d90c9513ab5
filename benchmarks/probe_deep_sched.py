#!/usr/bin/env python
"""Probe: deep-scene (depth-9) chunk sweep under the cost schedule.

C=2048 wins on the shallow headline scenes (probe_chunk_sched.py), but
the deep scene is different on both sides: bf16 runs at HBM gather
speed (no VMEM cliff to trigger, plumbing is a bigger fraction at K=2)
while the int8 pool PINS in VMEM — a 2x round tape could evict it (the
K=8 cliff mechanism). Measure both pools at C=1024/2048.
"""
import dataclasses, functools, json, os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from benchmarks.probe_twophase_run import sustained_ms, W, H
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays, quantize_features
from svox_t_tpu.ops.schedule import cost_order


def main():
    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]
    n_rays = origins.shape[0]

    tree, feats = build_shell_tree(depth=9, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    bf16 = jnp.asarray(feats).astype(jnp.bfloat16)
    qf = quantize_features(jnp.asarray(feats, jnp.float32))
    r = st.VolumeRenderer(tree, step_size=1e-3)
    base = r._get_options(False)
    order = cost_order(baked, origins, dirs, base, feats.shape[0],
                       jnp.asarray(feats)[:, -1])
    o_s, d_s = origins[order], dirs[order]

    from benchmarks.probe_twophase_run import N_SUSTAIN
    from svox_t_tpu.ops.render import volume_render

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd_sustained_q(sp, f, o, d, v, opt_):
        # Perturb the dequant scale per frame: keeps the loop body
        # loop-VARIANT (XLA must not hoist the render) at negligible cost.
        def one(i, acc):
            f_i = f._replace(scale=f.scale * (1.0 + 1e-7 * i))
            return acc + jnp.sum(volume_render(sp, f_i, o, d, v, opt_))
        return jax.lax.fori_loop(0, N_SUSTAIN, one, 0.0)

    def sustained_ms_q(sp, q, o, d, opt, n_iter=3):
        _ = float(fwd_sustained_q(sp, q, o, d, d, opt))
        times = []
        for i in range(n_iter):
            # Perturb the dequant scale (relay cache honesty); int8 rows
            # can't be scalar-scaled in place.
            q_i = q._replace(scale=q.scale * (1.0 + 1e-5 * (i + 1)))
            _ = float(jnp.sum(q_i.scale))
            t0 = time.time()
            _ = float(fwd_sustained_q(sp, q_i, o, d, d, opt))
            times.append(time.time() - t0)
        return min(times) / N_SUSTAIN * 1e3

    res = {}
    for pool, ft in (("bf16", bf16), ("int8", qf)):
        run = sustained_ms_q if pool == "int8" else sustained_ms
        for C in (1024, 2048):
            opt = dataclasses.replace(base, chunk_size=C)
            ms = run(baked, ft, o_s, d_s, opt)
            key = f"{pool}_C{C}"
            res[key] = {"ms": round(ms, 1),
                        "mrays_s": round(n_rays / ms / 1e3, 2)}
            print(json.dumps({key: res[key]}), file=sys.stderr, flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
