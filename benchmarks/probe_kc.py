#!/usr/bin/env python
"""Probe: JOINT (round size K, chunk size C) sweep under the cost
schedule, holding K*C (slots per round / phase-2 width) constant.

probe_k_sched.py swept K at fixed C=2048 and found exact/fast flat:
smaller K cuts the ceil(n/K) rounding waste (~+K/2 slots/ray) but
doubles the per-round while plumbing. Holding K*C constant instead
keeps phase-2 width and per-round plumbing amortization unchanged while
still halving the rounding waste — the combination the flat K sweep
could not see. Sweeps (K=4,C=2048) baseline, (2,4096), (2,3072),
(1,4096), (1,8192) for exact + opaque-fast.
"""
import dataclasses, json, os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, build_opaque_tree, orbit_camera
from benchmarks.probe_twophase_run import sustained_ms, W, H
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays
from svox_t_tpu.ops.schedule import cost_order


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
        ("opaque_fast", obaked, ofeats, True),
    ):
        base = r._sched_options(r._get_options(fast))
        order = cost_order(sp, origins, dirs, base, ft.shape[0],
                           jnp.asarray(ft)[:, -1])
        o_s, d_s = origins[order], dirs[order]
        for K, C in ((4, 2048), (2, 4096), (2, 3072), (1, 4096), (1, 8192)):
            opt = dataclasses.replace(base, round_size=K, chunk_size=C)
            ms = sustained_ms(sp, ft, o_s, d_s, opt)
            key = f"{mode}_K{K}_C{C}"
            res[key] = {"ms": round(ms, 1),
                        "mrays_s": round(n_rays / ms / 1e3, 2)}
            print(json.dumps({key: res[key]}), file=sys.stderr, flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
