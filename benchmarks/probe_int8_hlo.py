#!/usr/bin/env python
"""Probe: which buffers pin into scoped VMEM (S(1)) in the deep-scene
int8 march at C=1024 vs C=2048? (The C=2048 int8 win needs a mechanism:
probe_deep_sched.py measured 103.6 -> 69.3 ms while bf16 is flat.)"""
import dataclasses, functools, json, os, re, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import (cam2world_rays, quantize_features,
                                   volume_render)

W = H = 800


def main():
    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]

    tree, feats = build_shell_tree(depth=9, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    qf = quantize_features(jnp.asarray(feats, jnp.float32))
    r = st.VolumeRenderer(tree, step_size=1e-3)
    base = r._get_options(False)

    @functools.partial(jax.jit, static_argnames=("opt_",))
    def fwd_sustained(sp, f, o, d, v, opt_):
        def one(i, acc):
            f_i = f._replace(scale=f.scale * (1.0 + 1e-7 * i))
            return acc + jnp.sum(volume_render(sp, f_i, o, d, v, opt_))
        return jax.lax.fori_loop(0, 4, one, 0.0)

    for C in (1024, 2048):
        opt = dataclasses.replace(base, chunk_size=C)
        txt = (
            fwd_sustained.lower(baked, qf, origins, dirs, dirs, opt)
            .compile().as_text()
        )
        # S(1) = scoped VMEM space; report which big shapes carry it.
        pins = re.findall(r"(\w+\[[0-9,]+\][^ ]*S\(1\)[^ ]*)", txt)
        big = [p for p in pins
               if max([int(x) for x in re.findall(r"\d+", p)[:2]] or [0])
               > 100000]
        from collections import Counter
        print(json.dumps({
            "C": C,
            "n_S1_refs": len(pins),
            "big_S1": dict(Counter(big).most_common(8)),
        }), flush=True)


if __name__ == "__main__":
    main()
