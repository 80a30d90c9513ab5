#!/usr/bin/env python
"""Backward-program round-size sweep for the tape VJP.

The flat-program replay (round 3) bakes the backward round size into
the tape (`bwd_prog_K`, from opt.bwd_round_size at record time). With
no structure tables to VMEM-pin, bigger backward rounds amortize the
per-round scatter fixed costs — K=8 measured 52.6 ms fwd+bwd under the
scan-of-whiles replay; re-sweep K under the flat program, and sweep the
frames-per-dispatch amortization (gradient accumulation over N frames,
the multi-frame training shape)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays
from svox_t_tpu.ops import tape as tape_ops

W = H = 800


@functools.partial(jax.jit, static_argnames=("opt_", "n"))
def fwdbwd_sustained(tp, f, opt_, n):
    def one(i, acc):
        g = jax.grad(lambda ff: jnp.sum(tape_ops.replay_render(
            tp, ff, opt_, unsort=False)))(f * (1.0 + 1e-7 * i))
        return acc + jnp.sum(g)
    return jax.lax.fori_loop(0, n, one, 0.0)


def bench(tp, feats, opt, n):
    _ = float(fwdbwd_sustained(tp, feats, opt, n))
    ts = []
    for i in range(3):
        f_i = feats * (1.0 + 1e-7 * (i + 1))
        _ = float(jnp.sum(f_i))
        t0 = time.time()
        _ = float(fwdbwd_sustained(tp, f_i, opt, n))
        ts.append(time.time() - t0)
    return min(ts) / n


def main():
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    r = st.VolumeRenderer(tree, step_size=1e-3)
    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]
    B = origins.shape[0]

    for C in (2048, 4096):
        for Kb in (8, 16, 32):
            opt = dataclasses.replace(
                r._get_options(False), chunk_size=C, bwd_round_size=Kb
            )
            tp = tape_ops.record_tape(baked, feats.shape[0], origins, dirs,
                                      dirs, opt, compact=True)
            s4 = bench(tp, feats, opt, 4)
            s16 = bench(tp, feats, opt, 16)
            print(
                f"C={C} Kbwd={Kb}: fwd+bwd N=4 {s4*1e3:.1f} ms "
                f"({B/s4/1e6:.2f} Mrays/s)  N=16 {s16*1e3:.1f} ms "
                f"({B/s16/1e6:.2f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
