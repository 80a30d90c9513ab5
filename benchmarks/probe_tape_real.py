#!/usr/bin/env python
"""Measure the REAL recorded-tape replay on the headline scene (TPU).

Reports: record cost (count+record walks, the per-camera one-off),
sustained replay throughput (exact, fast, opaque-fast; compact and
uncompacted), unsort-gather cost, and fwd+bwd through the tape VJP.
Compare against bench.py's march numbers (exact 27.4 ms / fast 18.3 /
opaque-fast 11.4 / fwd+bwd 196 ms sustained).
"""
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
from benchmarks.scenes import build_shell_tree, build_opaque_tree, orbit_camera
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays
from svox_t_tpu.ops import tape as tape_ops

W = H = 800
N_SUSTAIN = 4


@functools.partial(jax.jit, static_argnames=("opt", "unsort"))
def replay_once(tp, feats, opt, unsort):
    return tape_ops.replay_render(tp, feats, opt, unsort=unsort)


def _perturb(feats, i):
    # Quantized pools perturb the dequant scale (loop-variant body —
    # the XLA hoisting trap, docs/PERFORMANCE.md).
    if isinstance(feats, tuple):
        return feats._replace(scale=feats.scale * (1.0 + 1e-7 * i))
    return feats * (1.0 + 1e-7 * i)


@functools.partial(jax.jit, static_argnames=("opt", "unsort"))
def replay_sustained(tp, feats, opt, unsort):
    def one(i, acc):
        out = tape_ops.replay_render(tp, _perturb(feats, i), opt,
                                     unsort=unsort)
        return acc + jnp.sum(out)
    return jax.lax.fori_loop(0, N_SUSTAIN, one, 0.0)


@functools.partial(jax.jit, static_argnames=("opt",))
def replay_fwdbwd_sustained(tp, feats, opt):
    def one(i, acc):
        g = jax.grad(lambda f: jnp.sum(
            tape_ops.replay_render(tp, f, opt, unsort=False)))(
                feats * (1.0 + 1e-7 * i))
        return acc + jnp.sum(g)
    return jax.lax.fori_loop(0, N_SUSTAIN, one, 0.0)


def bench_sustained(fn, tp, feats, opt, n_iter=4, **kw):
    times = []
    for i in range(n_iter):
        f_i = _perturb(feats, i + 1)
        _ = float(jnp.sum(f_i.scale if isinstance(f_i, tuple) else f_i))
        t0 = time.time()
        _ = float(fn(tp, f_i, opt, **kw))
        times.append(time.time() - t0)
    return min(times) / N_SUSTAIN


def main():
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    r = st.VolumeRenderer(tree, step_size=1e-3)
    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]
    B = origins.shape[0]

    def measure(label, spec, f, fast, compact, C):
        opt = dataclasses.replace(
            r._get_options(fast), chunk_size=C)
        t0 = time.time()
        tp = tape_ops.record_tape(spec, f.shape[0], origins, dirs, dirs,
                                  opt, compact=compact)
        jax.block_until_ready(tp.idx)
        rec_s = time.time() - t0
        # warm (compile)
        _ = float(jnp.sum(replay_once(tp, f, opt, False)))
        _ = float(replay_sustained(tp, f, opt, False))
        s_sorted = bench_sustained(replay_sustained, tp, f, opt, unsort=False)
        _ = float(replay_sustained(tp, f, opt, True))
        s_unsort = bench_sustained(replay_sustained, tp, f, opt, unsort=True)
        print(f"[{label} compact={compact} C={C}] record {rec_s*1e3:.0f} ms "
              f"(one-off)  S={tp.S} live={tp.n_samples}  "
              f"replay {s_sorted*1e3:.1f} ms ({B/s_sorted/1e6:.1f} Mrays/s)  "
              f"unsorted; {s_unsort*1e3:.1f} ms ({B/s_unsort/1e6:.1f}) w/ "
              f"output unsort")
        return tp, opt

    # exact
    tp, opt = measure("exact", baked, feats, False, True, 2048)
    measure("exact", baked, feats, False, False, 2048)

    # production pixel-order path: record_persp's 4x8 block sort makes
    # the unsort a near-free block gather (probe_tape_group.py sweep)
    tpb = r.record_persp(c2w, W, H, fx=W * 1.1, features=feats)
    _ = float(replay_sustained(tpb, feats, opt, True))
    s_blk = bench_sustained(replay_sustained, tpb, feats, opt, unsort=True)
    print(f"[exact block-group G={tpb.group} {tpb.out_blocks[2:]}] "
          f"pixel-order replay {s_blk*1e3:.1f} ms "
          f"({B/s_blk/1e6:.1f} Mrays/s)")
    # fwd+bwd through the tape VJP (exact single-pass)
    opt_b = dataclasses.replace(opt, bwd_chunk_size=0)
    _ = float(replay_fwdbwd_sustained(tp, feats, opt_b))
    fb = bench_sustained(replay_fwdbwd_sustained, tp, feats, opt_b, n_iter=3)
    print(f"[exact fwd+bwd via tape] {fb*1e3:.1f} ms "
          f"({B/fb/1e6:.2f} Mrays/s)")

    # fast
    measure("fast", baked, feats, True, True, 2048)

    # opaque-fast
    otree, ofeats = build_opaque_tree(depth=7, data_format="SH9", data_dim=28)
    obaked = otree._baked_spec()
    r_o = st.VolumeRenderer(otree, step_size=1e-3)
    opt_o = dataclasses.replace(r_o._get_options(True), chunk_size=2048)
    t0 = time.time()
    tpo = tape_ops.record_tape(obaked, ofeats.shape[0], origins, dirs, dirs,
                               opt_o, compact=True)
    jax.block_until_ready(tpo.idx)
    rec_s = time.time() - t0
    _ = float(replay_sustained(tpo, ofeats, opt_o, False))
    s = bench_sustained(replay_sustained, tpo, ofeats, opt_o, unsort=False)
    print(f"[opaque-fast compact C=2048] record {rec_s*1e3:.0f} ms  "
          f"S={tpo.S} live={tpo.n_samples}  replay {s*1e3:.1f} ms "
          f"({B/s/1e6:.1f} Mrays/s)")


if __name__ == "__main__":
    main()
