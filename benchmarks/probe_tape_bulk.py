#!/usr/bin/env python
"""Tape-backward scatter strategy: per-round tiered ladder vs bulk flush.

The flat-program replay emits rounds from one lax.scan; the backward
can therefore emit each round's gradient rows as scan OUTPUTS (ys —
written once, never carried) and flush them with ONE bulk scatter-add
(`RenderOptions.bwd_bulk_scatter`). The round-2 global gradient tape
lost 1.5x to scan-CARRY copies; ys rows have no carry, and tape rows
are length-homogeneous (padding 1.07-1.12x live), so the bulk flush
should pay ~18 ns/allocated row against the ladder's ~42-79 ns/live
row. Sweep the strategy x backward round size x frames-per-dispatch.

Grads are bitwise-identical between strategies up to scatter-add
summation order (CPU check: exactly equal on the probe scene).

MEASURED (v5e, headline scene, ms fwd+bwd per frame at N=4 / N=16
frames per dispatch):
  K=4  bulk (1.77M alloc)  43.9 / 39.7
  K=6  bulk (1.77M alloc)  43.8 / 39.4
  K=8  ladder (1.57M)      50.4 / 46.0
  K=8  bulk (1.57M alloc)  39.8 / 35.3   <- design point (18.1 Mrays/s)
  K=10 bulk (1.97M alloc)  47.5 / 42.9
  K=12 bulk (2.36M alloc)  55.3 / 50.8
  K=16 bulk (2.10M alloc)  49.4 / 44.8
Performance tracks ALLOCATED rows exactly (the ~16 ns/row flush is the
floor; the program-ladder padding makes K=8 the alloc minimum on this
tape), confirming the flush-floor model in docs/PERFORMANCE.md.
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

    C = 2048
    for Kb in (4, 6, 8, 10, 12, 16):
        opt0 = dataclasses.replace(
            r._get_options(False), chunk_size=C, bwd_round_size=Kb
        )
        tp = tape_ops.record_tape(baked, feats.shape[0], origins, dirs,
                                  dirs, opt0, compact=True)
        n_alloc = int(tp.bwd_round_chunk.shape[0]) * Kb * C
        for bulk in ((0, 1) if Kb == 8 else (1,)):
            opt = dataclasses.replace(opt0, bwd_bulk_scatter=bulk)
            s4 = bench(tp, feats, opt, 4)
            s16 = bench(tp, feats, opt, 16)
            print(
                f"Kbwd={Kb} bulk={bulk} (alloc rows {n_alloc/1e6:.2f}M): "
                f"fwd+bwd N=4 {s4*1e3:.1f} ms ({B/s4/1e6:.2f} Mrays/s)  "
                f"N=16 {s16*1e3:.1f} ms ({B/s16/1e6:.2f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
