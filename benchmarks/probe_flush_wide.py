#!/usr/bin/env python
"""Wide multi-frame gradient flush: does row-bound scatter survive N*29?

probe_scatter_shape.py measured the bulk gradient flush row-bound from
width 4 to 28 (28.6-28.7 ms at T=1.57M rows regardless). If that holds
to width N*29, N frames' gradient rows can share ONE scatter call (the
destinations are frame-invariant once the sigma>0 test moves from the
index side to the row side) and the 28.6 ms flush amortizes to
28.6/N ms/frame — the lever for VERDICT #3 (tape fwd+bwd 18.2 -> 25).

Measured here, T=1.57M M=88008:
  1. flat (T, N*29) scatter for N in {1,2,4,8,16} — where does
     row-bound break?
  2. operand-(M,N,29) scatter with updates (T,N,29) — same lowering?
  3. the (N,T,29) -> (T,N,29) transpose (the layout the outer-scan
     emission would need) vs per-round emission already in (T,N,29).
  4. N separate width-29 scatters in one program (the do-nothing
     baseline the combine must beat).

MEASURED (v5e, T=1.57M, M=88008, sustained N=4/dispatch, best-of-3):
  see printed table; committed in the commit message after hardware run.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

T = int(os.environ.get("PROBE_T", 1_570_000))
M = int(os.environ.get("PROBE_M", 88_008))
W = 29
N_SUSTAIN = int(os.environ.get("PROBE_N", 4))


def timed(fn, *a):
    _ = float(fn(*a))
    ts = []
    for _i in range(3):
        t0 = time.time()
        _ = float(fn(*a))
        ts.append(time.time() - t0)
    return min(ts) / N_SUSTAIN


@functools.partial(jax.jit, static_argnames=("w",))
def flat_scatter(rows, idx, w):
    def one(i, acc):
        r = rows * (1.0 + 1e-7 * i)
        g = jnp.zeros((M, w), rows.dtype).at[idx].add(r, mode="drop")
        return acc + jnp.sum(g[0])
    return jax.lax.fori_loop(0, N_SUSTAIN, one, jnp.zeros((), rows.dtype))


@functools.partial(jax.jit, static_argnames=("nf",))
def transpose_then_scatter(rows_ntw, idx, nf):
    # The layout the real backward needs: per-frame ys (N, T, W) ->
    # ONE flat (T, N*W) scatter. NOTE (M, N, W)/(T, N, W) shaped
    # scatters are DEAD: T(8,128) pads the minor dim 29 -> 128 (4.4x
    # memory, OOM at nf=16) — flat N*W pads 464 -> 512 only.
    def one(i, acc):
        r = (rows_ntw * (1.0 + 1e-7 * i)).transpose(1, 0, 2).reshape(
            rows_ntw.shape[1], nf * W)
        g = jnp.zeros((M, nf * W), rows_ntw.dtype).at[idx].add(
            r, mode="drop")
        return acc + jnp.sum(g[0])
    return jax.lax.fori_loop(0, N_SUSTAIN, one,
                             jnp.zeros((), rows_ntw.dtype))


@functools.partial(jax.jit, static_argnames=("nf",))
def separate_scatters(rows_ntw, idx, nf):
    def one(i, acc):
        r = rows_ntw * (1.0 + 1e-7 * i)
        s = acc
        for n in range(nf):
            g = jnp.zeros((M, W), rows_ntw.dtype).at[idx].add(
                r[:, n], mode="drop")
            s = s + jnp.sum(g[0])
        return s
    return jax.lax.fori_loop(0, N_SUSTAIN, one,
                             jnp.zeros((), rows_ntw.dtype))


def main():
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, M, size=T).astype(np.int32))
    print(f"T={T} M={M} W={W} sustained N={N_SUSTAIN}")

    for nf in (1, 2, 4, 8, 16):
        rows = jnp.asarray(
            rng.randn(T, nf * W).astype(np.float32) * 0.01)
        dt = timed(flat_scatter, rows, idx, nf * W)
        print(f"flat  (T,{nf*W:3d})          {dt*1e3:7.1f} ms  "
              f"{dt/nf*1e3:6.1f} ms/frame", flush=True)
        del rows

    for nf in (8,):
        rows = jnp.asarray(
            rng.randn(T, nf, W).astype(np.float32) * 0.01)
        dt = timed(separate_scatters, rows, idx, nf)
        print(f"separate {nf:2d}x(T,{W})      {dt*1e3:7.1f} ms  "
              f"{dt/nf*1e3:6.1f} ms/frame", flush=True)
        del rows

    for nf in (8, 16):
        rows = jnp.asarray(
            rng.randn(nf, T, W).astype(np.float32) * 0.01)
        dt = timed(transpose_then_scatter, rows, idx, nf)
        print(f"transpose+flat ({nf},T,{W})->(T,{nf*W}) "
              f"{dt*1e3:7.1f} ms  {dt/nf*1e3:6.1f} ms/frame", flush=True)
        del rows


if __name__ == "__main__":
    main()
