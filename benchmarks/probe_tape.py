#!/usr/bin/env python
"""Probe: recorded-sample-tape replay — is it the exact-forward step change?

The march pays ~5.6 ns/slot of which ~2.6 is the structure walk (top
gather + lane select) plus ~0.75 loop plumbing and ~1.6x slot waste.
A RECORDED TAPE (per camera x structure version, like the cost plan)
stores each ray's sample sequence (data_idx, dt) once; per-frame
rendering replays only the radiometry: dynamic-slice tape reads (no
structure gathers), one feature gather per round, same phase-2 math.

Two variants:
  * uncompacted — every sample the march takes (incl. empty-leaf
    crossings); preserves round boundaries => bit-exact replay.
  * compacted — empty crossings dropped (att == 1.0 exactly, so
    removing them only REGROUPS the cumprod — the round_size license).

This probe times a MOCK replay with the real scene's per-ray sample
counts (march_cost) and real chunk caps, random tape contents (gather
cost is index-distribution-insensitive — probe_kchain). Timing only;
the real recorder comes after a go decision.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays
from svox_t_tpu.ops.schedule import march_cost
from svox_t_tpu.ops.render import (_lookup_leaf_xyz, _ray_setup,
                                   _clip_to_occupied, effective_skip_base)
from svox_t_tpu.ops.sh import eval_basis

W = H = 800
C = 2048
K = 4
N_SUSTAIN = 4


@functools.partial(jax.jit, static_argnames=("skip_base", "n_rows",
                                             "step_size", "max_steps"))
def occupied_count(spec, origins, dirs, skip_base, n_rows, step_size,
                   max_steps):
    """Per-ray OCCUPIED-sample count (samples with a feature row)."""
    o, d, invdir, dscale, tmin, tmax, hit = _ray_setup(spec, origins, dirs)
    tmin, tmax, hit = _clip_to_occupied(spec, o, invdir, tmin, tmax, hit, 0, 0)
    oxyz = (o[:, 0], o[:, 1], o[:, 2])
    dxyz = (d[:, 0], d[:, 1], d[:, 2])
    ivxyz = (invdir[:, 0], invdir[:, 1], invdir[:, 2])

    def body(carry):
        t, act, n, nt = carry
        didx, dt, _, _ = _lookup_leaf_xyz(spec, oxyz, dxyz, ivxyz, t,
                                          step_size, skip_base)
        occ = jnp.logical_and(act, didx < n_rows)
        n = n + occ.astype(jnp.int32)
        nt = nt + act.astype(jnp.int32)
        t = jnp.where(act, t + dt, t)
        act = jnp.logical_and(act, t < tmax)
        return t, act, n, nt

    t0 = jnp.where(hit, tmin, jnp.inf)
    act0 = jnp.logical_and(hit, t0 < tmax)
    z = jnp.zeros_like(t0, jnp.int32)
    _, _, n, nt = jax.lax.while_loop(
        lambda c: jnp.logical_and(jnp.any(c[1]), jnp.max(c[3]) < max_steps),
        body, (t0, act0, z, z))
    return n, nt


def make_mock_tape(counts, M, S, rng):
    """(n_chunks, S, C) idx/dt with per-ray valid prefix = counts."""
    B = counts.shape[0]
    n_chunks = B // C
    slot = np.arange(S, dtype=np.int32)
    valid = slot[None, :] < counts[:, None]          # (B, S)
    idx = rng.randint(0, max(M, 1), size=(B, S)).astype(np.int32)
    idx = np.where(valid, idx, M)
    dt = rng.uniform(1e-3, 1e-2, size=(B, S)).astype(np.float32)
    idx = idx.reshape(n_chunks, C, S).transpose(0, 2, 1)   # (n_chunks, S, C)
    dt = dt.reshape(n_chunks, C, S).transpose(0, 2, 1)
    caps = counts.reshape(n_chunks, C).max(axis=1).astype(np.int32)
    return jnp.asarray(idx), jnp.asarray(dt), jnp.asarray(caps)


@functools.partial(jax.jit, static_argnames=("n_color", "basis_dim", "S"))
def replay(tape_idx, tape_dt, caps, features, vdirs_c, dscale_c, n_color,
           basis_dim, S):
    """Mock tape replay: scan chunks, while-loop rounds, phase-2 math."""
    M = features.shape[0]
    dtype = features.dtype

    def chunk(acc, xs):
        tidx, tdt, cap, vd, ds = xs
        from svox_t_tpu.ops.sh import FORMAT_SH
        basis = eval_basis(FORMAT_SH, basis_dim, vd, None)   # (C, basis_dim)

        def cond(carry):
            s0, L, out_c = carry
            return s0 < cap

        def body(carry):
            s0, L, out_c = carry
            ts = jax.lax.dynamic_slice(tidx, (s0, 0), (K, C))
            dts = jax.lax.dynamic_slice(tdt, (s0, 0), (K, C))
            vf = ts < M
            feat = features[jnp.where(vf, ts, 0).reshape(-1)]
            sigma = jnp.where(vf, feat[:, -1].reshape(K, C), 0.0)
            contrib = sigma > 0.0
            att = jnp.exp(-dts * ds[None] * sigma)
            att_eff = jnp.where(contrib, att, 1.0)
            cp = jnp.cumprod(att_eff, axis=0)
            L_before = L[None] * jnp.concatenate(
                [jnp.ones((1, C), dtype), cp[:-1]], axis=0)
            weight = jnp.where(contrib, L_before * (1.0 - att), 0.0)
            coeffs = feat[:, : n_color * basis_dim].reshape(
                K, C, n_color, basis_dim)
            tmp = jnp.einsum("bk,abck->abc", basis, coeffs,
                             precision=jax.lax.Precision.HIGHEST)
            s = jax.nn.sigmoid(tmp)
            out_c = out_c + jnp.sum(weight[:, :, None] * s, axis=0)
            return s0 + K, L * cp[-1], out_c

        L0 = jnp.ones((C,), dtype)
        out0 = jnp.zeros((C, n_color), dtype)
        _, L, out_c = jax.lax.while_loop(cond, body,
                                         (jnp.zeros((), jnp.int32), L0, out0))
        out = jnp.concatenate([out_c + L[:, None], (1.0 - L)[:, None]],
                              axis=-1)
        return acc + jnp.sum(out), None

    acc, _ = jax.lax.scan(chunk, jnp.zeros((), dtype),
                          (tape_idx, tape_dt, caps, vdirs_c, dscale_c))
    return acc


@functools.partial(jax.jit, static_argnames=("n_color", "basis_dim", "S"))
def replay_sustained(tape_idx, tape_dt, caps, features, vdirs_c, dscale_c,
                     n_color, basis_dim, S):
    def one(i, acc):
        f = features * (1.0 + 1e-7 * i)
        return acc + replay(tape_idx, tape_dt, caps, f, vdirs_c, dscale_c,
                            n_color, basis_dim, S)
    return jax.lax.fori_loop(0, N_SUSTAIN, one, 0.0)


def main():
    rng = np.random.RandomState(0)
    tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
    baked = tree._baked_spec()
    r = st.VolumeRenderer(tree, step_size=1e-3)
    opt = r._get_options(False)
    c2w = orbit_camera()
    origins, dirs = cam2world_rays(c2w, W, H, fx=W * 1.1, fy=W * 1.1)
    perm, _ = _tile_perm(W, H, 32)
    origins, dirs = origins[perm], dirs[perm]
    B = origins.shape[0]
    M = feats.shape[0]
    skip_base = effective_skip_base(baked, opt)

    n_occ, n_tot = occupied_count(baked, origins, dirs, skip_base, M,
                                  float(opt.step_size), int(opt.max_steps))
    n_occ = np.asarray(n_occ)
    n_tot = np.asarray(n_tot)
    print(f"rays={B}  total samples={n_tot.sum()}  occupied={n_occ.sum()}  "
          f"mean/ray {n_tot.mean():.2f}/{n_occ.mean():.2f}  "
          f"max {n_tot.max()}/{n_occ.max()}")

    # delta_scale per ray (for att math) — recompute quickly
    o, d, invdir, dscale, tmin, tmax, hit = _ray_setup(
        baked, origins, dirs)
    dscale = np.asarray(dscale)

    Bp = ((B + C - 1) // C) * C
    pad = Bp - B
    for label, counts in (("uncompacted", n_tot), ("compacted", n_occ)):
        order = np.argsort(counts, kind="stable")
        cs = np.concatenate([np.zeros(pad, np.int32), counts[order]])
        order_p = np.concatenate([order[:1].repeat(pad), order])
        n_chunks = Bp // C
        caps_np = cs.reshape(n_chunks, C).max(axis=1)
        S = int(((caps_np.max() + K - 1) // K) * K)
        alloc = int((np.ceil(caps_np / K) * K * C).sum())
        print(f"[{label}] S={S}  allocated slots={alloc} "
              f"({alloc / max(counts.sum(), 1):.2f}x live)")
        tape_idx, tape_dt, caps = make_mock_tape(cs, M, S, rng)
        vdirs_c = jnp.asarray(
            np.asarray(dirs)[order_p].reshape(n_chunks, C, 3))
        dscale_c = jnp.asarray(dscale[order_p].reshape(n_chunks, C))
        args = (tape_idx, tape_dt, caps, feats, vdirs_c, dscale_c)
        kw = dict(n_color=3, basis_dim=9, S=S)
        _ = float(replay(*args, **kw))
        _ = float(replay_sustained(*args, **kw))
        times = []
        for i in range(4):
            f_i = feats * (1.0 + 1e-7 * (i + 1))
            _ = float(jnp.sum(f_i))
            a2 = (tape_idx, tape_dt, caps, f_i, vdirs_c, dscale_c)
            t0 = time.time()
            _ = float(replay_sustained(*a2, **kw))
            times.append(time.time() - t0)
        ms = min(times) / N_SUSTAIN * 1e3
        print(f"[{label}] sustained {ms:.1f} ms  "
              f"{B / (ms * 1e-3) / 1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()
