"""Batched N-frame replay (`replay_render_frames`): forward parity and
the combined wide-flush backward.

Contract (ops/tape.py `_replay_bwd_frames_impl`):
  * forward == a per-frame `replay_render` loop, bitwise (same program
    per frame, scanned).
  * backward == the stack of per-frame gradients — the combined flush
    only reorders scatter-add summation (zero rows routed to their true
    destinations instead of dropped), so grads match tightly.
  * frames are independent: frame j's cotangent never leaks into
    frame i's gradient.
  * fallbacks (bulk opt-out, oversized ys) produce identical grads.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import svox_t_tpu as st
from svox_t_tpu.ops import tape as tape_ops
from svox_t_tpu.ops.tape import replay_render, replay_render_frames

from helpers import build_tree, make_rays


def _shell_occupy(c):
    r = np.linalg.norm(c - 0.5, axis=-1)
    return (r > 0.22) & (r < 0.42)


@pytest.fixture
def rng():
    return np.random.RandomState(11)


def _setup(rng, compact=True, n_rays=192):
    t, feats, _ = build_tree(
        rng, N=2, data_dim=28, depth_limit=5, n_random_refines=2,
        data_format="SH9", occupy=_shell_occupy,
    )
    rays = make_rays(rng, n_rays)
    r = st.VolumeRenderer(t)
    opt = dataclasses.replace(r._get_options(False), chunk_size=64)
    spec = t._baked_spec()
    tp = tape_ops.record_tape(spec, feats.shape[0], rays.origins,
                              rays.dirs, rays.viewdirs, opt,
                              compact=compact)
    fs = jnp.stack([feats * (1.0 + 0.03 * i) for i in range(4)])
    return tp, fs, opt, spec


@pytest.mark.parametrize("compact", [False, True])
def test_frames_forward_bitwise(rng, compact):
    tp, fs, opt, spec = _setup(rng, compact)
    outs = np.asarray(replay_render_frames(tp, fs, opt, spec))
    for i in range(fs.shape[0]):
        ref = np.asarray(replay_render(tp, fs[i], opt, spec))
        np.testing.assert_array_equal(outs[i], ref)


@pytest.mark.parametrize("compact", [False, True])
def test_frames_grads_match_per_frame(rng, compact):
    tp, fs, opt, spec = _setup(rng, compact)

    def loss_frames(ffs):
        return jnp.sum(replay_render_frames(tp, ffs, opt, spec,
                                            unsort=False) ** 2)

    g = np.asarray(jax.grad(loss_frames)(fs))
    assert g.shape == fs.shape
    for i in range(fs.shape[0]):
        gi = np.asarray(jax.grad(lambda f: jnp.sum(
            replay_render(tp, f, opt, spec, unsort=False) ** 2))(fs[i]))
        scale = max(np.abs(gi).max(), 1e-9)
        np.testing.assert_allclose(g[i] / scale, gi / scale, atol=3e-6)


def test_frames_are_independent(rng):
    """Zero cotangent on frame 0 -> zero gradient on frame 0, full
    gradient on frame 1 (no cross-frame leakage through the combined
    flush)."""
    tp, fs, opt, spec = _setup(rng)

    def loss(ffs):
        out = replay_render_frames(tp, ffs, opt, spec, unsort=False)
        return jnp.sum(out[1] ** 2)  # frame 1 only

    g = np.asarray(jax.grad(loss)(fs))
    assert np.all(g[0] == 0.0)
    assert np.all(g[2] == 0.0)
    assert np.abs(g[1]).max() > 0.0


def test_frames_fallback_paths_match(rng):
    """Bulk opt-out (per-frame tiered) and the wide path agree."""
    tp, fs, opt, spec = _setup(rng)
    opt_nb = dataclasses.replace(opt, bwd_bulk_scatter=0)

    def loss(ffs, op):
        return jnp.sum(replay_render_frames(tp, ffs, op, spec,
                                            unsort=False) ** 2)

    g1 = np.asarray(jax.grad(lambda f: loss(f, opt))(fs))
    g2 = np.asarray(jax.grad(lambda f: loss(f, opt_nb))(fs))
    scale = max(np.abs(g1).max(), 1e-9)
    np.testing.assert_allclose(g2 / scale, g1 / scale, atol=1e-6)


def test_frames_oversize_cap_falls_back(rng, monkeypatch):
    """ys stacks past _WIDE_YS_MAX_BYTES use the per-frame scan —
    same gradients."""
    tp, fs, opt, spec = _setup(rng)

    def loss(ffs):
        return jnp.sum(replay_render_frames(tp, ffs, opt, spec,
                                            unsort=False) ** 2)

    g1 = np.asarray(jax.grad(loss)(fs))
    monkeypatch.setattr(tape_ops, "_WIDE_YS_MAX_BYTES", 0)
    g2 = np.asarray(jax.grad(loss)(fs))
    scale = max(np.abs(g1).max(), 1e-9)
    np.testing.assert_allclose(g2 / scale, g1 / scale, atol=1e-6)


def test_frames_indirect_tape(rng):
    """Data-indirect tapes (shared index table): batched grads match
    per-frame grads through the same table."""
    t, feats, _ = build_tree(
        rng, N=2, data_dim=28, depth_limit=5, n_random_refines=2,
        data_format="SH9", occupy=_shell_occupy,
    )
    rays = make_rays(rng, 128)
    r = st.VolumeRenderer(t)
    opt = dataclasses.replace(r._get_options(False), chunk_size=64)
    spec = t._baked_spec()
    tp = tape_ops.record_tape(spec, feats.shape[0], rays.origins,
                              rays.dirs, rays.viewdirs, opt,
                              compact=False, indirect=True)
    table = tape_ops.pack_index_table(t._spec().data_flat)
    fs = jnp.stack([feats * (1.0 + 0.05 * i) for i in range(3)])

    def loss_frames(ffs):
        return jnp.sum(replay_render_frames(
            tp, ffs, opt, spec, unsort=False, index_table=table) ** 2)

    g = np.asarray(jax.grad(loss_frames)(fs))
    for i in range(fs.shape[0]):
        gi = np.asarray(jax.grad(lambda f: jnp.sum(replay_render(
            tp, f, opt, spec, unsort=False,
            index_table=table) ** 2))(fs[i]))
        scale = max(np.abs(gi).max(), 1e-9)
        np.testing.assert_allclose(g[i] / scale, gi / scale, atol=3e-6)
