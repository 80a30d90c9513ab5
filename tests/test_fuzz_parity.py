"""Randomized option-product parity fuzz: PARTIALLY occupied trees
(truncated feature pool -> out-of-range ids = empty space, the
configuration that hides boundary bugs — an all-occupied tree makes the
cull box the full cube and boundary handling untestable) rendered under
the cross product of backend x interp x fast, checked three ways:

  * tree backend == baked backend (must be EXACT: same march semantics
    over the same structure),
  * both == the scan-based oracle,
  * exact-mode gradients: custom VJP == oracle autodiff.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import svox_t_tpu as st
from svox_t_tpu.ops.reference_renderer import volume_render_oracle
from svox_t_tpu.ops.render import volume_render

from helpers import build_tree, make_rays


def _partial_scene(seed):
    rng = np.random.RandomState(seed)
    fmt, ddim = [("RGBA", 4), ("SH4", 13)][seed % 2]
    t, feats, _ = build_tree(
        rng, data_format=fmt, data_dim=ddim,
        n_random_refines=1 + seed % 3, sigma_scale=25.0,
    )
    # Truncate the pool: leaves whose data id lands past M' read as
    # empty space (the svox_t out-of-range contract) -> a partially
    # occupied tree with a tight (non-cube) occupied AABB.
    M = feats.shape[0]
    feats = feats[: max(8, int(M * 0.55))]
    rays = make_rays(rng, 64)
    return t, feats, rays


@pytest.mark.parametrize("seed", [101, 102, 103])
@pytest.mark.parametrize("interp", [0, 1])
@pytest.mark.parametrize("fast", [False, True])
def test_fuzz_backend_and_oracle_parity(seed, interp, fast):
    t, feats, rays = _partial_scene(seed)
    r = st.VolumeRenderer(t)
    # box_advance (enabled by fast) shifts sample positions and applies
    # only to the baked backend (tree-walk specs carry no box), so the
    # EXACT three-way comparison runs with it off; the box-advanced
    # baked render is checked separately against the fast envelope.
    opt = dataclasses.replace(
        r._get_options(fast), interp=interp, box_advance=0
    )

    args = (feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    out_tree = np.asarray(volume_render(t._spec(), *args))
    out_baked = np.asarray(volume_render(t._baked_spec(), *args))
    np.testing.assert_allclose(
        out_baked, out_tree, atol=1e-6,
        err_msg=f"backend parity seed={seed} interp={interp} fast={fast}",
    )
    out_oracle = np.asarray(volume_render_oracle(t._spec(), *args))
    np.testing.assert_allclose(
        out_tree, out_oracle, atol=3e-5,
        err_msg=f"oracle parity seed={seed} interp={interp} fast={fast}",
    )
    if fast:
        opt_ba = dataclasses.replace(opt, box_advance=1)
        out_ba = np.asarray(
            volume_render(
                t._baked_spec(), feats, rays.origins, rays.dirs,
                rays.viewdirs, opt_ba,
            )
        )
        np.testing.assert_allclose(out_ba, out_tree, atol=5e-3)


@pytest.mark.parametrize("seed", [101, 102])
@pytest.mark.parametrize("interp", [0, 1])
def test_fuzz_grad_parity(seed, interp):
    t, feats, rays = _partial_scene(seed)
    r = st.VolumeRenderer(t)
    opt = dataclasses.replace(r._get_options(False), interp=interp)

    def loss(spec, f):
        out = volume_render(spec, f, rays.origins, rays.dirs,
                            rays.viewdirs, opt)
        return jnp.sum(out ** 2)

    g_tree = np.asarray(jax.grad(lambda f: loss(t._spec(), f))(feats))
    g_baked = np.asarray(jax.grad(lambda f: loss(t._baked_spec(), f))(feats))
    np.testing.assert_allclose(g_baked, g_tree, atol=1e-5)

    def loss_oracle(f):
        out = volume_render_oracle(
            t._spec(), f, rays.origins, rays.dirs, rays.viewdirs, opt
        )
        return jnp.sum(out ** 2)

    g_oracle = np.asarray(jax.grad(loss_oracle)(feats))
    scale = 1e-4 * max(1.0, float(np.abs(g_oracle).max()))
    np.testing.assert_allclose(g_tree, g_oracle, atol=3e-4 + scale)


@pytest.mark.parametrize("seed", [101, 102, 103])
@pytest.mark.parametrize("compact", [False, True])
@pytest.mark.parametrize("fast", [False, True])
def test_fuzz_tape_parity(seed, compact, fast):
    """Tape replay fuzz on partially occupied trees (the configuration
    where boundary bugs hide): uncompacted tapes replay BIT-identically
    to the march, compacted within the regroup license; gradients match
    the march VJP for both flush strategies."""
    from svox_t_tpu.ops import tape as tape_ops

    t, feats, rays = _partial_scene(seed)
    r = st.VolumeRenderer(t)
    opt = dataclasses.replace(r._get_options(fast), chunk_size=32)
    spec = t._baked_spec()
    M = feats.shape[0]

    args = (feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    out_march = np.asarray(volume_render(spec, *args))
    tp = tape_ops.record_tape(spec, M, rays.origins, rays.dirs,
                              rays.viewdirs, opt, compact=compact)
    out_tape = np.asarray(tape_ops.replay_render(tp, feats, opt, spec))
    if compact:
        np.testing.assert_allclose(
            out_tape, out_march, atol=2e-6,
            err_msg=f"compact tape seed={seed} fast={fast}",
        )
    else:
        np.testing.assert_array_equal(
            out_tape, out_march,
            err_msg=f"bit-exact tape seed={seed} fast={fast}",
        )

    if fast:
        return  # thresholded grads fall back to the march backward
    g_march = np.asarray(jax.grad(lambda f: jnp.sum(volume_render(
        spec, f, rays.origins, rays.dirs, rays.viewdirs, opt) ** 2))(feats))
    scale = max(float(np.abs(g_march).max()), 1e-9)
    for bulk in (0, 1):
        opt_b = dataclasses.replace(opt, bwd_bulk_scatter=bulk)
        g_tape = np.asarray(jax.grad(lambda f: jnp.sum(
            tape_ops.replay_render(tp, f, opt_b, spec) ** 2))(feats))
        np.testing.assert_allclose(
            g_tape / scale, g_march / scale, atol=3e-6,
            err_msg=f"tape grads seed={seed} compact={compact} bulk={bulk}",
        )
