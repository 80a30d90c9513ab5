"""Multi-chip (virtual 8-device CPU mesh) sharding tests: sharded render
equals single-device render; the distributed train step runs, reduces
feature gradients over the mesh, and decreases the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import svox_t_tpu as st
from svox_t_tpu.ops.render import volume_render
from svox_t_tpu.parallel import (make_ray_mesh, make_train_step, render_sharded,
                                 replicate_spec, shard_rays)

from helpers import build_tree, make_rays


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must create 8 CPU devices"
    return make_ray_mesh()


def test_sharded_render_matches_single(mesh):
    rng = np.random.RandomState(0)
    t, feats, _ = build_tree(rng)
    spec = t._spec()
    rays = make_rays(rng, 128)  # divisible by 8
    opt = st.VolumeRenderer(t)._get_options(False)

    single = np.asarray(
        volume_render(spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt)
    )
    spec_r = replicate_spec(mesh, spec)
    rays_s = shard_rays(mesh, rays)
    sharded = np.asarray(render_sharded(mesh, spec_r, feats, rays_s, opt))
    np.testing.assert_allclose(sharded, single, atol=1e-6)


def test_sharded_gradients_match_single(mesh):
    rng = np.random.RandomState(1)
    t, feats, _ = build_tree(rng)
    spec = t._spec()
    rays = make_rays(rng, 64)
    opt = st.VolumeRenderer(t)._get_options(False)

    def loss(f, o, d, v):
        out = volume_render(spec, f, o, d, v, opt)
        return jnp.mean((out - 0.3) ** 2)

    g_single = np.asarray(
        jax.grad(loss)(feats, rays.origins, rays.dirs, rays.viewdirs)
    )

    from jax.sharding import NamedSharding, PartitionSpec as P

    ray_sh = NamedSharding(mesh, P("rays"))
    repl = NamedSharding(mesh, P())
    f_r = jax.device_put(feats, repl)
    o_s = jax.device_put(rays.origins, ray_sh)
    d_s = jax.device_put(rays.dirs, ray_sh)
    v_s = jax.device_put(rays.viewdirs, ray_sh)
    g_sharded = np.asarray(jax.jit(jax.grad(loss))(f_r, o_s, d_s, v_s))
    np.testing.assert_allclose(g_sharded, g_single, atol=1e-6)


def test_train_step_decreases_loss(mesh):
    rng = np.random.RandomState(2)
    t, feats, _ = build_tree(rng)
    spec = replicate_spec(mesh, t._spec())
    opt = st.VolumeRenderer(t)._get_options(False)
    rays = shard_rays(mesh, make_rays(rng, 64))

    import optax

    step = make_train_step(mesh, opt, optimizer=optax.adam(5e-2))
    state = step.init(feats)
    target = jax.device_put(
        jnp.full((64, 5), 0.4)[:, : np.asarray(feats).shape[1]][:, :4],
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("rays")),
    )
    tup = (rays.origins, rays.dirs, rays.viewdirs)
    losses = []
    for _ in range(10):
        state, loss = step(state, spec, tup, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_sharded_trilinear_matches_single(mesh):
    """interp=trilinear under GSPMD ray sharding: outputs and feature
    gradients equal the single-device result (the 8-corner scatter must
    psum correctly across the mesh)."""
    import dataclasses

    rng = np.random.RandomState(5)
    t, feats, _ = build_tree(rng)
    spec = replicate_spec(mesh, t._spec())
    opt = dataclasses.replace(
        st.VolumeRenderer(t)._get_options(False), interp=1
    )
    rays = make_rays(rng, 64)

    from svox_t_tpu.ops.render import volume_render

    def loss(f, o, d, v):
        out = volume_render(spec, f, o, d, v, opt)
        return jnp.mean((out - 0.3) ** 2)

    out_single = np.asarray(
        volume_render(
            t._spec(), feats, rays.origins, rays.dirs, rays.viewdirs, opt
        )
    )
    g_single = np.asarray(
        jax.grad(loss)(feats, rays.origins, rays.dirs, rays.viewdirs)
    )

    from jax.sharding import NamedSharding, PartitionSpec as P

    ray_sh = NamedSharding(mesh, P("rays"))
    repl = NamedSharding(mesh, P())
    f_r = jax.device_put(feats, repl)
    o_s = jax.device_put(rays.origins, ray_sh)
    d_s = jax.device_put(rays.dirs, ray_sh)
    v_s = jax.device_put(rays.viewdirs, ray_sh)
    out_sharded = np.asarray(
        jax.jit(
            lambda f, o, d, v: volume_render(spec, f, o, d, v, opt)
        )(f_r, o_s, d_s, v_s)
    )
    np.testing.assert_allclose(out_sharded, out_single, atol=1e-6)
    g_sharded = np.asarray(jax.jit(jax.grad(loss))(f_r, o_s, d_s, v_s))
    np.testing.assert_allclose(g_sharded, g_single, atol=1e-6)
