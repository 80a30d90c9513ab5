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


# ---------------------------------------------------------------------------
# Model-parallel feature pool (pool sharding)
# ---------------------------------------------------------------------------


def _pool_mesh(shape=(8,), axes=("pool",)):
    return jax.sharding.Mesh(np.asarray(jax.devices()[:int(np.prod(shape))]).reshape(*shape), axes)


def test_pool_sharded_render_matches_single():
    """Row-sharded pool + per-round psum == single-device render, on both
    backends, incl. a chunk count > 1 (the scan path) and a pool size
    that needs padding."""
    import dataclasses

    from svox_t_tpu.parallel import render_pool_sharded

    rng = np.random.RandomState(10)
    t, feats, _ = build_tree(rng)
    assert feats.shape[0] % 8 != 0  # padding path exercised
    rays = make_rays(rng, 96)
    opt = dataclasses.replace(
        st.VolumeRenderer(t)._get_options(False), chunk_size=40
    )
    mesh = _pool_mesh()
    for spec in (t._spec(), t._baked_spec()):
        single = np.asarray(volume_render(
            spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
        ))
        out = np.asarray(render_pool_sharded(mesh, spec, feats, rays, opt))
        np.testing.assert_allclose(out, single, atol=2e-6)


def test_pool_sharded_interp_matches_single():
    import dataclasses

    from svox_t_tpu.parallel import render_pool_sharded

    rng = np.random.RandomState(11)
    t, feats, _ = build_tree(rng)
    rays = make_rays(rng, 64)
    opt = dataclasses.replace(
        st.VolumeRenderer(t)._get_options(False), interp=1
    )
    mesh = _pool_mesh()
    spec = t._baked_spec()
    single = np.asarray(volume_render(
        spec, feats, rays.origins, rays.dirs, rays.viewdirs, opt
    ))
    out = np.asarray(render_pool_sharded(mesh, spec, feats, rays, opt))
    np.testing.assert_allclose(out, single, atol=2e-6)


def test_pool_sharded_grads_match_single():
    """Feature grads through shard_map: each device scatters only its own
    rows; the custom-VJP backward psums the pool cotangent over the ray
    axis itself (shard_map AD cannot insert collectives into a custom_vjp
    bwd — hence ray_axis in RenderOptions). Exact vs the single-device
    custom VJP."""
    import dataclasses

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from svox_t_tpu.parallel import shard_pool

    rng = np.random.RandomState(12)
    t, feats, _ = build_tree(rng)
    spec = t._baked_spec()
    rays = make_rays(rng, 64)
    opt0 = st.VolumeRenderer(t)._get_options(False)
    M = feats.shape[0]

    def loss_single(f):
        out = volume_render(spec, f, rays.origins, rays.dirs, rays.viewdirs, opt0)
        return jnp.mean((out - 0.3) ** 2)

    g1 = np.asarray(jax.grad(loss_single)(feats))

    mesh = _pool_mesh((4, 2), ("rays", "pool"))
    fshard, _ = shard_pool(mesh, feats)
    opt2 = dataclasses.replace(opt0, pool_axis="pool", pool_rows=M, ray_axis="rays")
    rspec = P("rays")

    def local(spec_, f_, o_, d_, v_):
        return volume_render(spec_, f_, o_, d_, v_, opt2)

    sm = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("pool"), rspec, rspec, rspec), out_specs=rspec,
    )

    def loss_sm(f):
        out = sm(spec, f, rays.origins, rays.dirs, rays.viewdirs)
        return jnp.mean((out - 0.3) ** 2)

    g2 = np.asarray(jax.jit(jax.grad(loss_sm))(fshard))[:M]
    np.testing.assert_allclose(g2, g1, atol=1e-7)


def test_pool_train_step_2d_mesh():
    """DP x MP train step: pool + optimizer state sharded over the pool
    axis, rays over the ray axis; loss decreases and the first-step
    gradient equals the single-device gradient."""
    import optax

    from svox_t_tpu.parallel import make_pool_train_step, shard_rays, unshard_pool

    rng = np.random.RandomState(13)
    t, feats, _ = build_tree(rng)
    spec = t._baked_spec()
    opt = st.VolumeRenderer(t)._get_options(False)
    M = feats.shape[0]
    mesh = _pool_mesh((4, 2), ("rays", "pool"))
    rays = make_rays(rng, 64)
    rays_s = shard_rays(mesh, rays)
    target = jax.device_put(
        jnp.full((64, 4), 0.4),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("rays")),
    )

    step = make_pool_train_step(
        mesh, opt, n_features=M, optimizer=optax.sgd(1.0)
    )
    state = step.init(feats)
    # optimizer state is sharded over the pool axis
    f0 = state[0]
    assert "pool" in str(f0.sharding.spec)
    state1, loss0 = step(state, spec, tuple(rays_s), target)

    # SGD(lr=1): f1 - f0 == -grad; compare with the single-device grad.
    def loss_single(f):
        out = volume_render(spec, f, rays.origins, rays.dirs, rays.viewdirs, opt)
        return 0.5 * jnp.mean((out - target) ** 2)

    g1 = np.asarray(jax.grad(loss_single)(feats))
    g2 = np.asarray(unshard_pool(f0, M)) - unshard_pool(state1[0], M)
    np.testing.assert_allclose(g2, g1, atol=1e-6)

    losses = [float(loss0)]
    for _ in range(3):
        state1, l = step(state1, spec, tuple(rays_s), target)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_pool_sharded_aux_passes():
    """Aux entry points under a sharded pool: opacity fwd+grad and the
    motion-feature render fwd+grad match single-device."""
    import dataclasses

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from svox_t_tpu.ops.render_aux import motion_feature_render, opacity_render
    from svox_t_tpu.parallel import shard_pool

    rng = np.random.RandomState(14)
    t, feats, _ = build_tree(rng)
    rays = make_rays(rng, 32)
    M = feats.shape[0]
    nb, J, jdim = 2, 3, 4
    sw = jnp.asarray(np.abs(rng.rand(M, nb)).astype(np.float32))
    ji = jnp.asarray(rng.randint(0, J, (M, nb)).astype(np.int32))
    jf = jnp.asarray(rng.randn(J, jdim).astype(np.float32))
    spec = t._spec(skinning_weights=sw, joint_index=ji)
    opt0 = st.VolumeRenderer(t)._get_options(False)

    op1 = np.asarray(opacity_render(spec, feats, rays.origins, rays.dirs, opt0))
    gop1 = np.asarray(jax.grad(
        lambda f: jnp.sum(opacity_render(spec, f, rays.origins, rays.dirs, opt0))
    )(feats))
    mf1 = np.asarray(motion_feature_render(
        spec, jf, feats, rays.origins, rays.dirs, opt0
    ))
    gj1 = np.asarray(jax.grad(lambda j: jnp.sum(motion_feature_render(
        spec, j, feats, rays.origins, rays.dirs, opt0
    )))(jf))

    mesh = _pool_mesh()
    fshard, _ = shard_pool(mesh, feats)
    opt2 = dataclasses.replace(opt0, pool_axis="pool", pool_rows=M)

    op_sm = shard_map(
        lambda s, f, o, d: opacity_render(s, f, o, d, opt2),
        mesh=mesh, in_specs=(P(), P("pool"), P(), P()), out_specs=P(),
    )
    op2 = np.asarray(jax.jit(op_sm)(spec, fshard, rays.origins, rays.dirs))
    np.testing.assert_allclose(op2, op1, atol=2e-6)
    gop2 = np.asarray(jax.jit(jax.grad(
        lambda f: jnp.sum(op_sm(spec, f, rays.origins, rays.dirs))
    ))(fshard))[:M]
    np.testing.assert_allclose(gop2, gop1, atol=1e-6)

    mf_sm = shard_map(
        lambda s, j, f, o, d: motion_feature_render(s, j, f, o, d, opt2),
        mesh=mesh, in_specs=(P(), P(), P("pool"), P(), P()), out_specs=P(),
    )
    mf2 = np.asarray(jax.jit(mf_sm)(spec, jf, fshard, rays.origins, rays.dirs))
    np.testing.assert_allclose(mf2, mf1, atol=2e-6)
    gj2 = np.asarray(jax.jit(jax.grad(lambda j: jnp.sum(mf_sm(
        spec, j, fshard, rays.origins, rays.dirs
    ))))(jf))
    np.testing.assert_allclose(gj2, gj1, atol=1e-6)


def test_brick_sharded_render_matches_single():
    """Huge-scene MP: brick atlas row-sharded (one psum per march step)
    composed with the sharded pool — forward and feature grads equal the
    single-device render."""
    import dataclasses

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from svox_t_tpu.ops import bake as bake_ops
    from svox_t_tpu.parallel import (render_pool_sharded, shard_baked,
                                     shard_pool)
    from svox_t_tpu.parallel.render import _spec_pspecs

    rng = np.random.RandomState(15)
    t, feats, _ = build_tree(rng, depth_limit=5, n_random_refines=3)
    t._ensure_host_data()
    baked = bake_ops.bake_arrays(
        t._child, t._data, t._parent_depth, t.offset, t.invradius,
        t.filled, top_levels=2,
    )
    assert baked.brick_levels >= 1 and baked.brick.shape[0] > 8
    rays = make_rays(rng, 64)
    opt0 = st.VolumeRenderer(t)._get_options(False)
    M = feats.shape[0]

    single = np.asarray(volume_render(
        baked, feats, rays.origins, rays.dirs, rays.viewdirs, opt0
    ))

    def loss_single(f):
        out = volume_render(baked, f, rays.origins, rays.dirs, rays.viewdirs, opt0)
        return jnp.mean((out - 0.3) ** 2)

    g1 = np.asarray(jax.grad(loss_single)(feats))

    mesh = _pool_mesh()
    baked_s = shard_baked(mesh, baked)
    # fwd through the high-level wrapper (brick + pool both sharded)
    out = np.asarray(render_pool_sharded(mesh, baked_s, feats, rays, opt0))
    np.testing.assert_allclose(out, single, atol=2e-6)

    # grads: brick + pool sharded
    fshard, _ = shard_pool(mesh, feats)
    opt2 = dataclasses.replace(opt0, pool_axis="pool", pool_rows=M)
    sm = shard_map(
        lambda s, f, o, d, v: volume_render(s, f, o, d, v, opt2),
        mesh=mesh,
        in_specs=(_spec_pspecs(baked_s), P("pool"), P(), P(), P()),
        out_specs=P(),
    )

    def loss_sm(f):
        out = sm(baked_s, f, rays.origins, rays.dirs, rays.viewdirs)
        return jnp.mean((out - 0.3) ** 2)

    g2 = np.asarray(jax.jit(jax.grad(loss_sm))(fshard))[:M]
    np.testing.assert_allclose(g2, g1, atol=1e-7)

    # refresh on a sharded bake is refused (re-shard after refreshing)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bake_ops.refresh(baked_s, jnp.zeros((t.capacity * 8,), jnp.int32))


def test_ray_sharded_grad_tape_matches_single(mesh):
    """grad_tape_rows > 0 inside a ray-sharded shard_map: the tape
    carries are filled from ray-derived rows, so their initial values
    must be vma-promoted like the grad buffer (regression: unvarying
    tape carries were rejected by shard_map's varying-axes check at
    trace time). Gradients must equal the single-device tape path."""
    import dataclasses

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    rng = np.random.RandomState(21)
    t, feats, _ = build_tree(rng)
    spec = t._baked_spec()
    rays = make_rays(rng, 64)
    opt0 = st.VolumeRenderer(t)._get_options(False)

    def loss_single(f):
        out = volume_render(
            spec, f, rays.origins, rays.dirs, rays.viewdirs, opt0
        )
        return jnp.mean((out - 0.3) ** 2)

    g1 = np.asarray(jax.grad(loss_single)(feats))

    opt1 = dataclasses.replace(opt0, ray_axis="rays", grad_tape_rows=512)
    rspec = P("rays")
    sm = shard_map(
        lambda f, o, d, v: volume_render(spec, f, o, d, v, opt1),
        mesh=mesh,
        in_specs=(P(), rspec, rspec, rspec),
        out_specs=rspec,
    )

    def loss_sm(f):
        out = sm(f, rays.origins, rays.dirs, rays.viewdirs)
        return jnp.mean((out - 0.3) ** 2)

    g2 = np.asarray(jax.jit(jax.grad(loss_sm))(feats))
    np.testing.assert_allclose(g2, g1, atol=1e-6)


def test_frames_api_under_ray_sharding(mesh):
    """render_frames composes with GSPMD ray sharding: a (T, M, D)
    stack rendered over sharded rays equals the single-device stack."""
    rng = np.random.RandomState(23)
    t, feats, _ = build_tree(rng)
    r = st.VolumeRenderer(t)
    rays = make_rays(rng, 64)
    stack = jnp.stack([feats, feats * 1.1, feats * 0.9])

    single = np.asarray(r.render_frames(stack, rays))

    from jax.sharding import NamedSharding, PartitionSpec as P

    ray_sh = NamedSharding(mesh, P("rays"))
    rays_s = st.Rays(
        jax.device_put(rays.origins, ray_sh),
        jax.device_put(rays.dirs, ray_sh),
        jax.device_put(rays.viewdirs, ray_sh),
    )
    stack_r = jax.device_put(stack, NamedSharding(mesh, P()))
    sharded = np.asarray(r.render_frames(stack_r, rays_s))
    np.testing.assert_allclose(sharded, single, atol=1e-6)


def test_subset_tape_replay_sharded(mesh):
    """Row-subset tapes (ops/tape_subset.py) are ordinary RayTapes:
    `shard_tape`/`replay_sharded` apply unchanged, so minibatch
    training composes with ray-sharded multi-chip replay."""
    import dataclasses

    from svox_t_tpu.ops import tape as tape_ops
    from svox_t_tpu.ops import tape_subset as tsub
    from svox_t_tpu.parallel import replay_sharded

    rng = np.random.RandomState(5)
    t, feats, _ = build_tree(rng)
    rays = make_rays(rng, 300)
    r = st.VolumeRenderer(t)
    opt = dataclasses.replace(r._get_options(False), chunk_size=64)
    spec = t._baked_spec()
    tp = tape_ops.record_tape(spec, feats.shape[0], rays.origins,
                              rays.dirs, rays.viewdirs, opt)
    ids = rng.choice(300, size=96, replace=False)
    # chunk size divisible by the 8-device rays axis
    sub = tsub.subset_tape(tp, ids, chunk_size=32)
    single = np.asarray(tape_ops.replay_render(sub, feats, opt, spec))
    sharded = np.asarray(replay_sharded(mesh, sub, feats, opt, spec))
    np.testing.assert_allclose(sharded, single, atol=1e-6)
