"""Multi-chip scaling: ray-sharded data parallelism over a device mesh.

The reference has no distributed machinery at all (SURVEY.md §2.3) — its
only parallelism is single-GPU SIMT. The workload's natural multi-chip
axis is the **ray batch**: tree structure and the feature pool are small
(tens–hundreds of MB) and are replicated; rays/pixels are sharded 1-D
across chips; the only cross-chip communication is the feature-gradient
all-reduce, which GSPMD inserts automatically as a single `psum` over ICI
when the sharded backward scatter-adds into the replicated feature pool.

Usage:
    mesh = make_ray_mesh()                       # all devices, axis "rays"
    out = render_sharded(mesh, spec, features, rays, opt)
    step = make_train_step(mesh, opt, optimizer) # jitted fwd+bwd+update
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import render as render_ops
from ..utils.spec import Rays, RenderOptions, TreeSpec


def make_ray_mesh(devices=None, axis_name: str = "rays") -> Mesh:
    """1-D mesh over all (or given) devices, sharding axis `rays`."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_spec(mesh: Mesh, tree_or_spec) -> TreeSpec:
    """Place all tree arrays fully replicated on the mesh."""
    spec = tree_or_spec if isinstance(tree_or_spec, TreeSpec) else tree_or_spec._spec()
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), spec)


def shard_rays(mesh: Mesh, rays: Rays, axis_name: str = "rays") -> Rays:
    """Shard a ray batch along its leading dim. Batch size must divide by
    the mesh size (pad beforehand if needed)."""
    sh = NamedSharding(mesh, P(axis_name))
    return Rays(*(jax.device_put(jnp.asarray(x), sh) for x in rays))


def render_sharded(
    mesh: Mesh,
    spec: TreeSpec,
    features: jax.Array,
    rays: Rays,
    opt: RenderOptions,
    axis_name: str = "rays",
) -> jax.Array:
    """jit the volume render with rays sharded / tree replicated. XLA
    GSPMD propagates the shardings through the march loop; no collectives
    are needed in the forward pass."""
    ray_sh = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        static_argnames=("opt",),
        in_shardings=(None, repl, ray_sh, ray_sh, ray_sh),
        out_shardings=ray_sh,
    )
    def _render(spec, features, origins, dirs, vdirs, opt):
        return render_ops.volume_render(spec, features, origins, dirs, vdirs, opt)

    return _render(spec, features, rays.origins, rays.dirs, rays.viewdirs, opt)


def make_train_step(
    mesh: Mesh,
    opt: RenderOptions,
    optimizer=None,
    loss_fn: Optional[Callable] = None,
    axis_name: str = "rays",
):
    """Build a jitted distributed training step.

    The step renders a sharded ray batch against the replicated feature
    pool, computes a loss against sharded targets, backprops through the
    hand-written render VJP, and applies an optimizer update. The feature
    gradient is produced by scatter-adds from every shard into the
    replicated (M, D) buffer — GSPMD turns that into per-chip partial
    gradients + one `psum` over ICI (the entire communication footprint
    of this workload).

    :param optimizer: an optax GradientTransformation (default: sgd(1e-2))
    :param loss_fn: (pred, target) -> scalar; default 0.5*MSE over colors
    :return: step(params_state, spec, rays, target) -> (state, loss)
        where params_state = (features, opt_state)
    """
    import optax

    if optimizer is None:
        optimizer = optax.sgd(1e-2)
    if loss_fn is None:
        loss_fn = lambda pred, tgt: 0.5 * jnp.mean((pred - tgt) ** 2)

    ray_sh = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def init(features):
        features = jax.device_put(jnp.asarray(features), repl)
        return features, optimizer.init(features)

    @functools.partial(
        jax.jit,
        static_argnames=("opt_static",),
        in_shardings=((repl, repl), None, (ray_sh, ray_sh, ray_sh), ray_sh),
        out_shardings=((repl, repl), repl),
    )
    def step(params_state, spec, rays, target, opt_static=opt):
        features, opt_state = params_state

        def loss_of(f):
            pred = render_ops.volume_render(
                spec, f, rays[0], rays[1], rays[2], opt_static
            )
            return loss_fn(pred, target)

        loss, grads = jax.value_and_grad(loss_of)(features)
        updates, opt_state = optimizer.update(grads, opt_state, features)
        features = optax.apply_updates(features, updates)
        return (features, opt_state), loss

    step.init = init
    return step
