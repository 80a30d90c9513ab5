"""Simulate exact-mode slot counts with uniform-box gather-free sub-steps."""
import functools, json, os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
import svox_t_tpu as st
from benchmarks.scenes import build_shell_tree, orbit_camera
from svox_t_tpu.models.renderer import _tile_perm
from svox_t_tpu.ops.render import cam2world_rays, _ray_setup, _clip_to_occupied, _lookup_leaf_xyz
from svox_t_tpu.ops import bake as bo

W = H = 800
K = 4
MAXS = 1024
SB = bo.SKIP_BASE

@functools.partial(jax.jit, static_argnames=("usub", "M"))
def slots_per_ray(spec, o_in, d_in, usub, M):
    """Count gather-SLOTS (not samples) per ray under exact semantics,
    taking up to `usub` gather-free chain steps inside uniform boxes."""
    o, d, invdir, dscale, tmin, tmax, hit = _ray_setup(spec, o_in, d_in)
    tmin, tmax, hit = _clip_to_occupied(spec, o, invdir, tmin, tmax, hit, 0, 0)
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    ivx, ivy, ivz = invdir[:, 0], invdir[:, 1], invdir[:, 2]
    one = 1.0 - 1e-6
    step = 1e-3

    def body(carry):
        t, act, nslot, nsamp = carry
        didx, dt, _, cube = _lookup_leaf_xyz(
            spec, (ox, oy, oz), (dx, dy, dz), (ivx, ivy, ivz), t, step, 0)
        nslot = nslot + act.astype(jnp.int32)
        nsamp = nsamp + act.astype(jnp.int32)
        t_slot = t
        t = jnp.where(act, t + dt, t)
        act = jnp.logical_and(act, t < tmax)
        if usub:
            bits = didx - SB
            uni = jnp.logical_and(
                jnp.logical_and(bits >= 0, bits < (1 << 25)),
                jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(bits, 24), 1) == 1)
            bz = jnp.where(uni, jax.lax.bitwise_and(bits, 0xFFFFFF), 0)
            def _ext(sh):
                v = jax.lax.shift_right_logical(bz, sh) if sh else bz
                return jax.lax.bitwise_and(v, 15).astype(cube.dtype)
            cxx = jnp.floor(jnp.clip(ox + t_slot * dx, 0.0, one) * cube)
            cyy = jnp.floor(jnp.clip(oy + t_slot * dy, 0.0, one) * cube)
            czz = jnp.floor(jnp.clip(oz + t_slot * dz, 0.0, one) * cube)
            lox = cxx - _ext(0); hix = cxx + 1.0 + _ext(4)
            loy = cyy - _ext(8); hiy = cyy + 1.0 + _ext(12)
            loz = czz - _ext(16); hiz = czz + 1.0 + _ext(20)
            for _ in range(usub):
                pxc = jnp.clip(ox + t * dx, 0.0, one)
                pyc = jnp.clip(oy + t * dy, 0.0, one)
                pzc = jnp.clip(oz + t * dz, 0.0, one)
                sxu = pxc * cube; syu = pyc * cube; szu = pzc * cube
                inb = ((sxu >= lox) & (sxu < hix) & (syu >= loy)
                       & (syu < hiy) & (szu >= loz) & (szu < hiz))
                take = act & uni & inb
                fxu = sxu - jnp.floor(sxu)
                fyu = syu - jnp.floor(syu)
                fzu = szu - jnp.floor(szu)
                t1x = -fxu * ivx; t2x = t1x + ivx
                t1y = -fyu * ivy; t2y = t1y + ivy
                t1z = -fzu * ivz; t2z = t1z + ivz
                smin = jnp.maximum(jnp.maximum(
                    jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z))
                smax = jnp.minimum(jnp.minimum(
                    jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z))
                smin = jnp.maximum(smin, 0.0)
                smax = jnp.minimum(smax, 1e9)
                dsub = (smax - smin) / cube + step
                t = jnp.where(take, t + dsub, t)
                nsamp = nsamp + take.astype(jnp.int32)
                act = jnp.logical_and(act, t < tmax)
        return t, act, nslot, nsamp

    t0 = jnp.where(hit, tmin, jnp.inf)
    act0 = jnp.logical_and(hit, t0 < tmax)
    z = jnp.zeros_like(t0, dtype=jnp.int32)
    _, _, nslot, nsamp = jax.lax.while_loop(
        lambda c: jnp.logical_and(jnp.any(c[1]), jnp.max(c[3]) < MAXS),
        body, (t0, act0, z, z))
    return nslot, nsamp

tree, feats = build_shell_tree(depth=7, data_format="SH9", data_dim=28)
baked = tree._baked_spec()
c2w = orbit_camera()
origins, dirs = cam2world_rays(c2w, W, H, fx=W*1.1, fy=W*1.1)
perm, _ = _tile_perm(W, H, 32)
origins, dirs = origins[perm], dirs[perm]
res = {}
for usub in (0, 1, 2, 3, 7):
    nslot, nsamp = slots_per_ray(baked, origins, dirs, usub, feats.shape[0])
    nslot = np.asarray(nslot); nsamp = np.asarray(nsamp)
    ch = nslot.reshape(-1, 1024)
    rounds = int(np.ceil(ch.max(axis=1) / K).sum())
    res[f"u{usub}"] = {
        "mean_slots": round(float(nslot.mean()), 2),
        "p95_slots": int(np.percentile(nslot, 95)),
        "max_slots": int(nslot.max()),
        "chunk_rounds": rounds,
        "mean_samples": round(float(nsamp.mean()), 2),
    }
    print(json.dumps({f"u{usub}": res[f"u{usub}"]}), file=sys.stderr, flush=True)
print(json.dumps(res))
