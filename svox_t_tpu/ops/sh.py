"""Spherical-basis evaluation (SH / SG / ASG) in pure JAX.

Numerical parity targets:
  * SH polynomials & constants: reference `svox_t/sh.py:28-162` and the
    device constants in `svox_t/csrc/rt_kernel.cu:54-185`.
  * SG:  out[i] = exp(lambda_i * (dot(dir, mu_i) - 1)) / basis_dim
         (rt_kernel.cu:131-137).
  * ASG: out[i] = S * exp(-a*dot_x^2 - b*dot_y^2) / basis_dim with
         S = dot(dir, z_i) (rt_kernel.cu:118-129; untested upstream).

All functions are batched over arbitrary leading dims and jit/vmap/grad
friendly. They are used both by the renderer (view-dependent appearance)
and as the numerical oracle in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small per-sample contractions must run in true f32: JAX's default
# matmul precision may use bf16 passes, which breaks the <=1e-4
# radiometry parity target.
_PREC = jax.lax.Precision.HIGHEST

from ..utils.spec import FORMAT_ASG, FORMAT_RGBA, FORMAT_SG, FORMAT_SH

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = [
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
]
C3 = [
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
]
C4 = [
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
]


def eval_sh_bases(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH basis values at unit directions, (..., (deg+1)**2)."""
    assert 0 <= deg <= 4
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    cols = [C0 * one]
    if deg > 0:
        cols += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            cols += [
                C2[0] * xy,
                C2[1] * yz,
                C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz,
                C2[4] * (xx - yy),
            ]
            if deg > 2:
                cols += [
                    C3[0] * y * (3 * xx - yy),
                    C3[1] * xy * z,
                    C3[2] * y * (4 * zz - xx - yy),
                    C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                    C3[4] * x * (4 * zz - xx - yy),
                    C3[5] * z * (xx - yy),
                    C3[6] * x * (xx - 3 * yy),
                ]
                if deg > 3:
                    cols += [
                        C4[0] * xy * (xx - yy),
                        C4[1] * yz * (3 * xx - yy),
                        C4[2] * xy * (7 * zz - 1),
                        C4[3] * yz * (7 * zz - 3),
                        C4[4] * (zz * (35 * zz - 30) + 3),
                        C4[5] * xz * (7 * zz - 3),
                        C4[6] * (xx - yy) * (7 * zz - 1),
                        C4[7] * xz * (xx - 3 * yy),
                        C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
                    ]
    return jnp.stack(cols, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH-coefficient colors at unit directions.

    :param sh: (..., C, (deg+1)**2) coefficients
    :param dirs: (..., 3) unit directions
    :return: (..., C)
    """
    assert 0 <= deg <= 4
    assert (deg + 1) ** 2 == sh.shape[-1]
    basis = eval_sh_bases(deg, dirs)  # (..., B)
    return jnp.sum(sh * basis[..., None, :], axis=-1)


_SH_DIM_TO_DEG = {1: 0, 4: 1, 9: 2, 16: 3, 25: 4}


def eval_basis(format: int, basis_dim: int, dirs: jnp.ndarray,
               extra_data: jnp.ndarray | None) -> jnp.ndarray:
    """Basis function values for any supported format, (..., basis_dim).

    ``dirs`` are used *as passed* (not re-normalized), matching the
    reference's `maybe_precalc_basis` (rt_kernel.cu:109-185).
    """
    if format == FORMAT_SH:
        deg = _SH_DIM_TO_DEG[basis_dim]
        return eval_sh_bases(deg, dirs)
    if format == FORMAT_SG:
        # extra_data: (basis_dim, >=4) rows [lambda, mu_x, mu_y, mu_z]
        lam = extra_data[:basis_dim, 0]
        mu = extra_data[:basis_dim, 1:4]
        dot = jnp.einsum("...d,kd->...k", dirs, mu, precision=_PREC)
        return jnp.exp(lam * (dot - 1.0)) / basis_dim
    if format == FORMAT_ASG:
        # extra_data rows: [a, b, x(3), y(3), z(3)] (rt_kernel.cu:118-129)
        ex = extra_data[:basis_dim]
        a, b = ex[:, 0], ex[:, 1]
        xax, yax, zax = ex[:, 2:5], ex[:, 5:8], ex[:, 8:11]
        s = jnp.einsum("...d,kd->...k", dirs, zax, precision=_PREC)
        dx = jnp.einsum("...d,kd->...k", dirs, xax, precision=_PREC)
        dy = jnp.einsum("...d,kd->...k", dirs, yax, precision=_PREC)
        return s * jnp.exp(-a * dx * dx - b * dy * dy) / basis_dim
    raise ValueError(f"No basis for format {format} (RGBA has none)")
