"""Grid and coordinate primitives.

Conventions (shared by the whole framework):

* Scalar images are ``(D, H, W)`` arrays (or batched ``(N, D, H, W)``).
* Vector fields are channel-first ``(3, D, H, W)`` arrays where channel 0 is
  the ``x`` component (displacing along the last/W axis), channel 1 is ``y``
  (H axis) and channel 2 is ``z`` (D axis).  This mirrors the convention of
  ``torch.nn.functional.grid_sample`` used throughout the reference
  implementation (see /root/reference/utils/util.py:263-278 and
  utils/registration.py:17-30) so numerics are directly comparable.
* "Normalised" coordinates live in ``[-1, 1]`` with ``align_corners=True``
  semantics: ``-1`` is the centre of the first voxel and ``+1`` the centre of
  the last voxel along each axis.

Unlike the reference's ``transform_coordinates`` (utils/util.py:418-443),
which pairs channel ``i`` with spatial axis ``i`` (only correct for cubic
volumes), the conversions here pair channel 0 with the W axis etc., which is
consistent with the resampler for any volume shape.
"""

from __future__ import annotations

import jax.numpy as jnp


def identity_grid(shape) -> jnp.ndarray:
    """Normalised identity sampling grid.

    :param shape: spatial shape ``(D, H, W)``.
    :return: ``(3, D, H, W)`` grid with values in ``[-1, 1]``; channel 0
        varies along the W axis, channel 1 along H, channel 2 along D.

    Reference semantics: /root/reference/utils/util.py:263-278.

    Built from ``broadcasted_iota`` so that a call made during tracing
    stays SYMBOLIC: a precomputed grid closed over by a jitted function is
    embedded in the HLO as a literal — 192 MB at 256³, which overflows the
    remote-compile transport (HTTP 413) and bloats every module.
    """
    import jax

    D, H, W = shape

    def axis_coords(n: int, axis: int) -> jnp.ndarray:
        if n == 1:
            return jnp.full((D, H, W), -1.0, jnp.float32)
        i = jax.lax.broadcasted_iota(jnp.float32, (D, H, W), axis)
        return 2.0 * i / (n - 1) - 1.0

    return jnp.stack([axis_coords(W, 2), axis_coords(H, 1),
                      axis_coords(D, 0)], axis=0)


def _axis_sizes(shape):
    """Per-channel axis extents in channel order (x→W, y→H, z→D)."""
    D, H, W = shape
    return jnp.array([W, H, D], dtype=jnp.float32)


def voxel_to_normalised(field: jnp.ndarray) -> jnp.ndarray:
    """Convert a displacement field from voxel units to normalised units.

    ``field`` is ``(3, D, H, W)``; channel c is scaled by ``2 / (size_c - 1)``
    where ``size_c`` is the extent of the axis that channel displaces.

    Reference semantics: /root/reference/utils/util.py:418-429 (fixed for
    non-cubic volumes, see module docstring).
    """
    sizes = _axis_sizes(field.shape[-3:])
    scale = (2.0 / (sizes - 1.0)).reshape((3,) + (1,) * 3)
    return field * scale


def normalised_to_voxel(field: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`voxel_to_normalised`.

    Reference semantics: /root/reference/utils/util.py:432-443.
    """
    sizes = _axis_sizes(field.shape[-3:])
    scale = ((sizes - 1.0) / 2.0).reshape((3,) + (1,) * 3)
    return field * scale


def field_norm(field: jnp.ndarray) -> jnp.ndarray:
    """Voxel-wise L2 norm over the channel axis of a ``(3, D, H, W)`` field
    (batched leading axes allowed) — reference utils/util.py:215-225."""
    return jnp.linalg.norm(field, axis=-4)


def det_jacobian(jac: jnp.ndarray) -> jnp.ndarray:
    """Closed-form determinant of a field Jacobian.

    :param jac: ``(3, 3, D, H, W)`` where ``jac[c, d]`` is the derivative of
        field channel ``c`` along coordinate ``d`` (0=x, 1=y, 2=z).
    :return: ``(D, H, W)`` determinant map.

    Reference semantics: /root/reference/utils/util.py:72-91.
    """
    a, b, c = jac[0, 0], jac[0, 1], jac[0, 2]
    d, e, f = jac[1, 0], jac[1, 1], jac[1, 2]
    g, h, i = jac[2, 0], jac[2, 1], jac[2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def inv_jacobian(jac: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate/det) inverse of a field Jacobian.

    :param jac: ``(3, 3, D, H, W)`` as in :func:`det_jacobian`.
    :return: ``(3, 3, D, H, W)`` per-voxel matrix inverse.

    Used by the anchored residual warp (engine/mcmc.py): mapping a
    transformation residual ``T - T0`` into the anchor's source frame
    requires ``J_{T0}^{-1}``.  Near-singular voxels (folding transforms)
    are guarded with a tiny determinant floor — the fold guard aborts such
    runs anyway.
    """
    a, b, c = jac[0, 0], jac[0, 1], jac[0, 2]
    d, e, f = jac[1, 0], jac[1, 1], jac[1, 2]
    g, h, i = jac[2, 0], jac[2, 1], jac[2, 2]
    det = det_jacobian(jac)
    det = jnp.where(jnp.abs(det) < 1e-6, jnp.where(det < 0, -1e-6, 1e-6), det)
    cof = jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e]),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f]),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d]),
    ])
    return cof / det


def count_non_diffeomorphic(det_J: jnp.ndarray) -> jnp.ndarray:
    """Number of voxels with non-positive Jacobian determinant.

    The reference counts NaNs of ``log det J`` (utils/util.py:209-212), which
    is exactly the count of ``det_J <= 0``; counting directly avoids the NaN
    round-trip.
    """
    return jnp.sum(det_J <= 0.0, axis=tuple(range(det_J.ndim))[-3:])
