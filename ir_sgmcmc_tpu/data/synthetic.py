"""Synthetic image pairs for tests and benchmarks (no data dependency).

The reference's tests warp spheres and Shepp-Logan-like phantoms
(/root/reference/tests/test_warping.py); these generators provide
fixed/moving pairs with known ground-truth structure so trainer-level tests
can assert that registration actually improves alignment.
"""

from __future__ import annotations

import numpy as np


def sphere(shape, centre, radius, value=1.0, soft=True):
    zz, yy, xx = np.meshgrid(*(np.arange(s, dtype=np.float32) for s in shape), indexing="ij")
    d2 = (zz - centre[0]) ** 2 + (yy - centre[1]) ** 2 + (xx - centre[2]) ** 2
    if soft:
        return value * np.exp(-d2 / (2.0 * (radius / 2.0) ** 2)).astype(np.float32)
    return (d2 < radius**2).astype(np.float32) * value


def sphere_pair(shape=(16, 16, 16), offset=(0.0, 0.0, 2.0), radius=None, seed=0):
    """Fixed/moving dict pair: a textured soft sphere and its translated copy.

    The moving volume is the *same* textured volume rolled by ``offset``
    (rounded to voxels) — a genuinely registrable pair: the texture gives
    the LCC residual map real alignment signal, unlike independent noise
    per volume, which local contrast normalisation turns into an
    irreducible residual floor.

    Returns dicts with ``im`` (float), ``mask`` (bool, everything), ``seg``
    (int16 hard sphere label 1), matching the reference data layout
    (data_loader/datasets.py:107-137) minus the batch axis.
    """
    shape = tuple(shape)
    radius = radius if radius is not None else shape[0] / 4.0
    c = np.asarray(shape, np.float32) / 2.0
    rng = np.random.default_rng(seed)

    im = sphere(shape, c, radius)
    # smooth multiplicative texture so contrast-normalised residuals see it
    texture = rng.standard_normal(shape).astype(np.float32)
    for ax in range(3):
        texture = (np.roll(texture, 1, ax) + texture + np.roll(texture, -1, ax)) / 3.0
    im = im * (1.0 + 0.3 * texture) + 0.02 * rng.standard_normal(shape).astype(np.float32)
    seg = sphere(shape, c, radius * 0.8, soft=False).astype(np.int16)
    mask = np.ones(shape, dtype=bool)
    fixed = {"im": im.astype(np.float32), "mask": mask, "seg": seg}

    shift = [int(round(o)) for o in np.asarray(offset, np.float32)]
    moving = {
        "im": np.roll(im, shift, axis=(0, 1, 2)).astype(np.float32),
        "mask": mask,
        "seg": np.roll(seg, shift, axis=(0, 1, 2)),
    }
    return fixed, moving


def svf_pair(shape=(32, 32, 32), magnitude=4.0, seed=0):
    """Fixed/moving pair deformed by a KNOWN random smooth SVF.

    The moving volume is a textured soft sphere; the fixed volume is the
    moving volume warped by the ground-truth diffeomorphism ``T_gt``
    (integrated from a heavily-smoothed random velocity scaled so the peak
    displacement magnitude is ``magnitude`` voxels).  A perfect registration
    of moving -> fixed therefore recovers exactly ``disp_gt``, making
    displacement error and per-voxel uncertainty *calibration* measurable
    (VERDICT round-1 next-step #3).

    :return: ``(fixed, moving, disp_gt)`` — dicts as in :func:`sphere_pair`
        plus the ground-truth voxel-unit displacement ``(3, D, H, W)``.
    """
    import jax.numpy as jnp

    from ..models.transformation import SVF3D
    from ..ops.resample import warp

    shape = tuple(shape)
    rng = np.random.default_rng(seed)

    radius = shape[0] / 4.0
    c = np.asarray(shape, np.float32) / 2.0
    im = sphere(shape, c, radius)
    texture = rng.standard_normal(shape).astype(np.float32)
    for ax in range(3):
        texture = (np.roll(texture, 1, ax) + texture + np.roll(texture, -1, ax)) / 3.0
    im = im * (1.0 + 0.3 * texture) + 0.02 * rng.standard_normal(shape).astype(np.float32)
    seg = sphere(shape, c, radius * 0.8, soft=False).astype(np.int16)
    mask = np.ones(shape, dtype=bool)
    moving = {"im": im.astype(np.float32), "mask": mask, "seg": seg}

    # random velocity, heavily smoothed (30 box passes -> very smooth,
    # diffeomorphic after integration), scaled to the target magnitude
    v = rng.standard_normal((3,) + shape).astype(np.float32)
    for _ in range(30):
        for ax in (1, 2, 3):
            v = (np.roll(v, 1, ax) + v + np.roll(v, -1, ax)) / 3.0
    norm = np.sqrt((v**2).sum(axis=0))
    v *= magnitude / max(float(norm.max()), 1e-6)

    svf = SVF3D(shape, no_steps=12, use_gather=True)  # exact, unbounded
    T_gt, disp_gt = svf(jnp.asarray(v))
    fixed = {
        "im": np.asarray(warp(jnp.asarray(moving["im"]), T_gt, method="linear")),
        "mask": mask,
        "seg": np.asarray(warp(jnp.asarray(seg), T_gt, method="nearest")),
    }
    return fixed, moving, np.asarray(disp_gt)


def to_device(pair, jnp):
    return {k: jnp.asarray(v) for k, v in pair.items()}
