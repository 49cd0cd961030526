"""Host-side subsystem tests: NIfTI/VTK IO, dataset pipeline, resize oracles,
metrics, Fourier ops, figure/plot builders."""

import numpy as np
import pytest

from ir_sgmcmc_tpu.data.dataset import (
    NiftiPairDataset,
    SyntheticPairDataset,
    _pad_to_cube,
    _resize_nearest,
    _resize_trilinear,
    make_dataset,
)
from ir_sgmcmc_tpu.utils.metrics import average_surface_distance, calc_metrics
from ir_sgmcmc_tpu.utils.nifti import read_nifti, write_nifti
from ir_sgmcmc_tpu.utils.vtk_io import read_vtk_field, write_vtk_field


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for dtype in (np.float32, np.int16, np.uint8):
        arr = (rng.random((5, 6, 7)) * 100).astype(dtype)
        p = tmp_path / f"vol_{np.dtype(dtype).name}.nii.gz"
        write_nifti(p, arr, spacing=(1.5, 2.0, 2.5))
        back, spacing = read_nifti(p)
        np.testing.assert_array_equal(back, arr)
        np.testing.assert_allclose(spacing, (1.5, 2.0, 2.5))


def test_vtk_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    field = rng.standard_normal((3, 4, 5, 6)).astype(np.float32)
    p = tmp_path / "field.vtk"
    write_vtk_field(p, field, spacing=(1.0, 1.0, 1.0))
    back = read_vtk_field(p)
    np.testing.assert_allclose(back, field, atol=1e-6)


def test_resize_trilinear_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    vol = rng.standard_normal((9, 9, 9)).astype(np.float32)
    ours = _resize_trilinear(vol, (5, 7, 6))
    theirs = F.interpolate(torch.from_numpy(vol)[None, None], size=(5, 7, 6),
                           mode="trilinear", align_corners=True)[0, 0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_resize_nearest_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    vol = (rng.random((8, 9, 10)) * 50).astype(np.float32)
    ours = _resize_nearest(vol, (5, 5, 5))
    theirs = F.interpolate(torch.from_numpy(vol)[None, None], size=(5, 5, 5),
                           mode="nearest")[0, 0].numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_pad_to_cube():
    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    out = _pad_to_cube(vol)
    assert out.shape == (4, 4, 4)
    assert out.min() == vol.min()  # minimum-mode padding


def test_nifti_pair_dataset(tmp_path):
    rng = np.random.default_rng(4)
    (tmp_path / "masks").mkdir()
    (tmp_path / "segs").mkdir()
    for i in range(2):
        vol = rng.random((10, 12, 8)).astype(np.float32)
        write_nifti(tmp_path / f"subj{i}.nii.gz", vol.transpose(2, 1, 0))
        write_nifti(tmp_path / "masks" / f"subj{i}.nii.gz",
                    np.ones((8, 12, 10), np.uint8))
        seg = (rng.random((8, 12, 10)) > 0.7).astype(np.int16)
        write_nifti(tmp_path / "segs" / f"subj{i}.nii.gz", seg)

    ds = NiftiPairDataset(dims=(6, 6, 6), data_dir=tmp_path, save_dir=tmp_path)
    assert len(ds) == 1
    fixed, moving, q_v = ds[0]
    assert fixed["im"].shape == (6, 6, 6) and fixed["im"].dtype == np.float32
    assert moving["mask"].dtype == bool and moving["seg"].dtype == np.int16
    assert q_v["mu"].shape == (3, 6, 6, 6)
    assert np.allclose(q_v["log_var"], 2 * np.log(0.5))
    assert (tmp_path / "idx_to_id.json").exists()

    ds_cg = NiftiPairDataset(dims=(6, 6, 6), data_dir=tmp_path, cps=(2, 2, 2))
    assert ds_cg.init_q_v()["mu"].shape[0] == 3
    assert all(s > 6 // 2 for s in ds_cg.init_q_v()["mu"].shape[1:])


def test_make_dataset_factory():
    ds = make_dataset("SyntheticDataLoader", dims=(8, 8, 8))
    assert isinstance(ds, SyntheticPairDataset)
    fixed, moving, q_v = ds[0]
    assert fixed["im"].shape == (8, 8, 8)
    with pytest.raises(ValueError):
        make_dataset("UnknownLoader", dims=(8, 8, 8))


def test_average_surface_distance_oracle():
    # two 4-voxel cubes offset by 2 along z: symmetric ASD == 2
    a = np.zeros((12, 12, 12), np.int16)
    b = np.zeros((12, 12, 12), np.int16)
    a[4:8, 4:8, 2:4] = 1
    b[4:8, 4:8, 4:6] = 1
    asd = average_surface_distance(a, b, 1)
    assert 1.0 <= asd <= 2.0  # surfaces are 2 apart at the far faces
    asd_same = average_surface_distance(a, a, 1)
    assert asd_same == 0.0
    assert np.isinf(average_surface_distance(a, np.zeros_like(b), 1))


def test_calc_metrics_shapes():
    rng = np.random.default_rng(5)
    seg = (rng.random((2, 8, 8, 8)) * 3).astype(np.int16)
    asd, dsc = calc_metrics(seg[:1], seg, {"a": 1, "b": 2})
    assert asd.shape == (2, 2) and dsc.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(dsc)[0], 1.0)  # self-comparison


def test_fourier_ops():
    import jax.numpy as jnp

    from ir_sgmcmc_tpu.ops.fourier import (
        fourier_derivative_magnitude,
        gaussian_grad_smooth,
        gaussian_smooth_fft,
    )

    const = jnp.ones((1, 8, 8, 8), jnp.float32)
    d = fourier_derivative_magnitude(const)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-5)

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((8, 8, 8)).astype(np.float32))
    sm = gaussian_smooth_fft(x, 2.0)
    assert float(jnp.var(sm)) < float(jnp.var(x))
    np.testing.assert_allclose(float(jnp.mean(sm)), float(jnp.mean(x)), atol=1e-5)

    import jax

    g = jax.grad(lambda v: float(0.0) + jnp.sum(gaussian_grad_smooth(v, 2.0) * x))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(x), atol=1e-6)


def test_figures_and_plots_smoke():
    pytest.importorskip("matplotlib")
    from ir_sgmcmc_tpu.utils import figures, plots

    rng = np.random.default_rng(7)
    res = rng.standard_normal((8, 8, 8)).astype(np.float32)
    mask = np.ones((8, 8, 8), bool)
    fig = figures.residual_histogram(res, mask, np.log([0.5, 0.5]), np.log([0.3, 1.0]))
    assert fig is not None
    assert figures.image_grid({"a": res, "b": res}) is not None
    field = rng.standard_normal((3, 8, 8, 8)).astype(np.float32)
    assert figures.field_norm_grid({"f": field}) is not None
    assert figures.sample_grid(res, field, res) is not None
    assert plots.plot_2d(field[:2, 4]) is not None
    assert plots.plot_grid(field * 0.01 + np.linspace(-1, 1, 8)[None, None, None, :]) is not None

    import matplotlib.pyplot as plt

    plt.close("all")


def test_asd_matches_bruteforce_average_hausdorff():
    """The EDT-based ASD equals the SimpleITK AverageHausdorffDistance
    definition (/root/reference/utils/util.py:151-206): mean over both
    contours of each surface voxel's distance to the other contour —
    verified against an exact brute-force pairwise computation, including
    anisotropic spacing."""
    from scipy.spatial import cKDTree

    from ir_sgmcmc_tpu.utils.metrics import _surface, average_surface_distance

    rng = np.random.default_rng(7)
    dims = (20, 20, 20)
    zz, yy, xx = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")

    def ball(c, r):
        return ((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2) <= r**2

    seg_a = ball((9, 9, 9), 5).astype(np.int16)
    seg_b = ball((10, 8, 9.5), 4).astype(np.int16)

    for spacing in [(1.0, 1.0, 1.0), (2.0, 1.0, 0.5)]:
        ours = average_surface_distance(seg_a, seg_b, 1, spacing)

        sa = np.argwhere(_surface(seg_a == 1)) * np.asarray(spacing)
        sb = np.argwhere(_surface(seg_b == 1)) * np.asarray(spacing)
        d_ab = cKDTree(sb).query(sa)[0]
        d_ba = cKDTree(sa).query(sb)[0]
        brute = (d_ab.sum() + d_ba.sum()) / (len(sa) + len(sb))
        np.testing.assert_allclose(ours, brute, rtol=1e-5)

    # identical shapes -> exactly zero; empty structure -> inf
    assert average_surface_distance(seg_a, seg_a, 1) == 0.0
    assert average_surface_distance(seg_a, np.zeros(dims, np.int16), 1) == float("inf")
