"""Camera-path generation (render/cam_paths.py — run_gen_cam_paths parity)."""

import os

import numpy as np

from unboundednerfpytorch_tpu.configs.schema import DataConfig, ExpConfig
from unboundednerfpytorch_tpu.data import synthetic
from unboundednerfpytorch_tpu.render import cam_paths


def _data_with_cams(n=12):
    data = synthetic.make_data_dict(n_views=n, H=8, W=8)
    # two physical cameras, camera 0 twice as common -> core camera
    data["cam_idxs"] = [0 if i % 3 != 2 else 1 for i in range(len(data["poses"]))]
    return data


def test_gen_cam_paths_exports(tmp_path):
    data = _data_with_cams()
    cfg = ExpConfig(data=DataConfig(dataset_type="synthetic"))
    out = cam_paths.gen_cam_paths(
        cfg, data, str(tmp_path), straight_length=4, k_nearest=5,
        log_fn=lambda *a: None,
    )
    assert len(out["straight"]) == 4
    assert out["combined"] == out["rotation"] + out["straight"]
    # per-camera npz + combined npz written, loadable, right shapes
    rot = np.load(tmp_path / "rot_cam.npz")
    assert rot["cam_lst"].shape == (len(out["combined"]), 5, 3)
    assert rot["xyz_min"].shape == (3,)
    cam0 = np.load(tmp_path / "cam_0.npz")
    assert cam0["cam_lst"].shape[0] == 1 + len(out["straight"])


def test_select_k_nearest_is_sorted_by_distance():
    pos = np.array([[0, 0, 0], [1, 0, 0], [3, 0, 0], [0.5, 0, 0]])
    idxs = cam_paths.select_k_nearest_points(0, pos, k=2)
    assert idxs == [0, 3, 1]


def test_central_ray_dir_matches_ray_ops():
    import jax.numpy as jnp

    from unboundednerfpytorch_tpu.ops import rays as ray_ops

    data = _data_with_cams(4)
    K = np.asarray(data["Ks"][0])
    c2w = np.asarray(data["poses"][0][:3, :4])
    H, W = (int(v) for v in data["HW"][0])
    _, rd = ray_ops.get_rays(H, W, jnp.asarray(K), jnp.asarray(c2w))
    center = np.asarray(rd)[H // 2, W // 2]
    center = center / np.linalg.norm(center)
    got = cam_paths.central_ray_dir(K, c2w, H, W)
    got = got / np.linalg.norm(got)
    # center pixel sits within half a pixel of the principal point
    np.testing.assert_allclose(center, got, atol=1e-6)
