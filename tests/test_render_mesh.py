"""Distributed rendering: a data-mesh-sharded render must match the
single-device render exactly (renderer.render_image mesh= path)."""

import numpy as np

import jax

from unboundednerfpytorch_tpu.data import synthetic
from unboundednerfpytorch_tpu.models import fourier_grid as fg
from unboundednerfpytorch_tpu.parallel import mesh as mesh_mod
from unboundednerfpytorch_tpu.render import renderer


def test_mesh_render_matches_single_device():
    cfg = fg.FourierGridConfig(
        scene_center=(0.0, 0.0, 0.0),
        scene_radius=(1.0, 1.0, 1.0),
        num_voxels_density=24**3,
        num_voxels_rgb=24**3,
        num_voxels_base_density=24**3,
        num_voxels_base_rgb=24**3,
        alpha_init=1e-2,
        fast_color_thres=1e-4,
        fourier_freq_num=2,
        rgbnet_dim=6,
        stepsize=1.0,
    )
    params = fg.create(cfg, jax.random.PRNGKey(0))
    params = params.replace(
        density=params.density.replace(
            grid=params.density.grid
            + jax.random.normal(jax.random.PRNGKey(1), params.density.grid.shape)
        )
    )

    def fwd(aux, ro, rd, vd):
        return fg.forward(aux, cfg, ro, rd, vd, bg=1.0)

    H = W = 16
    K = np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]], np.float32)
    pose = synthetic.look_at_pose(np.array([2.5, 0.3, 0.8]), np.zeros(3))

    rgb1, depth1, bg1 = renderer.render_image(
        fwd, H, W, K, pose[:3, :4], chunk=64, aux=params
    )
    mesh = mesh_mod.make_mesh(8)
    rgb2, depth2, bg2 = renderer.render_image(
        fwd, H, W, K, pose[:3, :4], chunk=64, aux=params, mesh=mesh
    )
    np.testing.assert_allclose(rgb2, rgb1, atol=1e-5)
    np.testing.assert_allclose(depth2, depth1, atol=1e-5)
    np.testing.assert_allclose(bg2, bg1, atol=1e-5)
