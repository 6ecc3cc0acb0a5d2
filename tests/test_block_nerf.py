"""Block-NeRF subsystem tests: embeddings vs reference math, PDF sampling,
volume rendering invariants, hierarchical render, train step, IDW compose."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.models import block_nerf as B
from unboundednerfpytorch_tpu.models.block_nerf import compose, training as T


def _rays(n=8, near=0.1, far=5.0):
    return jnp.concatenate(
        [
            jnp.zeros((n, 3)),
            jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1)),
            jnp.full((n, 1), 0.001),
            jnp.full((n, 1), 1.0),
            jnp.full((n, 1), near),
            jnp.full((n, 1), far),
        ],
        -1,
    )


def test_pos_embedding_matches_reference_ordering():
    x = jnp.array([[0.3, -0.7, 1.2]])
    out = np.asarray(B.pos_embedding(x, 2))
    # per-freq [sin(f x), cos(f x)] blocks (block_nerf_model.py:58-75)
    expect = np.concatenate(
        [np.sin(1 * x), np.cos(1 * x), np.sin(2 * x), np.cos(2 * x)], -1
    )
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_inter_pos_embedding_damps_with_variance():
    mu = jnp.ones((4, 3)) * 0.5
    low = B.inter_pos_embedding(mu, jnp.zeros((4, 3)), 4)
    high = B.inter_pos_embedding(mu, jnp.ones((4, 3)) * 10, 4)
    # large covariance must shrink the encoding toward zero (IPE property)
    assert np.abs(np.asarray(high)).mean() < np.abs(np.asarray(low)).mean() * 0.5


def test_sample_pdf_concentrates_on_heavy_bins():
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 17), (2, 17))
    w = np.full((2, 16), 1e-4, np.float32)
    w[:, 8] = 10.0  # all mass in bin 8 (z in [0.5, 0.5625])
    samples = np.asarray(B.sample_pdf(jnp.asarray(bins), jnp.asarray(w), 32))
    frac_in = ((samples > 0.45) & (samples < 0.62)).mean()
    assert frac_in > 0.8


def test_volume_rendering_conservation():
    rng = np.random.RandomState(0)
    z = np.sort(rng.rand(4, 17).astype(np.float32), -1) * 5
    sig = rng.rand(4, 16).astype(np.float32) * 3
    rgb = rng.rand(4, 16, 3).astype(np.float32)
    res = B.volume_rendering(
        jnp.asarray(rgb), jnp.asarray(sig), jnp.asarray(z),
        jnp.asarray(0.5 * (z[:, :-1] + z[:, 1:])),
    )
    w = np.asarray(res["weights"])
    Ti = np.asarray(res["transmittance"])
    assert np.all(w >= 0) and np.all(w.sum(-1) <= 1 + 1e-5)
    assert np.allclose(Ti[:, 0], 1.0)


@pytest.mark.slow
def test_render_rays_and_train_step():
    key = jax.random.PRNGKey(0)
    params = B.create(key, n_appearance=4)
    rays = _rays(8)
    ts = jnp.zeros((8,), jnp.int32)
    res = B.render_rays(params, rays, ts, key=jax.random.PRNGKey(1),
                        n_samples=8, n_importance=8)
    assert res["rgb_fine"].shape == (8, 3)
    assert np.isfinite(np.asarray(res["rgb_fine"])).all()
    # fine pass has N_samples + N_importance + 1 intervals
    assert res["transmittance_fine_real"].shape == (8, 17)

    state = T.create_state(key, n_appearance=4)
    step = T.make_train_step(n_samples=8, n_importance=8)
    batch = {"rays": rays, "rgbs": jnp.ones((8, 3)) * 0.5, "ts": ts}
    losses = []
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(i + 2))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_compose_idw():
    H = W = 4
    res = {
        "a": {
            "rgb_fine": np.full((H * W, 3), 0.2, np.float32),
            "depth_fine": np.ones(H * W, np.float32),
            "distance_weight": 3.0,
        },
        "b": {
            "rgb_fine": np.full((H * W, 3), 0.8, np.float32),
            "depth_fine": np.ones(H * W, np.float32) * 2,
            "distance_weight": 1.0,
        },
    }
    rgb, depth = compose.inverse_interpolation(res, H, W)
    # weighted 0.75*0.2 + 0.25*0.8 = 0.35 -> 89/255
    assert abs(int(rgb["compose"][0, 0, 0]) - int(0.35 * 255)) <= 2

    blocks = {"block_0": {"elements": [["img_a", 0]]}, "block_1": {"elements": [["img_b", 1]]}}
    assert compose.filter_blocks("img_a", blocks) == ["block_0"]
    assert compose.distance_weight([0, 0, 0], [0, 2, 0], p=4) == pytest.approx(2.0**-4)


def test_dataset_splits_val_test_compose(tmp_path):
    """The reference dataset's val/test/compose splits + nearest-appearance
    lookup (waymo_dataset.py:46-60,177-194,198-276), numpy-first."""
    import json

    import imageio.v2 as imageio

    from unboundednerfpytorch_tpu.models.block_nerf import dataset as D

    H = W = 8
    meta = {}
    for i, name in enumerate(["a", "b"]):
        c2w = np.eye(4)[:3]
        c2w[1, 3] = 0.05 * i
        meta[name] = {
            "c2w": c2w.tolist(), "intrinsics": [8.0, 8.0], "W": W, "H": H,
            "equivalent_exposure": 1.0, "image_name": name,
            "cam_idx": 0, "origin_pos": [0.0, 0.05 * i, 0.0],
        }
    val_dir = tmp_path / "val"
    (val_dir / "rgbs").mkdir(parents=True)
    with open(val_dir / "split_block_val.json", "w") as f:
        json.dump({"block_0": {"elements": [["a", 0], ["b", 1]]}}, f)
    with open(val_dir / "val_all_meta.json", "w") as f:
        json.dump(meta, f)
    for name in meta:
        imageio.imwrite(val_dir / "rgbs" / f"{name}.png",
                        np.zeros((H, W, 3), np.uint8))

    views = D.load_val_rays(str(tmp_path), "block_0", img_downscale=1)
    assert len(views) == 2
    rays, rgbs, ts, hw, name = views[0]
    assert rays.shape == (H * W, 10) and rgbs.shape == (H * W, 3)
    assert hw == (H, W) and name == "a"

    frames = D.gen_test_rays(meta["a"], 0, n_frames=4, img_downscale=1)
    assert len(frames) == 4
    # y slides by dy_max across the trajectory
    assert abs(frames[-1][0][0, 1] - frames[0][0][0, 1]) > 0.0

    comp = D.gen_compose_rays(meta, "b", "a", 1, frame_step=0.01,
                              img_downscale=1)
    assert len(comp) == 5  # 0.05 y-distance / 0.01
    # appearance id threads through
    assert int(comp[0][1][0]) == 1

    # nearest appearance: same cam, closest origin
    q = {"cam_idx": 0, "origin_pos": [0.0, 0.04, 0.0]}
    assert D.find_nearest_appearance_idx(
        q, [["a", 0], ["b", 1]], meta) == 1
