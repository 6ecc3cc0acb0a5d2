"""Reference-checkpoint importer gates (utils/reference_import.py).

Fixtures are synthetic checkpoints in the REFERENCE's exact on-disk format —
key names and tensor layouts from ``FourierGrid_ckpt_manager.py:44-51`` /
``FourierGrid_grid.py:53-58`` / ``grid.py:48`` / ``FourierGrid_model.py:234-241``
— so a conversion bug (wrong transpose, wrong MLP layer order, wrong
act_shift handling) fails against an independent torch evaluation of the
same tensors."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from unboundednerfpytorch_tpu.utils import reference_import as ri


def _reference_rgbnet(dim0, width, depth):
    """The reference's exact rgbnet construction
    (FourierGrid_model.py:234-241) — nested Sequential key structure."""
    torch.manual_seed(3)
    return nn.Sequential(
        nn.Linear(dim0, width), nn.ReLU(inplace=True),
        *[
            nn.Sequential(nn.Linear(width, width), nn.ReLU(inplace=True))
            for _ in range(depth - 2)
        ],
        nn.Linear(width, 3),
    )


def _bank_grid(rng, banks, channels, n):
    return torch.tensor(
        rng.standard_normal((banks, channels, n, n, n)).astype(np.float32)
    )


def _torch_bank_query(grid, xyz_norm_m11, num_freqs):
    """Independent torch evaluation of the Fourier-bank query
    (FourierGrid_grid.py:60-78 semantics)."""
    B, C = grid.shape[0], grid.shape[1]
    M = xyz_norm_m11.shape[0]
    ind = xyz_norm_m11.flip(-1)
    banks = [ind]
    freqs = 2 ** torch.arange(num_freqs, dtype=torch.float32)
    for k in range(num_freqs):
        banks.append(torch.sin(freqs[k] * ind))
        banks.append(torch.cos(freqs[k] * ind))
    out = 0
    for b in range(B):
        coords = banks[b].reshape(1, 1, 1, M, 3)
        v = F.grid_sample(grid[b : b + 1], coords, mode="bilinear",
                          align_corners=True)
        out = out + v.reshape(C, M).T
    return out / B


# ---------------------------------------------------------------------------
# FourierGrid family
# ---------------------------------------------------------------------------


def _fourier_ckpt(num_freqs=2, n=11, k0_dim=4, width=16, depth=3,
                  sample_num=-1, img_emb_dim=-1, step=777):
    rng = np.random.default_rng(0)
    banks = 2 * num_freqs + 1
    bg_len = 0.2
    b = 1.0 + bg_len
    kw = {
        "xyz_min": np.array([-b, -b, -b], np.float32),
        "xyz_max": np.array([b, b, b], np.float32),
        "num_voxels_density": n**3,
        "num_voxels_rgb": n**3,
        "num_voxels_viewdir": -1,
        "fourier_freq_num": num_freqs,
        "num_voxels_base_density": n**3,
        "num_voxels_base_rgb": n**3,
        "alpha_init": 1e-2,
        "voxel_size_ratio_density": 1.0,
        "voxel_size_ratio_rgb": 1.0,
        "mask_cache_world_size": [n, n, n],
        "fast_color_thres": {0: 0.0, 1000: 1e-4},  # dict schedule form
        "contracted_norm": "inf",
        "density_type": "FourierGrid",
        "k0_type": "FourierGrid",
        "density_config": {},
        "k0_config": {},
        "sample_num": sample_num,
        "rgbnet_dim": k0_dim,
        "rgbnet_depth": depth,
        "rgbnet_width": width,
        "viewbase_pe": 4,
    }
    dim0 = 3 + 3 * 4 * 2 + k0_dim
    rgbnet = _reference_rgbnet(dim0, width, depth)
    sd = {
        "scene_center": torch.tensor([0.1, -0.2, 0.3]),
        "scene_radius": torch.tensor([2.0, 2.0, 2.0]),
        "xyz_min": torch.tensor([-b, -b, -b]),
        "xyz_max": torch.tensor([b, b, b]),
        "act_shift": torch.tensor([np.log(1 / (1 - 1e-2) - 1) - 0.4]),
        "viewfreq": torch.tensor([2.0**i for i in range(4)]),
    }
    # the reference's grids are shaped by its derived lattice (num_voxels →
    # world_size with float truncation); mirror that via the translated config
    m = ri._fourier_cfg(kw, sd, {}).world_size_density[0]
    kw["mask_cache_world_size"] = [m, m, m]
    # grid modules register xyz_min/xyz_max buffers, MaskGrid registers the
    # affine lookup transform (FourierGrid_grid.py:48-49,155-158) — all part
    # of the reference's on-disk state dict
    scale = torch.full((3,), (m - 1) / (2 * b))
    sd.update({
        "density.grid": _bank_grid(rng, banks, 1, m),
        "density.xyz_min": torch.tensor([-b, -b, -b]),
        "density.xyz_max": torch.tensor([b, b, b]),
        "k0.grid": _bank_grid(rng, banks, k0_dim, m),
        "k0.xyz_min": torch.tensor([-b, -b, -b]),
        "k0.xyz_max": torch.tensor([b, b, b]),
        "mask_cache.mask": torch.tensor(rng.random((m, m, m)) > 0.3),
        "mask_cache.xyz2ijk_scale": scale,
        "mask_cache.xyz2ijk_shift": b * scale,
    })
    sd.update({f"rgbnet.{k}": v for k, v in rgbnet.state_dict().items()})
    if img_emb_dim > 0 and sample_num > 0:
        sd["img_embeddings.weight"] = torch.tensor(
            rng.standard_normal((sample_num, img_emb_dim)).astype(np.float32)
        )
    return {
        "global_step": step,
        "model_kwargs": kw,
        "model_state_dict": sd,
        "optimizer_state_dict": {},
    }, rgbnet


def test_fourier_import_field_query_parity():
    ckpt, rgbnet = _fourier_ckpt(sample_num=5, img_emb_dim=3)
    family, cfg, params, step = ri.convert_reference_ckpt(ckpt)
    assert family == "FourierGrid" and step == 777
    assert cfg.fourier_freq_num == 2 and cfg.bg_len == pytest.approx(0.2)
    assert cfg.fast_color_thres == pytest.approx(1e-4)  # last schedule entry
    assert cfg.scene_center == pytest.approx((0.1, -0.2, 0.3))
    # the reference never consumes appearance embeddings in forward
    # (FourierGrid_model.py:202-207 vs :615-637) — they are dropped on import
    assert cfg.img_emb_dim == -1 and params.img_embeddings is None

    # field-query parity at random world points inside the contracted cube
    rng = np.random.default_rng(7)
    xyz = rng.uniform(-1.1, 1.1, (300, 3)).astype(np.float32)
    got_d = np.asarray(params.density(jnp.asarray(xyz)))[..., 0]
    got_k = np.asarray(params.k0(jnp.asarray(xyz)))
    norm = torch.tensor(xyz) / 1.2  # cube is ±(1+bg_len)
    want_d = _torch_bank_query(
        ckpt["model_state_dict"]["density.grid"], norm, 2
    ).numpy()[..., 0]
    want_k = _torch_bank_query(
        ckpt["model_state_dict"]["k0.grid"], norm, 2
    ).numpy()
    np.testing.assert_allclose(got_d, want_d, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got_k, want_k, rtol=2e-4, atol=2e-5)

    # rgbnet parity (nested Sequential flattening + [out,in]->[in,out])
    x = rng.standard_normal((64, 3 + 24 + 4)).astype(np.float32)
    with torch.no_grad():
        want = rgbnet(torch.tensor(x)).numpy()
    got = np.asarray(params.rgbnet(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # buffers
    assert float(params.act_shift) == pytest.approx(
        float(ckpt["model_state_dict"]["act_shift"][0])
    )
    np.testing.assert_array_equal(
        np.asarray(params.mask_cache.mask),
        ckpt["model_state_dict"]["mask_cache.mask"].numpy(),
    )


def test_fourier_import_renders(tmp_path):
    """Imported checkpoint round-trips through save_model/load_model and
    renders finite pixels through the production forward."""
    from unboundednerfpytorch_tpu.models import fourier_grid as fg
    from unboundednerfpytorch_tpu.utils import checkpoint as ckpt_mod

    ckpt, _ = _fourier_ckpt()
    tar = tmp_path / "fine_last.tar"
    torch.save(ckpt, tar)
    out = tmp_path / "imported"
    family, cfg, params, step = ri.import_checkpoint(str(tar), out_dir=str(out))

    family2, cfg2, params2, step2, _ = ckpt_mod.load_model(str(out))
    assert (family2, step2) == (family, 777)
    np.testing.assert_allclose(
        np.asarray(params2.density.grid), np.asarray(params.density.grid)
    )

    # load_model also accepts the raw reference .tar transparently
    family3, _, params3, step3, opt3 = ckpt_mod.load_model(str(tar))
    assert (family3, step3, opt3) == (family, 777, None)
    np.testing.assert_allclose(
        np.asarray(params3.k0.grid), np.asarray(params.k0.grid)
    )

    rng = np.random.default_rng(1)
    ro = jnp.asarray(rng.uniform(-0.5, 0.5, (32, 3)).astype(np.float32))
    rd = rng.standard_normal((32, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    res = fg.forward(params2, cfg2, ro, rd, rd, bg=1.0)
    assert bool(jnp.all(jnp.isfinite(res.rgb_marched)))


# ---------------------------------------------------------------------------
# DVGO / DCVGO / DMPIGO families
# ---------------------------------------------------------------------------


def _dense(rng, c, n):
    return torch.tensor(
        rng.standard_normal((1, c, n, n, n)).astype(np.float32)
    )


def test_dvgo_import_query_parity():
    rng = np.random.default_rng(2)
    n, k0_dim = 10, 6
    kw = {
        "xyz_min": np.array([-1.5, -1.5, -1.5], np.float32),
        "xyz_max": np.array([1.5, 1.5, 1.5], np.float32),
        "num_voxels": n**3,
        "num_voxels_base": n**3,
        "alpha_init": 1e-2,
        "voxel_size_ratio": 1.0,
        "mask_cache_path": None,
        "mask_cache_thres": 1e-3,
        "mask_cache_world_size": [n, n, n],
        "fast_color_thres": 1e-4,
        "density_type": "DenseGrid",
        "k0_type": "DenseGrid",
        "density_config": {},
        "k0_config": {},
        "rgbnet_dim": k0_dim,
        "rgbnet_direct": True,
        "rgbnet_full_implicit": False,
        "rgbnet_depth": 3,
        "rgbnet_width": 16,
        "viewbase_pe": 4,
    }
    rgbnet = _reference_rgbnet(3 + 24 + k0_dim, 16, 3)
    m = ri._dvgo_cfg(kw, {}).world_size[0]
    kw["mask_cache_world_size"] = [m, m, m]
    sd = {
        "xyz_min": torch.tensor(kw["xyz_min"]),
        "xyz_max": torch.tensor(kw["xyz_max"]),
        "act_shift": torch.tensor([np.log(1 / (1 - 1e-2) - 1)]),
        "density.grid": _dense(rng, 1, m),
        "k0.grid": _dense(rng, k0_dim, m),
        "mask_cache.mask": torch.tensor(rng.random((m, m, m)) > 0.5),
    }
    sd.update({f"rgbnet.{k}": v for k, v in rgbnet.state_dict().items()})
    ckpt = {"global_step": 5, "model_kwargs": kw, "model_state_dict": sd}

    family, cfg, params, _ = ri.convert_reference_ckpt(ckpt)
    assert family == "dvgo" and cfg.rgbnet_direct is True

    xyz = rng.uniform(-1.4, 1.4, (200, 3)).astype(np.float32)
    got = np.asarray(params.k0(jnp.asarray(xyz)))
    ind = (torch.tensor(xyz) / 1.5).flip(-1).reshape(1, 1, 1, -1, 3)
    want = (
        F.grid_sample(sd["k0.grid"], ind, mode="bilinear", align_corners=True)
        .reshape(k0_dim, -1).T.numpy()
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dcvgo_import_detects_family():
    rng = np.random.default_rng(4)
    n = 8
    b = 1.2
    kw = {
        "xyz_min": np.array([-b, -b, -b], np.float32),
        "xyz_max": np.array([b, b, b], np.float32),
        "num_voxels": n**3,
        "num_voxels_base": n**3,
        "alpha_init": 1e-2,
        "voxel_size_ratio": 1.0,
        "mask_cache_world_size": [n, n, n],
        "fast_color_thres": 0.0,
        "contracted_norm": "inf",
        "density_type": "DenseGrid",
        "k0_type": "DenseGrid",
        "density_config": {},
        "k0_config": {},
        "rgbnet_dim": 4,
        "rgbnet_depth": 3,
        "rgbnet_width": 16,
        "viewbase_pe": 4,
    }
    rgbnet = _reference_rgbnet(3 + 24 + 4, 16, 3)
    sd = {
        "scene_center": torch.tensor([1.0, 2.0, 3.0]),
        "scene_radius": torch.tensor([4.0, 4.0, 4.0]),
        "act_shift": torch.tensor([0.5]),
        "density.grid": _dense(rng, 1, n),
        "k0.grid": _dense(rng, 4, n),
        "mask_cache.mask": torch.ones(n, n, n, dtype=torch.bool),
    }
    sd.update({f"rgbnet.{k}": v for k, v in rgbnet.state_dict().items()})
    ckpt = {"global_step": 1, "model_kwargs": kw, "model_state_dict": sd}
    family, cfg, params, _ = ri.convert_reference_ckpt(ckpt)
    assert family == "dcvgo"
    assert cfg.scene_center == pytest.approx((1.0, 2.0, 3.0))
    assert cfg.bg_len == pytest.approx(0.2)
    assert float(params.act_shift) == pytest.approx(0.5)


def test_dmpigo_import_act_shift_grid():
    rng = np.random.default_rng(5)
    depth_planes = 16
    kw = {
        "xyz_min": np.array([-1.0, -1.0, -1.0], np.float32),
        "xyz_max": np.array([1.0, 1.0, 1.0], np.float32),
        "num_voxels": 8 * 8 * depth_planes,
        "mpi_depth": depth_planes,
        "voxel_size_ratio": 256.0 / depth_planes,
        "mask_cache_path": None,
        "mask_cache_thres": 1e-3,
        "fast_color_thres": 0.0,
        "density_type": "DenseGrid",
        "k0_type": "DenseGrid",
        "density_config": {},
        "k0_config": {},
        "rgbnet_dim": 0,
        "rgbnet_depth": 3,
        "rgbnet_width": 16,
        "viewbase_pe": 0,
    }
    # build config first to learn the translated world size, then shape the
    # reference tensors to it (the reference's grids always match its kwargs)
    cfg = ri._dmpigo_cfg(kw, {})
    X, Y, Z = cfg.world_size
    kw["mask_cache_world_size"] = [X, Y, Z]
    cfg = ri._dmpigo_cfg(kw, {})
    act = rng.standard_normal(depth_planes).astype(np.float32)
    sd = {
        "act_shift.grid": torch.tensor(act.reshape(1, 1, 1, 1, depth_planes)),
        "density.grid": torch.tensor(
            rng.standard_normal((1, 1, X, Y, Z)).astype(np.float32)
        ),
        "k0.grid": torch.tensor(
            rng.standard_normal((1, 3, X, Y, Z)).astype(np.float32)
        ),
        "mask_cache.mask": torch.ones(X, Y, Z, dtype=torch.bool),
    }
    ckpt = {"global_step": 2, "model_kwargs": kw, "model_state_dict": sd}
    family, cfg, params, _ = ri.convert_reference_ckpt(ckpt)
    assert family == "dmpigo"
    np.testing.assert_allclose(np.asarray(params.act_shift), act)


def test_dvgo_tensorf_import_query_parity():
    """TensoRF k0 import: plane/vector/f_vec layout translation gated against
    an independent torch evaluation of the reference's compute_tensorf_feat
    (grid.py:130-189)."""
    rng = np.random.default_rng(6)
    n, R, C = 10, 4, 6
    kw = {
        "xyz_min": np.array([-1.5, -1.5, -1.5], np.float32),
        "xyz_max": np.array([1.5, 1.5, 1.5], np.float32),
        "num_voxels": n**3,
        "num_voxels_base": n**3,
        "alpha_init": 1e-2,
        "voxel_size_ratio": 1.0,
        "mask_cache_thres": 1e-3,
        "fast_color_thres": 0.0,
        "density_type": "DenseGrid",
        "k0_type": "TensoRFGrid",
        "density_config": {},
        "k0_config": {"n_comp": R},
        "rgbnet_dim": C,
        "rgbnet_direct": True,
        "rgbnet_full_implicit": False,
        "rgbnet_depth": 3,
        "rgbnet_width": 16,
        "viewbase_pe": 4,
    }
    m = ri._dvgo_cfg(kw, {}).world_size[0]
    kw["mask_cache_world_size"] = [m, m, m]
    t = lambda *s: torch.tensor(rng.standard_normal(s).astype(np.float32))
    rgbnet = _reference_rgbnet(3 + 24 + C, 16, 3)
    sd = {
        "act_shift": torch.tensor([0.0]),
        "density.grid": _dense(rng, 1, m),
        "k0.xy_plane": t(1, R, m, m),
        "k0.xz_plane": t(1, R, m, m),
        "k0.yz_plane": t(1, R, m, m),
        "k0.x_vec": t(1, R, m, 1),
        "k0.y_vec": t(1, R, m, 1),
        "k0.z_vec": t(1, R, m, 1),
        "k0.f_vec": t(3 * R, C),
        "mask_cache.mask": torch.ones(m, m, m, dtype=torch.bool),
    }
    sd.update({f"rgbnet.{k}": v for k, v in rgbnet.state_dict().items()})
    ckpt = {"global_step": 9, "model_kwargs": kw, "model_state_dict": sd}
    family, cfg, params, _ = ri.convert_reference_ckpt(ckpt)
    assert type(params.k0).__name__ == "TensoRFGrid"

    xyz = rng.uniform(-1.4, 1.4, (150, 3)).astype(np.float32)
    got = np.asarray(params.k0(jnp.asarray(xyz)))

    # independent torch evaluation (compute_tensorf_feat semantics)
    ind = torch.tensor(xyz / 1.5).reshape(1, 1, -1, 3)
    ind = torch.cat([ind, torch.zeros_like(ind[..., [0]])], -1)
    gs = lambda g, ix: (
        F.grid_sample(g, ind[..., ix], mode="bilinear", align_corners=True)
        .flatten(0, 2).T
    )
    feat = torch.cat(
        [
            gs(sd["k0.xy_plane"], [1, 0]) * gs(sd["k0.z_vec"], [3, 2]),
            gs(sd["k0.xz_plane"], [2, 0]) * gs(sd["k0.y_vec"], [3, 1]),
            gs(sd["k0.yz_plane"], [2, 1]) * gs(sd["k0.x_vec"], [3, 0]),
        ],
        dim=-1,
    )
    want = (feat @ sd["k0.f_vec"]).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_import_rejects_shape_mismatch():
    ckpt, _ = _fourier_ckpt()
    ckpt["model_state_dict"]["density.grid"] = torch.zeros(5, 1, 7, 7, 7)
    with pytest.raises(ValueError, match="shape mismatch"):
        ri.convert_reference_ckpt(ckpt)


# ---------------------------------------------------------------------------
# export (native -> reference .tar) round trip
# ---------------------------------------------------------------------------


def test_export_roundtrip_fourier():
    """export -> import must reproduce the native params exactly, and the
    exported key set must equal what the reference's own save would write
    (so a strict load_state_dict on the reference side succeeds)."""
    ckpt, _ = _fourier_ckpt(sample_num=-1)
    family, cfg, params, step = ri.convert_reference_ckpt(ckpt)
    ref = ri.convert_to_reference(family, cfg, params, global_step=step)

    # key-set parity with the reference-format fixture (the fixture mirrors
    # the reference module construction, so its state dict IS the key spec)
    assert set(ref["model_state_dict"]) == set(ckpt["model_state_dict"])

    family2, cfg2, params2, step2 = ri.convert_reference_ckpt(ref)
    assert (family2, step2) == (family, step)
    np.testing.assert_allclose(
        np.asarray(params2.density.grid), np.asarray(params.density.grid)
    )
    np.testing.assert_allclose(
        np.asarray(params2.k0.grid), np.asarray(params.k0.grid)
    )
    for w1, w2 in zip(params.rgbnet.weights, params2.rgbnet.weights):
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2))
    np.testing.assert_array_equal(
        np.asarray(params.mask_cache.mask), np.asarray(params2.mask_cache.mask)
    )
    assert float(params.act_shift) == pytest.approx(float(params2.act_shift))
    # grid tensor layout in the tar is the reference's channel-second
    assert ref["model_state_dict"]["k0.grid"].shape[1] == cfg.k0_dim


def test_export_roundtrip_dmpigo():
    from unboundednerfpytorch_tpu.models import dmpigo

    cfg = dmpigo.DMPIGOConfig(
        xyz_min=(-1.0, -1.0, -1.0), xyz_max=(1.0, 1.0, 1.0),
        num_voxels=8 * 8 * 16, mpi_depth=16, rgbnet_dim=4,
        rgbnet_depth=3, rgbnet_width=16, viewbase_pe=0,
    )
    params = dmpigo.create(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(8)
    params = params.replace(
        density=params.density.replace(
            grid=jnp.asarray(
                rng.standard_normal(params.density.grid.shape).astype(np.float32)
            )
        )
    )
    ref = ri.convert_to_reference("dmpigo", cfg, params, global_step=3)
    assert tuple(ref["model_state_dict"]["act_shift.grid"].shape) == (
        1, 1, 1, 1, 16,
    )
    family2, cfg2, params2, _ = ri.convert_reference_ckpt(ref)
    assert family2 == "dmpigo"
    np.testing.assert_allclose(
        np.asarray(params2.density.grid), np.asarray(params.density.grid)
    )
    np.testing.assert_allclose(
        np.asarray(params2.act_shift), np.asarray(params.act_shift)
    )


def test_export_roundtrip_dvgo_tensorf(tmp_path):
    """TensoRF k0: export -> import preserves planes/vectors/f_vec; also
    exercises the file-level export_checkpoint path."""
    from unboundednerfpytorch_tpu.models import dvgo
    from unboundednerfpytorch_tpu.utils import checkpoint as ckpt_mod

    cfg = dvgo.DVGOConfig(
        xyz_min=(-1.5, -1.5, -1.5), xyz_max=(1.5, 1.5, 1.5),
        num_voxels=10**3, num_voxels_base=10**3, alpha_init=1e-2,
        k0_type="TensoRFGrid", k0_config=(("n_comp", 4),),
        rgbnet_dim=6, rgbnet_depth=3, rgbnet_width=16,
    )
    params = dvgo.create(cfg, jax.random.PRNGKey(1))
    ckpt_mod.save_model(str(tmp_path / "native"), "dvgo", cfg, params,
                        global_step=11)
    ref = ri.export_checkpoint(str(tmp_path / "native"),
                               str(tmp_path / "fine_last.tar"))
    assert ref["global_step"] == 11
    family2, cfg2, params2, _ = ri.convert_reference_ckpt(ref)
    np.testing.assert_allclose(
        np.asarray(params2.k0.xy_plane), np.asarray(params.k0.xy_plane)
    )
    np.testing.assert_allclose(
        np.asarray(params2.k0.f_vec), np.asarray(params.k0.f_vec)
    )
    # and the written .tar itself imports
    import torch

    loaded = torch.load(str(tmp_path / "fine_last.tar"), weights_only=False)
    assert ri.detect_family(loaded["model_kwargs"]) == "dvgo"


def test_overlay_render_knobs():
    """Scene-config render knobs must win over converter defaults when a
    reference .tar is used with a config — geometry fields must NOT move."""
    from unboundednerfpytorch_tpu.configs.schema import ModelRenderConfig

    ckpt, _ = _fourier_ckpt()
    _, cfg, _, _ = ri.convert_reference_ckpt(ckpt)
    assert cfg.t_boundary == pytest.approx(1.5)  # converter default
    mr = ModelRenderConfig(
        stepsize=0.7, t_boundary=2.0, sample_budget=48, color_budget=24,
        num_voxels_density=999, num_voxels_rgb=999,  # geometry: ignored
        num_voxels_base_density=999, num_voxels_base_rgb=999,
    )
    out = ri.overlay_render_knobs(cfg, mr)
    assert out.stepsize == pytest.approx(0.7)
    assert out.t_boundary == pytest.approx(2.0)
    assert out.sample_budget == 48 and out.color_budget == 24
    assert out.num_voxels_density == cfg.num_voxels_density  # unchanged
