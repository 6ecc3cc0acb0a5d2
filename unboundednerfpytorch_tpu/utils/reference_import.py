"""Import reference UnboundedNeRFPytorch checkpoints (torch ``.tar``).

Migration path for users of the reference framework: a trained reference
checkpoint — ``{global_step, model_kwargs, model_state_dict,
optimizer_state_dict}`` as written by
``/root/reference/FourierGrid/FourierGrid_ckpt_manager.py:44-51`` and
``run_train.py:313-332`` — is converted into this framework's native
checkpoint (``utils/checkpoint.py``) so it can be rendered, served, baked,
or fine-tuned here without retraining.

Layout translation (reference → TPU-native, channel-last):

=====================  ==============================  =====================
tensor                 reference (torch)               here (jax)
=====================  ==============================  =====================
FourierGrid bank grid  ``[2K+1, C, X, Y, Z]``          ``[2K+1, X, Y, Z, C]``
DenseGrid              ``[1, C, X, Y, Z]``             ``[X, Y, Z, C]``
rgbnet Linear          ``weight [out, in]``            ``[in, out]``
TensoRF plane          ``[1, R, A, B]``                ``[A, B, R]``
TensoRF vector         ``[1, R, A, 1]``                ``[A, R]``
mask_cache.mask        ``[X, Y, Z] bool``              same
dmpigo act_shift       ``DenseGrid [1,1,1,1,D]``       ``[D]``
=====================  ==============================  =====================

Model family detection follows ``load_everything.py:42-50`` semantics but
from the checkpoint itself: the ``model_kwargs`` key set is unique per family
(``fourier_freq_num`` → FourierGrid, ``mpi_depth`` → dmpigo,
``contracted_norm`` → dcvgo, else dvgo).

Optimizer state (per-tensor Adam ``exp_avg``/``exp_avg_sq``) is NOT imported:
the reference stores moments per flat param-group index whose ordering
depends on its module construction order, and a migrated model is typically
rendered or fine-tuned fresh; pass ``--no_reload_optimizer`` semantics apply.
"""

from __future__ import annotations

import re

import numpy as np

import jax.numpy as jnp

__all__ = [
    "detect_family",
    "import_checkpoint",
    "convert_reference_ckpt",
    "convert_to_reference",
    "export_checkpoint",
    "overlay_render_knobs",
]

# Render/train-time knobs that reference checkpoints do NOT store (they are
# config values in the reference too, not model state). When a converted
# .tar is used with a scene config, the config's values must win over the
# converter's defaults. Geometry/topology fields (num_voxels*, bg_len,
# fourier_freq_num, rgbnet_*) are model state and are NEVER overlaid.
_RENDER_KNOBS = (
    "stepsize",
    "t_boundary",
    "sample_budget",
    "color_budget",
    "budget_probe_stride",
    "density_bake_scale",
    "packed_gather",
)


def overlay_render_knobs(mcfg, cfg_model):
    """Overlay scene-config render knobs onto a config converted from a
    reference checkpoint (which cannot carry them). Only fields present on
    BOTH dataclasses are copied; returns the (possibly replaced) mcfg."""
    import dataclasses

    updates = {}
    for name in _RENDER_KNOBS:
        if hasattr(mcfg, name) and hasattr(cfg_model, name):
            v = getattr(cfg_model, name)
            if v is not None and getattr(mcfg, name) != v:
                updates[name] = v
    return dataclasses.replace(mcfg, **updates) if updates else mcfg


# ---------------------------------------------------------------------------
# leaf converters
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    """torch tensor / numpy array → float-preserving numpy array."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _banks(t) -> jnp.ndarray:
    """[B, C, X, Y, Z] → [B, X, Y, Z, C]."""
    a = _np(t)
    if a.ndim != 5:
        raise ValueError(f"expected 5D bank grid, got shape {a.shape}")
    return jnp.asarray(np.transpose(a, (0, 2, 3, 4, 1)))


def _dense(t) -> jnp.ndarray:
    """[1, C, X, Y, Z] → [X, Y, Z, C]."""
    a = _np(t)
    if a.ndim != 5 or a.shape[0] != 1:
        raise ValueError(f"expected [1,C,X,Y,Z] dense grid, got shape {a.shape}")
    return jnp.asarray(np.transpose(a[0], (1, 2, 3, 0)))


def _mlp_layers(sd: dict, prefix: str):
    """Collect an nn.Sequential's Linear layers under ``prefix`` in module
    order (numeric key paths like ``rgbnet.0`` / ``rgbnet.2.0`` sort by their
    int tuple), returning (weights [in,out], biases)."""
    pat = re.compile(re.escape(prefix) + r"\.((?:\d+\.)*\d+)\.weight$")
    paths = []
    for k in sd:
        m = pat.match(k)
        if m:
            paths.append(tuple(int(p) for p in m.group(1).split(".")))
    paths.sort()
    weights, biases = [], []
    for p in paths:
        base = prefix + "." + ".".join(str(i) for i in p)
        weights.append(jnp.asarray(_np(sd[base + ".weight"]).T))  # [in, out]
        biases.append(jnp.asarray(_np(sd[base + ".bias"])))
    if not weights:
        raise KeyError(f"no Linear layers found under {prefix!r}")
    return tuple(weights), tuple(biases)


def _tensorf(template, sd: dict, prefix: str):
    """Reference TensoRFGrid params → our channel-last TensoRFGrid
    (grid.py:90-110 layouts)."""
    plane = lambda k: jnp.asarray(np.transpose(_np(sd[k])[0], (1, 2, 0)))
    vec = lambda k: jnp.asarray(_np(sd[k])[0, :, :, 0].T)
    kw = dict(
        xy_plane=plane(f"{prefix}.xy_plane"),
        xz_plane=plane(f"{prefix}.xz_plane"),
        yz_plane=plane(f"{prefix}.yz_plane"),
        x_vec=vec(f"{prefix}.x_vec"),
        y_vec=vec(f"{prefix}.y_vec"),
        z_vec=vec(f"{prefix}.z_vec"),
    )
    if f"{prefix}.f_vec" in sd:
        kw["f_vec"] = jnp.asarray(_np(sd[f"{prefix}.f_vec"]))  # [R+R+Rxy, C]
    return template.replace(**kw)


def _thres(v) -> float:
    """fast_color_thres may be a step-keyed dict schedule in model_kwargs
    (garden_single.py:12-21); a trained ckpt's effective value is the last
    schedule entry."""
    if isinstance(v, dict):
        return float(v[max(v, key=lambda k: int(k))])
    return float(v)


def _grid_field(template_field, sd: dict, key: str, banked: bool):
    """Replace a grid-primitive field (DenseGrid / FourierGrid / TensoRFGrid)
    from the state dict, shape-checked against the template."""
    tname = type(template_field).__name__
    if tname == "TensoRFGrid":
        return _tensorf(template_field, sd, key)
    new = _banks(sd[f"{key}.grid"]) if banked else _dense(sd[f"{key}.grid"])
    old = template_field.grid
    if tuple(new.shape) != tuple(old.shape):
        raise ValueError(
            f"{key}.grid shape mismatch: checkpoint {tuple(new.shape)} vs "
            f"model template {tuple(old.shape)} — model_kwargs translated to "
            f"a different resolution"
        )
    return template_field.replace(grid=new.astype(old.dtype))


# ---------------------------------------------------------------------------
# family detection + config translation
# ---------------------------------------------------------------------------


def detect_family(model_kwargs: dict) -> str:
    if "fourier_freq_num" in model_kwargs:
        return "FourierGrid"
    if "mpi_depth" in model_kwargs:
        return "dmpigo"
    if "contracted_norm" in model_kwargs:
        return "dcvgo"
    return "dvgo"


def _cfg_items(d: dict | None) -> tuple:
    """dict grid config (e.g. TensoRF n_comp) → hashable frozen items."""
    return tuple(sorted((d or {}).items()))


def _fourier_cfg(kw: dict, sd: dict, overrides: dict):
    from unboundednerfpytorch_tpu.models.fourier_grid import FourierGridConfig

    bg_len = float(np.asarray(kw["xyz_max"]).ravel()[0]) - 1.0
    fields = dict(
        scene_center=tuple(float(v) for v in _np(sd["scene_center"])),
        scene_radius=tuple(float(v) for v in _np(sd["scene_radius"])),
        num_voxels_density=int(kw["num_voxels_density"]),
        num_voxels_rgb=int(kw["num_voxels_rgb"]),
        num_voxels_base_density=int(kw["num_voxels_base_density"]),
        num_voxels_base_rgb=int(kw["num_voxels_base_rgb"]),
        num_voxels_viewdir=int(kw.get("num_voxels_viewdir", -1)),
        alpha_init=float(kw["alpha_init"]),
        fast_color_thres=_thres(kw["fast_color_thres"]),
        bg_len=bg_len,
        contracted_norm=str(kw["contracted_norm"]),
        fourier_freq_num=int(kw["fourier_freq_num"]),
        rgbnet_dim=int(kw.get("rgbnet_dim", 0)),
        rgbnet_depth=int(kw.get("rgbnet_depth", 3)),
        rgbnet_width=int(kw.get("rgbnet_width", 128)),
        viewbase_pe=int(kw.get("viewbase_pe", 4)),
        # the reference instantiates appearance embeddings but its forward
        # never consumes them — rgbnet dim0 excludes img_emb_dim
        # (FourierGrid_model.py:202-207 vs :615-637) — so they are dropped
        # on import to preserve the checkpointed model's actual function
        img_emb_dim=-1,
        sample_num=int(kw.get("sample_num", -1)),
        mask_cache_world_size=tuple(
            int(v) for v in kw["mask_cache_world_size"]
        ),
    )
    fields.update(overrides)
    return FourierGridConfig(**fields)


def _dvgo_cfg(kw: dict, overrides: dict):
    from unboundednerfpytorch_tpu.models.dvgo import DVGOConfig

    fields = dict(
        xyz_min=tuple(float(v) for v in np.asarray(kw["xyz_min"]).ravel()),
        xyz_max=tuple(float(v) for v in np.asarray(kw["xyz_max"]).ravel()),
        num_voxels=int(kw["num_voxels"]),
        num_voxels_base=int(kw["num_voxels_base"]),
        alpha_init=float(kw["alpha_init"]),
        fast_color_thres=_thres(kw["fast_color_thres"]),
        density_type=str(kw.get("density_type", "DenseGrid")),
        k0_type=str(kw.get("k0_type", "DenseGrid")),
        density_config=_cfg_items(kw.get("density_config")),
        k0_config=_cfg_items(kw.get("k0_config")),
        rgbnet_dim=int(kw.get("rgbnet_dim", 0)),
        rgbnet_direct=bool(kw.get("rgbnet_direct", False)),
        rgbnet_full_implicit=bool(kw.get("rgbnet_full_implicit", False)),
        rgbnet_depth=int(kw.get("rgbnet_depth", 3)),
        rgbnet_width=int(kw.get("rgbnet_width", 128)),
        viewbase_pe=int(kw.get("viewbase_pe", 4)),
        mask_cache_world_size=tuple(
            int(v) for v in kw["mask_cache_world_size"]
        )
        if kw.get("mask_cache_world_size")
        else None,
        mask_cache_thres=float(kw.get("mask_cache_thres") or 1e-3),
    )
    fields.update(overrides)
    return DVGOConfig(**fields)


def _dcvgo_cfg(kw: dict, sd: dict, overrides: dict):
    from unboundednerfpytorch_tpu.models.dcvgo import DCVGOConfig

    bg_len = float(np.asarray(kw["xyz_max"]).ravel()[0]) - 1.0
    fields = dict(
        scene_center=tuple(float(v) for v in _np(sd["scene_center"])),
        scene_radius=tuple(float(v) for v in _np(sd["scene_radius"])),
        num_voxels=int(kw["num_voxels"]),
        num_voxels_base=int(kw["num_voxels_base"]),
        alpha_init=float(kw["alpha_init"]),
        fast_color_thres=_thres(kw["fast_color_thres"]),
        bg_len=bg_len,
        contracted_norm=str(kw["contracted_norm"]),
        rgbnet_dim=int(kw.get("rgbnet_dim", 0)),
        rgbnet_depth=int(kw.get("rgbnet_depth", 3)),
        rgbnet_width=int(kw.get("rgbnet_width", 128)),
        viewbase_pe=int(kw.get("viewbase_pe", 4)),
        mask_cache_world_size=tuple(
            int(v) for v in kw["mask_cache_world_size"]
        ),
    )
    fields.update(overrides)
    return DCVGOConfig(**fields)


def _dmpigo_cfg(kw: dict, overrides: dict):
    from unboundednerfpytorch_tpu.models.dmpigo import DMPIGOConfig

    fields = dict(
        xyz_min=tuple(float(v) for v in np.asarray(kw["xyz_min"]).ravel()),
        xyz_max=tuple(float(v) for v in np.asarray(kw["xyz_max"]).ravel()),
        num_voxels=int(kw["num_voxels"]),
        mpi_depth=int(kw["mpi_depth"]),
        fast_color_thres=_thres(kw["fast_color_thres"]),
        density_type=str(kw.get("density_type", "DenseGrid")),
        k0_type=str(kw.get("k0_type", "DenseGrid")),
        rgbnet_dim=int(kw.get("rgbnet_dim", 0)),
        rgbnet_depth=int(kw.get("rgbnet_depth", 3)),
        rgbnet_width=int(kw.get("rgbnet_width", 128)),
        viewbase_pe=int(kw.get("viewbase_pe", 0)),
        mask_cache_world_size=tuple(
            int(v) for v in kw["mask_cache_world_size"]
        )
        if kw.get("mask_cache_world_size")
        else None,
    )
    fields.update(overrides)
    return DMPIGOConfig(**fields)


# ---------------------------------------------------------------------------
# param translation
# ---------------------------------------------------------------------------


def _maybe_mlp(template_mlp, sd: dict, prefix: str = "rgbnet"):
    if template_mlp is None:
        return None
    w, b = _mlp_layers(sd, prefix)
    if len(w) != len(template_mlp.weights):
        raise ValueError(
            f"rgbnet depth mismatch: checkpoint has {len(w)} Linear layers, "
            f"template expects {len(template_mlp.weights)}"
        )
    for got, want in zip(w, template_mlp.weights):
        if tuple(got.shape) != tuple(want.shape):
            raise ValueError(
                f"rgbnet layer shape mismatch: {tuple(got.shape)} vs "
                f"{tuple(want.shape)}"
            )
    return template_mlp.replace(weights=w, biases=b)


def _mask_cache(template, sd: dict):
    mask = jnp.asarray(_np(sd["mask_cache.mask"]).astype(bool))
    if tuple(mask.shape) != tuple(template.mask.shape):
        raise ValueError(
            f"mask_cache shape mismatch: {tuple(mask.shape)} vs "
            f"{tuple(template.mask.shape)}"
        )
    return template.replace(mask=mask)


def _fourier_params(cfg, sd: dict):
    import jax

    from unboundednerfpytorch_tpu.models import fourier_grid as fg

    p = fg.create(cfg, jax.random.PRNGKey(0))
    rep = dict(
        density=_grid_field(p.density, sd, "density", banked=True),
        k0=_grid_field(p.k0, sd, "k0", banked=True),
        rgbnet=_maybe_mlp(p.rgbnet, sd),
        act_shift=jnp.asarray(
            float(_np(sd["act_shift"]).ravel()[0]), jnp.float32
        ),
        mask_cache=_mask_cache(p.mask_cache, sd),
    )
    if p.vd is not None:
        rep["vd"] = _grid_field(p.vd, sd, "vd", banked=True)
    return p.replace(**rep)


def _voxgo_params(family: str, cfg, sd: dict):
    import jax

    from unboundednerfpytorch_tpu.utils.checkpoint import _import_family

    mod = _import_family(family)
    p = mod.create(cfg, jax.random.PRNGKey(0))
    if family == "dmpigo":
        act_shift = jnp.asarray(_np(sd["act_shift.grid"]).reshape(-1))
        if act_shift.shape[0] != int(cfg.mpi_depth):
            raise ValueError(
                f"act_shift depth mismatch: {act_shift.shape[0]} vs "
                f"mpi_depth {cfg.mpi_depth}"
            )
    else:
        act_shift = jnp.asarray(
            float(_np(sd["act_shift"]).ravel()[0]), jnp.float32
        )
    return p.replace(
        density=_grid_field(p.density, sd, "density", banked=False),
        k0=_grid_field(p.k0, sd, "k0", banked=False),
        rgbnet=_maybe_mlp(p.rgbnet, sd),
        act_shift=act_shift,
        mask_cache=_mask_cache(p.mask_cache, sd),
    )


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------


def convert_reference_ckpt(
    ckpt: dict, family: str | None = None, overrides: dict | None = None
):
    """In-memory conversion of a loaded reference checkpoint dict.

    Returns ``(family, cfg, params, global_step)``. ``overrides`` patches
    config fields that are render-time knobs absent from the reference's
    ``model_kwargs`` (e.g. ``stepsize``, ``t_boundary``)."""
    kw = dict(ckpt["model_kwargs"])
    sd = dict(ckpt["model_state_dict"])
    overrides = dict(overrides or {})
    family = family or detect_family(kw)
    if family == "FourierGrid":
        cfg = _fourier_cfg(kw, sd, overrides)
        params = _fourier_params(cfg, sd)
    elif family in ("dvgo", "dcvgo", "dmpigo"):
        if family == "dvgo":
            cfg = _dvgo_cfg(kw, overrides)
        elif family == "dcvgo":
            cfg = _dcvgo_cfg(kw, sd, overrides)
        else:
            cfg = _dmpigo_cfg(kw, overrides)
        params = _voxgo_params(family, cfg, sd)
    else:
        raise ValueError(f"unknown model family {family!r}")
    return family, cfg, params, int(ckpt.get("global_step", 0))


# ---------------------------------------------------------------------------
# export (native -> reference .tar)
# ---------------------------------------------------------------------------


def _export_grid(sd: dict, prefix: str, field) -> None:
    """Write a grid primitive's tensors/buffers under ``prefix`` in the
    reference's layouts + buffer key set (grid.py:41-48 registers xyz_min/
    xyz_max on every grid module — strict load_state_dict requires them)."""
    import torch

    tname = type(field).__name__
    sd[f"{prefix}.xyz_min"] = torch.tensor(list(field.xyz_min),
                                           dtype=torch.float32)
    sd[f"{prefix}.xyz_max"] = torch.tensor(list(field.xyz_max),
                                           dtype=torch.float32)
    if tname == "TensoRFGrid":
        plane = lambda a: torch.tensor(
            np.transpose(np.asarray(a), (2, 0, 1))[None]
        )  # [A,B,R] -> [1,R,A,B]
        vec = lambda a: torch.tensor(np.asarray(a).T[None, :, :, None])
        sd[f"{prefix}.xy_plane"] = plane(field.xy_plane)
        sd[f"{prefix}.xz_plane"] = plane(field.xz_plane)
        sd[f"{prefix}.yz_plane"] = plane(field.yz_plane)
        sd[f"{prefix}.x_vec"] = vec(field.x_vec)
        sd[f"{prefix}.y_vec"] = vec(field.y_vec)
        sd[f"{prefix}.z_vec"] = vec(field.z_vec)
        if field.f_vec is not None:
            sd[f"{prefix}.f_vec"] = torch.tensor(np.asarray(field.f_vec))
        return
    g = np.asarray(field.grid, np.float32)
    if g.ndim == 5:  # FourierGrid banks [B,X,Y,Z,C] -> [B,C,X,Y,Z]
        sd[f"{prefix}.grid"] = torch.tensor(np.transpose(g, (0, 4, 1, 2, 3)))
    else:  # DenseGrid [X,Y,Z,C] -> [1,C,X,Y,Z]
        sd[f"{prefix}.grid"] = torch.tensor(
            np.transpose(g, (3, 0, 1, 2))[None]
        )


def _export_mask_cache(sd: dict, mc) -> None:
    import torch

    mask = np.asarray(mc.mask, bool)
    mn = np.asarray(mc.xyz_min, np.float32)
    mx = np.asarray(mc.xyz_max, np.float32)
    scale = (np.asarray(mask.shape, np.float32) - 1) / (mx - mn)
    sd["mask_cache.mask"] = torch.tensor(mask)
    sd["mask_cache.xyz2ijk_scale"] = torch.tensor(scale)
    sd["mask_cache.xyz2ijk_shift"] = torch.tensor(-mn * scale)


def _export_rgbnet(sd: dict, mlp) -> None:
    """Our [in,out] MLP -> the reference's nested-Sequential key structure
    (FourierGrid_model.py:234-241): Linear at 0, hidden Sequentials from 2,
    final Linear at index depth."""
    import torch

    depth = len(mlp.weights)
    for i, (w, b) in enumerate(zip(mlp.weights, mlp.biases)):
        if i == 0:
            base = "rgbnet.0"
        elif i == depth - 1:
            base = f"rgbnet.{depth}"
        else:
            base = f"rgbnet.{1 + i}.0"
        sd[base + ".weight"] = torch.tensor(np.asarray(w).T)
        sd[base + ".bias"] = torch.tensor(np.asarray(b))


def _viewfreq(viewbase_pe: int):
    import torch

    return torch.tensor([2.0**i for i in range(viewbase_pe)])


def convert_to_reference(family: str, cfg, params, global_step: int = 0) -> dict:
    """Native (family, cfg, params) → the reference's checkpoint dict
    (``FourierGrid_ckpt_manager.save_model`` layout), so reference tooling
    can ``load_state_dict`` it strictly."""
    import torch

    sd: dict = {}
    kw: dict = {}
    bbox_min = np.asarray(cfg.xyz_min, np.float32)
    bbox_max = np.asarray(cfg.xyz_max, np.float32)
    sd["xyz_min"] = torch.tensor(bbox_min)
    sd["xyz_max"] = torch.tensor(bbox_max)
    has_rgbnet = params.rgbnet is not None
    if has_rgbnet:
        sd["viewfreq"] = _viewfreq(cfg.viewbase_pe)
        _export_rgbnet(sd, params.rgbnet)
    _export_grid(sd, "density", params.density)
    _export_grid(sd, "k0", params.k0)
    _export_mask_cache(sd, params.mask_cache)

    rgb_kw = dict(
        rgbnet_dim=int(cfg.rgbnet_dim),
        rgbnet_depth=int(cfg.rgbnet_depth),
        rgbnet_width=int(cfg.rgbnet_width),
        viewbase_pe=int(cfg.viewbase_pe),
    )
    mc_ws = list(int(v) for v in params.mask_cache.mask.shape)

    if family == "FourierGrid":
        sd["scene_center"] = torch.tensor(list(cfg.scene_center))
        sd["scene_radius"] = torch.tensor(list(cfg.scene_radius))
        sd["act_shift"] = torch.tensor([float(np.asarray(params.act_shift))])
        if params.vd is not None:
            _export_grid(sd, "vd", params.vd)
        kw = dict(
            xyz_min=bbox_min, xyz_max=bbox_max,
            num_voxels_density=int(cfg.num_voxels_density),
            num_voxels_rgb=int(cfg.num_voxels_rgb),
            num_voxels_viewdir=int(cfg.num_voxels_viewdir),
            fourier_freq_num=int(cfg.fourier_freq_num),
            num_voxels_base_density=int(cfg.num_voxels_base_density),
            num_voxels_base_rgb=int(cfg.num_voxels_base_rgb),
            alpha_init=float(cfg.alpha_init),
            voxel_size_ratio_density=float(cfg.voxel_size_ratio_density),
            voxel_size_ratio_rgb=float(
                cfg._voxel_size(cfg.num_voxels_rgb)
                / cfg._voxel_size(cfg.num_voxels_base_rgb)
            ),
            mask_cache_world_size=mc_ws,
            fast_color_thres=float(cfg.fast_color_thres),
            contracted_norm=str(cfg.contracted_norm),
            density_type="FourierGrid", k0_type="FourierGrid",
            density_config={}, k0_config={},
            sample_num=int(cfg.sample_num),
            **rgb_kw,
        )
    elif family == "dvgo":
        sd["act_shift"] = torch.tensor([float(np.asarray(params.act_shift))])
        kw = dict(
            xyz_min=bbox_min, xyz_max=bbox_max,
            num_voxels=int(cfg.num_voxels),
            num_voxels_base=int(cfg.num_voxels_base),
            alpha_init=float(cfg.alpha_init),
            voxel_size_ratio=float(cfg.voxel_size_ratio),
            mask_cache_path=None,
            mask_cache_thres=float(cfg.mask_cache_thres),
            mask_cache_world_size=mc_ws,
            fast_color_thres=float(cfg.fast_color_thres),
            density_type=str(cfg.density_type), k0_type=str(cfg.k0_type),
            density_config=dict(cfg.density_config),
            k0_config=dict(cfg.k0_config),
            rgbnet_direct=bool(cfg.rgbnet_direct),
            rgbnet_full_implicit=bool(cfg.rgbnet_full_implicit),
            **rgb_kw,
        )
    elif family == "dcvgo":
        sd["scene_center"] = torch.tensor(list(cfg.scene_center))
        sd["scene_radius"] = torch.tensor(list(cfg.scene_radius))
        sd["act_shift"] = torch.tensor([float(np.asarray(params.act_shift))])
        kw = dict(
            xyz_min=bbox_min, xyz_max=bbox_max,
            num_voxels=int(cfg.num_voxels),
            num_voxels_base=int(cfg.num_voxels_base),
            alpha_init=float(cfg.alpha_init),
            voxel_size_ratio=float(cfg.voxel_size_ratio),
            mask_cache_world_size=mc_ws,
            fast_color_thres=float(cfg.fast_color_thres),
            contracted_norm=str(cfg.contracted_norm),
            density_type="DenseGrid", k0_type="DenseGrid",
            density_config={}, k0_config={},
            **rgb_kw,
        )
    elif family == "dmpigo":
        # dmpigo's act_shift is a (frozen) DenseGrid module [1,1,1,1,D]
        import torch as _torch

        act = np.asarray(params.act_shift, np.float32).reshape(1, 1, 1, 1, -1)
        sd["act_shift.grid"] = _torch.tensor(act)
        sd["act_shift.xyz_min"] = _torch.tensor(bbox_min)
        sd["act_shift.xyz_max"] = _torch.tensor(bbox_max)
        kw = dict(
            xyz_min=bbox_min, xyz_max=bbox_max,
            num_voxels=int(cfg.num_voxels),
            mpi_depth=int(cfg.mpi_depth),
            voxel_size_ratio=float(cfg.voxel_size_ratio),
            mask_cache_path=None, mask_cache_thres=1e-3,
            mask_cache_world_size=mc_ws,
            fast_color_thres=float(cfg.fast_color_thres),
            density_type=str(cfg.density_type), k0_type=str(cfg.k0_type),
            density_config={}, k0_config={},
            **rgb_kw,
        )
    else:
        raise ValueError(f"unknown model family {family!r}")

    return {
        "global_step": int(global_step),
        "model_kwargs": kw,
        "model_state_dict": sd,
        "optimizer_state_dict": {},
    }


def export_checkpoint(ckpt_dir: str, out_tar: str) -> dict:
    """Load a NATIVE checkpoint directory and write a reference-format
    torch ``.tar`` next to it. Returns the exported dict."""
    import torch

    from unboundednerfpytorch_tpu.utils.checkpoint import load_model

    family, cfg, params, step, _ = load_model(ckpt_dir)
    ref = convert_to_reference(family, cfg, params, global_step=step)
    torch.save(ref, out_tar)
    return ref


def import_checkpoint(
    tar_path: str,
    out_dir: str | None = None,
    family: str | None = None,
    overrides: dict | None = None,
):
    """Load a reference ``.tar`` checkpoint and convert it; optionally write
    a native checkpoint directory loadable by ``checkpoint.load_model``.

    Returns ``(family, cfg, params, global_step)``."""
    import torch

    # reference ckpts carry numpy arrays inside model_kwargs (get_kwargs
    # stores xyz_min/xyz_max as .numpy()), so full unpickling is required;
    # only import checkpoints you trust, exactly as with the reference
    ckpt = torch.load(tar_path, map_location="cpu", weights_only=False)
    family, cfg, params, step = convert_reference_ckpt(
        ckpt, family=family, overrides=overrides
    )
    if out_dir is not None:
        from unboundednerfpytorch_tpu.utils.checkpoint import save_model

        save_model(out_dir, family, cfg, params, global_step=step)
    return family, cfg, params, step
