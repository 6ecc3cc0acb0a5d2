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

__all__ = ["detect_family", "import_checkpoint", "convert_reference_ckpt"]


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
