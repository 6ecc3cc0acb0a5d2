"""Field primitives (L4): grid parameter representations as pytrees."""

from unboundednerfpytorch_tpu.fields.grids import (
    DenseGrid,
    FourierGrid,
    MaskGrid,
    TensoRFGrid,
    create_grid,
    nerf_pos_embed_coords,
)

__all__ = [
    "DenseGrid",
    "FourierGrid",
    "MaskGrid",
    "TensoRFGrid",
    "create_grid",
    "nerf_pos_embed_coords",
]
