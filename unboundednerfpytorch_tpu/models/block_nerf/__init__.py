"""Block-NeRF subsystem: MLP-based multi-block city-scale NeRF
(the reference's legacy distributed stack, SURVEY.md component #26)."""

from unboundednerfpytorch_tpu.models.block_nerf.model import (
    BlockNeRFParams,
    block_nerf_apply,
    block_nerf_loss,
    create,
    inter_pos_embedding,
    pos_embedding,
    visibility_apply,
)
from unboundednerfpytorch_tpu.models.block_nerf.rendering import (
    get_cone_mean_conv,
    render_rays,
    sample_pdf,
    volume_rendering,
)

__all__ = [
    "BlockNeRFParams",
    "block_nerf_apply",
    "block_nerf_loss",
    "create",
    "inter_pos_embedding",
    "pos_embedding",
    "visibility_apply",
    "get_cone_mean_conv",
    "render_rays",
    "sample_pdf",
    "volume_rendering",
]
