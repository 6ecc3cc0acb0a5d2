"""TPU-native compute ops (L3): the replacements for the reference's four
CUDA extensions (render_utils, adam_upd, total_variation, ub360_utils), as
fixed-shape JAX functions with Pallas fast paths in ``ops/pallas/``."""

from unboundednerfpytorch_tpu.ops.alpha import alpha2weights, raw2alpha
from unboundednerfpytorch_tpu.ops.interp import (
    grid_sample_2d,
    grid_sample_3d,
    max_pool_3d_same,
    resize_grid_3d,
)
from unboundednerfpytorch_tpu.ops.rays import (
    get_rays,
    get_rays_of_a_view,
    get_training_rays_flatten,
    ndc_rays,
)
from unboundednerfpytorch_tpu.ops.sampling import (
    RaySamples,
    contract,
    contracted_t_values,
    cumdist_thres,
    maskcache_lookup,
    n_samples_cap,
    ray_aabb,
    sample_ndc_pts_on_rays,
    sample_pts_on_rays,
    sample_ray_contracted,
)
from unboundednerfpytorch_tpu.ops.tv import (
    total_variation_add_grad,
    total_variation_grad,
)

__all__ = [
    "alpha2weights",
    "raw2alpha",
    "grid_sample_2d",
    "grid_sample_3d",
    "max_pool_3d_same",
    "resize_grid_3d",
    "get_rays",
    "get_rays_of_a_view",
    "get_training_rays_flatten",
    "ndc_rays",
    "RaySamples",
    "contract",
    "contracted_t_values",
    "cumdist_thres",
    "maskcache_lookup",
    "n_samples_cap",
    "ray_aabb",
    "sample_ndc_pts_on_rays",
    "sample_pts_on_rays",
    "sample_ray_contracted",
    "total_variation_add_grad",
    "total_variation_grad",
]
