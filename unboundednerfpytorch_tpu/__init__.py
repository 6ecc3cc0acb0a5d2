"""unboundednerfpytorch_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework
for unbounded / large-scale Neural Radiance Fields.

Built from scratch with the capabilities of sjtuytc/UnboundedNeRFPytorch
(DVGO / DCVGO / DMPIGO / FourierGrid voxel models + Block-NeRF), re-designed
TPU-first:

- fixed-shape masked ray marching instead of dynamic-shape compaction
- one jitted train step (render + losses + TV grad + masked Adam)
- Pallas kernels for the hot ops; XLA fusion elsewhere
- jax.sharding Mesh / pjit for multi-chip (ray-batch DP, grid sharding,
  block-parallel scenes)

Layer map mirrors SURVEY.md: ops/ (L3 kernels), fields/ (L4 primitives),
models/ (L5), optim/+train/ (L2/L6), data/+configs/ (L1), cli/ (L7).
"""

__version__ = "0.1.0"
