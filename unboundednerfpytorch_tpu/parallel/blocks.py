"""Block/scene parallelism helpers: map Block-NeRF-style blocks onto device
slices or hosts (SURVEY.md §2.3 'TPU-native equivalents').

Per-block training is embarrassingly parallel (no inter-block communication,
run_FourierGrid.py:101-103); these helpers pick which devices serve which
block so several blocks train concurrently on one slice, or one block per
host process on a pod.
"""

from __future__ import annotations

import jax

from unboundednerfpytorch_tpu.parallel import mesh as mesh_mod


def assign_blocks_to_device_slices(n_blocks: int, devices=None):
    """Partition local devices into contiguous slices, one per block (round
    robin when blocks outnumber devices). Returns [(block_id, device_list)]."""
    devices = list(devices if devices is not None else jax.devices())
    n_dev = len(devices)
    if n_blocks >= n_dev:
        return [(b, [devices[b % n_dev]]) for b in range(n_blocks)]
    per = n_dev // n_blocks
    return [
        (b, devices[b * per : (b + 1) * per]) for b in range(n_blocks)
    ]


def block_meshes(n_blocks: int, devices=None):
    """A data-axis Mesh per block over its device slice."""
    return {
        b: mesh_mod.make_mesh(devices=devs)
        for b, devs in assign_blocks_to_device_slices(n_blocks, devices)
    }


def my_block_for_host(n_blocks: int) -> int:
    """Multi-host assignment: host i trains block i mod n (one block per
    host process, the reference's per-block `--block_index` runs)."""
    return jax.process_index() % n_blocks
