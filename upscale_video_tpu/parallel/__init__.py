"""Multi-chip parallelism: meshes, data/spatial/tensor sharding, executors.

The reference's parallelism (SURVEY.md §2.4) was multiprocessing pools with
one worker per GPU slot (upscale/upscale_processing.py:54-73, 302-347) and
Python-loop spatial tiling (:395-477).  The TPU mapping:

- frame-level data parallelism  -> batch dim sharded over a mesh axis
- intra-frame spatial tiling    -> H-axis ``shard_map`` with neighbor halo
  exchange over ICI (the context-parallel analog)
- (beyond reference) channel TP -> GSPMD out-channel weight sharding
"""

from upscale_video_tpu.parallel.mesh import make_mesh, parse_chips
from upscale_video_tpu.parallel.spatial import spatial_forward
from upscale_video_tpu.parallel.data import data_parallel_fn, shard_batch
from upscale_video_tpu.parallel.tensor import (
    shard_params_channelwise,
    tensor_parallel_fn,
)

__all__ = [
    "make_mesh",
    "parse_chips",
    "spatial_forward",
    "data_parallel_fn",
    "shard_batch",
    "shard_params_channelwise",
    "tensor_parallel_fn",
]
