"""upscale_video_tpu — TPU-native AI video super-resolution framework.

A ground-up rebuild of the capability surface of davlee1972/upscale_video
(reference: /root/reference) designed for TPU hardware:

- The ncnn/Vulkan inference engine is replaced by a loader that converts
  ncnn ``.param``/``.bin`` model files into JAX pytrees plus a graph
  executor that traces the whole network into ONE jitted XLA program
  (reference engine usage: upscale/upscale_processing.py:65-71, 278-280).
- The per-frame PNG spill data plane is replaced by streaming rawvideo
  pipes and on-device tensor chaining (deblur -> denoise -> SR fused into
  a single device program), with the PNG-per-frame layout retained as a
  compatibility/repair mode (reference: upscale_processing.py:232-234).
- multiprocessing GPU worker pools (upscale_processing.py:54-73, 302-347)
  become on-chip frame batching plus ``jax.sharding.Mesh`` data/spatial
  parallelism across TPU chips.

Subpackages
-----------
- ``models``   : ncnn model format parsing, weight loading, graph execution
- ``ops``      : pixel ops, tiling, NL-means denoise, Pallas kernels
- ``parallel`` : device meshes, sharded inference, host pipeline executor
- ``video``    : ffmpeg integration, hermetic Y4M/PNG codecs, frame store
- ``pipeline`` : end-to-end workflows (process/upscale_only/merge_only/fix)
- ``cli``      : argparse front-ends mirroring the reference CLI surface
- ``train``    : fine-tuning (beyond-reference capability)
"""

__version__ = "0.1.0"
