"""CLI front-ends mirroring the reference's tools (SURVEY.md §1 L6):

- ``upscale-video`` (reference upscale_video.py)   — full pipeline
- ``upscale-only``  (reference upscale/upscale_only.py)
- ``merge-only``    (reference upscale/merge_only.py)
- ``fix-frames``    (reference upscale/fix_frames.py)
- ``test-images``   (reference test_images.py)      — parameter sampling
- ``test-chips``    (reference test_gpus.py)        — chip calibration
- ``vsr-compare``   (beyond reference)              — PSNR quality gate
- ``vsr-finetune``  (beyond reference)              — fine-tune + export
- ``vsr-import``    (beyond reference)              — torch .pth -> ncnn
- ``vsr-warmup``    (beyond reference)              — pre-compile + cache

Flag letters are preserved where they existed (-i -o -f -e -p -m -s -t -b
-g -r -x -l -d, upscale_video.py:13-72); ``-f/--ffmpeg`` is now OPTIONAL —
without it the hermetic Y4M/PNG backend is used.  TPU-specific knobs are
new long flags (--precision --tile_size --halo --frames_per_step
--model_path --global_quality --data_plane --pipe_pix --parallel
--conv_impl --tta --copy_audio --trace_dir).
"""
