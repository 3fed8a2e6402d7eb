from tracking_tpu.parallel.mesh import make_mesh, shard_video_batch, run_video_batch  # noqa: F401
