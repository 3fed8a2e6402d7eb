from tracking_tpu.runner.scan import run_video, make_step_fn  # noqa: F401
