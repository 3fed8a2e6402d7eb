from tracking_tpu.io.video import read_video, read_frame_dir, VideoSource  # noqa: F401
