from tracking_tpu.track.kalman import KalmanParams, kalman_init, kalman_predict, kalman_update  # noqa: F401
from tracking_tpu.track.tracker import BlobTracker, TrackerConfig  # noqa: F401
from tracking_tpu.track.trajectory import TrackRecorder, TrajectoryAnalysis  # noqa: F401
