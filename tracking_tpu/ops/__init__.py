from tracking_tpu.ops.color import bgr2gray_u8, to_u8, to_unit_f32, absdiff_u8  # noqa: F401
from tracking_tpu.ops.threshold import threshold_binary  # noqa: F401
from tracking_tpu.ops.filters import gaussian_blur, gaussian_kernel1d, median_blur, box_filter  # noqa: F401
from tracking_tpu.ops.morphology import erode, dilate, morph_open, morph_close, fill_holes  # noqa: F401
