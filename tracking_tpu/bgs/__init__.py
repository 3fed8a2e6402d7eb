"""BGS algorithm modules. Importing this package populates the registry."""

from tracking_tpu.bgs.base import BGSAlgorithm  # noqa: F401
import tracking_tpu.bgs.simple  # noqa: F401
import tracking_tpu.bgs.dp  # noqa: F401
import tracking_tpu.bgs.gmm  # noqa: F401
import tracking_tpu.bgs.sigma_delta  # noqa: F401
import tracking_tpu.bgs.lbsp_family  # noqa: F401
