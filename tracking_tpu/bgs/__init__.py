"""BGS algorithm modules. Importing this package populates the registry."""

from tracking_tpu.bgs.base import BGSAlgorithm  # noqa: F401
import tracking_tpu.bgs.simple  # noqa: F401
import tracking_tpu.bgs.dp  # noqa: F401
import tracking_tpu.bgs.gmm  # noqa: F401
import tracking_tpu.bgs.sigma_delta  # noqa: F401
import tracking_tpu.bgs.lbsp_family  # noqa: F401
import tracking_tpu.bgs.lb  # noqa: F401
import tracking_tpu.bgs.vumeter  # noqa: F401
import tracking_tpu.bgs.prati_mediod  # noqa: F401
import tracking_tpu.bgs.eigenbackground  # noqa: F401
import tracking_tpu.bgs.t2f  # noqa: F401
import tracking_tpu.bgs.gmg  # noqa: F401
import tracking_tpu.bgs.kde  # noqa: F401
import tracking_tpu.bgs.imbs  # noqa: F401
import tracking_tpu.bgs.texture  # noqa: F401
import tracking_tpu.bgs.multilayer  # noqa: F401
import tracking_tpu.bgs.shrink  # noqa: F401
import tracking_tpu.bgs.multicue  # noqa: F401
import tracking_tpu.bgs.lbp_mrf  # noqa: F401
import tracking_tpu.bgs.subsense_shrink  # noqa: F401
import tracking_tpu.bgs.fuzzy  # noqa: F401
import tracking_tpu.bgs.fgd  # noqa: F401
