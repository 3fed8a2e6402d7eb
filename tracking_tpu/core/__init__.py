from tracking_tpu.core.config import BGSConfig, config_from_xml, config_to_xml  # noqa: F401
from tracking_tpu.core.registry import get_algorithm, list_algorithms, register  # noqa: F401
