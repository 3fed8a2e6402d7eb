from tracking_tpu.analysis.metrics import (  # noqa: F401
    mask_similarity,
    confusion_counts,
    precision_recall_fscore,
    roc_curve,
    image_roc,
    roc_threshold_search,
    save_roc_file,
)
