from nafae_tpu.models.detector.faster_rcnn import FasterRCNNExtractor  # noqa: F401
