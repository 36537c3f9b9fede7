from quadrs_tpu.models.receiver import PipelineConfig, PipelineModel
from quadrs_tpu.models.waterfall import WaterfallConfig, WaterfallModel

__all__ = [
    "PipelineConfig",
    "PipelineModel",
    "WaterfallConfig",
    "WaterfallModel",
]
