from quadrs_tpu.models.channelizer import Channelize, run_channelize
from quadrs_tpu.models.receiver import PipelineConfig, PipelineModel
from quadrs_tpu.models.waterfall import WaterfallConfig, WaterfallModel

__all__ = [
    "Channelize",
    "PipelineConfig",
    "PipelineModel",
    "WaterfallConfig",
    "WaterfallModel",
    "run_channelize",
]
