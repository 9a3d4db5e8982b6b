from .sweep import DEFAULT_LEVELS, LevelSweep, save_results
from .codec_api import CodecProcessor
from .fast import GateResult, make_inference_model, make_serving_model, turbo_gate
from .streaming import (
    DecoderPool, PacketCodec, StreamingDecoder, StreamingEncoder, StreamPool,
)
