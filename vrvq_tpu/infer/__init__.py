from .sweep import DEFAULT_LEVELS, LevelSweep, save_results
from .codec_api import CodecProcessor
from .fast import make_inference_model
from .streaming import (
    DecoderPool, PacketCodec, StreamingDecoder, StreamingEncoder, StreamPool,
)
