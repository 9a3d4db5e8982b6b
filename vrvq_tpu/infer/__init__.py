from .sweep import DEFAULT_LEVELS, LevelSweep, save_results
from .codec_api import CodecProcessor
