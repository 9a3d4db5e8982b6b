from .audio_io import read_wav, write_wav, wav_info, find_audio, read_sources
from .loaders import AudioLoader, AudioDataset, ConcatDataset
