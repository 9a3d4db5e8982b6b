from .codec import DACFile, ConvSpec, output_length, delay as codec_delay
from .dac_vrvq import DAC_VRVQ, Encoder, Decoder
from .quantize import VectorQuantize, ResidualVectorQuantize, VBRResidualVectorQuantize
from .importance import ImportanceSubnet
from .dac_moe import DAC_MOE, MOEResidualVectorQuantize
from .discriminator import Discriminator, MPD, MSD, MRD
