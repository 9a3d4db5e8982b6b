from .layers import (
    WNConv1d,
    WNConvTranspose1d,
    Snake1d,
    ResidualUnit,
    EncoderBlock,
    DecoderBlock,
    DenoisingBlock,
    snake,
)
from .fold import fold_weight_norm
