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
