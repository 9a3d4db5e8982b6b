from .recon import L1Loss, L2Loss, SISDRLoss, MultiScaleSTFTLoss, MelSpectrogramLoss
from .gan import GANLoss, discriminator_loss, generator_loss
from .framewise import (
    SISDRLossFramewise, L1LossFramewise, MelSpectrogramLossFramewise,
)
