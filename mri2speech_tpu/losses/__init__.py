"""Loss functions: masked weighted MSE/MAE (acoustic) and LSGAN/feature losses."""

from mri2speech_tpu.losses.masked_mse_mae import MaskedMSEMAE, masked_mse_mae_loss  # noqa: F401
from mri2speech_tpu.losses.gan import (  # noqa: F401
    feature_loss,
    discriminator_loss,
    generator_loss,
)
