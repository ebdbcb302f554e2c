"""Model zoo: acoustic CNN-BiLSTM and HiFi-GAN vocoder family."""

from mri2speech_tpu.models.vocoder import (  # noqa: F401
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from mri2speech_tpu.models.acoustic import (  # noqa: F401
    AcousticModel,
    build_acoustic_model,
)
