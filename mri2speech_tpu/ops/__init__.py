"""Signal-processing ops: STFT, mel filterbanks, dB/log-power bridges, scalers.

These ops define the numerical identity of the pipeline (sr=11413, n_fft=2048,
hop=420, n_mels=64) and are golden-tested against the PyTorch/librosa semantics
of the reference.
"""

from mri2speech_tpu.ops.mel import (  # noqa: F401
    mel_filterbank,
    hann_window_periodic,
    stft_magnitude,
    mel_spectrogram,
    compute_mel_db,
    power_to_db,
    db_to_power,
    mel_db_to_log_power,
    dynamic_range_compression,
    pre_emphasis,
    hz_to_mel_htk,
    mel_to_hz_htk,
    mel_bin_frequencies_htk,
)
from mri2speech_tpu.ops.scaler import MelScaler  # noqa: F401
