"""Data subsystem: preprocessing pipeline, datasets, filelists, converters.

Host side does only IO and cropping; all DSP (mel extraction) runs on the TPU
through `mri2speech_tpu.ops`, batched — including inside the jitted vocoder
train step (the reference computes mels per-sample in CPU dataloader workers,
`meldataset.py:151-224`; we fuse that into the device step instead).
"""

from mri2speech_tpu.data.dataset import FixedLenPairDataset, split_indices  # noqa: F401
from mri2speech_tpu.data.meldata import MelDataset, get_dataset_filelist  # noqa: F401
