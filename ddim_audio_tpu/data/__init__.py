from .codec import (
    wav2pfft,
    pfft2wav,
    pfft2img,
    limit_length_img,
)
from .audio_dataset import AudioDataset, get_dataset

__all__ = [
    "wav2pfft",
    "pfft2wav",
    "pfft2img",
    "limit_length_img",
    "AudioDataset",
    "get_dataset",
]
