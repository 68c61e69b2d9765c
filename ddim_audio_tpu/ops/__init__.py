from .stft import stft_pfft, istft_pfft, STFTConfig
from .signal import denoise_2d

__all__ = ["stft_pfft", "istft_pfft", "STFTConfig", "denoise_2d"]
