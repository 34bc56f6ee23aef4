from consistencytta_tpu.ops.mel import hann_window, mel_filterbank
from consistencytta_tpu.ops.stft import MelFrontend, stft_magnitude

__all__ = [
    "hann_window",
    "mel_filterbank",
    "MelFrontend",
    "stft_magnitude",
]
