from . import stft
from .stft import (
    analysis_window,
    dft_matrices,
    frame_signal,
    istft_frame,
    stft_frame,
)

__all__ = [
    "stft",
    "analysis_window",
    "dft_matrices",
    "frame_signal",
    "istft_frame",
    "stft_frame",
]
