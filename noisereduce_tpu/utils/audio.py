"""WAV dtype conversion utilities (reference noisereduce/utils.py:4-15)."""
from __future__ import annotations

import numpy as np

__all__ = ["int16_to_float32", "float32_to_int16"]


def int16_to_float32(data):
    """int16-scaled waveform -> float32 in [-1, 1)."""
    if np.max(np.abs(data)) > 32768:
        raise ValueError("Data has values above 32768")
    return (data / 32768.0).astype("float32")


def float32_to_int16(data):
    """float waveform -> int16, renormalizing if the peak exceeds 1."""
    if np.max(data) > 1:
        data = data / np.max(np.abs(data))
    return np.array(data * 32767).astype("int16")
