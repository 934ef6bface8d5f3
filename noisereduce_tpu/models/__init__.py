from noisereduce_tpu.models.spectral_gate import (
    gate_stationary,
    gate_nonstationary,
    stationary_noise_threshold,
)
from noisereduce_tpu.models.tpu_gate import TPUGate
