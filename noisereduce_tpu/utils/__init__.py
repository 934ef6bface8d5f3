from noisereduce_tpu.utils.audio import int16_to_float32, float32_to_int16
from noisereduce_tpu.utils.noise import (
    band_limited_noise,
    band_limited_noise_jax,
    fftnoise,
)
