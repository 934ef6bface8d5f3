from noisereduce_tpu.ops.stft import stft, istft, frame_signal, overlap_add, hann_window
from noisereduce_tpu.ops.dsp import (
    amp_to_db,
    sigmoid,
    temperature_sigmoid,
    triangular_vector,
    smooth_mask,
    smooth_mask_2d_torchgate,
    ewma_filtfilt,
    moving_average_same,
)
