#!/usr/bin/env python
"""Capture golden reference outputs for self-contained parity testing.

Runs the *reference* package (timsainb/noisereduce at /root/reference) on
deterministic inputs covering the five BASELINE.json configs and stores the
inputs AND outputs in tests/golden/golden_v1.npz. The replay test
(tests/test_golden_parity.py) then validates noisereduce_tpu against these
fixtures with no reference checkout present — CI anywhere can prove parity.

Run once (requires /root/reference):
    python tests/golden/capture.py
"""
import json
import os
import sys
import warnings

import numpy as np

REFERENCE = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
SR = 44100
N = 30000


def build_inputs():
    """Deterministic test signals (mirrors tests/test_reduce_noise_parity.py:
    fish.wav head + seeded Gaussian noise; the arrays are STORED so replay
    does not need the wav)."""
    from scipy.io import wavfile

    _, data = wavfile.read(os.path.join(REFERENCE, "assets", "fish.wav"))
    x = data.astype(np.float64)[:N]
    rng = np.random.default_rng(7)
    y_mono = x + rng.standard_normal(N) * 200.0
    y_stereo = np.stack([np.roll(y_mono, 97 * c) for c in range(2)])

    # band-limited noise clip via the reference generator (global np.random)
    sys.path.insert(0, REFERENCE)
    from noisereduce.generate_noise import band_limited_noise

    np.random.seed(42)
    noise = band_limited_noise(2000, 12000, N, SR) * 300.0

    # BASELINE config #1's exact workload shape (reference
    # test_reduction.py:6-19): a DISTINCT noise recording as y_noise plus
    # non-default FFT geometry — here on the repo's own assets (speech.wav
    # as the voice, cafe.wav as the noise recording).
    _, speech = wavfile.read(os.path.join(HERE, "..", "..", "assets",
                                          "speech.wav"))
    _, cafe = wavfile.read(os.path.join(HERE, "..", "..", "assets",
                                        "cafe.wav"))
    y_recorded = speech.astype(np.float64) + cafe.astype(np.float64)
    cafe_clip = cafe.astype(np.float64)
    return y_mono, y_stereo, noise, y_recorded, cafe_clip


# name -> (input key, kwargs). Covers the five BASELINE.json configs:
# stationary + noise clip, non-stationary, multichannel, chunked, torch path.
CONFIGS = {
    "stationary_noise_clip": ("y_mono", {"stationary": True, "use_noise": True}),
    "stationary_self": ("y_mono", {"stationary": True}),
    "nonstationary": ("y_mono", {}),
    "nonstationary_chunked": ("y_mono", {"chunk_size": 8000, "padding": 1500}),
    "stationary_multichannel": (
        "y_stereo",
        {"stationary": True, "prop_decrease": 0.8},
    ),
    "torch_stationary_chunked": (
        "y_mono",
        {"stationary": True, "use_torch": True, "device": "cpu",
         "chunk_size": 8000, "padding": 1500},
    ),
    "torch_nonstationary_chunked": (
        "y_mono",
        {"use_torch": True, "device": "cpu",
         "chunk_size": 8000, "padding": 1500},
    ),
    # BASELINE config #1: stationary gate, a separate noise RECORDING as
    # y_noise (not synthetic band noise), non-default n_fft=2048
    # (reference test_reduction.py:6-19 workload shape)
    "stationary_recorded_noise_nfft2048": (
        "y_recorded",
        {"stationary": True, "n_fft": 2048, "use_recorded_noise": True},
    ),
}


def main():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import noisereduce as nr_ref

    y_mono, y_stereo, noise, y_recorded, cafe_clip = build_inputs()
    inputs = {"y_mono": y_mono, "y_stereo": y_stereo, "noise": noise,
              "y_recorded": y_recorded, "cafe_clip": cafe_clip}

    arrays = dict(inputs)
    meta = {"sr": SR, "configs": {}}
    for name, (ykey, kw) in CONFIGS.items():
        kw = dict(kw)
        use_noise = kw.pop("use_noise", False)
        use_recorded = kw.pop("use_recorded_noise", False)
        call_kw = dict(kw)
        if use_noise:
            call_kw["y_noise"] = noise[: SR // 4]
        if use_recorded:
            call_kw["y_noise"] = cafe_clip
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = nr_ref.reduce_noise(y=inputs[ykey], sr=SR, **call_kw)
        arrays[f"out_{name}"] = np.asarray(out)
        meta["configs"][name] = {
            "input": ykey, "use_noise": use_noise,
            "use_recorded_noise": use_recorded, "kwargs": kw,
        }
        print(f"captured {name}: out shape {out.shape} dtype {out.dtype}")

    np.savez_compressed(os.path.join(HERE, "golden_v1.npz"), **arrays)
    with open(os.path.join(HERE, "golden_v1.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    size = os.path.getsize(os.path.join(HERE, "golden_v1.npz"))
    print(f"wrote golden_v1.npz ({size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
