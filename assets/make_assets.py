"""Generate the repo's OWNED audio assets (deterministic, seeded).

The reference ships two 4.55 s 44.1 kHz mono int16 recordings
(assets/fish.wav — speech; assets/cafe_short.wav — cafe background) that
its tests and docs load. This repo owns its fixtures instead: two fully
synthesized recordings with the same sample rate / length / dtype envelope,
regenerable bit-for-bit from this script.

  speech.wav  — speech-like: glottal pulse train with a pitch contour,
                driven through vowel formant resonators, with unvoiced
                fricative bursts and word-like amplitude grouping.
  cafe.wav    — nonstationary background: pink noise bed, AM "babble"
                bands, sparse transient clinks, and mains-hum harmonics.

Run:  python assets/make_assets.py   (writes next to this file)
"""
from __future__ import annotations

import os

import numpy as np
from scipy.io import wavfile
from scipy.signal import lfilter

SR = 44100
N = 200542  # 4.547 s — the reference assets' frame count
_HERE = os.path.dirname(os.path.abspath(__file__))


def _resonator(x, freq, bw, sr=SR):
    """Second-order all-pole resonator (a formant)."""
    r = np.exp(-np.pi * bw / sr)
    theta = 2 * np.pi * freq / sr
    a = [1.0, -2 * r * np.cos(theta), r * r]
    return lfilter([1.0 - r], a, x)


def make_speech(rng: np.random.Generator) -> np.ndarray:
    t = np.arange(N) / SR
    dur = N / SR

    # --- voiced source: pulse train with a wandering pitch contour -------
    f0 = 140.0 + 30.0 * np.sin(2 * np.pi * 0.6 * t) + 15.0 * np.sin(
        2 * np.pi * 2.1 * t + 1.0
    )
    phase = np.cumsum(f0) / SR
    # soft glottal pulses: sharpened raised cosine of the phase
    frac = phase % 1.0
    glottal = np.maximum(0.0, np.cos(2 * np.pi * frac)) ** 6
    glottal = np.diff(glottal, prepend=glottal[:1])  # spectral tilt

    # --- vowel formant trajectories (slow morph between vowel targets) --
    vowels = np.array(
        [  # F1, F2, F3 for /a/ /i/ /u/ /e/ /o/
            [800.0, 1200.0, 2500.0],
            [300.0, 2300.0, 3000.0],
            [325.0, 700.0, 2530.0],
            [500.0, 1800.0, 2700.0],
            [450.0, 900.0, 2600.0],
        ]
    )
    seg = np.minimum((t / dur * len(vowels)).astype(int), len(vowels) - 1)
    blend = (t / dur * len(vowels)) - seg
    nxt = np.minimum(seg + 1, len(vowels) - 1)
    voiced = np.zeros(N)
    for fi, bw in enumerate((90.0, 110.0, 170.0)):
        f_traj = vowels[seg, fi] * (1 - blend) + vowels[nxt, fi] * blend
        # piecewise-constant approximation per 20 ms hop keeps the filter LTI
        hop = SR // 50
        for s in range(0, N, hop):
            e = min(s + hop, N)
            voiced[s:e] += _resonator(glottal[s:e], float(f_traj[s]), bw)

    # --- unvoiced bursts (fricative-like) at word boundaries -------------
    unvoiced = rng.standard_normal(N)
    unvoiced = lfilter([1, -0.97], [1], unvoiced)  # high-pass tilt
    burst_env = np.zeros(N)
    for c in (0.55, 1.7, 2.9, 4.1):
        i0 = int(c * SR)
        L = int(0.09 * SR)
        if i0 + L < N:
            burst_env[i0 : i0 + L] = np.hanning(L)
    unvoiced *= burst_env * 0.15

    # --- word-like amplitude grouping with pauses -------------------------
    words = np.clip(
        0.2
        + 0.8 * np.maximum(0.0, np.sin(2 * np.pi * 1.1 * t + 0.4)) ** 0.5
        * np.maximum(0.0, np.sin(2 * np.pi * 0.35 * t + 0.9)) ** 0.25,
        0.0,
        1.0,
    )
    y = voiced * words + unvoiced
    return y / np.abs(y).max() * 0.6


def make_cafe(rng: np.random.Generator) -> np.ndarray:
    t = np.arange(N) / SR

    # pink-ish bed: white noise through a one-pole lowpass cascade blend
    w = rng.standard_normal(N)
    pink = (
        lfilter([1], [1, -0.95], w) * 0.35
        + lfilter([1], [1, -0.6], w) * 0.5
        + w * 0.2
    )

    # "babble": AM-modulated band noises drifting at syllabic rates
    babble = np.zeros(N)
    for k in range(6):
        band = _resonator(
            rng.standard_normal(N), 300.0 + 400.0 * k, 250.0
        )
        rate = 2.0 + 1.5 * rng.random()
        am = 0.5 + 0.5 * np.sin(2 * np.pi * rate * t + rng.random() * 6.28)
        babble += band * am ** 2

    # sparse clinks: damped high-frequency sinusoids (cutlery/cups)
    clinks = np.zeros(N)
    for _ in range(10):
        i0 = int(rng.random() * (N - SR // 4))
        f = 2500.0 + 4500.0 * rng.random()
        L = int(0.06 * SR)
        tt = np.arange(L) / SR
        clinks[i0 : i0 + L] += (
            np.sin(2 * np.pi * f * tt) * np.exp(-tt * 60.0) * rng.random()
        )

    hum = 0.02 * np.sin(2 * np.pi * 50 * t) + 0.01 * np.sin(
        2 * np.pi * 150 * t
    )

    y = pink * 0.08 + babble * 0.35 + clinks * 0.5 + hum
    return y / np.abs(y).max() * 0.45


def main() -> None:
    rng = np.random.default_rng(20260817)
    speech = make_speech(rng)
    cafe = make_cafe(rng)
    for name, y in (("speech.wav", speech), ("cafe.wav", cafe)):
        wavfile.write(
            os.path.join(_HERE, name), SR, (y * 32767.0).astype(np.int16)
        )
        print(name, len(y), "samples @", SR)


if __name__ == "__main__":
    main()
