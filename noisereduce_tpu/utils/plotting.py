"""Matplotlib debug views of the gating pipeline
(reference noisereduce/plotting.py:5-61 — same role and signatures: the
caller passes the intermediates to plot; nothing here is wired into the
main path).
"""
from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib.pyplot as plt  # lazy: matplotlib optional at runtime

    return plt


def plot_spectrogram(signal, title):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(20, 4))
    signal = np.asarray(signal)
    cax = ax.matshow(
        signal,
        origin="lower",
        aspect="auto",
        cmap=plt.cm.afmhot,
        vmin=-np.max(np.abs(signal)),
        vmax=np.max(np.abs(signal)),
    )
    fig.colorbar(cax)
    ax.set_title(title)
    plt.tight_layout()
    plt.show()


def plot_statistics_and_filter(
    mean_freq_noise, std_freq_noise, noise_thresh, smoothing_filter
):
    plt = _plt()
    fig, ax = plt.subplots(ncols=2, figsize=(20, 4))
    ax[0].plot(np.asarray(mean_freq_noise), label="Mean power of noise")
    ax[0].plot(np.asarray(std_freq_noise), label="Std. power of noise")
    ax[0].plot(np.asarray(noise_thresh), label="Noise threshold (by frequency)")
    ax[0].set_title("Threshold for mask")
    ax[0].legend()
    cax = ax[1].matshow(np.asarray(smoothing_filter), origin="lower")
    fig.colorbar(cax)
    ax[1].set_title("Filter for smoothing Mask")
    plt.show()


def plot_reduction_steps(
    noise_stft_db,
    mean_freq_noise,
    std_freq_noise,
    noise_thresh,
    smoothing_filter,
    sig_stft_db,
    sig_mask,
    recovered_spec,
):
    plot_spectrogram(noise_stft_db, title="Noise")
    plot_statistics_and_filter(
        mean_freq_noise, std_freq_noise, noise_thresh, smoothing_filter
    )
    plot_spectrogram(sig_stft_db, title="Signal")
    plot_spectrogram(sig_mask, title="Mask applied")
    plot_spectrogram(recovered_spec, title="Recovered spectrogram")
