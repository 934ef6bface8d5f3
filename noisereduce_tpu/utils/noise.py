"""Band-limited noise generation (reference noisereduce/generate_noise.py).

Two variants:
  - ``band_limited_noise``: NumPy, global-RNG — signature-compatible with
    the reference test utility (generate_noise.py:16-20).
  - ``band_limited_noise_jax``: keyed-PRNG JAX version for reproducible
    on-device generation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fftnoise", "band_limited_noise", "band_limited_noise_jax"]


def fftnoise(f):
    """Random-phase noise with the given (Hermitian-symmetrized) magnitude
    spectrum.

    Provenance: this is the classic spectrum-shaping recipe from
    https://stackoverflow.com/a/36564667 (which the reference utility,
    generate_noise.py:4-13, also credits). The positive-frequency bins get
    unit-modulus phases from ONE ``np.random.rand`` draw of (len-1)//2
    values on the global NumPy RNG — the same draw order as the reference,
    so seeded workloads produce the same noise.
    """
    spec = np.asarray(f, dtype=complex).copy()
    n_pos = (spec.shape[0] - 1) // 2
    theta = np.random.rand(n_pos) * 2 * np.pi
    spec[1 : n_pos + 1] *= np.cos(theta) + 1j * np.sin(theta)
    # negative-frequency bins mirror the rotated positive bins so the
    # inverse transform is real up to rounding
    spec[-1 : -1 - n_pos : -1] = spec[1 : n_pos + 1].conj()
    return np.fft.ifft(spec).real


def band_limited_noise(min_freq, max_freq, samples=1024, samplerate=1):
    """Flat-spectrum noise limited to [min_freq, max_freq] Hz
    (generate_noise.py:16-20)."""
    freqs = np.abs(np.fft.fftfreq(samples, 1 / samplerate))
    f = np.zeros(samples)
    f[np.logical_and(freqs >= min_freq, freqs <= max_freq)] = 1
    return fftnoise(f)


def band_limited_noise_jax(key, min_freq, max_freq, samples=1024, samplerate=1):
    """Keyed-PRNG band-limited noise, same spectrum shaping as the NumPy
    variant but reproducible and jittable."""
    freqs = jnp.abs(jnp.fft.fftfreq(samples, 1 / samplerate))
    band = (freqs >= min_freq) & (freqs <= max_freq)
    f = band.astype(jnp.complex64 if not jax.config.read("jax_enable_x64") else jnp.complex128)
    n_p = (samples - 1) // 2
    phases = jax.random.uniform(key, (n_p,)) * 2 * jnp.pi
    rot = jnp.cos(phases) + 1j * jnp.sin(phases)
    f = f.at[1 : n_p + 1].multiply(rot)
    f = f.at[samples - n_p : samples].set(jnp.conj(f[1 : n_p + 1])[::-1])
    return jnp.fft.ifft(f).real
