"""Demo mirroring the reference's example notebooks: denoise a speech clip
with synthetic band-limited noise, stationary and non-stationary, plus the
differentiable TPUGate embedded in a training step.

Run: python examples/demo.py [path/to/audio.wav]
"""
import os
import sys

# runnable as a script from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS even when a sitecustomize pre-registered another
# platform (plugin registration can override the env var contract).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import noisereduce_tpu as nr
from noisereduce_tpu.utils import io as nrio

_SPEECH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "assets", "speech.wav"
)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else _SPEECH
    rate, data = nrio.read_wav(path, dtype="float32")
    if data.ndim == 2:
        data = data.mean(axis=1)
    print(f"loaded {path}: {len(data)} frames @ {rate} Hz")

    noise = nr.band_limited_noise(2000, 12000, len(data), rate).astype(np.float32)
    noise *= 0.5 * np.std(data) / np.std(noise)  # ~6 dB SNR, clearly audible
    noisy = data + noise

    # stationary, with an explicit 2-second noise clip
    den_stat = nr.reduce_noise(
        y=noisy, sr=rate, stationary=True, y_noise=noise[: rate * 2]
    )
    # non-stationary (the default)
    den_nonstat = nr.reduce_noise(y=noisy, sr=rate)

    for name, den in [("stationary", den_stat), ("non-stationary", den_nonstat)]:
        resid = float(np.mean((den - data) ** 2))
        base = float(np.mean((noisy - data) ** 2))
        print(f"{name:15s}: residual noise power {resid:.2e} (input {base:.2e})")
        nrio.write_wav(f"/tmp/denoised_{name.replace('-', '')}.wav", den, rate)

    # TPUGate in a gradient step (torch notebook 3.0 equivalent)
    import jax
    import jax.numpy as jnp

    gate = nr.TPUGate(sr=rate, nonstationary=True)
    batch = jnp.asarray(noisy[: rate * 2])[None]
    grads = jax.grad(lambda x: jnp.mean(gate(x) ** 2))(batch)
    print(f"TPUGate grad norm through the gate: {float(jnp.linalg.norm(grads)):.3e}")


if __name__ == "__main__":
    main()
