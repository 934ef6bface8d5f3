"""STFT/ISTFT convention parity vs scipy.signal and torch.

These pin the #1 parity risk (SURVEY.md §7): exact window/boundary/scaling
semantics of both reference backends.
"""
import numpy as np
import pytest
import scipy.signal

from noisereduce_tpu.config import StftConfig, Convention
from noisereduce_tpu.ops import stft, istft

RNG = np.random.default_rng(0)


def _scipy_stft(x, cfg):
    _, _, Z = scipy.signal.stft(
        x,
        nfft=cfg.n_fft,
        noverlap=cfg.win_length - cfg.hop_length,
        nperseg=cfg.win_length,
        padded=False,
    )
    return Z


def _scipy_istft(Z, cfg):
    _, x = scipy.signal.istft(
        Z,
        nfft=cfg.n_fft,
        noverlap=cfg.win_length - cfg.hop_length,
        nperseg=cfg.win_length,
    )
    return x


@pytest.mark.parametrize("n", [4096, 5000, 200542 // 16])
@pytest.mark.parametrize(
    "geom",
    [
        dict(n_fft=1024),
        dict(n_fft=1024, win_length=512),
        dict(n_fft=512, hop_length=100),
        dict(n_fft=2048, win_length=1200, hop_length=300),
    ],
)
@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_scipy_stft_roundtrip_parity(n, geom, method):
    cfg = StftConfig(convention=Convention.SCIPY, **geom)
    x = RNG.standard_normal(n)

    Z_ref = _scipy_stft(x, cfg)
    Z = np.asarray(stft(x, cfg, method=method))
    assert Z.shape == Z_ref.shape, (Z.shape, Z_ref.shape)
    np.testing.assert_allclose(Z, Z_ref, atol=1e-10, rtol=0)

    # ISTFT on a perturbed spectrogram (so masking-path scaling is exercised)
    mask = RNG.uniform(0.2, 1.0, Z_ref.shape)
    y_ref = _scipy_istft(Z_ref * mask, cfg)
    y = np.asarray(istft(Z_ref * mask, cfg, method=method))
    assert y.shape[-1] == cfg.istft_length(Z_ref.shape[-1])
    m = min(y.shape[-1], y_ref.shape[-1])
    np.testing.assert_allclose(y[:m], y_ref[:m], atol=1e-9, rtol=0)


@pytest.mark.parametrize("n", [4096, 6001])
@pytest.mark.parametrize(
    "geom",
    [
        dict(n_fft=1024),
        dict(n_fft=1024, win_length=512),
        dict(n_fft=512, hop_length=128),
    ],
)
@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_torch_stft_roundtrip_parity(n, geom, method):
    torch = pytest.importorskip("torch")
    cfg = StftConfig(convention=Convention.TORCH, **geom)
    x = RNG.standard_normal((2, n))
    xt = torch.from_numpy(x)

    Z_ref = torch.stft(
        xt,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        return_complex=True,
        pad_mode="constant",
        center=True,
        window=torch.hann_window(cfg.win_length, dtype=xt.dtype),
    ).numpy()
    Z = np.asarray(stft(x, cfg, method=method))
    assert Z.shape == Z_ref.shape
    np.testing.assert_allclose(Z, Z_ref, atol=1e-10, rtol=0)

    mask = RNG.uniform(0.2, 1.0, Z_ref.shape)
    Zm = Z_ref * mask
    y_ref = torch.istft(
        torch.from_numpy(Zm),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        center=True,
        window=torch.hann_window(cfg.win_length, dtype=xt.dtype),
    ).numpy()
    y = np.asarray(istft(Zm, cfg, method=method))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=1e-9, rtol=0)


def test_batched_matches_loop():
    cfg = StftConfig(n_fft=256)
    x = RNG.standard_normal((3, 4, 2000))
    Z = np.asarray(stft(x, cfg, method="fft"))
    for i in range(3):
        for j in range(4):
            np.testing.assert_allclose(
                Z[i, j], np.asarray(stft(x[i, j], cfg, method="fft")), atol=1e-12
            )
