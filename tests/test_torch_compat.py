"""torch_compat.TorchGate — the reference nn.Module surface over TPUGate.

The numerical parity of the underlying gate vs the reference TorchGate is
covered by test_reduce_noise_parity / the recorded oracle; these tests pin
the SHIM: tensor in/out, bitwise equality with the native JAX path, and
torch autograd routing through jax.vjp.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from noisereduce_tpu.models.tpu_gate import TPUGate
from noisereduce_tpu.torch_compat import TorchGate

SR = 16000


def _x(batch=2, seconds=2, seed=0, dtype=torch.float32):
    rng = np.random.default_rng(seed)
    return torch.from_numpy(
        rng.standard_normal((batch, SR * seconds)).astype(np.float32)
    ).to(dtype)


@pytest.mark.parametrize("nonstationary", [False, True])
def test_shim_matches_native_jax_path(nonstationary):
    tg = TorchGate(sr=SR, nonstationary=nonstationary)
    x = _x()
    out = tg(x)
    assert isinstance(out, torch.Tensor)
    assert out.dtype == x.dtype and out.device == x.device
    native = TPUGate(sr=SR, nonstationary=nonstationary)(
        jnp.asarray(x.numpy())
    )
    np.testing.assert_array_equal(out.numpy(), np.asarray(native))


def test_shim_stationary_with_noise_clip():
    tg = TorchGate(sr=SR, nonstationary=False)
    x, xn = _x(), _x(batch=1, seed=1)
    out = tg(x, xn)
    native = TPUGate(sr=SR, nonstationary=False)(
        jnp.asarray(x.numpy()), jnp.asarray(xn.numpy())
    )
    np.testing.assert_array_equal(out.numpy(), np.asarray(native))


def test_constructor_surface_matches_reference():
    # torchgate/torchgate.py:32-46 — same kwargs accepted, same defaults
    tg = TorchGate(
        sr=8000,
        nonstationary=True,
        n_std_thresh_stationary=2.0,
        n_thresh_nonstationary=1.5,
        temp_coeff_nonstationary=0.2,
        n_movemean_nonstationary=10,
        prop_decrease=0.8,
        n_fft=512,
        win_length=512,
        hop_length=128,
        freq_mask_smooth_hz=300,
        time_mask_smooth_ms=25,
    )
    g = tg.gate
    assert g.n_thresh_nonstationary == 1.5
    assert g.hop_length == 128 and g.prop_decrease == 0.8


def test_torch_autograd_routes_through_jax_vjp():
    tg = TorchGate(sr=SR, nonstationary=True)
    x = _x(seconds=1)
    xt = x.clone().requires_grad_(True)
    out = tg(xt)
    loss = (out.double() ** 2).mean()
    loss.backward()
    assert xt.grad is not None and torch.isfinite(xt.grad).all()

    # identical cotangent through the native jax path
    xj = jnp.asarray(x.numpy())
    gate = tg.gate
    out_j = gate(xj)
    g_out = np.asarray(
        (2.0 * out.detach().double() / out.numel()).float().numpy()
    )
    _, vjp_fn = jax.vjp(lambda a: gate(a), xj)
    (gj,) = vjp_fn(jnp.asarray(g_out))
    np.testing.assert_allclose(
        xt.grad.numpy(), np.asarray(gj), rtol=0, atol=0
    )
    del out_j


def test_noise_clip_grad_rejected():
    tg = TorchGate(sr=SR)
    x = _x(seconds=1).requires_grad_(True)
    xn = _x(batch=1, seconds=1, seed=2).requires_grad_(True)
    with pytest.raises(ValueError, match="no_grad"):
        tg(x, xn)


def test_module_niceties():
    tg = TorchGate(sr=SR).to("cpu").eval()
    assert list(tg.parameters()) == []
    out = tg(_x(seconds=1))
    assert out.shape[0] == 2


def test_reference_size_errors_propagate():
    tg = TorchGate(sr=SR)
    with pytest.raises(ValueError, match="bigger than"):
        tg(torch.zeros(2, 100))
    with pytest.raises(ValueError, match="batch, signal_length"):
        tg(torch.zeros(100))
