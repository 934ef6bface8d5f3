"""Drop-in PyTorch interop for TPUGate.

The reference ships ``noisereduce.torchgate.TorchGate`` as an embeddable
``torch.nn.Module`` (torchgate/torchgate.py:7-264). Migrating users keep
torch pipelines (datasets, trainers, tensors); this module gives them the
same class surface — constructor kwargs, ``forward(x, xn=None)``, tensor
in / tensor out, ``.to(device)`` — while the math runs on the JAX/TPU gate
(:class:`noisereduce_tpu.models.tpu_gate.TPUGate`).

Unlike the reference (whose internals are ``@torch.no_grad()``), gradients
flow: ``forward`` registers a ``torch.autograd.Function`` whose backward
calls ``jax.vjp`` on the gate, so the shim is trainable inside a torch
autograd graph — using the same fused-primal / staged-cotangent custom VJP
the native JAX path uses (ops/pallas/torch_dispatch.py).

Torch is an optional dependency exactly as in the reference
(noisereduce.py:4-10): importing this module without torch installed raises
the reference's ImportError message.
"""
from __future__ import annotations

import numpy as np

try:
    import torch
except ImportError as _e:  # pragma: no cover - torch present in CI image
    raise ImportError(
        "TorchGate is not available. Install noisereduce-tpu with the torch "
        "extra (pip install 'noisereduce-tpu[torch]') to use the torch-compat "
        "module."
    ) from _e

import jax
import jax.numpy as jnp

from noisereduce_tpu.models.tpu_gate import TPUGate

__all__ = ["TorchGate"]


def _to_jax(t: torch.Tensor) -> jax.Array:
    # .cpu() is a no-op for CPU tensors; CUDA tensors round-trip through
    # host (this package targets TPUs — there is no torch-CUDA ↔ JAX-TPU
    # zero-copy path)
    return jnp.asarray(t.detach().cpu().numpy())


def _to_torch(a, like: torch.Tensor) -> torch.Tensor:
    # np.asarray of a JAX array is read-only; torch tensors must own
    # writable memory (users do in-place ops), so copy
    return torch.from_numpy(np.asarray(a).copy()).to(
        device=like.device, dtype=like.dtype
    )


class _GateFunction(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, xn, gate):
        xj = _to_jax(x)
        xnj = None if xn is None else _to_jax(xn)
        out = gate(xj, xnj)
        ctx.gate = gate
        ctx.save_for_backward(x)
        ctx.xn_cpu = xn
        return _to_torch(out, x)

    @staticmethod
    def backward(ctx, grad_out):
        (x,) = ctx.saved_tensors
        gate, xn = ctx.gate, ctx.xn_cpu
        xj = _to_jax(x)
        xnj = None if xn is None else _to_jax(xn)
        # jax.vjp routes through the gate's custom VJP (fused primal on
        # TPU, staged cotangent) — identical gradients to jax.grad on the
        # native path. The noise clip feeds statistics only; its grad is
        # not propagated (the reference computes it under no_grad).
        if xnj is None:
            _, vjp_fn = jax.vjp(lambda a: gate(a), xj)
        else:
            _, vjp_fn = jax.vjp(lambda a: gate(a, xnj), xj)
        (gx,) = vjp_fn(_to_jax(grad_out))
        return _to_torch(gx, x), None, None


class TorchGate(torch.nn.Module):
    """Reference-compatible ``TorchGate`` running on the JAX/TPU gate.

    Constructor surface mirrors torchgate/torchgate.py:32-46 (same names,
    same defaults); ``forward(x, xn=None)`` takes (batch, signal_length)
    tensors and returns torch.istft's natural (n_frames-1)*hop length,
    like the reference (torchgate.py:255-264). The module has no torch
    parameters or buffers — ``.to(device)`` keeps working (outputs follow
    the input tensor's device/dtype).
    """

    def __init__(
        self,
        sr: int,
        nonstationary: bool = False,
        n_std_thresh_stationary: float = 1.5,
        n_thresh_nonstationary: float = 1.3,
        temp_coeff_nonstationary: float = 0.1,
        n_movemean_nonstationary: int = 20,
        prop_decrease: float = 1.0,
        n_fft: int = 1024,
        win_length: int = None,
        hop_length: int = None,
        freq_mask_smooth_hz: float = 500,
        time_mask_smooth_ms: float = 50,
    ):
        super().__init__()
        self.gate = TPUGate(
            sr=sr,
            nonstationary=nonstationary,
            n_std_thresh_stationary=n_std_thresh_stationary,
            n_thresh_nonstationary=n_thresh_nonstationary,
            temp_coeff_nonstationary=temp_coeff_nonstationary,
            n_movemean_nonstationary=n_movemean_nonstationary,
            prop_decrease=prop_decrease,
            n_fft=n_fft,
            win_length=win_length,
            hop_length=hop_length,
            freq_mask_smooth_hz=freq_mask_smooth_hz,
            time_mask_smooth_ms=time_mask_smooth_ms,
        )

    def forward(
        self, x: torch.Tensor, xn: torch.Tensor = None
    ) -> torch.Tensor:
        if x.requires_grad or (xn is not None and xn.requires_grad):
            if xn is not None and xn.requires_grad:
                raise ValueError(
                    "gradients through the noise clip are not supported "
                    "(the reference computes noise statistics under "
                    "no_grad); pass xn.detach()"
                )
            return _GateFunction.apply(x, xn, self.gate)
        out = self.gate(
            _to_jax(x), None if xn is None else _to_jax(xn)
        )
        return _to_torch(out, x)
