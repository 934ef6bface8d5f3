"""Public API: ``reduce_noise`` — signature-compatible with the reference
(noisereduce/noisereduce.py:13-185), executing as fused JAX/XLA graphs.

Compatibility notes:
  - ``n_jobs`` and ``tmp_folder`` are accepted for drop-in compatibility.
    Chunk parallelism here is a vmapped (optionally mesh-sharded) axis
    inside one device launch, so they are no-ops — except the reference's
    ``n_jobs != 1 with use_torch`` ValueError, which is preserved.
    ``use_tqdm=True`` shows a real per-chunk-group progress bar by driving
    the chunk loop from the host (reference base.py:211).
  - ``use_torch=True`` selects the torch-convention gate (TPUGate) — no
    torch dependency; ``device`` selects a JAX device ("tpu"/"cpu"/None).
  - The reference computes in float64 (spectralgate/base.py:140). Here the
    compute dtype defaults to float64 when jax x64 is enabled (CPU parity)
    and float32 otherwise (TPU). Override with ``compute_dtype``.

Extra TPU-native kwargs (all optional): ``compute_dtype``, ``method``
('auto' picks matmul-DFT on TPU, FFT on CPU), ``mesh`` (a
``jax.sharding.Mesh`` to shard the chunk axis over devices).
"""
from __future__ import annotations

import functools
import warnings


import jax
import jax.numpy as jnp
import numpy as np

from noisereduce_tpu.config import Convention, GateConfig
from noisereduce_tpu.models.spectral_gate import (
    gate_nonstationary,
    gate_stationary,
    stationary_noise_threshold,
)
from noisereduce_tpu.models.tpu_gate import TPUGate
from noisereduce_tpu.parallel.chunking import (
    n_chunks_for,
    pad_chunk_signal,
    process_chunked,
)

__all__ = ["reduce_noise", "reduce_noise_batch"]


# ---------------------------------------------------------------------------
# jitted pipeline entry points (config objects are static)
# ---------------------------------------------------------------------------
def _fused_chunked_ok(
    cfg, y2d, chunk_size, padding, mesh, mpc, use_pallas, interpret=False
):
    """Whole-body fused chunked path: hop blocks gathered straight from the
    padded signal (no chunk-view materialization), one launch — sharded
    over ``mesh`` and/or scanned in ``max_parallel_chunks`` groups when
    requested (the same kernels run per shard/group)."""
    if use_pallas is False:
        return False
    if y2d.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if y2d.shape[-1] <= chunk_size:
        return False  # unchunked path has different (exact) view geometry
    from noisereduce_tpu.models.spectral_gate import _tpu_available
    from noisereduce_tpu.ops.pallas_pipeline import fused_gate_supported

    wanted = (
        use_pallas is True
        or interpret
        or (use_pallas == "auto" and _tpu_available())
    )
    smoothing = cfg.smoothing
    n_grad_time = smoothing[1] if smoothing else 0
    return wanted and fused_gate_supported(
        cfg, chunk_size + 2 * padding, n_grad_time
    )


def _fused_interpret() -> bool:
    """Test/dryrun hook: NRTPU_FUSED_INTERPRET=1 forces the fused chunked
    path in Pallas interpret mode so CPU meshes exercise the exact
    production composition (the Mosaic kernels execute as jax ops).
    Read once per jit trace (it is a static argument of the entry points)."""
    import os

    return os.environ.get("NRTPU_FUSED_INTERPRET", "") == "1"


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "chunk_size", "padding", "method", "mesh", "axis_name", "mpc",
        "use_pallas", "interpret", "cores",
    ),
)
def _run_stationary(
    y2d, y_noise_mono, cfg, chunk_size, padding, method, mesh=None,
    axis_name="chunks", mpc=0, use_pallas="auto", interpret=False,
    cores=False,
):
    thresh = stationary_noise_threshold(
        y_noise_mono, cfg, method=method, use_pallas=use_pallas
    )
    if _fused_chunked_ok(
        cfg, y2d, chunk_size, padding, mesh, mpc, use_pallas, interpret
    ):
        from noisereduce_tpu.ops.pallas_pipeline import fused_gate_chunked

        return fused_gate_chunked(
            y2d, cfg, chunk_size, padding, noise_thresh=thresh,
            interpret=interpret, mesh=mesh, axis_name=axis_name,
            max_parallel_chunks=mpc, flat_output=not cores,
        )
    fn = lambda c, t: gate_stationary(
        c, t, cfg, method=method, use_pallas=use_pallas
    )
    return process_chunked(
        fn, y2d, chunk_size, padding, mesh=mesh, axis_name=axis_name,
        extra=(thresh,), max_parallel_chunks=mpc,
        cores=cores and y2d.shape[-1] > chunk_size,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "chunk_size", "padding", "method", "mesh", "axis_name", "mpc",
        "use_pallas", "interpret", "cores",
    ),
)
def _run_nonstationary(
    y2d, cfg, chunk_size, padding, method, mesh=None, axis_name="chunks",
    mpc=0, use_pallas="auto", interpret=False, cores=False,
):
    if _fused_chunked_ok(
        cfg, y2d, chunk_size, padding, mesh, mpc, use_pallas, interpret
    ):
        from noisereduce_tpu.ops.pallas_pipeline import fused_gate_chunked

        return fused_gate_chunked(
            y2d, cfg, chunk_size, padding, interpret=interpret, mesh=mesh,
            axis_name=axis_name, max_parallel_chunks=mpc,
            flat_output=not cores,
        )
    fn = lambda c: gate_nonstationary(c, cfg, method=method, use_pallas=use_pallas)
    return process_chunked(
        fn, y2d, chunk_size, padding, mesh=mesh, axis_name=axis_name,
        max_parallel_chunks=mpc, cores=cores and y2d.shape[-1] > chunk_size,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "gate", "chunk_size", "padding", "method", "mesh", "axis_name", "mpc",
        "use_pallas", "cores",
    ),
)
def _run_torch_gate(
    y2d, y_noise, gate, chunk_size, padding, method, mesh=None,
    axis_name="chunks", mpc=0, use_pallas="auto", cores=False,
):
    def one(chunk, xn):
        # TPUGate returns torch's natural (shorter) istft length; the
        # reference writes it into a zeros buffer of the chunk's shape
        # (base.py:144-150 slicing semantics) — zero-fill the tail.
        out = gate(chunk, xn, method=method, use_pallas=use_pallas)
        deficit = chunk.shape[-1] - out.shape[-1]
        if deficit:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, deficit)])
        return out

    def call(chunk, *extra):
        xn = extra[0] if extra else None
        if chunk.ndim == 3:  # (channels, n_chunks, view)
            return gate.batched_chunks(
                chunk, xn, method=method, use_pallas=use_pallas
            )
        return one(chunk, xn)

    extra = () if y_noise is None else (y_noise,)
    return process_chunked(
        call, y2d, chunk_size, padding, mesh=mesh, axis_name=axis_name,
        extra=extra, max_parallel_chunks=mpc,
        cores=cores and y2d.shape[-1] > chunk_size,
    )


# ---------------------------------------------------------------------------
# host-driven chunk loop with a live progress bar (use_tqdm=True, chunked)
# ---------------------------------------------------------------------------
@functools.partial(
    jax.jit, static_argnames=("cfg", "method", "use_pallas")
)
def _group_nonstationary(chunks, cfg, method, use_pallas):
    return gate_nonstationary(chunks, cfg, method=method, use_pallas=use_pallas)


@functools.partial(jax.jit, static_argnames=("cfg", "method", "use_pallas"))
def _group_stationary(chunks, thresh, cfg, method, use_pallas="auto"):
    return gate_stationary(
        chunks, thresh, cfg, method=method, use_pallas=use_pallas
    )


@functools.partial(jax.jit, static_argnames=("cfg", "method", "use_pallas"))
def _noise_threshold_jit(y_noise_mono, cfg, method, use_pallas="auto"):
    return stationary_noise_threshold(
        y_noise_mono, cfg, method=method, use_pallas=use_pallas
    )


@functools.partial(jax.jit, static_argnames=("gate", "method", "use_pallas"))
def _group_torch(chunks, xn, gate, method, use_pallas="auto"):
    return gate.batched_chunks(
        chunks, xn, method=method, use_pallas=use_pallas
    )


@functools.partial(
    jax.jit, static_argnames=("chunk_size", "padding", "g", "n_chunks")
)
def _extract_group_jit(ypad, start, chunk_size, padding, g, n_chunks):
    """Halo'd views for chunks [start, start+g) from the pre-padded signal
    — one compiled graph reused across all groups (``start`` is traced)."""
    view = chunk_size + 2 * padding

    def one(i):
        # clamp so the (shape-static) tail group reads valid memory; the
        # caller discards the rows past n_chunks
        off = jnp.minimum(start + i, n_chunks - 1) * chunk_size
        return jax.lax.dynamic_slice_in_dim(ypad, off, view, axis=-1)

    chunks = jax.vmap(one)(jnp.arange(g))  # (g, ..., view)
    return jnp.moveaxis(chunks, 0, -2)


def _run_chunked_with_progress(
    group_fn, y2d, chunk_size, padding, max_parallel_chunks
):
    """Host-driven chunk-group loop with a tqdm bar (reference base.py:211).

    The fully-batched path is ONE device launch, so real progress requires
    driving groups from the host: one compiled launch per group of
    ``max_parallel_chunks`` chunks (1 if unset — the reference's sequential
    n_jobs=1 granularity). Numerics match the batched path (same per-chunk
    graph; chunks are independent).

    Memory: only the padded signal plus ONE group's views live on device at
    a time (the bounded-HBM property max_parallel_chunks advertises), and
    the filtered signal is assembled host-side — no full-signal device
    round-trip.
    """
    from tqdm.auto import tqdm

    n = y2d.shape[-1]
    n_chunks = n_chunks_for(n, chunk_size)
    ypad = pad_chunk_signal(y2d, chunk_size, padding)
    g = max_parallel_chunks if max_parallel_chunks else 1
    outs = []
    starts = range(0, n_chunks, g)
    for s in tqdm(starts, total=len(starts), desc="chunks", unit="group"):
        block = _extract_group_jit(ypad, s, chunk_size, padding, g, n_chunks)
        k = min(g, n_chunks - s)
        core = np.asarray(group_fn(block))[
            ..., :k, padding : padding + chunk_size
        ]
        outs.append(core.reshape(core.shape[:-2] + (k * chunk_size,)))
    return np.concatenate(outs, axis=-1)[..., :n]


# ---------------------------------------------------------------------------
def _default_compute_dtype():
    return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


def _as_2d(y: np.ndarray):
    """Reference input normalization (base.py:52-62): 1-D -> (1, n) + flat
    flag; >2-D rejected."""
    if y.ndim == 1:
        return y[None, :], True
    if y.ndim > 2:
        raise ValueError("Waveform must be in shape (# frames, # channels)")
    return y, False


def reduce_noise(
    y,
    sr,
    stationary=False,
    y_noise=None,
    prop_decrease=1.0,
    time_constant_s=2.0,
    freq_mask_smooth_hz=500,
    time_mask_smooth_ms=50,
    thresh_n_mult_nonstationary=2,
    sigmoid_slope_nonstationary=10,
    n_std_thresh_stationary=1.5,
    tmp_folder=None,
    chunk_size=600000,
    padding=30000,
    n_fft=1024,
    win_length=None,
    hop_length=None,
    clip_noise_stationary=True,
    use_tqdm=False,
    n_jobs=1,
    use_torch=False,
    device=None,
    # --- TPU-native extras (defaults preserve reference behavior) ---
    compute_dtype=None,
    method="auto",
    mesh=None,
    max_parallel_chunks=0,
):
    """Reduce noise via spectral gating (reference noisereduce.py:13-185).

    Parameters
    ----------
    y : np.ndarray [(frames,) or (channels, frames)], real-valued
        input signal
    sr : int
        sample rate of the input / noise signal
    stationary : bool
        stationary (fixed per-frequency threshold from noise statistics) vs
        non-stationary (time-varying threshold from an IIR-smoothed floor)
        noise reduction; default False
    y_noise : np.ndarray, optional
        noise clip for stationary statistics; defaults to the signal itself
    prop_decrease : float
        proportion to reduce the noise by (1.0 = 100%)
    time_constant_s : float
        time constant of the non-stationary noise-floor IIR, seconds
    freq_mask_smooth_hz / time_mask_smooth_ms : float or None
        triangular mask-smoothing widths (None disables that axis)
    thresh_n_mult_nonstationary, sigmoid_slope_nonstationary : float
        non-stationary threshold multiple and sigmoid slope
    n_std_thresh_stationary : float
        stationary threshold = mean + this many std of the noise dB spectrum
    chunk_size, padding : int
        long recordings process as halo'd chunks of this geometry
    n_fft, win_length, hop_length : int
        STFT geometry (win defaults to n_fft; hop to win // 4)
    clip_noise_stationary : bool
        clip the noise clip to chunk_size samples
    use_torch : bool
        use the torch-convention gate (TPUGate) — no torch dependency
    device : str or jax.Device, optional
        JAX device/platform to run on
    use_tqdm : bool
        show a live progress bar over chunk groups (reference base.py:211).
        On chunked in-memory signals this drives one device launch per
        group of ``max_parallel_chunks`` chunks (1 if unset) from the host;
        batched single-launch execution (the fastest path) has no
        per-chunk progress to report. Ignored with ``mesh``.
    tmp_folder, n_jobs :
        accepted for reference compatibility; chunk fan-out is an XLA
        array axis here, not a process pool
    compute_dtype, method, mesh, max_parallel_chunks :
        TPU-native extras — on-device precision; 'fft' vs 'matmul' (MXU)
        DFT; a jax.sharding.Mesh to shard the chunk axis over devices; and
        a bound on simultaneously-resident chunks (0 = all at once, set to
        bound HBM on hours-long recordings).

    Returns a NumPy array with the input's shape and dtype.
    """
    out, meta = _reduce_noise_deferred(
        y=y,
        sr=sr,
        stationary=stationary,
        y_noise=y_noise,
        prop_decrease=prop_decrease,
        time_constant_s=time_constant_s,
        freq_mask_smooth_hz=freq_mask_smooth_hz,
        time_mask_smooth_ms=time_mask_smooth_ms,
        thresh_n_mult_nonstationary=thresh_n_mult_nonstationary,
        sigmoid_slope_nonstationary=sigmoid_slope_nonstationary,
        n_std_thresh_stationary=n_std_thresh_stationary,
        tmp_folder=tmp_folder,
        chunk_size=chunk_size,
        padding=padding,
        n_fft=n_fft,
        win_length=win_length,
        hop_length=hop_length,
        clip_noise_stationary=clip_noise_stationary,
        use_tqdm=use_tqdm,
        n_jobs=n_jobs,
        use_torch=use_torch,
        device=device,
        compute_dtype=compute_dtype,
        method=method,
        mesh=mesh,
        max_parallel_chunks=max_parallel_chunks,
    )
    return _finalize_reduce_output(out, *meta)


def _reduce_noise_deferred(
    y,
    sr,
    stationary=False,
    y_noise=None,
    prop_decrease=1.0,
    time_constant_s=2.0,
    freq_mask_smooth_hz=500,
    time_mask_smooth_ms=50,
    thresh_n_mult_nonstationary=2,
    sigmoid_slope_nonstationary=10,
    n_std_thresh_stationary=1.5,
    tmp_folder=None,
    chunk_size=600000,
    padding=30000,
    n_fft=1024,
    win_length=None,
    hop_length=None,
    clip_noise_stationary=True,
    use_tqdm=False,
    n_jobs=1,
    use_torch=False,
    device=None,
    compute_dtype=None,
    method="auto",
    mesh=None,
    max_parallel_chunks=0,
    _noise_rows=None,
):
    """:func:`reduce_noise` body, returning the (possibly still in-flight)
    device output plus the metadata ``_finalize_reduce_output`` needs.
    ``reduce_noise_batch`` uses this to queue many launches before any host
    sync (pipelining); the public entry point finalizes immediately. Private
    so the pipelining plumbing stays out of the drop-in-compat signature
    (VERDICT r4 #6).

    ``_noise_rows``: (B, n_clip) per-row noise sources for a stationary
    BATCH of B independent mono signals riding the channel axis — each
    row's threshold comes from its own row (no mono collapse), computed in
    one batched launch and consumed as a (B, bins) per-row threshold by the
    gate kernels. Per-row outputs are exactly the per-signal calls'."""
    del tmp_folder  # chunk fan-out is an XLA axis, not a process pool
    if use_torch and n_jobs != 1:
        raise ValueError(
            "n_jobs must be 1 when using torch version of spectral gating."
        )
    # Validate smoothing geometry eagerly, like the reference constructors
    # (spectralgate/base.py:99-128) — same ValueErrors, before any compile.
    from noisereduce_tpu.config import smoothing_kernel_sizes

    _win = n_fft if win_length is None else win_length
    _hop = _win // 4 if hop_length is None else hop_length
    smoothing_kernel_sizes(
        sr, n_fft, _hop, freq_mask_smooth_hz, time_mask_smooth_ms
    )

    y = np.asarray(y)
    out_dtype = y.dtype
    y2d, flat = _as_2d(y)
    cdtype = compute_dtype or _default_compute_dtype()
    y2d = jnp.asarray(y2d, dtype=cdtype)
    if compute_dtype is not None and y2d.dtype != jnp.dtype(compute_dtype):
        # e.g. compute_dtype=float64 with jax x64 disabled silently realizes
        # as float32 — surface it instead of returning f32 to a parity-minded
        # caller (ADVICE r1).
        warnings.warn(
            f"requested compute_dtype={jnp.dtype(compute_dtype).name} but JAX "
            f"realized {y2d.dtype.name} (enable jax_enable_x64 for float64)",
            stacklevel=2,
        )
    if stationary and y2d.dtype == jnp.bfloat16:
        # The stationary mask is a binary dB-threshold compare; bf16 spectra
        # flip threshold-adjacent bins, bounding accuracy at ~1.5e-1 of peak
        # (~-25 dB) vs the f32 envelope of ~5e-3 for the soft non-stationary
        # mask (tests/test_bfloat16_mode.py, BASELINE.md). Don't let that
        # happen silently.
        warnings.warn(
            "compute_dtype=bfloat16 with stationary=True: the binary "
            "threshold mask amplifies bf16 rounding (pinned envelope ~1.5e-1 "
            "of peak vs f32). Use float32, or stationary=False for bf16 "
            "fast mode.",
            stacklevel=2,
        )

    use_pallas = "auto"
    if device is not None:
        if isinstance(device, str):
            try:
                dev = jax.devices(device)[0]
            except RuntimeError:
                # reference parity: its torch path defaults to device="cuda"
                # and silently falls back when CUDA is absent
                # (streamed_torch_gate.py:53). We fall back to the default
                # device, with a notice.
                warnings.warn(
                    f"device={device!r} is unavailable; falling back to the "
                    f"default JAX device ({jax.devices()[0].platform})",
                    stacklevel=2,
                )
                dev = None
        else:
            dev = device
        if dev is not None:
            y2d = jax.device_put(y2d, dev)
            # the fused Mosaic kernel is TPU-only; an explicit non-TPU device
            # must take the jnp path even when the default backend is a TPU
            if not (
                dev.platform == "tpu"
                or "TPU" in getattr(dev, "device_kind", "").upper()
            ):
                use_pallas = False

    axis_name = mesh.axis_names[0] if mesh is not None else "chunks"
    # live tqdm needs host-driven group launches; the mesh path stays one
    # sharded launch (progress there would serialize devices)
    progress = bool(use_tqdm) and y2d.shape[-1] > chunk_size and mesh is None

    if use_torch:
        out = _reduce_noise_torch_path(
            y2d,
            sr,
            stationary,
            y_noise,
            prop_decrease,
            time_constant_s,
            freq_mask_smooth_hz,
            time_mask_smooth_ms,
            thresh_n_mult_nonstationary,
            sigmoid_slope_nonstationary,
            n_std_thresh_stationary,
            chunk_size,
            padding,
            n_fft,
            win_length,
            hop_length,
            clip_noise_stationary,
            method,
            cdtype,
            mesh,
            axis_name,
            max_parallel_chunks,
            progress,
            use_pallas,
        )
    elif stationary:
        cfg = GateConfig(
            sr=sr,
            stationary=True,
            prop_decrease=prop_decrease,
            time_constant_s=time_constant_s,
            freq_mask_smooth_hz=freq_mask_smooth_hz,
            time_mask_smooth_ms=time_mask_smooth_ms,
            n_std_thresh_stationary=n_std_thresh_stationary,
            n_fft=n_fft,
            win_length=win_length,
            hop_length=hop_length,
            convention=Convention.SCIPY,
        )
        # noise clip handling (stationary.py:47-64): default to y, mono
        # collapse, optional clip to chunk_size samples
        if _noise_rows is not None:
            # batched serving: each row is an independent mono signal whose
            # statistics come from its own noise row (mono collapse of a
            # 1-row signal is the identity — reference semantics per row)
            yn_mono = jnp.asarray(_noise_rows, dtype=cdtype)
            if clip_noise_stationary:
                yn_mono = yn_mono[:, :chunk_size]
        else:
            if y_noise is None:
                yn2d = y2d
            else:
                yn = np.asarray(y_noise)
                yn2d, _ = _as_2d(yn)
                yn2d = jnp.asarray(yn2d, dtype=cdtype)
            yn_mono = jnp.mean(yn2d, axis=0)
            if clip_noise_stationary:
                yn_mono = yn_mono[:chunk_size]
        if progress:
            thresh = _noise_threshold_jit(yn_mono, cfg, method, use_pallas)
            out = _run_chunked_with_progress(
                lambda blk: _group_stationary(
                    blk, thresh, cfg, method, use_pallas
                ),
                y2d, chunk_size, padding, max_parallel_chunks,
            )
        else:
            out = _run_stationary(
                y2d, yn_mono, cfg, chunk_size, padding, method, mesh,
                axis_name, max_parallel_chunks, use_pallas,
                _fused_interpret(), cores=True,
            )
    else:
        cfg = GateConfig(
            sr=sr,
            stationary=False,
            prop_decrease=prop_decrease,
            time_constant_s=time_constant_s,
            freq_mask_smooth_hz=freq_mask_smooth_hz,
            time_mask_smooth_ms=time_mask_smooth_ms,
            thresh_n_mult_nonstationary=thresh_n_mult_nonstationary,
            sigmoid_slope_nonstationary=sigmoid_slope_nonstationary,
            n_fft=n_fft,
            win_length=win_length,
            hop_length=hop_length,
            convention=Convention.SCIPY,
        )
        if progress:
            out = _run_chunked_with_progress(
                lambda blk: _group_nonstationary(blk, cfg, method, use_pallas),
                y2d, chunk_size, padding, max_parallel_chunks,
            )
        else:
            out = _run_nonstationary(
                y2d, cfg, chunk_size, padding, method, mesh, axis_name,
                max_parallel_chunks, use_pallas, _fused_interpret(),
                cores=True,
            )

    return out, (out_dtype, flat, int(y2d.shape[-1]))


def _finalize_reduce_output(out, out_dtype, flat, n_samples):
    out = np.asarray(out)
    if out.ndim == 3:
        # fused chunked path returned (ch, k_pad, chunk_size) cores: the
        # flatten that is a tile-misaligned relayout loop on device (~6.5
        # ms/960 s) is a free view on the host copy
        out = out.reshape(out.shape[0], -1)[:, :n_samples]
    out = out.astype(out_dtype)
    return out.flatten() if flat else out


def _reduce_noise_torch_path(
    y2d,
    sr,
    stationary,
    y_noise,
    prop_decrease,
    time_constant_s,
    freq_mask_smooth_hz,
    time_mask_smooth_ms,
    thresh_n_mult_nonstationary,
    sigmoid_slope_nonstationary,
    n_std_thresh_stationary,
    chunk_size,
    padding,
    n_fft,
    win_length,
    hop_length,
    clip_noise_stationary,
    method,
    cdtype,
    mesh=None,
    axis_name="chunks",
    max_parallel_chunks=0,
    progress=False,
    use_pallas="auto",
):
    """StreamedTorchGate-equivalent dispatch (streamed_torch_gate.py:12-87):
    parameter mapping temp_coeff = 1/slope, n_movemean = time_constant·sr/hop;
    noise kept multi-channel, clipped to the SIGNAL length (not chunk_size)."""
    win = n_fft if win_length is None else win_length
    hop = win // 4 if hop_length is None else hop_length
    gate = TPUGate(
        sr=sr,
        nonstationary=not stationary,
        n_std_thresh_stationary=n_std_thresh_stationary,
        n_thresh_nonstationary=thresh_n_mult_nonstationary,
        temp_coeff_nonstationary=1 / sigmoid_slope_nonstationary,
        n_movemean_nonstationary=int(time_constant_s / hop * sr),
        prop_decrease=prop_decrease,
        n_fft=n_fft,
        win_length=win_length,
        hop_length=hop_length,
        freq_mask_smooth_hz=freq_mask_smooth_hz,
        time_mask_smooth_ms=time_mask_smooth_ms,
    )
    yn = None
    if y_noise is not None:
        yn = np.asarray(y_noise)
        if yn.shape[-1] > y2d.shape[-1] and clip_noise_stationary:
            # reference quirk (streamed_torch_gate.py:57-58): the clip
            # slices the FIRST axis — samples for 1-D noise, but channels
            # (usually a no-op) for 2-D noise. Reproduced for drop-in parity.
            yn = yn[: y2d.shape[-1]]
        if yn.ndim == 1:
            yn = yn[None, :]
        yn = jnp.asarray(yn, dtype=cdtype)
    if progress:
        return _run_chunked_with_progress(
            lambda blk: _group_torch(blk, yn, gate, method, use_pallas),
            y2d, chunk_size, padding, max_parallel_chunks,
        )
    return _run_torch_gate(
        y2d, yn, gate, chunk_size, padding, method, mesh, axis_name,
        max_parallel_chunks, use_pallas, cores=True,
    )


# ---------------------------------------------------------------------------
# Batched serving entry point
# ---------------------------------------------------------------------------
def reduce_noise_batch(ys, sr, y_noise=None, **kwargs):
    """Denoise MANY mono recordings in as few device launches as possible.

    Serving-shaped front end over :func:`reduce_noise`: signals are grouped
    by (length, dtype) and each group runs as ONE batched launch — the gate
    math is row-independent, so each signal's output is exactly what the
    per-signal call produces, while per-launch overhead (the dominant cost
    for short clips; see BASELINE.md's batch-4 row) amortizes across the
    group. All group launches are dispatched before any result is pulled
    back to the host (JAX dispatch is async), so a heterogeneous batch
    pipelines its device work instead of paying a launch+sync round trip
    per group. The reference has no batch entry point — its joblib pool
    (spectralgate/base.py:206-216) parallelizes chunks of one recording,
    not independent recordings.

    Parameters
    ----------
    ys : sequence of 1-D np.ndarray
        mono recordings; lengths and dtypes may differ (equal lengths batch
        together — a production loop that segments streams into fixed-size
        clips gets one launch per dtype)
    sr : int
        shared sample rate
    y_noise : np.ndarray or sequence or None
        a single shared noise clip (stationary mode: one threshold, still
        batched), or one clip per signal (per-signal thresholds: processed
        per signal), or None
    **kwargs :
        forwarded to :func:`reduce_noise`. ``stationary=True`` with
        ``y_noise=None`` derives each signal's threshold from itself;
        equal-length rows still batch — the per-row thresholds are computed
        in one batched launch and consumed as a (B, bins) threshold by one
        batched gate launch, so a 32-clip self-noise batch is 2 launches,
        not 32. Per-signal 1-D noise clips batch the same way (grouped by
        clip length); per-signal 2-D (multichannel) clips fall back to
        pipelined per-signal launches.

    Returns a list of np.ndarray in input order, each with its input's
    shape and dtype. Each output is exactly what the per-signal
    :func:`reduce_noise` call produces (same kernels, row-independent
    math).
    """
    ys = [np.asarray(y) for y in ys]
    for i, y in enumerate(ys):
        if y.ndim != 1:
            raise ValueError(
                f"ys[{i}] has ndim {y.ndim}; reduce_noise_batch takes mono "
                "1-D signals (call reduce_noise directly for multichannel)"
            )
    per_signal_noise = (
        y_noise is not None
        and not isinstance(y_noise, np.ndarray)
        and isinstance(y_noise, (list, tuple))
    )
    if per_signal_noise and len(y_noise) != len(ys):
        raise ValueError(
            f"got {len(y_noise)} noise clips for {len(ys)} signals"
        )
    stationary = bool(kwargs.get("stationary", False))
    use_torch = bool(kwargs.get("use_torch", False))
    clip_noise = bool(kwargs.get("clip_noise_stationary", True))
    # per-row noise statistics: self-noise (each row's threshold from
    # itself) or per-signal clips — both batch via a (B, bins) threshold
    per_row = stationary and (per_signal_noise or y_noise is None)

    out: list = [None] * len(ys)
    if (stationary and per_signal_noise
            and any(np.asarray(c).ndim != 1 for c in y_noise)):
        # per-signal MULTICHANNEL clips would need a mono collapse outside
        # the gate's compute dtype to batch bitwise; keep those per-signal.
        # (Non-stationary gates never read the noise, so their batches stay
        # batched and the clips are simply dropped below.) Per-signal
        # launches still PIPELINE: every launch is queued (deferred)
        # before the first result is pulled to the host, so device work for
        # signal i+1 overlaps the transfer/sync of signal i
        pending = [
            _reduce_noise_deferred(
                y=y, sr=sr, y_noise=y_noise[i], **kwargs,
            )
            for i, y in enumerate(ys)
        ]
        return [_finalize_reduce_output(o, *meta) for o, meta in pending]

    groups: dict = {}
    for i, y in enumerate(ys):
        key = (y.shape[0], y.dtype)
        if per_signal_noise and stationary:
            c = np.asarray(y_noise[i])
            key += (c.shape[-1], c.dtype)
        groups.setdefault(key, []).append(i)
    # dispatch every group's launch before materializing any result: JAX
    # dispatch is async, so a heterogeneous batch (several (length, dtype)
    # groups) pipelines its device work instead of paying one
    # launch+sync round trip per group. The cost is every group's output
    # staying resident until the final gather — short serving clips, not
    # hours of audio.
    pending = []
    for idx in groups.values():
        block = np.stack([ys[i] for i in idx])  # (B, n)
        if not per_row:
            # shared threshold (one clip) or non-stationary (noise unused
            # by the gate — drop it so a per-signal clip list can't reach
            # np.asarray as a ragged sequence): one launch
            pending.append(
                (idx, _reduce_noise_deferred(
                    y=block, sr=sr,
                    y_noise=y_noise if stationary else None, **kwargs))
            )
        elif use_torch:
            # TPUGate's stationary statistics are already per batch row
            # (torchgate.py:126-165): self-noise batches with xn=None, and
            # equal-length 1-D clips stack into a (B, n_clip) xn after the
            # adapter's per-signal length clip (streamed_torch_gate.py:57-58)
            if per_signal_noise:
                n = block.shape[-1]
                clips = [np.asarray(y_noise[i]) for i in idx]
                if clip_noise:
                    clips = [c[:n] if c.shape[-1] > n else c for c in clips]
                noise_arg = np.stack(clips)
            else:
                noise_arg = None
            pending.append(
                (idx, _reduce_noise_deferred(y=block, sr=sr,
                                             y_noise=noise_arg, **kwargs))
            )
        else:
            # scipy engine: per-row thresholds from each row's own noise
            # source, ONE batched threshold launch + ONE batched gate launch
            # (VERDICT r4 #3); outputs are bitwise the per-signal calls'
            noise_rows = (
                np.stack([np.asarray(y_noise[i]) for i in idx])
                if per_signal_noise else block
            )
            pending.append(
                (idx, _reduce_noise_deferred(y=block, sr=sr, y_noise=None,
                                             _noise_rows=noise_rows,
                                             **kwargs))
            )
    for _, (o, _) in pending:
        # queue every group's D2H before materializing any result, so
        # transfers overlap trailing compute (and each other, where the
        # interconnect allows)
        if hasattr(o, "copy_to_host_async"):
            o.copy_to_host_async()
    for idx, (o, meta) in pending:
        res = _finalize_reduce_output(o, *meta)
        for row, i in enumerate(idx):
            out[i] = res[row]
    return out
