#!/usr/bin/env python
"""Round-4 single-session on-chip measurement sweep.

Everything the round-4 perf work needs, captured in ONE session so the
numbers are like-for-like under one tunnel state (the remote launch
overhead swings 24-80 ms across sessions — see NOTES.md):

  A. launch overhead (empty jit)
  B. headline bf16 pipeline, stage deltas: full / blocks build /
     merged-kernel-from-blocks / kernel-without-istft-tail (the tail
     slice+assembly cost), plus the f32 twins of full/from-blocks
  C. in-kernel phase ablations (monkeypatch stubs, probe_fast_phases
     style): iSTFT body, mask phases, freq-smooth/blend, spectra-only
  D. a jax.profiler device trace of the full bf16 graph, parsed into
     per-op device-time buckets (gather/kernel/assembly/other) — the
     trace-backed attribution VERDICT r3 item 1 asks for
  E. training step (TPUGate, batch 256 x 4 s @16 kHz): full step,
     forward-only, and the backward-only residue
  F. batch serving row (32 x 15 s clips) as currently dispatched

Run on the TPU: python benchmarks/profile_r4.py [--skip-trace]
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/nr_tpu_jax_cache")
import jax.numpy as jnp

from noisereduce_tpu.config import GateConfig
from noisereduce_tpu.api import _run_nonstationary
from noisereduce_tpu.ops.pallas import dispatch as dp
from noisereduce_tpu.ops.pallas import kernels as kn

SR, DUR, CHUNK, PAD = 48000, 960, 600000, 30000
REPS = 8


def _checksum(out):
    if out.size % 4096 == 0:
        return jnp.sum(out.reshape(-1, 4096).astype(jnp.float32))
    return jnp.sum(out.astype(jnp.float32))


def timeit(fn, *args, reps=REPS):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def p(label, t, extra=""):
    print(f"{label:<44s} {t * 1e3:8.2f} ms {extra}", flush=True)


def parse_trace(trace_dir):
    """Sum device-track op durations from a jax.profiler trace, bucketed."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print("no trace file found under", trace_dir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device PIDs (process names containing TPU / device)
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm or "Device" in nm:
                dev_pids.add(e.get("pid"))
    per_op = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        per_op[name] = per_op.get(name, 0.0) + e.get("dur", 0.0)
    total = sum(per_op.values())
    print(f"-- trace: {len(per_op)} distinct device ops, "
          f"total {total / 1e3:.2f} ms (all reps in trace window)")
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"   {us / 1e3:9.3f} ms  {name[:110]}")


def main():
    skip_trace = "--skip-trace" in sys.argv
    cfg = GateConfig(sr=SR, stationary=False)
    scfg = cfg.stft
    rng = np.random.default_rng(0)
    n = SR * DUR
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    from noisereduce_tpu.ops.pallas.geometry import _geometry, _merged_halo

    ngf = cfg.smoothing[0] if cfg.smoothing else 0
    halo = _merged_halo(ngf)
    view = CHUNK + 2 * PAD
    win, hop, r, n_frames, n_blocks, t_pad, nb_pad, ext, n_tiles = _geometry(
        scfg, view, halo
    )
    k = (n - 1) // CHUNK + 1
    need = n_blocks * hop
    bpad = scfg.boundary_pad
    boundary = (bpad, view)
    print(f"geometry: chunks={k} t_pad={t_pad} n_tiles={n_tiles} hop={hop} "
          f"r={r} need={need}", flush=True)

    # ---- A. launch overhead ------------------------------------------------
    tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32), dev)
    t_launch = timeit(jax.jit(lambda x: jnp.sum(x) + 1.0), tiny)
    p("A  launch overhead (empty jit)", t_launch)

    # ---- B. stage deltas ----------------------------------------------------
    y16 = jax.device_put(
        jnp.asarray(rng.standard_normal((1, n)), jnp.bfloat16), dev
    )
    y32 = jax.device_put(
        jnp.asarray(rng.standard_normal((1, n)), jnp.float32), dev
    )

    full = jax.jit(lambda a: _checksum(
        _run_nonstationary(a, cfg, CHUNK, PAD, "matmul", use_pallas="auto")
    ))
    t_full16 = timeit(full, y16)
    p("B1 full fused bf16", t_full16, f"({DUR / t_full16:,.0f} RTF, "
      f"on-chip ~{(t_full16 - t_launch) * 1e3:.1f} ms)")
    t_full32 = timeit(full, y32)
    p("B2 full fused f32", t_full32, f"({DUR / t_full32:,.0f} RTF)")

    def build_blocks(y2d, bf16):
        ch = y2d.shape[0]
        left = PAD + bpad
        right = max(0, (k - 1) * CHUNK + need - n - left)
        ypad = jnp.pad(y2d, [(0, 0), (left, right)])
        parts = [
            jax.lax.dynamic_slice_in_dim(ypad, i * CHUNK, need, axis=-1)
            for i in range(k)
        ]
        ext_sig = jnp.stack(parts, axis=1)
        rm = 16 if bf16 else 8
        n8 = -(-n_blocks // rm) * rm
        return jnp.pad(
            ext_sig.reshape(ch * k, n_blocks, hop),
            [(0, 0), (0, n8 - n_blocks), (0, 0)],
        )

    t_blocks = timeit(jax.jit(lambda a: _checksum(build_blocks(a, True))), y16)
    p("B3 blocks build bf16 (pad+slices+stack)", t_blocks,
      f"(on-chip ~{(t_blocks - t_launch) * 1e3:.1f} ms)")

    blocks16 = jax.device_put(jax.jit(lambda a: build_blocks(a, True))(y16), dev)

    def from_blocks(b):
        out = dp._merged_gate_from_blocks(
            b, cfg, view, False, None,
            out_slice=(PAD, CHUNK), fast=True, boundary=boundary,
        )
        return _checksum(out)

    t_fromblk = timeit(jax.jit(from_blocks), blocks16)
    p("B4 merged kernel from blocks (bf16+tail)", t_fromblk,
      f"(on-chip ~{(t_fromblk - t_launch) * 1e3:.1f} ms)")

    # kernel without the istft tail slice: checksum the raw OLA plane
    orig_tail = dp._scipy_istft_tail

    def tail_stub(out_blocks, scfg_, n_frames_, out_slice=None,
                  norm_done=False):
        B, tp, hp = out_blocks.shape
        return out_blocks.reshape(B, tp * hp)

    dp._scipy_istft_tail = tail_stub
    try:
        t_notail = timeit(jax.jit(from_blocks), blocks16)
    finally:
        dp._scipy_istft_tail = orig_tail
    p("B5 kernel, no tail slice (plane checksum)", t_notail,
      f"-> tail+assembly ~{(t_fromblk - t_notail) * 1e3:.1f} ms")

    # implied gather cost inside the full graph
    print(f"   => full - fromblocks (gather in situ) "
          f"~{(t_full16 - t_fromblk) * 1e3:.1f} ms; standalone gather "
          f"~{(t_blocks - t_launch) * 1e3:.1f} ms", flush=True)

    # ---- C. in-kernel phase ablations (bf16, from prebuilt blocks) ---------
    # CRITICAL METHODOLOGY NOTE (round 4): jax.jit reuses traces keyed on
    # the wrapped FUNCTION OBJECT, so re-jitting the same `from_blocks`
    # after monkeypatching the kernels silently reuses the UNSTUBBED trace
    # — the original version of this script measured the full kernel five
    # times and reported noise as phase deltas. Every ablation below must
    # (a) clear the jit caches and (b) wrap a FRESH function object.
    def run_fromblocks():
        jax.clear_caches()

        def fresh(b):  # new function object -> new trace
            return from_blocks(b)

        f = jax.jit(fresh)
        return timeit(f, blocks16)

    orig_istft = kn._apply_istft_kernel
    orig_am = kn._am_kernel
    orig_fs = kn._freq_smooth_blend_phase

    def istft_stub(re_ref, im_ref, m_ref, ci, si, out_ref, *, inv=None,
                   oacc_ref=None, **kw):
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        if oacc_ref is not None:
            oacc_ref[...] = jnp.zeros(oacc_ref.shape, oacc_ref.dtype)

    def am_stub(blocks_hbm, c_ref, s_ref, re_ref, im_ref, mask_ref, tc_ref,
                ts_ref, y_ref, blocks_ref, dma_sem, l_ref, lt_ref, dfwd_ref,
                dbwd_ref, **kw):
        from jax.experimental import pallas as pl_

        j = pl_.program_id(1)
        bin0 = kw["bin0_base"] + j * kw["core"]
        kn._spectra_phases(
            blocks_hbm, blocks_ref, dma_sem, c_ref, s_ref, re_ref, im_ref,
            tc_ref, ts_ref,
            n_tb=kw["n_tb"], n_tiles=kw["n_tiles"], r=kw["r"],
            ext=kw["ext"], bin0=bin0, j=j, col_dc=kw["col_dc"],
            n_bins=kw["n_bins"], scale=kw["scale"], prec=kw["prec"],
            boundary=kw.get("boundary"), direct=kw.get("direct", False),
        )
        mask_ref[...] = jnp.ones(mask_ref.shape, mask_ref.dtype)

    def fs_stub(mask_s, band, **kw):
        return

    kn._apply_istft_kernel = istft_stub
    dp._apply_istft_kernel = istft_stub
    try:
        t_noistft = run_fromblocks()
    finally:
        kn._apply_istft_kernel = orig_istft
        dp._apply_istft_kernel = orig_istft
    p("C1 ablate iSTFT body", t_noistft,
      f"-> iSTFT ~{(t_fromblk - t_noistft) * 1e3:.1f} ms")

    kn._am_kernel = am_stub
    dp._am_kernel = am_stub
    try:
        t_nomask = run_fromblocks()
    finally:
        kn._am_kernel = orig_am
        dp._am_kernel = orig_am
    p("C2 ablate mask phases (mask:=1)", t_nomask,
      f"-> IIR+sigmoid+tsmooth ~{(t_fromblk - t_nomask) * 1e3:.1f} ms")

    kn._freq_smooth_blend_phase = fs_stub
    dp._freq_smooth_blend_phase = fs_stub
    try:
        t_nofs = run_fromblocks()
    finally:
        kn._freq_smooth_blend_phase = orig_fs
        dp._freq_smooth_blend_phase = orig_fs
    p("C3 ablate freq-smooth/blend", t_nofs,
      f"-> band+blend ~{(t_fromblk - t_nofs) * 1e3:.1f} ms")

    kn._apply_istft_kernel = istft_stub
    dp._apply_istft_kernel = istft_stub
    kn._am_kernel = am_stub
    dp._am_kernel = am_stub
    kn._freq_smooth_blend_phase = fs_stub
    dp._freq_smooth_blend_phase = fs_stub
    try:
        t_sponly = run_fromblocks()
    finally:
        kn._apply_istft_kernel = orig_istft
        dp._apply_istft_kernel = orig_istft
        kn._am_kernel = orig_am
        dp._am_kernel = orig_am
        kn._freq_smooth_blend_phase = orig_fs
        dp._freq_smooth_blend_phase = orig_fs
    p("C4 spectra+DMA only", t_sponly,
      f"(on-chip ~{(t_sponly - t_launch) * 1e3:.1f} ms)")

    # ---- D. device trace of the full bf16 graph -----------------------------
    if not skip_trace:
        trace_dir = "/tmp/nr_r4_trace"
        os.makedirs(trace_dir, exist_ok=True)
        try:
            with jax.profiler.trace(trace_dir):
                for _ in range(3):
                    float(full(y16))
            parse_trace(trace_dir)
        except Exception as e:
            print("trace failed:", repr(e)[:200], flush=True)

    # ---- E. training step (batch 256 x 4 s @ 16 kHz) ------------------------
    from noisereduce_tpu.models.tpu_gate import TPUGate

    g2 = TPUGate(sr=16000, nonstationary=True)
    xb = jax.device_put(
        jnp.asarray(rng.standard_normal((256, 16000 * 4)), jnp.float32), dev
    )

    def loss_fn(xx):
        return jnp.mean(g2(xx) ** 2)

    def train_step(x):
        loss, grads = jax.value_and_grad(loss_fn)(x)
        return loss + jnp.sum(grads)

    audio_s = 256 * 4
    t_step = timeit(jax.jit(train_step), xb, reps=4)
    p("E1 train step b256 (fwd+bwd)", t_step,
      f"({audio_s / t_step:,.0f} RTF)")
    t_fwd = timeit(jax.jit(loss_fn), xb, reps=4)
    p("E2 train fwd only (fused primal)", t_fwd,
      f"-> bwd residue ~{(t_step - t_fwd) * 1e3:.1f} ms")

    # staged forward alone (what the bwd recomputes today)
    def staged_fwd(x):
        return jnp.mean(g2(x, use_pallas=False) ** 2)

    t_staged = timeit(jax.jit(staged_fwd), xb, reps=4)
    p("E3 staged fwd only", t_staged)

    # ---- F. batch serving row (32 x 15 s) -----------------------------------
    n_clip = SR * 15
    yb = jax.device_put(
        jnp.asarray(rng.standard_normal((32, n_clip)), jnp.float32), dev
    )
    t_batch = timeit(full, yb, reps=4)
    p("F1 batch 32x15s f32 (current dispatch)", t_batch,
      f"({32 * 15 / t_batch:,.0f} RTF)")
    t_batch16 = timeit(full, yb.astype(jnp.bfloat16), reps=4)
    p("F2 batch 32x15s bf16", t_batch16,
      f"({32 * 15 / t_batch16:,.0f} RTF)")

    print("done.", flush=True)


if __name__ == "__main__":
    main()
