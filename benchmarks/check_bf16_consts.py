#!/usr/bin/env python
"""On-device check of the bf16-const-matrix claim (geometry.py
_fast_consts_bf16): pre-truncating the direct windowed-DFT const matrices
to bf16 should be bit-identical to feeding the f32 matrices into Mosaic
DEFAULT dots (which truncate operands to bf16 on the way into the MXU).

Runs the bf16 fast merged kernel twice — once with the production bf16
consts, once with _fast_consts_bf16 monkeypatched to identity — and
compares outputs elementwise on device.

Run on the TPU: python benchmarks/check_bf16_consts.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/nr_tpu_jax_cache")
import jax.numpy as jnp

SR, DUR, CHUNK, PAD = 48000, 30, 600000, 30000


def main():
    from noisereduce_tpu.api import _run_nonstationary
    from noisereduce_tpu.config import GateConfig
    from noisereduce_tpu.ops.pallas import dispatch as dp
    from noisereduce_tpu.ops.pallas import geometry as geo

    cfg = GateConfig(sr=SR, stationary=False)
    rng = np.random.default_rng(0)
    y = jax.device_put(
        jnp.asarray(rng.standard_normal((1, SR * DUR)), jnp.bfloat16),
        jax.devices()[0],
    )

    def run():
        f = jax.jit(
            lambda a: _run_nonstationary(
                a, cfg, CHUNK, PAD, "matmul", use_pallas="auto"
            )
        )
        return np.asarray(f(y))

    out_bf16 = run()

    orig = geo._fast_consts_bf16
    geo._fast_consts_bf16 = lambda *arrs: arrs  # keep f32 consts
    dp._fast_consts_bf16 = geo._fast_consts_bf16
    try:
        out_f32c = run()
    finally:
        geo._fast_consts_bf16 = orig
        dp._fast_consts_bf16 = orig

    same = np.array_equal(out_bf16, out_f32c)
    dmax = float(np.max(np.abs(out_bf16.astype(np.float32)
                               - out_f32c.astype(np.float32))))
    smax = float(np.max(np.abs(out_f32c.astype(np.float32))))
    print(f"bitwise identical: {same}   max abs dev: {dmax:.3e} "
          f"(rel {dmax / max(smax, 1e-30):.3e})")
    if not same:
        print("NOTE: DEFAULT-precision truncation differs from explicit "
              "RNE bf16 casting — update the geometry.py comment if so.")


if __name__ == "__main__":
    main()
