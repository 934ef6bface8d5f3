#!/usr/bin/env python
"""Device-trace per-op profile of the TPUGate b256 training step.

Round-4 follow-up to exp_train_r4.py: the step is fused primal +
bf16-cotangent staged twin; this script answers WHERE the ~20 ms of
on-chip step time goes (fused fwd kernel vs staged twin fwd vs staged
bwd vs framing/OLA data movement), using the same trace-parsing
approach as bench.py's _phase_attribution but reporting the top ops
individually.
"""
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/nr_tpu_jax_cache")
import jax.numpy as jnp

from noisereduce_tpu.models.tpu_gate import TPUGate

REPS = 5


def timeit(fn, *args, reps=6):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def trace_ops(fn, *args, reps=REPS, top=28):
    float(fn(*args))  # compile outside the trace
    with tempfile.TemporaryDirectory(prefix="nr_train_trace") as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                float(fn(*args))
        paths = glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                          recursive=True)
        if not paths:
            print("no trace captured")
            return
        with gzip.open(sorted(paths)[-1], "rt") as f:
            data = json.load(f)
    events = data.get("traceEvents", [])
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm or "Device" in nm:
                dev_pids.add(e.get("pid"))
    per_op = {}
    module_us = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit"):
            module_us = max(module_us, e.get("dur", 0.0))
            continue
        per_op[name] = per_op.get(name, 0.0) + e.get("dur", 0.0)
    total = sum(per_op.values())
    print(f"module span {module_us / reps / 1e3:8.3f} ms/run; "
          f"sum of ops {total / reps / 1e3:8.3f} ms/run")
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us / reps / 1e3:8.3f} ms  {name[:110]}")


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32), dev)
    t_launch = timeit(jax.jit(lambda x: jnp.sum(x) + 1.0), tiny, reps=10)
    print(f"launch overhead {t_launch * 1e3:.2f} ms", flush=True)

    g2 = TPUGate(sr=16000, nonstationary=True)
    xb = jax.device_put(
        jnp.asarray(rng.standard_normal((256, 16000 * 4)), jnp.float32), dev
    )

    def loss_fn(xx):
        return jnp.mean(g2(xx) ** 2)

    @jax.jit
    def train_step(x):
        loss, grads = jax.value_and_grad(loss_fn)(x)
        return loss + jnp.sum(grads)

    @jax.jit
    def fwd_only(x):
        return loss_fn(x)

    audio_s = 256 * 4
    t_f = timeit(fwd_only, xb)
    print(f"fwd-only   {t_f * 1e3:8.2f} ms  "
          f"(on-chip ~{(t_f - t_launch) * 1e3:.2f})", flush=True)
    t_s = timeit(train_step, xb)
    print(f"train step {t_s * 1e3:8.2f} ms  RTF {audio_s / t_s:,.0f}  "
          f"(on-chip ~{(t_s - t_launch) * 1e3:.2f})", flush=True)

    print("\n=== fwd-only trace ===", flush=True)
    trace_ops(fwd_only, xb)
    print("\n=== train-step trace ===", flush=True)
    trace_ops(train_step, xb)


if __name__ == "__main__":
    main()
