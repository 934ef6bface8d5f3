"""Device-trace module + kernel time of the f32 fused headline graph.

Round-5 record: this script adjudicated the 6-pass limb-emulation
experiment (NOTES.md "f32 HIGHEST dots measured IRREDUCIBLE"). The
NRTPU_F32_DOT switch it toggled was removed with the losing variants —
an optional argv[1] label is kept only for output tagging. Trace-based
timing is the methodology keeper: wall-minus-launch through the tunnel
swung the SAME executables by ±40% across sessions.
"""
import glob, gzip, json, os, sys, tempfile, time
mode = sys.argv[1] if len(sys.argv) > 1 else "current"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/nr_tpu_jax_cache")
import jax.numpy as jnp
from noisereduce_tpu.config import GateConfig
from noisereduce_tpu.api import _run_nonstationary

SR, DUR, CHUNK, PAD = 48000, 960, 600000, 30000
cfg = GateConfig(sr=SR, stationary=False)
rng = np.random.default_rng(0)
y = jax.device_put(jnp.asarray(rng.standard_normal((1, SR*DUR)), jnp.float32))

def _checksum(out):
    return jnp.sum(out.reshape(-1, 4096).astype(jnp.float32))

full = jax.jit(lambda a: _checksum(_run_nonstationary(a, cfg, CHUNK, PAD, "matmul", use_pallas="auto")))
v = float(full(y))  # compile+warm
reps = 4
with tempfile.TemporaryDirectory(prefix="tr") as td:
    with jax.profiler.trace(td):
        for _ in range(reps):
            float(full(y))
    paths = glob.glob(os.path.join(td, "**", "*.trace.json.gz"), recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
events = data.get("traceEvents", [])
dev_pids = {e.get("pid") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and ("TPU" in e.get("args", {}).get("name", "")
                 or "/device:" in e.get("args", {}).get("name", "")
                 or "Device" in e.get("args", {}).get("name", ""))}
per_op = {}
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        per_op[e["name"]] = per_op.get(e["name"], 0.0) + e.get("dur", 0.0)
module_us = max((us for nm, us in per_op.items() if nm.startswith("jit")), default=0.0)
kern_us = sum(us for nm, us in per_op.items() if "nonstationary" in nm.lower() or "custom" in nm.lower())
print(f"mode={mode} checksum={v:.6f} module {module_us/reps/1e3:.2f} ms/run, kernel-bucket {kern_us/reps/1e3:.2f} ms/run")
