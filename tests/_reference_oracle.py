"""Record/replay oracle for the parity suites.

Parity tests compare ``noisereduce_tpu.reduce_noise`` against the reference
package. With a reference checkout present (``/root/reference``) the oracle
runs it LIVE; without one, it replays outputs recorded into
``tests/golden/parity_v1.npz`` — so the whole suite runs standalone with
zero skips (VERDICT r2 item 6).

Keys are content hashes of the exact call (input bytes + dtype + shape +
kwargs), so replay only ever matches byte-identical workloads; any drift in
a test's inputs fails loudly with a re-capture instruction instead of
silently comparing the wrong fixture.

Capture/refresh (requires the reference checkout)::

    NRTPU_CAPTURE_PARITY=1 python -m pytest \
        tests/test_reduce_noise_parity.py tests/test_parity_sweep.py -q

Force replay mode even with the checkout present (CI standalone proof)::

    NRTPU_IGNORE_REFERENCE=1 python -m pytest tests/ -q
"""
from __future__ import annotations

import atexit
import hashlib
import os
import sys
import warnings

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = "/root/reference"
SPEECH_WAV = os.path.join(HERE, "..", "assets", "speech.wav")
CAFE_WAV = os.path.join(HERE, "..", "assets", "cafe.wav")
PARITY_NPZ = os.path.join(HERE, "golden", "parity_v1.npz")

_FORCE_REPLAY = os.environ.get("NRTPU_IGNORE_REFERENCE") == "1"
CAPTURING = os.environ.get("NRTPU_CAPTURE_PARITY") == "1"

LIVE = False
_nr_ref = None
if not _FORCE_REPLAY and os.path.isdir(REFERENCE):
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    try:
        import noisereduce as _nr_ref  # type: ignore

        LIVE = True
    except Exception:  # pragma: no cover - packaging issue in the checkout
        _nr_ref = None

_store: dict[str, np.ndarray] = {}
_replay = None


def call_key(y, kwargs: dict) -> str:
    """Content hash of one reduce_noise call (arrays by bytes)."""
    h = hashlib.sha1()

    def add_array(a):
        a = np.asarray(a)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())

    add_array(y)
    for k in sorted(kwargs):
        h.update(k.encode())
        v = kwargs[k]
        if isinstance(v, np.ndarray):
            add_array(v)
        else:
            h.update(repr(v).encode())
    return "k" + h.hexdigest()


def reference_reduce_noise(y, sr, **kwargs) -> np.ndarray:
    """The reference's reduce_noise — live when available, replayed else."""
    key = call_key(y, dict(kwargs, sr=sr))
    if LIVE:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = _nr_ref.reduce_noise(y=y, sr=sr, **kwargs)
        if CAPTURING:
            _store[key] = np.asarray(out)
        return out

    global _replay
    if _replay is None:
        if not os.path.exists(PARITY_NPZ):
            raise RuntimeError(
                f"no reference checkout and no recorded fixtures at "
                f"{PARITY_NPZ}; capture them with NRTPU_CAPTURE_PARITY=1 "
                f"and the reference present"
            )
        _replay = np.load(PARITY_NPZ)
    if key not in _replay.files:
        raise KeyError(
            f"no recorded reference output for this workload ({key}) — the "
            f"test's inputs changed since capture; re-run "
            f"NRTPU_CAPTURE_PARITY=1 pytest on the parity suites with "
            f"/root/reference present"
        )
    return _replay[key]


if CAPTURING and LIVE:

    @atexit.register
    def _dump_capture():  # merge so the suites can capture incrementally
        if not _store:
            return
        merged: dict[str, np.ndarray] = {}
        if os.path.exists(PARITY_NPZ):
            with np.load(PARITY_NPZ) as old:
                merged.update({k: old[k] for k in old.files})
        merged.update(_store)
        np.savez_compressed(PARITY_NPZ, **merged)
        print(
            f"[parity-capture] wrote {len(_store)} new / {len(merged)} total "
            f"entries to {PARITY_NPZ}"
        )
