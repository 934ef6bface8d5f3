"""Real multi-process DCN-path test: 2 jax.distributed processes on
localhost (4 virtual CPU devices each -> one 8-device global mesh) drive
``distributed_chunks`` + the shard-mapped gate end-to-end, including the
segment-boundary halo contract (each process holds only its own segment of
the recording, cut with ``padding`` overlap).

This replaces the reference's joblib process pool test coverage
(/root/reference/spectralgate/base.py:206-216) with the multi-HOST
equivalent: process-local data, one global sharded array, no collectives.
"""
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_chunks_match_single_process():
    port = str(_free_port())
    env = dict(os.environ)
    # the workers set their own JAX_PLATFORMS/XLA_FLAGS; scrub conflicting
    # inherited settings (the repo conftest forces an 8-device single host)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=os.path.dirname(HERE),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}: OK" in out, out[-2000:]
