"""Execute the Python code blocks in docs/getting-started.md so the
quickstart cannot rot (VERDICT r3 #7 — doc examples smoke-tested like
tests/test_examples.py). Blocks run in one shared namespace in document
order; file/batch/mesh blocks get their inputs pre-seeded with small
synthetic audio so the run stays CPU-cheap."""
import os
import pathlib
import re

import numpy as np
import pytest

DOC = pathlib.Path(__file__).parents[1] / "docs" / "getting-started.md"


def _python_blocks(text):
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def test_getting_started_blocks(tmp_path, monkeypatch):
    blocks = _python_blocks(DOC.read_text())
    assert len(blocks) >= 5, "getting-started.md lost its code blocks"

    # inputs the doc assumes exist: a noisy wav on disk, short clips, and a
    # long recording (kept just over one chunk so the mesh block chunks)
    import noisereduce_tpu as nr

    sr_seed = 16000
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(sr_seed) * 3000).astype(np.int16)
    from scipy.io import wavfile

    monkeypatch.chdir(tmp_path)
    wavfile.write("noisy.wav", sr_seed, wav)
    ns = {
        "clip_a": rng.standard_normal(4000).astype(np.float32),
        "clip_b": rng.standard_normal(4000).astype(np.float32),
        "clip_c": rng.standard_normal(5000).astype(np.float32),
        "long_audio": rng.standard_normal(40000).astype(np.float32),
    }
    for block in blocks:
        if "long_audio" in block:
            # keep the mesh block cheap: chunk the 40k-sample signal
            block = block.replace(
                "mesh=mesh)", "mesh=mesh, chunk_size=8000, padding=400)"
            )
        exec(compile(block, str(DOC), "exec"), ns)
    assert ns["clean"].shape == ns["long_audio"].shape
    assert os.path.exists("clean.wav")
    assert len(ns["outs"]) == 3


def test_getting_started_cli_line():
    """The CLI invocation the doc shows parses (module + flags exist)."""
    text = DOC.read_text()
    assert "python -m noisereduce_tpu" in text
    from noisereduce_tpu.__main__ import main

    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
