"""Import-smoke the example scripts (module-level code only; their mains
are __main__-guarded). Catches bootstrap/import rot — the full runs are
exercised manually and in docs, not here (minutes of CPU compile)."""
import importlib.util
import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.parametrize("name", ["demo.py", "tpugate_training.py"])
def test_example_imports(name):
    path = os.path.join(EXAMPLES, name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main)
