"""The shipped notebooks must parse, and their code must execute end-to-end
(at reduced sizes, via parameter substitution) on the CPU backend."""
import json
import re
from pathlib import Path

import pytest

NB_DIR = Path(__file__).parents[1] / "notebooks"

#: size reductions so the walkthroughs run in seconds on CPU
_SHRINK = [
    (r"\bB = 2048\b", "B = 64"),
    (r"T=4096 \+ 1", "T=512 + 1"),
    (r"w=126", "w=30"),
    (r"max_context=126", "max_context=30"),
    (r"s=1024", "s=256"),
    (r"k=8192", "k=64"),
    (r"horizon=252", "horizon=80"),
    (r"R=32768", "R=4"),
    (r"R=32\b", "R=4"),
    (r"J=8", "J=5"),
    (r"max_iterations=500", "max_iterations=40"),
    (r"batch=32", "batch=4"),
    (r"np\.array\(\[7, 25, 75\]\)", "np.array([5, 10, 20])"),
    (r"Ts=\[2, 7, 252\]", "Ts=[2, 7, 40]"),
    (r"size=\(8, 34\)", "size=(2, 34)"),
    (r"size=\(128, 512, 34\)", "size=(16, 64, 34)"),
    (r"size=\(8, 1, 126\)", "size=(2, 1, 30)"),
    (r"size=\(32, 1, 4096\)", "size=(8, 1, 512)"),
    (r"alpha=1.15, beta=0.9, max_context=126", "alpha=1.3, beta=0.9, max_context=30"),
    (r"size=\(1, 1, 126\)", "size=(1, 1, 30)"),
    (r"size=\(131072, 1, 4096\)", "size=(64, 1, 512)"),
    (r"k=10000", "k=32"),
    (r"k=32, n_splits=32", "k=8, n_splits=4"),
    (r"k=64, n_splits=64", "k=16, n_splits=8"),
    (r":32(?=[,\]])", ":8"),
    (r"k=1024", "k=32"),
    (r"w=252", "w=100"),
]


def _cells(path):
    nb = json.loads(path.read_text())
    assert nb["nbformat"] == 4
    return ["".join(c["source"]) for c in nb["cells"]
            if c["cell_type"] == "code"]


@pytest.mark.parametrize("name", ["tutorial", "testing"])
def test_notebook_parses(name):
    for i, src in enumerate(_cells(NB_DIR / f"{name}.ipynb")):
        compile(src, f"{name}[{i}]", "exec")


@pytest.mark.parametrize("name", ["tutorial", "testing"])
def test_notebook_executes_shrunk(name, tmp_path, monkeypatch):
    import matplotlib

    matplotlib.use("Agg")
    monkeypatch.chdir(tmp_path)  # CACHE_PATH = cwd/_cache stays in tmp

    env = {"__name__": "__main__"}
    for i, src in enumerate(_cells(NB_DIR / f"{name}.ipynb")):
        for pat, rep in _SHRINK:
            src = re.sub(pat, rep, src)
        try:
            exec(compile(src, f"{name}[{i}]", "exec"), env)
        except Exception as e:  # pragma: no cover
            raise AssertionError(
                f"{name}.ipynb code cell {i} failed: {e}\n--- cell ---\n{src}"
            ) from e
    import matplotlib.pyplot as plt

    plt.close("all")
