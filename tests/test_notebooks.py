"""Tests for the tutorial-notebook build pipeline.

The executed ``.ipynb`` artifacts are committed; these tests guard the
percent-format parser and check the committed notebooks are in sync
with their sources (cell structure, error-free outputs) without
re-executing them (``make notebooks`` does that).
"""

import glob
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from build_notebooks import OUT_DIR, SRC_DIR, build_notebook, parse_percent


def test_parse_percent_cells():
    text = (
        "# %% [markdown]\n"
        "# # Title\n"
        "#\n"
        "# Body with `code`.\n"
        "\n"
        "# %%\n"
        "# %matplotlib inline\n"
        "x = 1\n"
        "\n"
        "# %% [markdown]\n"
        "# More text.\n"
        "# %%\n"
        "y = x + 1\n")
    cells = parse_percent(text)
    assert [k for k, _ in cells] == ["markdown", "code", "markdown",
                                     "code"]
    assert cells[0][1] == "# Title\n\nBody with `code`."
    # Magics are uncommented (jupytext convention), code preserved.
    assert cells[1][1] == "%matplotlib inline\nx = 1"
    assert cells[3][1] == "y = x + 1"


def test_build_notebook_structure():
    nb = build_notebook([("markdown", "hi"), ("code", "1 + 1")])
    assert [c.cell_type for c in nb.cells] == ["markdown", "code"]
    assert nb.cells[1].source == "1 + 1"


@pytest.mark.parametrize("src", sorted(
    glob.glob(os.path.join(SRC_DIR, "*.pct.py"))),
    ids=lambda p: os.path.basename(p).replace(".pct.py", ""))
def test_committed_notebook_in_sync(src):
    """Each committed .ipynb matches its source's cell structure and
    carries error-free executed outputs."""
    nbformat = pytest.importorskip("nbformat")
    name = os.path.basename(src).replace(".pct.py", "")
    out = os.path.join(OUT_DIR, name + ".ipynb")
    assert os.path.exists(out), "run make notebooks"
    with open(src) as fh:
        cells = parse_percent(fh.read())
    nb = nbformat.read(out, as_version=4)
    assert [c.cell_type for c in nb.cells] == [k for k, _ in cells], \
        "cell structure drifted; run make notebooks"
    assert [c.source for c in nb.cells] == [s for _, s in cells], \
        "cell sources drifted; run make notebooks"
    code = [c for c in nb.cells if c.cell_type == "code"]
    assert all(c.get("execution_count") is not None for c in code), \
        "notebook not executed; run make notebooks"
    errors = [o for c in code for o in c.get("outputs", [])
              if o.get("output_type") == "error"]
    assert not errors


def test_sources_are_valid_python():
    """Percent sources stay importable Python (magics commented)."""
    for src in glob.glob(os.path.join(SRC_DIR, "*.pct.py")):
        with open(src) as fh:
            compile(fh.read(), src, "exec")
