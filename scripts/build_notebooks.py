"""Build and execute the tutorial notebooks from percent-format sources.

The reference ships its examples as rendered notebooks
(``/root/reference/examples/*.ipynb``); this repo's runnable gate is the
``examples/*.py`` scripts, and the narrative tutorial layer lives in
``examples/notebooks/``. Sources are plain-Python *percent format*
(``# %%`` code cells, ``# %% [markdown]`` markdown cells) in
``examples/notebooks/src/``; this script converts each source to a
Jupyter notebook, executes it on the CPU backend at quick sizes, and
writes the executed ``.ipynb`` (with outputs and figures embedded) next
to the sources in ``examples/notebooks/``.

Run:  python scripts/build_notebooks.py [name ...] [--no-execute]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_DIR = os.path.join(REPO, "examples", "notebooks", "src")
OUT_DIR = os.path.join(REPO, "examples", "notebooks")

MARKDOWN_MARK = "# %% [markdown]"
CODE_MARK = "# %%"


def parse_percent(text):
    """Split percent-format source text into (kind, source) cells."""
    cells = []
    kind, lines = None, []

    def flush():
        if kind is None:
            return
        body = "\n".join(lines).strip("\n")
        if not body:
            return
        if kind == "markdown":
            stripped = []
            for ln in body.splitlines():
                if ln.startswith("# "):
                    stripped.append(ln[2:])
                elif ln == "#":
                    stripped.append("")
                else:
                    stripped.append(ln)
            body = "\n".join(stripped)
        else:
            # Jupytext convention: IPython magics are commented in the
            # .py source (keeping it importable) and uncommented here.
            body = "\n".join(
                ln[2:] if ln.startswith("# %") and not
                ln.startswith("# %%") else ln
                for ln in body.splitlines())
        cells.append((kind, body))

    for line in text.splitlines():
        if line.startswith(MARKDOWN_MARK):
            flush()
            kind, lines = "markdown", []
        elif line.startswith(CODE_MARK):
            flush()
            kind, lines = "code", []
        else:
            lines.append(line)
    flush()
    return cells


def build_notebook(cells):
    """Assemble an nbformat v4 notebook from (kind, source) cells."""
    import nbformat

    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python",
        "name": "python3"}
    nb.metadata["language_info"] = {"name": "python"}
    for kind, src in cells:
        if kind == "markdown":
            nb.cells.append(nbformat.v4.new_markdown_cell(src))
        else:
            nb.cells.append(nbformat.v4.new_code_cell(src))
    return nb


def execute(nb, timeout=1200):
    """Execute the notebook in-place on the CPU backend."""
    from nbclient import NotebookClient

    # The kernel inherits this environment: force the CPU backend and
    # float64 (the notebooks run quick sizes; the TPU path is the
    # example scripts' --full mode) and skip the TPU relay plugin.
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_ENABLE_X64"] = "1"
    os.environ["PYTHONPATH"] = REPO
    os.environ.setdefault("MPLBACKEND", "Agg")
    client = NotebookClient(nb, timeout=timeout, kernel_name="python3",
                            resources={"metadata": {"path": REPO}})
    client.execute()
    return nb


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("names", nargs="*",
                        help="notebook basenames to build (default: all)")
    parser.add_argument("--no-execute", action="store_true",
                        help="convert only, skip execution")
    args = parser.parse_args()

    import nbformat

    sources = sorted(f for f in os.listdir(SRC_DIR)
                     if f.endswith(".pct.py"))
    if args.names:
        wanted = {n.replace(".ipynb", "").replace(".pct.py", "")
                  for n in args.names}
        sources = [f for f in sources
                   if f.replace(".pct.py", "") in wanted]
        if not sources:
            sys.exit("no matching sources in " + SRC_DIR)

    for fname in sources:
        name = fname.replace(".pct.py", "")
        with open(os.path.join(SRC_DIR, fname)) as fh:
            cells = parse_percent(fh.read())
        nb = build_notebook(cells)
        t0 = time.perf_counter()
        if not args.no_execute:
            execute(nb)
        out = os.path.join(OUT_DIR, name + ".ipynb")
        nbformat.write(nb, out)
        print("{}: {} cells, {:.1f}s -> {}".format(
            name, len(nb.cells), time.perf_counter() - t0,
            os.path.relpath(out, REPO)))


if __name__ == "__main__":
    main()
