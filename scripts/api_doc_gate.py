"""API-doc coverage gate: every public symbol appears in ``docs/api.md``.

The reference generates its per-symbol API reference mechanically
(Sphinx autosummary over ``/root/reference/docs/api.rst`` with
``/root/reference/safe_learning/__init__.py:1-86`` as the doc index),
so a public symbol can never silently miss the docs. This repo's
``docs/api.md`` is hand-written; this gate restores the mechanical
guarantee: it imports every module under ``safe_learning_tpu``, collects
each module's ``__all__``, and fails unless every exported name is
mentioned in ``docs/api.md``.

A mention is any occurrence of the bare name as a word (back-ticked
code spans, headings, and signature lines all qualify); the gate checks
presence, not prose quality — the docstring gate and pydocstyle own the
latter.

Usage: ``python scripts/api_doc_gate.py`` — exits 1 and prints the
missing symbols when the gate fails. Wired into
``scripts/test_code.sh`` so CI enforces it.
"""

import importlib
import os
import pkgutil
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(REPO, "docs", "api.md")


def iter_modules():
    """Yield every importable module name under safe_learning_tpu."""
    sys.path.insert(0, REPO)
    pkg = importlib.import_module("safe_learning_tpu")
    yield "safe_learning_tpu", pkg
    for info in pkgutil.walk_packages(pkg.__path__,
                                      prefix="safe_learning_tpu."):
        spec = info.module_finder.find_spec(info.name)
        if spec is None or spec.origin is None or \
                not spec.origin.endswith(".py"):
            # ctypes shared objects (native/libfloodfill.so) live next
            # to the Python sources but are not importable modules.
            continue
        yield info.name, importlib.import_module(info.name)


def main():
    """Run the gate; return the number of missing symbols."""
    with open(DOC) as f:
        doc = f.read()
    words = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", doc))
    missing = []
    for name, module in iter_modules():
        for symbol in getattr(module, "__all__", ()):
            if symbol not in words:
                missing.append("{}.{}".format(name, symbol))
    for entry in sorted(missing):
        print("docs/api.md does not mention {}".format(entry))
    if missing:
        print("api-doc gate: {} public symbols missing from docs/api.md"
              .format(len(missing)))
    else:
        print("api-doc gate: all public symbols covered")
    return len(missing)


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
