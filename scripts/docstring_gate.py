"""Minimal docstring gate: the subset of pydocstyle's numpy convention
that can be checked from the AST, used as the always-on fallback when
pydocstyle itself is not installed (CI installs and runs the real tool;
``scripts/test_code.sh`` runs this one everywhere so the docstring gate
can never silently skip).

Checked (pydocstyle code in parentheses):
- public modules, classes, functions, methods and magic methods have
  docstrings (D100-D105; D107 ``__init__`` is exempt, as in the numpy
  convention);
- the first docstring line ends with a period (D400) and starts with a
  capital letter (D403);
- docstrings are not empty (D419);
- multi-line docstrings have a blank line between summary and body
  (D205).

Usage: ``python scripts/docstring_gate.py [package ...]`` — exits 1 and
prints findings when the gate fails.
"""

import ast
import os
import sys


def _first_line(doc):
    for line in doc.strip().splitlines():
        return line.strip()
    return ""


def _is_public(name):
    return not name.startswith("_") or (name.startswith("__")
                                        and name.endswith("__"))


def _check_doc(path, node, name, kind, findings):
    doc = ast.get_docstring(node)
    if doc is None:
        if name == "__init__":
            return  # D107 is exempt under the numpy convention
        findings.append((path, node.lineno,
                         "missing docstring in {} {} (D10x)".format(kind,
                                                                    name)))
        return
    if not doc.strip():
        findings.append((path, node.lineno,
                         "empty docstring in {} {} (D419)".format(kind,
                                                                  name)))
        return
    first = _first_line(doc)
    if first and first[-1] not in ".!?:":
        findings.append((path, node.lineno,
                         "{} {}: first line should end with a period "
                         "(D400): {!r}".format(kind, name, first[:60])))
    if first and first[0].isalpha() and not first[0].isupper():
        findings.append((path, node.lineno,
                         "{} {}: first word not capitalized (D403)".format(
                             kind, name)))
    lines = doc.strip().splitlines()
    if len(lines) > 1:
        # Find the end of the summary: the first line ending in a period
        # within the leading block. D205 requires one blank line between
        # the summary block and the description.
        if lines[1].strip() and first[-1] in ".!?:":
            findings.append((path, node.lineno,
                             "{} {}: need blank line between summary and "
                             "description (D205)".format(kind, name)))


def _walk(path, tree, findings):
    if ast.get_docstring(tree) is None:
        findings.append((path, 1, "missing module docstring (D100/D104)"))

    def visit(node, in_class):
        for child in ast.iter_child_nodes(node):
            if isinstance(child, ast.ClassDef):
                if _is_public(child.name):
                    _check_doc(path, child, child.name, "class", findings)
                    visit(child, True)
            elif isinstance(child, (ast.FunctionDef,
                                    ast.AsyncFunctionDef)):
                if _is_public(child.name):
                    kind = "method" if in_class else "function"
                    _check_doc(path, child, child.name, kind, findings)
                    visit(child, False)

    visit(tree, False)


def main(roots):
    findings = []
    for root in roots:
        for dirpath, _dirs, files in os.walk(root):
            if "__pycache__" in dirpath:
                continue
            for fname in sorted(files):
                if not fname.endswith(".py"):
                    continue
                path = os.path.join(dirpath, fname)
                with open(path) as fh:
                    tree = ast.parse(fh.read())
                _walk(path, tree, findings)
    for path, line, message in findings:
        print("{}:{}: {}".format(path, line, message))
    if findings:
        print("{} docstring findings".format(len(findings)))
        return 1
    print("docstring gate clean ({})".format(", ".join(roots)))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or ["safe_learning_tpu"]))
