#!/usr/bin/env bash
# Quality gates, mirroring the reference's scripts/test_code.sh
# (flake8 + pydocstyle + doctests + pytest with a coverage floor).
#
# In CI (CI=true) every gate is REQUIRED: a missing lint tool fails the
# run instead of being skipped — the reference enforces the same gates in
# Travis (.travis.yml). On dev machines without the tools installed the
# lint gates are skipped with a notice.

set -euo pipefail
cd "$(dirname "$0")/.."

module=safe_learning_tpu

require_or_skip() {
    # $1 = tool name. Returns 0 when the gate must run; exits 1 in CI
    # when the tool is missing; returns 1 (skip) otherwise.
    if command -v "$1" >/dev/null 2>&1; then
        return 0
    fi
    if [ "${CI:-false}" = "true" ]; then
        echo "ERROR: $1 is required in CI but not installed" >&2
        exit 1
    fi
    echo "$1 not installed; skipping gate (required in CI)"
    return 1
}

echo "=== syntax / bytecode check ==="
python -m compileall -q ${module} tests tests_f32 examples bench.py \
    __graft_entry__.py

if require_or_skip flake8; then
    echo "=== flake8 ==="
    flake8 ${module} tests tests_f32 examples
fi

if require_or_skip pydocstyle; then
    echo "=== pydocstyle ==="
    pydocstyle --convention=numpy ${module}
else
    # The docstring gate never silently skips: without pydocstyle run
    # the in-repo AST subset of the numpy convention.
    echo "=== docstring gate (fallback subset) ==="
    python scripts/docstring_gate.py ${module}
fi

echo "=== api-doc coverage gate ==="
python scripts/api_doc_gate.py

echo "=== doctests ==="
python -m pytest --doctest-modules ${module} -q

echo "=== pytest (float64 lane) ==="
if python -c "import pytest_cov" >/dev/null 2>&1; then
    python -m pytest tests/ -q --cov=${module} --cov-fail-under=80
else
    python -m pytest tests/ -q
fi

echo "=== pytest (float32 lane — the TPU-default dtype) ==="
python -m pytest tests_f32/ -q
