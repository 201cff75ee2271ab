#!/usr/bin/env bash
# Quality gates, mirroring the reference's scripts/test_code.sh
# (flake8 + pydocstyle + pytest with a coverage floor). Lint tools run
# when installed; the test suite always runs.

set -euo pipefail
cd "$(dirname "$0")/.."

module=safe_learning_tpu

echo "=== syntax / bytecode check ==="
python -m compileall -q ${module} tests tests_f32 examples bench.py \
    __graft_entry__.py

if command -v flake8 >/dev/null 2>&1; then
    echo "=== flake8 ==="
    flake8 ${module} tests tests_f32 examples
else
    echo "flake8 not installed; skipping style gate"
fi

if command -v pydocstyle >/dev/null 2>&1; then
    echo "=== pydocstyle ==="
    pydocstyle --convention=numpy ${module}
else
    echo "pydocstyle not installed; skipping docstring gate"
fi

echo "=== pytest (float64 lane) ==="
if python -c "import pytest_cov" >/dev/null 2>&1; then
    python -m pytest tests/ -q --cov=${module} --cov-fail-under=80
else
    python -m pytest tests/ -q
fi

echo "=== pytest (float32 lane — the TPU-default dtype) ==="
python -m pytest tests_f32/ -q
