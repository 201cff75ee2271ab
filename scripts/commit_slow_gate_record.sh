#!/bin/bash
# Commit the slow-gate pass record written by scripts/record_slow_gate.py
# (docs/index.md stamp + docs/slow_gate_log.md append) back to the repo.
#
# Run by the scheduled `slow-gates` CI job (.github/workflows/ci.yml)
# after `make test-slow` passes, with `permissions: contents: write`.
# Locally simulatable with DRY_RUN=1 (stages + builds the commit message
# but pushes nothing and leaves the working tree untouched):
#
#   DRY_RUN=1 bash scripts/commit_slow_gate_record.sh
set -euo pipefail
cd "$(dirname "$0")/.."

if git diff --quiet -- docs/index.md docs/slow_gate_log.md && \
   git ls-files --error-unmatch docs/slow_gate_log.md >/dev/null 2>&1; then
  echo "no record changes to commit"
  exit 0
fi

MSG="Record weekly slow-gate pass ($(date -u +%F))"
if [ "${DRY_RUN:-0}" = "1" ]; then
  echo "DRY_RUN: would commit docs/index.md docs/slow_gate_log.md"
  echo "DRY_RUN: message: $MSG"
  git --no-pager diff --stat -- docs/index.md docs/slow_gate_log.md
  exit 0
fi

git config user.name "github-actions[bot]"
git config user.email "41898282+github-actions[bot]@users.noreply.github.com"
git add docs/index.md docs/slow_gate_log.md
git commit -m "$MSG"
# Rebase onto any push that landed while the gates ran, then push.
git pull --rebase origin "${GITHUB_REF_NAME:-main}"
git push origin "HEAD:${GITHUB_REF_NAME:-main}"
echo "record committed and pushed"
