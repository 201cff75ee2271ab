"""Record a slow-proof-gate pass in ``docs/index.md`` + the append log.

``make test-slow`` runs the opt-in proof gates (the 1000^2 pendulum
bit-equality run against the float64 NumPy oracle and the 20-seed
extended-precision soak) and, when both lanes pass, invokes this script
to stamp the latest pass — date, per-lane durations, and commit — into
the "Slow proof gates" record line of ``docs/index.md`` AND to append
the same facts to ``docs/slow_gate_log.md`` (append-only history: a
silent-skip or failing scheduled job is distinguishable from "nobody
looked" because the log simply stops growing). The scheduled CI job
runs this and commits both files back (see ``.github/workflows/ci.yml``
slow-gates job), so the repo always carries machine-written evidence of
the most recent pass with no human in the loop.

Usage: ``python scripts/record_slow_gate.py <oracle_secs> <soak_secs>``.
"""

import datetime
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(REPO, "docs", "index.md")
LOG = os.path.join(REPO, "docs", "slow_gate_log.md")
MARK = "<!-- slow-gate-record -->"


def _commit():
    """Short hash of HEAD, or 'unknown' outside a git checkout."""
    try:
        return subprocess.check_output(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            text=True).strip()
    except (OSError, subprocess.CalledProcessError):
        return "unknown"


def main(oracle_secs, soak_secs):
    """Rewrite the record line in docs/index.md; append to the log."""
    today = datetime.date.today().isoformat()
    sha = _commit()
    line = ("{} Latest pass: {} — 1000^2 oracle bit-equality "
            "{:.0f}s, 20-seed extended soak {:.0f}s, commit {} "
            "(`make test-slow`).".format(MARK, today,
                                         float(oracle_secs),
                                         float(soak_secs), sha))
    with open(DOC) as f:
        text = f.read()
    if MARK in text:
        text = re.sub(re.escape(MARK) + r"[^\n]*", line, text)
    else:
        text = text.rstrip() + "\n\n" + line + "\n"
    with open(DOC, "w") as f:
        f.write(text)

    entry = ("| {} | {:.0f}s | {:.0f}s | {} |\n"
             .format(today, float(oracle_secs), float(soak_secs), sha))
    if not os.path.exists(LOG):
        with open(LOG, "w") as f:
            f.write(
                "# Slow proof-gate pass log\n\n"
                "Machine-written by `scripts/record_slow_gate.py` on "
                "every `make test-slow` pass (the weekly scheduled CI "
                "job commits its own row). Append-only: a stalled "
                "schedule shows up as a gap, not a stale-looking "
                "stamp.\n\n"
                "| date | 1000^2 oracle | 20-seed soak | commit |\n"
                "|---|---|---|---|\n")
    with open(LOG, "a") as f:
        f.write(entry)
    print("recorded:", line)
    print("appended:", entry.strip())


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
