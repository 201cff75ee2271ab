"""Record a slow-proof-gate pass in ``docs/index.md``.

``make test-slow`` runs the opt-in proof gates (the 1000^2 pendulum
bit-equality run against the float64 NumPy oracle and the 20-seed
extended-precision soak) and, when both lanes pass, invokes this script
to stamp the latest pass — date and per-lane durations — into the
"Slow proof gates" record line of ``docs/index.md``. The scheduled CI
job does the same, so the repo always carries machine-written evidence
of the most recent pass instead of relying on someone remembering the
``RUN_SLOW`` env var.

Usage: ``python scripts/record_slow_gate.py <oracle_secs> <soak_secs>``.
"""

import datetime
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(REPO, "docs", "index.md")
MARK = "<!-- slow-gate-record -->"


def main(oracle_secs, soak_secs):
    """Rewrite the record line in docs/index.md."""
    today = datetime.date.today().isoformat()
    line = ("{} Latest pass: {} — 1000^2 oracle bit-equality "
            "{:.0f}s, 20-seed extended soak {:.0f}s "
            "(`make test-slow`).".format(MARK, today,
                                         float(oracle_secs),
                                         float(soak_secs)))
    with open(DOC) as f:
        text = f.read()
    if MARK in text:
        text = re.sub(re.escape(MARK) + r"[^\n]*", line, text)
    else:
        text = text.rstrip() + "\n\n" + line + "\n"
    with open(DOC, "w") as f:
        f.write(text)
    print("recorded:", line)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
