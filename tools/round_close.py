#!/usr/bin/env python
"""Round-close artifact runner (VERDICT r5 item #2): one command that
regenerates BOTH per-round artifacts so no round can ship hash-query
edits without them again.

    python tools/round_close.py <round_number>

Runs, in order (sequential on purpose — concurrent Spark sessions on
this VM contend for all 32 cores and poison each other's timings):

1. tools/local_correctness.py <round> → LOCAL_CORRECTNESS_r<N>.json
   (full-surface sf0.01 oracle sweep; exits nonzero on any hash fail,
   which aborts step 2 — a bench map for a wrong engine is worthless).
2. bench.py at sf0.1 → refreshed BENCH_FULL_local.json.

Commit both files with the round-close commit.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "X"
    steps = [
        [sys.executable, os.path.join(REPO, "tools/local_correctness.py"),
         rnd],
        [sys.executable, os.path.join(REPO, "bench.py")],
    ]
    for cmd in steps:
        print(f"== {' '.join(cmd)}", file=sys.stderr, flush=True)
        r = subprocess.run(cmd, cwd=REPO)
        if r.returncode != 0:
            print(f"step failed ({r.returncode}): {' '.join(cmd)}",
                  file=sys.stderr)
            sys.exit(r.returncode)
    print("round-close artifacts refreshed: "
          f"LOCAL_CORRECTNESS_r{rnd}.json + BENCH_FULL_local.json")


if __name__ == "__main__":
    main()
