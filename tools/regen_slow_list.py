"""Regenerate tests/slow_tests.txt from a full-suite duration log.

Usage:
  python -m pytest tests/ -q --durations=0 > /tmp/pytest_full.log 2>&1
  python tools/regen_slow_list.py [/tmp/pytest_full.log] [threshold_s]

Tests whose call+setup time meets the threshold (default 2.5 s) are
listed; conftest.pytest_collection_modifyitems applies
``@pytest.mark.slow`` to them at collection time. Every module keeps
at least its fastest test OUT of the list so the fast lane
(``pytest -m "not slow"``) still executes the whole operator surface
once per run.
"""

from __future__ import annotations

import collections
import os
import re
import sys


def main() -> None:
    log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pytest_full.log"
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 2.5
    tests: dict[str, float] = {}
    for line in open(log):
        m = re.match(r"(\d+\.\d+)s (call|setup)\s+(tests/\S+)", line)
        if m:
            tests[m.group(3)] = tests.get(m.group(3), 0.0) + float(m.group(1))
    if not tests:
        raise SystemExit(f"no '--durations=0' lines found in {log}")
    slow = {t for t, d in tests.items() if d >= thr}
    by_mod: dict[str, list] = collections.defaultdict(list)
    for t, d in tests.items():
        by_mod[t.split("::")[0]].append((d, t))
    for lst in by_mod.values():
        if all(t in slow for _, t in lst):
            slow.discard(min(lst)[1])
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "slow_tests.txt",
    )
    kept = sum(d for t, d in tests.items() if t not in slow)
    with open(out, "w") as fh:
        fh.write(f"# Tests >= {thr}s (call+setup) in the full-suite duration run;\n")
        fh.write("# applied as @pytest.mark.slow by conftest.py. Regenerate with\n")
        fh.write("#   python -m pytest tests/ -q --durations=0 > /tmp/pytest_full.log\n")
        fh.write("#   python tools/regen_slow_list.py\n")
        fh.write("# Every module keeps at least its fastest test in the fast lane.\n")
        for t in sorted(slow):
            fh.write(t + "\n")
    print(
        f"wrote {out}: {len(slow)} slow tests, "
        f"fast lane ≈ {kept / 60:.1f} min of measured call+setup time",
    )


if __name__ == "__main__":
    main()
