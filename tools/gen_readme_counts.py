#!/usr/bin/env python
"""Rewrite README.md's catalog/test counts from ground truth — the
query count from the live registry, the test count from an actual
pytest collection — so the header can never drift from the code again
(round-12; the hand-maintained counts went stale two rounds running).

Usage: python tools/gen_readme_counts.py

The matching gate is tests/test_plan_quality.py::
test_readme_counts_are_current: the query phrase is compared against
the registry on every run, and the test count against the collected
item count whenever the full suite runs.
"""

from __future__ import annotations

import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    n_q, n_o = len(QUERIES), len(ORACLES)
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True,
        text=True,
        cwd=ROOT,
    )
    # pytest prints "N tests collected" on a clean collection but
    # "collected N items / M errors" when any module fails to import —
    # match both forms, and surface the tool's own output on failure
    # instead of a bare one-liner (round-12 ADVICE).
    m = re.search(r"(\d+) tests? collected", out.stdout) or re.search(
        r"collected (\d+) items?", out.stdout
    )
    err = re.search(r"(\d+) errors?", out.stdout)
    if not m or err:
        print("could not parse a clean pytest collection:", file=sys.stderr)
        print(out.stdout[-2000:], file=sys.stderr)
        print(out.stderr[-2000:], file=sys.stderr)
        return 1
    n_t = int(m.group(1))

    path = ROOT / "README.md"
    text = path.read_text()
    text, n1 = re.subn(
        r"\d+ named queries, ALL \d+ with",
        f"{n_q} named queries, ALL {n_o} with",
        text,
    )
    text, n2 = re.subn(r"\d+\+? tests:", f"{n_t} tests:", text)
    if n1 != 1 or n2 != 1:
        print(
            f"expected exactly one match per phrase, got {n1}/{n2}",
            file=sys.stderr,
        )
        return 1
    path.write_text(text)
    print(f"README.md: {n_q} queries ({n_o} exact oracles), {n_t} tests")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
