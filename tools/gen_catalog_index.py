#!/usr/bin/env python
"""Regenerate docs/CATALOG.md — the mechanical index of the query
registry: every registered name, the module:line that defines it, its
oracle status, and a stable hash of the oracle SQL (so doc/code drift
is detectable by diff alone). No Spark session needed; importing the
plans package is enough.

Usage: python tools/gen_catalog_index.py
"""

from __future__ import annotations

import hashlib
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def render() -> str:
    from deathmetal_datalake_spark.plans import ORACLES, QUERIES

    rows = []
    by_module: dict[str, int] = {}
    for name, fn in QUERIES.items():
        mod = fn.__module__.rsplit(".", 1)[-1]
        line = fn.__code__.co_firstlineno
        sql = ORACLES.get(name)
        oracle = (
            f"exact (`{hashlib.sha256(sql.encode()).hexdigest()[:12]}`)"
            if sql is not None
            else "rows-only"
        )
        rows.append((name, f"plans/{mod}.py:{line}", oracle))
        by_module[mod] = by_module.get(mod, 0) + 1

    parts = []
    parts.append(
            "# CATALOG — generated registry index\n\n"
            "Regenerate with `python tools/gen_catalog_index.py` after\n"
            "adding or moving a query; CI-style drift check: the file\n"
            "must be clean in `git status` after regeneration. Order is\n"
            "registration order as the driver sees it (newest first).\n\n"
            f"**{len(rows)} queries; "
            f"{sum(1 for _, _, o in rows if o != 'rows-only')} with exact "
            "oracles.** Oracle hashes are sha256-prefixes of the DuckDB "
            "SQL text.\n\n"
    )
    parts.append("Per module: ")
    parts.append(
        ", ".join(
            f"`{m}` {n}" for m, n in sorted(by_module.items(), key=lambda kv: -kv[1])
        )
    )
    parts.append("\n\n| # | query | defined at | oracle |\n|---|---|---|---|\n")
    for i, (name, loc, oracle) in enumerate(rows, 1):
        parts.append(f"| {i} | `{name}` | `{loc}` | {oracle} |\n")
    return "".join(parts)


def main() -> int:
    out = pathlib.Path(__file__).resolve().parent.parent / "docs" / "CATALOG.md"
    content = render()
    with open(out, "w") as f:
        f.write(content)
    print(f"wrote {out} ({content.count(chr(10) + '| ')} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
