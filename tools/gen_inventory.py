"""Generate INVENTORY.md: every registered query, its defining module
and line, and its oracle status — the line-by-line index for checking
the registry against SURVEY.md §2.

    python tools/gen_inventory.py > INVENTORY.md
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrtweety_analytic_spark.queries import ORACLES, QUERIES  # noqa: E402


def main() -> None:
    rows = []
    for name, fn in QUERIES.items():
        mod = inspect.getmodule(fn)
        try:
            _, line = inspect.getsourcelines(fn)
        except OSError:
            line = 0
        rel = os.path.relpath(mod.__file__, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        oracle = "oracle" if name in ORACLES else "rows-only"
        rows.append((name, f"{rel}:{line}", oracle))

    n_oracle = sum(1 for r in rows if r[2] == "oracle")
    print("# Operator inventory (generated)")
    print()
    print(f"{len(rows)} registered queries, {n_oracle} DuckDB-oracle-checked,")
    print(f"{len(rows) - n_oracle} rows-only. Regenerate with")
    print("`python tools/gen_inventory.py > INVENTORY.md`.")
    print()
    print("| # | query | defined at | correctness |")
    print("|---|---|---|---|")
    for i, (name, loc, oracle) in enumerate(rows, 1):
        print(f"| {i} | `{name}` | `{loc}` | {oracle} |")


if __name__ == "__main__":
    main()
