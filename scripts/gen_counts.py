"""Emit registry correctness counts and sync them into README.md.

Hand-maintained counts rot (round 7's README said 442+17 while the
registry held 445+14 — VERDICT r7 "What's wrong" #3).  This script is the
single source: it loads the registry, prints the counts, and rewrites the
README's counts sentence in place.  `tests/test_registry_oracle.py`
pins the README text to the live registry so drift fails CI.
"""

from __future__ import annotations

import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

COUNTS_RE = re.compile(
    r"\(\d+ oracle-checked \+ \d+ law-gated rows-only as of\s*\nround \d+\)"
)


def counts() -> tuple[int, int]:
    from lakehouse_variance_spark import registry

    registry.load_all()
    oracle = sum(1 for n in registry.QUERIES if n in registry.ORACLES)
    rows_only = len(registry.QUERIES) - oracle
    return oracle, rows_only


def main() -> None:
    # max round number + 1, not file count + 1 (CORRECTNESS_r03 is absent,
    # so a count undercounts the current round by one)
    rounds = [
        int(m.group(1))
        for f in os.listdir(HERE)
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json", f))
    ]
    round_no = max(rounds, default=0) + 1
    oracle, rows_only = counts()
    readme = os.path.join(HERE, "README.md")
    text = open(readme, encoding="utf-8").read()
    new = COUNTS_RE.sub(
        f"({oracle} oracle-checked + {rows_only} law-gated rows-only as of\n"
        f"round {round_no})",
        text,
    )
    if new != text:
        open(readme, "w", encoding="utf-8").write(new)
        print(f"README.md updated: {oracle} oracle + {rows_only} rows-only")
    else:
        print(f"README.md already current: {oracle} + {rows_only}")


if __name__ == "__main__":
    main()
