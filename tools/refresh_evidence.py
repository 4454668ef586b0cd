#!/usr/bin/env python
"""One-shot evidence refresh + drift audit (VERDICT r9 ask #8).

Round 9 ended with `pytest tests/` red because a final-commit query needed
THREE separate manual steps (SURVEY §2.13 inventory, shuffle budgets,
COVERAGE.md mention) and got none of them. This tool makes the whole
refresh ONE invocation, then audits that nothing drifted:

    python tools/refresh_evidence.py                 # full budget regen
    python tools/refresh_evidence.py --only q_a,q_b  # incremental budgets

Steps:
  1. `tools/make_survey_inventory.py --write`  — splice §2.13 in place.
  2. `tools/make_shuffle_budget.py [--only …]` — pin exchange counts.
  3. Audit (always runs, exits non-zero on any failure):
     a. SURVEY §2.13 total == len(REGISTRY);
     b. shuffle_budget.json has EXACTLY the registry's names at both SFs;
     c. every registered query name appears somewhere in COVERAGE.md
        (the judge reads COVERAGE.md as the §2 map — a query that is
        registered but unmapped is the round-9 drift class).

The audit alone (no regeneration) is `--audit-only`; tests/test_plan_gate
and tests/test_survey_inventory already enforce (a) and (b) in CI, so the
audit here is the fast pre-commit version of the same gates plus (c).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _run(argv: list[str]) -> None:
    print(f"# $ {' '.join(argv)}", file=sys.stderr)
    subprocess.run(argv, check=True, cwd=ROOT)


def audit() -> list[str]:
    from real_value_etl_spark.queries.all_queries import REGISTRY

    problems: list[str] = []

    survey = open(os.path.join(ROOT, "SURVEY.md")).read()
    m = re.search(r"### 2\.13 Registered-query inventory \(mechanical; all (\d+)\)", survey)
    if not m:
        problems.append("SURVEY.md: §2.13 heading not found")
    elif int(m.group(1)) != len(REGISTRY):
        problems.append(
            f"SURVEY.md §2.13 says {m.group(1)} queries, registry has "
            f"{len(REGISTRY)} — run tools/make_survey_inventory.py --write"
        )

    with open(os.path.join(ROOT, "tests", "shuffle_budget.json")) as f:
        budgets = json.load(f)["budgets"]
    for label, per_sf in sorted(budgets.items()):
        missing = sorted(set(REGISTRY) - set(per_sf))
        stale = sorted(set(per_sf) - set(REGISTRY))
        if missing:
            problems.append(f"shuffle_budget sf{label}: missing {missing}")
        if stale:
            problems.append(f"shuffle_budget sf{label}: stale (unregistered) {stale}")

    coverage = open(os.path.join(ROOT, "COVERAGE.md")).read()
    unmapped = sorted(n for n in REGISTRY if n not in coverage)
    if unmapped:
        problems.append(
            f"COVERAGE.md never mentions {len(unmapped)} registered "
            f"queries: {unmapped} — add each to its §2 section table"
        )
    return problems


def main() -> None:
    if "--audit-only" not in sys.argv:
        _run([sys.executable, os.path.join(ROOT, "tools", "make_survey_inventory.py"), "--write"])
        budget_cmd = [sys.executable, os.path.join(ROOT, "tools", "make_shuffle_budget.py")]
        if "--only" in sys.argv:
            budget_cmd += ["--only", sys.argv[sys.argv.index("--only") + 1]]
        _run(budget_cmd)

    problems = audit()
    for p in problems:
        print(f"DRIFT: {p}", file=sys.stderr)
    if problems:
        raise SystemExit(1)
    print("# evidence audit clean", file=sys.stderr)


if __name__ == "__main__":
    main()
