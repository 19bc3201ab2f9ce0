"""Round-close artifact freshness gate (round-7 verdict item: stale
PLAN_AUDIT/BENCH_DETAIL shipped twice): the committed plan-audit and
bench-detail artifacts must cover EXACTLY the registry at HEAD — a
registry change without regenerated artifacts fails CI instead of
shipping stale round-close evidence."""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_names() -> set[str]:
    return set(entrymod.queries()) | set(entrymod.extra_queries())


def test_plan_audit_matches_registry():
    audit = json.load(open(os.path.join(REPO, "PLAN_AUDIT.json")))
    audited = set(audit["queries"])
    names = _registry_names()
    assert audited == names, (
        f"PLAN_AUDIT.json is stale: missing {sorted(names - audited)}, "
        f"extra {sorted(audited - names)} — rerun tools/plan_report.py "
        f"after the LAST registry change of the round"
    )


def test_bench_detail_matches_registry():
    detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    benched = set(detail["queries"])
    names = _registry_names()
    assert benched == names, (
        f"BENCH_DETAIL.json is stale: missing {sorted(names - benched)}, "
        f"extra {sorted(benched - names)} — rerun bench.py after the "
        f"LAST registry change of the round"
    )
