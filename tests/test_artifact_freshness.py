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


def test_spread_map_covers_registry():
    """The spread map is the regression-review instrument: a query
    missing from it has no measurement-stability evidence, and a
    spread entry for a retired query is stale noise."""
    detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    spread = set(detail["spread_max_over_min"])
    names = _registry_names()
    assert spread == names, (
        f"spread map is stale: missing {sorted(names - spread)}, "
        f"extra {sorted(spread - names)} — rerun bench.py"
    )


def test_scale_probe_covers_declared_window():
    """Every DRIVER-DECLARED query must have a scale-probe entry (the
    100 TB evidence the verdict reads), probe entries may only name
    registry queries, and every entry carries the fitted exponents."""
    probe = json.load(open(os.path.join(REPO, "SCALE_PROBE.json")))
    probed = set(probe["queries"])
    names = _registry_names()
    declared = set(entrymod.queries())
    assert probed <= names, (
        f"SCALE_PROBE.json names retired queries: "
        f"{sorted(probed - names)} — rerun tools/scale_probe.py"
    )
    assert declared <= probed, (
        f"declared queries without a scale probe: "
        f"{sorted(declared - probed)} — run tools/scale_probe.py "
        f"0 <runs> <names...> to extend the table"
    )
    for name, entry in probe["queries"].items():
        assert {"seconds_by_sf", "fit_exponent", "tail_exponent"} <= set(entry), name
        assert len(entry["seconds_by_sf"]) >= 3, (
            f"{name}: fewer than 3 probe points"
        )


def test_registry_snapshot_stamps_every_query():
    """Every registry query must carry a first-seen round stamp in
    REGISTRY_SNAPSHOT.json — adding a query without stamping it fails
    here, which is what makes the recent-query probe gate below
    structural rather than best-effort (the round-9 loophole: two new
    EXTRAS queries shipped with no scale-probe entry because only
    declared queries were gated)."""
    snap = json.load(open(os.path.join(REPO, "REGISTRY_SNAPSHOT.json")))
    stamped = set(snap["first_seen"])
    names = _registry_names()
    assert stamped == names, (
        f"REGISTRY_SNAPSHOT.json is stale: missing {sorted(names - stamped)}, "
        f"extra {sorted(stamped - names)} — stamp new queries with the "
        f"current round and drop retired ones"
    )
    assert all(
        isinstance(r, int) and r <= snap["round"]
        for r in snap["first_seen"].values()
    )


def test_recent_queries_have_scale_probes():
    """Any query added this round or last round — declared OR extras —
    must have a SCALE_PROBE entry: new operators are exactly the ones
    whose scaling behavior is unproven."""
    snap = json.load(open(os.path.join(REPO, "REGISTRY_SNAPSHOT.json")))
    probe = json.load(open(os.path.join(REPO, "SCALE_PROBE.json")))
    probed = set(probe["queries"])
    recent = {
        n for n, r in snap["first_seen"].items() if r >= snap["round"] - 1
    }
    missing = recent - probed
    assert not missing, (
        f"recently added queries without a scale probe: {sorted(missing)} "
        f"— run tools/scale_probe.py 0 <runs> <names...>"
    )
