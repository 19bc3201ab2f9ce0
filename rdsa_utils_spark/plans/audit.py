"""Lineage-cut-aware plan auditing (round-11, VERDICT r10 task 1).

The scale gates (tools/plan_report.py, tests/test_plan_hygiene.py)
audit the COMPILED physical plan of every registered query. A
``localCheckpoint`` replaces the upstream plan with a ``Scan
ExistingRDD`` leaf, and construction-time materialization (iterative
trainers calling ``collect``/``count`` while the query is being
BUILT) executes whole plans the final frame never references — both
made the audit blind exactly where the flagship compositions are
(curation_e2e recorded 0 parquet scans in round 10).

:func:`capture_lineage_cuts` closes the gap: inside the context every
driver-side materialization route (``localCheckpoint``, ``collect``,
``toPandas``, ``count``, ``isEmpty``) records the frame's physical
plan BEFORE the cut, and every ``createDataFrame`` records a literal-
frame marker, so an audit can attribute the full lineage — and a
hygiene test can refuse any ``Scan ExistingRDD`` that no captured
segment backs (an unpatched cut route would hide operators again).

:func:`iter_physical_nodes` / :func:`count_global_windows` replace
the old textual single-partition-window proxy (an exact-indentation
string match that missed the same operator pair at any other plan
depth) with a structural walk: a window node is "global" iff its
``partitionSpec`` is empty — the same condition WindowExecBase warns
on at runtime ("No Partition Defined for Window operation").
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, Optional

#: Physical window operators that force a single partition when their
#: partitionSpec is empty (all log the WindowExecBase warning).
_WINDOW_NODES = ("Window", "WindowInPandas", "WindowGroupLimit")

#: Materialization kinds whose captured segment carries a real plan.
PLAN_SEGMENT_KINDS = ("checkpoint", "collect", "toPandas", "count", "isEmpty")


def iter_physical_nodes(jplan) -> Iterator:
    """Yield every node of a JVM ``SparkPlan`` tree, descending through
    the wrappers that hide their real subtree from ``children()``:
    ``AdaptiveSparkPlan`` (a leaf wrapping the input plan) and
    ``InMemoryTableScan`` (whose cached plan lives on the relation).
    Scalar-subquery plans live in expressions, not children — same
    scope as ``executedPlan().toString()``, which the textual audit
    reads."""
    stack = [jplan]
    while stack:
        n = stack.pop()
        yield n
        name = n.nodeName()
        if name == "AdaptiveSparkPlan":
            stack.append(n.initialPlan())
            continue
        if name == "InMemoryTableScan":
            try:
                stack.append(n.relation().cachedPlan())
            except Exception:
                pass
            continue
        ch = n.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))


def count_global_windows(df_or_jplan) -> int:
    """Number of window operators with an EMPTY partitionSpec anywhere
    in the physical plan — each one moves all data to a single
    partition at runtime, the 100 TB killer unless the frame is
    provably bounded (knot tables, calendar grids)."""
    from pyspark.sql import DataFrame

    # py4j JavaObjects answer hasattr() for ANY name — type-check, not
    # duck-type, to tell a pyspark frame from a JVM plan node.
    jplan = (
        df_or_jplan._jdf.queryExecution().executedPlan()
        if isinstance(df_or_jplan, DataFrame)
        else df_or_jplan
    )
    c = 0
    for n in iter_physical_nodes(jplan):
        try:
            if n.nodeName() in _WINDOW_NODES and n.partitionSpec().isEmpty():
                c += 1
        except Exception:
            continue
    return c


def analyze_frame(df) -> dict:
    """One frame's audit record: plan text + structural window count."""
    jp = df._jdf.queryExecution().executedPlan()
    return {"plan": jp.toString(), "global_windows": count_global_windows(jp)}


@contextmanager
def capture_lineage_cuts(segments: Optional[list] = None):
    """Patch the driver-side materialization routes so every lineage
    cut records the plan it is about to hide. Yields the segment list;
    each entry is ``{"kind": ..., "plan": str, "global_windows": int}``
    for plan-bearing kinds, ``{"kind": "literal_createDataFrame",
    "rows": n}`` for driver-literal frames, and ``{"kind":
    "rdd_createDataFrame", "unbacked": True}`` for RDD-backed frames
    (which DO hide lineage — the hygiene sweep refuses them).

    Reentrancy-guarded: ``toPandas`` may call ``collect`` internally;
    only the outermost materialization records a segment."""
    if segments is None:
        segments = []
    # Patch the CONCRETE classes: in Spark 4 pyspark.sql.DataFrame is
    # the abstract base and classic instances dispatch to the
    # classic.dataframe override, so a base-class patch never fires.
    # (The classic SparkSession, by contrast, IS
    # pyspark.sql.session.SparkSession — no classic.session module.)
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pre-4.0 layout
        from pyspark.sql import DataFrame
    from pyspark.sql.session import SparkSession

    real = {
        "localCheckpoint": DataFrame.localCheckpoint,
        "collect": DataFrame.collect,
        "toPandas": DataFrame.toPandas,
        "count": DataFrame.count,
        "isEmpty": DataFrame.isEmpty,
        "createDataFrame": SparkSession.createDataFrame,
    }
    busy = {"v": False}

    def _record(df, kind: str) -> None:
        try:
            entry = analyze_frame(df)
            entry["kind"] = kind
        except Exception as e:  # pragma: no cover - audit robustness
            entry = {
                "kind": kind, "plan": "", "global_windows": 0,
                "error": str(e)[:200],
            }
        segments.append(entry)

    def _wrap(kind):
        orig = real[kind if kind != "checkpoint" else "localCheckpoint"]

        def inner(self, *a, **k):
            # busy spans the WHOLE wrapped call, not just the plan
            # analysis (ADVICE r11): pyspark 4.1's non-Arrow toPandas
            # calls self.collect() internally, which re-enters this
            # class-level patch — without the outer hold, one toPandas
            # recorded a duplicate 'collect' segment and double-counted
            # its scans/exchanges in PLAN_AUDIT.json.
            if busy["v"]:
                return orig(self, *a, **k)
            busy["v"] = True
            try:
                _record(self, kind)
                return orig(self, *a, **k)
            finally:
                busy["v"] = False

        return inner

    def _create(self, data, *a, **k):
        from pyspark import RDD

        if isinstance(data, RDD):
            segments.append({"kind": "rdd_createDataFrame", "unbacked": True})
        else:
            try:
                n = len(data)
            except Exception:
                n = None
            segments.append({"kind": "literal_createDataFrame", "rows": n})
        return real["createDataFrame"](self, data, *a, **k)

    DataFrame.localCheckpoint = _wrap("checkpoint")
    DataFrame.collect = _wrap("collect")
    DataFrame.toPandas = _wrap("toPandas")
    DataFrame.count = _wrap("count")
    DataFrame.isEmpty = _wrap("isEmpty")
    SparkSession.createDataFrame = _create
    try:
        yield segments
    finally:
        DataFrame.localCheckpoint = real["localCheckpoint"]
        DataFrame.collect = real["collect"]
        DataFrame.toPandas = real["toPandas"]
        DataFrame.count = real["count"]
        DataFrame.isEmpty = real["isEmpty"]
        SparkSession.createDataFrame = real["createDataFrame"]


def audit_query(fn, spark, sf_dir: str) -> dict:
    """Build one registered query under the capture hook and return
    ``{"final": analyze_frame-record, "segments": [...]}`` — the unit
    both tools/plan_report.py and tests/test_plan_hygiene.py consume,
    so the gate and the CI sweep cannot drift on what "the plan" means."""
    segments: list = []
    with capture_lineage_cuts(segments):
        df = fn(spark, sf_dir)
        final = analyze_frame(df)
    return {"final": final, "segments": segments}
