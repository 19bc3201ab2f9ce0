"""Physical-plan introspection & assertion helpers.

No direct reference equivalent (the reference trusts Catalyst
blindly); this is the engine's scale-posture tooling: CI asserts that
the plans we ship are the plans we designed — broadcasts stay
broadcasts, filters stay pushed down, shuffle counts don't regress.
"""

from __future__ import annotations

import re
from typing import List

from pyspark.sql import DataFrame

_MODES = {"simple", "extended", "codegen", "cost", "formatted"}


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The query plan as text (same content as ``df.explain(mode)``,
    returned instead of printed)."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}")
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(explain_mode)


def count_exchanges(df: DataFrame, include_broadcast: bool = False) -> int:
    """Number of shuffle Exchange operators in the plan. Broadcast
    exchanges are excluded by default — they move only the small side."""
    plan = plan_string(df, "formatted")
    shuffles = len(re.findall(r"\(\d+\) Exchange\b", plan))
    if include_broadcast:
        shuffles += len(re.findall(r"\(\d+\) BroadcastExchange\b", plan))
    return shuffles


def count_broadcast_joins(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin", plan_string(df, "formatted")))


def has_cartesian_product(df: DataFrame) -> bool:
    return "CartesianProduct" in plan_string(df, "formatted")


def pushed_filters(df: DataFrame) -> List[str]:
    """The PushedFilters lists from every scan in the plan."""
    plan = plan_string(df, "formatted")
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_read_schemas(df: DataFrame) -> List[str]:
    """ReadSchema of every file scan — verifies column pruning (a scan
    reading all columns for a narrow projection is a bug)."""
    plan = plan_string(df, "formatted")
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def whole_stage_codegen_ids(df: DataFrame) -> List[int]:
    """Distinct WholeStageCodegen span ids — wider spans mean more of
    the plan runs as generated JVM code. (Simple-mode plans mark the
    spans as ``*(n)``; formatted mode omits them.)"""
    plan = plan_string(df, "simple")
    return sorted({int(m) for m in re.findall(r"\*\((\d+)\)", plan)})


def assert_no_unpartitioned_window(df: DataFrame) -> None:
    """Fail if any Window operator sorts the whole frame in one task —
    the single-task collapse documented in SURVEY.md §7.5.

    Detection: an unpartitioned window plans as
    ``Window … +- Sort … +- Exchange SinglePartition``.
    """
    plan = plan_string(df, "simple")
    if re.search(r"\bWindow\b", plan) and "Exchange SinglePartition" in plan:
        raise AssertionError(
            "Unpartitioned window in plan (Exchange SinglePartition: every "
            "row moves to ONE task). Partition the window spec.",
        )
