"""Spark event-log parsing + run-cost estimation.

Capability parity: reference
``rdsa_utils/helpers/pyspark_log_parser/parser.py:17-428`` (parse
SparkListener JSON events → runtime/cores/memory summary, find/sort
log files, tabulate runs) and the EC2 cost model
(``ec2_pricing.py``) reduced to an explicit rate table — the
reference's sqlite pricing DB is an ops artifact, not engine surface.

Event logs are newline-delimited JSON of SparkListener events; this
parser is driver-side (logs are MBs). For fleet-scale analysis load
the same files with ``spark.read.json`` and aggregate distributed.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterable, List, Mapping, Optional

import pandas as pd

_MEM_SUFFIX = {"k": 1 / (1024 * 1024), "m": 1 / 1024, "g": 1, "t": 1024}


def convert_value(value: str) -> float:
    """Normalize a Spark memory config string (e.g. '10g', '512m')
    to GiB."""
    text = str(value).strip().lower()
    if text.endswith("b") and text[:-1][-1:] in _MEM_SUFFIX:
        text = text[:-1]
    if text and text[-1] in _MEM_SUFFIX:
        return float(text[:-1]) * _MEM_SUFFIX[text[-1]]
    return float(text) / (1024**3)  # bare bytes


def iter_events(path: str) -> Iterable[dict]:
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    continue


def parse_pyspark_logs(events: Iterable[Mapping]) -> dict:
    """Aggregate SparkListener events into a run summary:
    app name/id, start/end/runtime_seconds, peak executor count,
    total cores, executor/driver memory (GiB), shuffle/input bytes."""
    summary: dict = {
        "app_name": None,
        "app_id": None,
        "start_time_ms": None,
        "end_time_ms": None,
        "runtime_seconds": None,
        "peak_executors": 0,
        "total_cores": 0,
        "executor_memory_gb": None,
        "driver_memory_gb": None,
        "shuffle_read_bytes": 0,
        "shuffle_write_bytes": 0,
        "input_bytes": 0,
        "n_tasks": 0,
        "failed_tasks": 0,
    }
    live_executors = 0
    for ev in events:
        kind = ev.get("Event", "")
        if kind == "SparkListenerApplicationStart":
            summary["app_name"] = ev.get("App Name")
            summary["app_id"] = ev.get("App ID")
            summary["start_time_ms"] = ev.get("Timestamp")
        elif kind == "SparkListenerApplicationEnd":
            summary["end_time_ms"] = ev.get("Timestamp")
        elif kind == "SparkListenerExecutorAdded":
            live_executors += 1
            summary["peak_executors"] = max(summary["peak_executors"], live_executors)
            cores = (ev.get("Executor Info") or {}).get("Total Cores", 0)
            summary["total_cores"] += int(cores or 0)
        elif kind == "SparkListenerExecutorRemoved":
            live_executors = max(0, live_executors - 1)
        elif kind == "SparkListenerEnvironmentUpdate":
            props = ev.get("Spark Properties") or {}
            if "spark.executor.memory" in props:
                summary["executor_memory_gb"] = convert_value(props["spark.executor.memory"])
            if "spark.driver.memory" in props:
                summary["driver_memory_gb"] = convert_value(props["spark.driver.memory"])
        elif kind == "SparkListenerTaskEnd":
            summary["n_tasks"] += 1
            if (ev.get("Task End Reason") or {}).get("Reason") != "Success":
                summary["failed_tasks"] += 1
            metrics = ev.get("Task Metrics") or {}
            summary["shuffle_read_bytes"] += int(
                (metrics.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0)
                + (metrics.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0),
            )
            summary["shuffle_write_bytes"] += int(
                (metrics.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0),
            )
            summary["input_bytes"] += int(
                (metrics.get("Input Metrics") or {}).get("Bytes Read", 0),
            )
    if summary["start_time_ms"] and summary["end_time_ms"]:
        summary["runtime_seconds"] = (
            summary["end_time_ms"] - summary["start_time_ms"]
        ) / 1000.0
    return summary


def find_pyspark_log_files(log_dir: str, pattern: str = "*") -> List[str]:
    """Event-log files under ``log_dir`` (newest first)."""
    files = [
        f for f in glob.glob(os.path.join(log_dir, pattern))
        if os.path.isfile(f)
    ]
    return sorted(files, key=os.path.getmtime, reverse=True)


def process_pyspark_logs(log_dir: str, pattern: str = "*") -> List[dict]:
    return [
        {**parse_pyspark_logs(iter_events(f)), "log_file": f}
        for f in find_pyspark_log_files(log_dir, pattern)
    ]


def filter_and_sort_logs_by_app_name(
    summaries: List[Mapping],
    app_name: Optional[str] = None,
) -> List[dict]:
    out = [
        dict(s) for s in summaries
        if app_name is None or s.get("app_name") == app_name
    ]
    return sorted(out, key=lambda s: s.get("start_time_ms") or 0, reverse=True)


def logs_to_dataframe(summaries: List[Mapping]) -> pd.DataFrame:
    return pd.DataFrame([dict(s) for s in summaries])


def calculate_pipeline_cost(
    summary: Mapping,
    rate_per_core_hour: float = 0.05,
    rate_per_gb_hour: float = 0.005,
) -> dict:
    """Crude run cost from the parsed summary: core-hours and
    memory-GB-hours at the given rates (defaults are order-of-magnitude
    on-demand cloud prices; override with your own)."""
    runtime_h = (summary.get("runtime_seconds") or 0.0) / 3600.0
    cores = summary.get("total_cores") or 0
    mem = (summary.get("executor_memory_gb") or 0.0) * (summary.get("peak_executors") or 0)
    core_cost = runtime_h * cores * rate_per_core_hour
    mem_cost = runtime_h * mem * rate_per_gb_hour
    return {
        "runtime_hours": runtime_h,
        "core_hours": runtime_h * cores,
        "memory_gb_hours": runtime_h * mem,
        "estimated_cost": core_cost + mem_cost,
    }
