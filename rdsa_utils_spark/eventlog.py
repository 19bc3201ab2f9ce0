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
import re
from typing import Iterable, List, Mapping, NamedTuple, Optional

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


class InstanceType(NamedTuple):
    """One cloud instance shape: name, vCPUs, memory, hourly price,
    family category. Capability parity: reference
    ``helpers/pyspark_log_parser/ec2_pricing.py:184-191``."""

    name: str
    vcpu: int
    memory_gb: float
    ec2_price: float
    family: str = ""


# Public AWS instance-naming convention: size suffix → vCPU count.
_SIZE_VCPU = {
    "large": 2, "xlarge": 4, "2xlarge": 8, "3xlarge": 12, "4xlarge": 16,
    "8xlarge": 32, "9xlarge": 36, "12xlarge": 48, "16xlarge": 64,
    "18xlarge": 72, "24xlarge": 96,
}

# family prefix → (GiB of RAM per vCPU, category, USD per vCPU-hour).
# Prices are a bundled static snapshot of public on-demand list rates
# (approximate; pass your own catalog to override) — replaces the
# reference's sqlite pricing DB + AWS pricing-API fetch
# (``ec2_pricing.py:319-407``, ``init_aws_ec2_db.py``) with data the
# engine can ship.
_FAMILY_SPECS = {
    "t3": (2.0, "General Purpose", 0.0416),
    "m4": (4.0, "General Purpose", 0.0500),
    "m5": (4.0, "General Purpose", 0.0480),
    "m5a": (4.0, "General Purpose", 0.0430),
    "m5d": (4.0, "General Purpose", 0.0565),
    "m6a": (4.0, "General Purpose", 0.0432),
    "c4": (2.0, "Compute optimised", 0.0498),
    "c5": (2.0, "Compute optimised", 0.0425),
    "c5a": (2.0, "Compute optimised", 0.0385),
    "c6a": (2.0, "Compute optimised", 0.0383),
    "r4": (8.0, "Memory optimised", 0.0665),
    "r5": (8.0, "Memory optimised", 0.0630),
    "r5a": (8.0, "Memory optimised", 0.0565),
    "r5b": (8.0, "Memory optimised", 0.0745),
    "r6a": (8.0, "Memory optimised", 0.0567),
    "x2gd": (16.0, "Memory optimised", 0.0835),
}


def extract_instance_specs(instance_type: str) -> Optional[dict]:
    """vCPU / memory / family for an instance-type name (e.g.
    ``m5.2xlarge``) from the public naming convention. ``None`` for
    unknown families/sizes. Parity: reference
    ``ec2_pricing.py:202-284``."""
    m = re.match(r"([a-z]+\d+[a-z]*)\.([a-z0-9]+)$", instance_type)
    if not m:
        return None
    family, size = m.groups()
    if family not in _FAMILY_SPECS or size not in _SIZE_VCPU:
        return None
    gb_per_vcpu, category, _ = _FAMILY_SPECS[family]
    vcpu = _SIZE_VCPU[size]
    return {"vcpu": vcpu, "memory_gb": vcpu * gb_per_vcpu, "family": category}


def instance_catalog() -> List[InstanceType]:
    """The bundled static instance catalog: every family in
    ``_FAMILY_SPECS`` × every size, priced linearly per vCPU. Stands in
    for the reference's sqlite DB (``ec2_pricing.py:286-316``)."""
    out = []
    for family, (gb_per_vcpu, category, usd_per_vcpu) in _FAMILY_SPECS.items():
        for size, vcpu in _SIZE_VCPU.items():
            out.append(
                InstanceType(
                    name=f"{family}.{size}",
                    vcpu=vcpu,
                    memory_gb=vcpu * gb_per_vcpu,
                    ec2_price=round(vcpu * usd_per_vcpu, 4),
                    family=category,
                ),
            )
    return out


def get_matching_instance(
    memory_gb: float,
    cores: int,
    instances: Optional[List[InstanceType]] = None,
) -> InstanceType:
    """Cheapest catalog instance with at least ``memory_gb`` RAM and
    ``cores`` vCPUs. Raises ``ValueError`` when nothing fits. Parity:
    reference ``ec2_pricing.py:407-461``."""
    if instances is None:
        instances = instance_catalog()
    if not instances:
        raise ValueError("No instances available to match the requirements.")
    valid = [i for i in instances if i.memory_gb >= memory_gb and i.vcpu >= cores]
    if not valid:
        raise ValueError(
            f"No suitable instance type found for {memory_gb}GB memory "
            f"and {cores} cores.",
        )
    return min(valid, key=lambda i: i.ec2_price)


def emr_price(ec2_price: float, surcharge_rate: float = 0.25) -> float:
    """EC2 price plus the managed-cluster (EMR-style) surcharge —
    flat 25% across families, as in reference
    ``ec2_pricing.py:16-46``."""
    return ec2_price * (1.0 + surcharge_rate)


def calculate_emr_pipeline_cost(
    summary: Mapping,
    instances: Optional[List[InstanceType]] = None,
    apply_emr_surcharge: bool = True,
) -> dict:
    """Instance-recommendation cost model over a
    :func:`parse_pyspark_logs` summary: pick the cheapest instance
    covering the run's cores + executor memory, then price the runtime
    at its (optionally surcharged) hourly rate. Output shape mirrors
    reference ``ec2_pricing.py:48-182``."""
    mem_gb = (summary.get("executor_memory_gb") or 0.0) * max(
        summary.get("peak_executors") or 0, 1,
    )
    cores = int(summary.get("total_cores") or 0)
    runtime_ms = int(
        (summary.get("end_time_ms") or 0) - (summary.get("start_time_ms") or 0),
    )
    runtime_hours = runtime_ms / (1000 * 60 * 60)
    inst = get_matching_instance(mem_gb, cores, instances)
    hourly = emr_price(inst.ec2_price) if apply_emr_surcharge else inst.ec2_price
    return {
        "configuration": {
            "memory_requested_gb": mem_gb,
            "cores_requested": cores,
        },
        "instance_recommendation": {
            "type": inst.name,
            "family": inst.family,
            "vcpu": inst.vcpu,
            "memory_gb": inst.memory_gb,
            "ec2_price": inst.ec2_price,
            "emr_price": round(hourly, 4),
        },
        "runtime": {"milliseconds": runtime_ms, "hours": runtime_hours},
        "costs": {
            "pipeline_cost": round(runtime_hours * hourly, 4),
            "ec2_cost": round(runtime_hours * inst.ec2_price, 4),
            "emr_surcharge": round(runtime_hours * (hourly - inst.ec2_price), 4),
        },
        "utilisation": {"cost_per_hour": round(hourly, 4)},
        "surcharge_applied": apply_emr_surcharge,
    }


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
