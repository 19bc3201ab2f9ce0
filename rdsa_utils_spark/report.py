"""Pipeline run-report generation from parsed Spark event logs.

Capability parity: reference
``rdsa_utils/helpers/pyspark_log_parser/report.py:16-76``
(``generate_report`` — papermill executes a notebook template, nbconvert
renders HTML). Re-designed dependency-free: the report is assembled as
plain HTML (with an optional markdown flavour) directly from the parsed
summaries + cost metrics, so it runs anywhere the engine runs — no
Jupyter kernel on the cluster edge node.
"""

from __future__ import annotations

import html
import json
from datetime import datetime, timezone
from pathlib import Path
from typing import List, Mapping, Optional

from .eventlog import calculate_emr_pipeline_cost, calculate_pipeline_cost

_CSS = """
body { font-family: system-ui, sans-serif; margin: 2rem; color: #1a1a1a; }
h1 { font-size: 1.4rem; } h2 { font-size: 1.1rem; margin-top: 2rem; }
table { border-collapse: collapse; margin: 1rem 0; }
th, td { border: 1px solid #ccc; padding: 0.35rem 0.7rem; text-align: left; }
th { background: #f2f2f2; }
tfoot td { font-weight: 600; background: #fafafa; }
.meta { color: #666; font-size: 0.85rem; }
"""


def _fmt_ts(ms: Optional[float]) -> str:
    if not ms:
        return ""
    return datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S",
    )


def _run_row(summary: Mapping) -> dict:
    """Normalize one entry to the report row shape. Accepts both this
    engine's :func:`rdsa_utils_spark.eventlog.parse_pyspark_logs`
    summaries and reference-shaped dicts
    (``{"file_path", "log_metrics", "cost_metrics"}`` — see reference
    report.py:34-53 example)."""
    if "log_metrics" in summary:  # reference shape
        metrics = summary.get("log_metrics") or {}
        cost = summary.get("cost_metrics") or {}
        runtime_s = ((cost.get("runtime") or {}).get("milliseconds") or 0) / 1000.0
        return {
            "name": metrics.get("Pipeline Name") or "",
            "started": _fmt_ts(metrics.get("Timestamp")),
            "runtime_seconds": runtime_s,
            "cores": metrics.get("Total Cores") or 0,
            "memory_gb": metrics.get("Total Memory") or 0,
            "cost": (cost.get("costs") or {}).get("pipeline_cost") or 0.0,
            "source": summary.get("file_path") or "",
        }
    cost = summary.get("cost_metrics")
    if cost is None:
        try:
            cost = calculate_emr_pipeline_cost(summary)
        except ValueError:  # run too big/odd for the catalog — rate model
            cost = {"costs": {"pipeline_cost": calculate_pipeline_cost(summary)["estimated_cost"]}}
    return {
        "name": summary.get("app_name") or "",
        "started": _fmt_ts(summary.get("start_time_ms")),
        "runtime_seconds": summary.get("runtime_seconds") or 0.0,
        "cores": summary.get("total_cores") or 0,
        "memory_gb": round(
            (summary.get("executor_memory_gb") or 0.0)
            * max(summary.get("peak_executors") or 0, 1),
            2,
        ),
        "cost": (cost.get("costs") or {}).get("pipeline_cost") or 0.0,
        "source": summary.get("log_file") or "",
    }


_COLUMNS = [
    ("name", "Pipeline"),
    ("started", "Started (UTC)"),
    ("runtime_seconds", "Runtime (s)"),
    ("cores", "Cores"),
    ("memory_gb", "Memory (GB)"),
    ("cost", "Est. cost ($)"),
    ("source", "Log file"),
]


def generate_report(
    logs_data: List[Mapping],
    output_path: str,
    title: str = "PySpark pipeline report",
    fmt: str = "html",
) -> str:
    """Render run summaries to a standalone report file and return the
    rendered text. ``fmt`` is ``"html"`` (default) or ``"md"``.

    Parity: reference ``helpers/pyspark_log_parser/report.py:16-76``
    (same inputs/outcome — a report file on disk — minus the notebook
    toolchain).
    """
    rows = [_run_row(s) for s in logs_data]
    total_runtime = sum(r["runtime_seconds"] for r in rows)
    total_cost = sum(r["cost"] for r in rows)
    generated = datetime.now(tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S UTC")

    if fmt == "md":
        lines = [f"# {title}", "", f"_Generated {generated} — {len(rows)} runs_", ""]
        lines.append("| " + " | ".join(label for _, label in _COLUMNS) + " |")
        lines.append("|" + "---|" * len(_COLUMNS))
        for r in rows:
            lines.append(
                "| " + " | ".join(_cell(r[key]) for key, _ in _COLUMNS) + " |",
            )
        lines.append(
            f"| **Total** | | **{total_runtime:.1f}** | | | **{total_cost:.4f}** | |",
        )
        text = "\n".join(lines) + "\n"
    elif fmt == "html":
        head = "".join(
            f"<th>{html.escape(label)}</th>" for _, label in _COLUMNS
        )
        body = "".join(
            "<tr>" + "".join(
                f"<td>{html.escape(_cell(r[key]))}</td>" for key, _ in _COLUMNS
            ) + "</tr>"
            for r in rows
        )
        foot = (
            f"<tr><td>Total</td><td></td><td>{total_runtime:.1f}</td>"
            f"<td></td><td></td><td>{total_cost:.4f}</td><td></td></tr>"
        )
        text = (
            "<!DOCTYPE html><html><head><meta charset='utf-8'>"
            f"<title>{html.escape(title)}</title><style>{_CSS}</style></head><body>"
            f"<h1>{html.escape(title)}</h1>"
            f"<p class='meta'>Generated {generated} &middot; {len(rows)} runs</p>"
            f"<table><thead><tr>{head}</tr></thead>"
            f"<tbody>{body}</tbody><tfoot>{foot}</tfoot></table>"
            "<h2>Raw summaries</h2>"
            f"<pre>{html.escape(json.dumps([dict(s) for s in logs_data], indent=2, default=str))}</pre>"
            "</body></html>"
        )
    else:
        raise ValueError(f"fmt must be 'html' or 'md', got {fmt!r}")

    out = Path(output_path)
    out.write_text(text, encoding="utf-8")
    return text


def _cell(v) -> str:
    if isinstance(v, float):
        return f"{v:.4f}".rstrip("0").rstrip(".") if v else "0"
    return str(v)
