"""Time-window / streaming operators (batch-first; see windows_time.py)."""

from rdsa_utils_spark.streaming.quality import (  # noqa: F401
    write_stream_contamination_gate,
    write_stream_quality_gate,
)
from rdsa_utils_spark.streaming.drift import (  # noqa: F401
    psi_vs_reference,
    reference_bin_counts,
    windowed_bin_counts,
)
from rdsa_utils_spark.streaming.windows_time import (  # noqa: F401
    session_window_agg,
    sessionize_by_gap,
    sliding_window_agg,
    tumbling_window_agg,
)
