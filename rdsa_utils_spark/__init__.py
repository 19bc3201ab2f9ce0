"""rdsa_utils_spark — a PySpark-native analytics engine.

Re-implements the query/data-processing capability surface of
ONSdigital/rdsa-utils (reference: /root/reference, MIT) as an
idiomatic, scale-first PySpark engine, and extends it with the
operators a large-scale training-data pipeline needs (dedup,
similarity search, text analysis, multimodal columns).

Design rules (see SURVEY.md §7):
- DataFrame/SQL API only; no RDDs in data paths.
- Native ``pyspark.sql.functions`` expressions first; Arrow-batched
  pandas UDFs only where built-ins can't express the semantics;
  never row-at-a-time Python UDFs.
- No driver-side ``collect()`` inside operators — driver
  materialization is always an explicit user step.
- Every operator designed for a 1000-executor / 100 TB deployment:
  broadcast the small join side, partition windows, push filters
  down, let AQE re-plan shuffles.
"""

__version__ = "0.1.0"

from rdsa_utils_spark.session import create_spark_session  # noqa: F401
from rdsa_utils_spark.config import LoadConfig, load_config  # noqa: F401
from rdsa_utils_spark.exceptions import (  # noqa: F401
    ColumnNotInDataframeError,
    ConfigError,
    DataframeEmptyError,
    PipelineError,
    RdsaSparkError,
    TableNotFoundError,
)
