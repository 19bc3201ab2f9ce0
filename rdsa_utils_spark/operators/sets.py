"""Set operators: unions, intersect, except.

Capability parity:
- ``union_multi_dfs`` — reference ``rdsa_utils/helpers/pyspark.py:1480-1508``
  (positional union of same-schema frames).
- ``union_mismatched_dfs`` — reference ``helpers/pyspark.py:1360-1389``
  (NULL-pad missing columns then union by name) — natively
  ``unionByName(allowMissingColumns=True)`` since Spark 3.1.

Unions are metadata-only (no shuffle); Spark plans them as a single
multi-child ``Union`` node.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame


def union_multi_dfs(df_list: Sequence[DataFrame]) -> DataFrame:
    """Positional union of N same-schema DataFrames."""
    if not df_list:
        raise ValueError("union_multi_dfs: empty df_list")
    return reduce(DataFrame.union, df_list)


def union_mismatched_dfs(df_list: Sequence[DataFrame]) -> DataFrame:
    """Union by column name, NULL-filling columns absent on either side."""
    if not df_list:
        raise ValueError("union_mismatched_dfs: empty df_list")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), df_list,
    )
