"""Type aliases for the engine's public API.

Capability parity: reference ``rdsa_utils/typing.py:10-23``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

# "database_name.table_name" (or catalog.db.table)
TablePath = str

# hour / day / month / year — partition granularity for partitioned writes
TimePartitions = str

FilePath = Union[str, Path]
Config = dict
