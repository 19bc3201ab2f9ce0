"""Engine exceptions.

Capability parity: reference ``rdsa_utils/exceptions.py:9-48`` defines
a small hierarchy of pipeline errors; ours mirrors the set by
capability (names follow our engine's vocabulary).
"""

from __future__ import annotations


class RdsaSparkError(Exception):
    """Base class for all engine errors."""


class ColumnNotInDataframeError(RdsaSparkError):
    """A referenced column is absent from the DataFrame."""


class DataframeEmptyError(RdsaSparkError):
    """A DataFrame that must contain rows is empty."""


class ConfigError(RdsaSparkError):
    """Configuration loading/validation failure."""


class InvalidBucketNameError(RdsaSparkError):
    """Object-store bucket name fails validation rules."""


class InvalidS3FilePathError(RdsaSparkError):
    """Object-store file path fails validation rules."""


class TableNotFoundError(RdsaSparkError):
    """A referenced catalog table does not exist."""


class PipelineError(RdsaSparkError):
    """Generic pipeline-stage failure."""


class SchemaDriftError(RdsaSparkError):
    """An incoming frame's schema diverges from the expected schema."""
