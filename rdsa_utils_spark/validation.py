"""Validation glue (pydantic helpers).

Capability parity: reference ``rdsa_utils/validation.py:16-87``
(``apply_validation``, list-coercing validator, date-format check).
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Mapping, Optional, Type

from rdsa_utils_spark.exceptions import ConfigError
from rdsa_utils_spark.helpers import list_convert


def apply_validation(config: Mapping[str, Any], validators: Mapping[str, Type]) -> dict:
    """Validate each named config section with its pydantic model;
    returns the config with validated sections dumped back to dicts."""
    out = dict(config)
    for section, model in validators.items():
        if section not in out:
            raise ConfigError(f"Config section {section!r} missing for validation")
        validated = model(**out[section])
        dump = getattr(validated, "model_dump", None) or getattr(validated, "dict")
        out[section] = dump()
    return out


def list_convert_validator(value: Any) -> list:
    """Pydantic-compatible coercion: scalar → [scalar], None → []."""
    return list_convert(value)


def allowed_date_format(value: Optional[str], fmt: str = "%Y-%m-%d") -> Optional[str]:
    """Pydantic-compatible check that a string parses with ``fmt``."""
    if value is None:
        return None
    try:
        dt.datetime.strptime(value, fmt)
    except ValueError as exc:
        raise ValueError(f"date {value!r} does not match format {fmt!r}") from exc
    return value
