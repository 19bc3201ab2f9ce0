"""Config loading & validation.

Capability parity: reference ``rdsa_utils/io/config.py:21-192``
(``LoadConfig``: file → dict, dotted overrides, optional pydantic
validation) and ``rdsa_utils/io/input.py:17-113`` (json/toml/yaml
parsers). Driver-side by nature; re-designed with a single
``load_config`` entry point plus a small class wrapper.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Mapping, Optional, Union

from rdsa_utils_spark.exceptions import ConfigError


def read_file(path: Union[str, Path]) -> str:
    p = Path(path)
    if not p.exists():
        raise ConfigError(f"Config file not found: {p}")
    return p.read_text()


def parse_json(text: str) -> dict:
    return json.loads(text)


def parse_toml(text: str) -> dict:
    import tomllib

    return tomllib.loads(text)


def parse_yaml(text: str) -> dict:
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover
        raise ConfigError("pyyaml not installed; use json or toml config") from exc
    return yaml.safe_load(text)


_PARSERS: dict[str, Callable[[str], dict]] = {
    "json": parse_json,
    "toml": parse_toml,
    "yaml": parse_yaml,
    "yml": parse_yaml,
}


def _apply_overrides(config: dict, overrides: Mapping[str, Any]) -> dict:
    """Apply ``{'section.key': value}`` dotted overrides. A key must
    already exist (typo guard — matches the reference's contract of
    only overwriting known settings)."""
    for dotted, value in overrides.items():
        parts = dotted.split(".")
        node = config
        for part in parts[:-1]:
            if not isinstance(node, dict) or part not in node:
                raise ConfigError(f"Override path not in config: {dotted!r}")
            node = node[part]
        if not isinstance(node, dict) or parts[-1] not in node:
            raise ConfigError(f"Override path not in config: {dotted!r}")
        node[parts[-1]] = value
    return config


def load_config(
    config_path: Union[str, Path],
    config_overrides: Optional[Mapping[str, Any]] = None,
    config_type: Optional[str] = None,
    config_validators: Optional[Mapping[str, Any]] = None,
) -> dict:
    """Load a JSON/TOML/YAML config file into a dict.

    ``config_validators`` maps section name → pydantic model class;
    each named section is validated and replaced by the model's
    ``.model_dump()``.
    """
    suffix = (config_type or Path(config_path).suffix.lstrip(".")).lower()
    if suffix not in _PARSERS:
        raise ConfigError(
            f"Unsupported config type {suffix!r} (expect {sorted(_PARSERS)})",
        )
    config = _PARSERS[suffix](read_file(config_path))
    if config is None:
        config = {}
    if not isinstance(config, dict):
        raise ConfigError("Top-level config must be a mapping")
    if config_overrides:
        config = _apply_overrides(config, config_overrides)
    if config_validators:
        for section, model in config_validators.items():
            if section not in config:
                raise ConfigError(f"Config section {section!r} missing for validation")
            validated = model(**config[section])
            dump = getattr(validated, "model_dump", None) or getattr(validated, "dict")
            config[section] = dump()
    return config


class LoadConfig:
    """Class-style wrapper (reference API shape): attributes per
    top-level section plus ``config`` for the whole tree."""

    def __init__(
        self,
        config_path: Union[str, Path],
        config_overrides: Optional[Mapping[str, Any]] = None,
        config_type: Optional[str] = None,
        config_validators: Optional[Mapping[str, Any]] = None,
    ) -> None:
        self.config_path = Path(config_path)
        self.config = load_config(
            config_path, config_overrides, config_type, config_validators,
        )
        for key, value in self.config.items():
            if isinstance(key, str) and key.isidentifier():
                setattr(self, key, value)
