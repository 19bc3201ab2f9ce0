"""Driver-side Python utility belt.

Capability parity: reference ``rdsa_utils/helpers/python.py:24-1161``
(iterables, dict merging, cartesian products, date coercion, file
utilities, env validation) and ``rdsa_utils/validation.py``. These are
plain-Python by nature; implementations are fresh but cover the same
call surface.
"""

from __future__ import annotations

import hashlib
import itertools
import os
from datetime import datetime
from pathlib import Path
from typing import Any, Iterable, Iterator, Mapping, Optional, Sequence, Union

# ---------------------------------------------------------------- iterables


def always_iterable(obj: Any, base_type: tuple = (str, bytes)) -> Iterator:
    """Yield obj's elements, or obj itself as a single element when it
    isn't iterable (strings/bytes count as single elements)."""
    if obj is None:
        return iter(())
    if isinstance(obj, base_type):
        return iter((obj,))
    try:
        return iter(obj)
    except TypeError:
        return iter((obj,))


def tuple_convert(obj: Any) -> tuple:
    return tuple(always_iterable(obj))


def list_convert(obj: Any) -> list:
    return list(always_iterable(obj))


def flatten_iterable(iterable: Iterable) -> list:
    """Flatten one level of nesting (strings stay whole)."""
    out: list = []
    for item in iterable:
        out.extend(always_iterable(item))
    return out


def convert_types_iterable(iterable: Iterable, as_type: type) -> list:
    return [as_type(x) for x in iterable]


def extend_lists(sections: Sequence[list], elements_to_add: Sequence) -> None:
    """Append to each section, in place, the elements it doesn't
    already contain (reference: helpers/python.py:44-111 — used to
    extend column lists loaded from config files; mutates, returns
    ``None``)."""
    for section in sections:
        section.extend([e for e in elements_to_add if e not in section])


def interleave_iterables(first: Sequence, second: Sequence) -> list:
    if len(first) != len(second):
        raise ValueError("interleave_iterables: lengths must match")
    return [x for pair in zip(first, second) for x in pair]


def pairwise_iterable(iterable: Iterable) -> Iterator[tuple]:
    """(a, b), (b, c), (c, d), …"""
    return itertools.pairwise(iterable)


def setdiff(first: Iterable, second: Iterable) -> list:
    """Elements of first not in second (order-preserving, de-duplicated)."""
    seen = set(second)
    out, emitted = [], set()
    for x in first:
        if x not in seen and x not in emitted:
            out.append(x)
            emitted.add(x)
    return out


# --------------------------------------------------------------------- dicts


def overwrite_dictionary(base: dict, override: Mapping) -> dict:
    """Recursively overwrite ``base`` with ``override``; unknown keys
    raise (typo guard, matching the reference's contract)."""
    for key, value in override.items():
        if key not in base:
            raise ValueError(f"overwrite_dictionary: unknown key {key!r}")
        if isinstance(base[key], dict) and isinstance(value, Mapping):
            overwrite_dictionary(base[key], value)
        else:
            base[key] = value
    return base


def calc_product_of_dict_values(**kwargs: Iterable) -> Iterator[dict]:
    """Cartesian product over dict-of-lists → dicts of scalars."""
    keys = list(kwargs)
    for combo in itertools.product(*[list_convert(kwargs[k]) for k in keys]):
        yield dict(zip(keys, combo))


# --------------------------------------------------------------------- dates


def convert_date_strings_to_datetimes(
    start_date: str,
    end_date: str,
) -> tuple[datetime, datetime]:
    """Parse a date-range pair, snapping the end to the end of its
    period: bare months snap to month-end, days to day-end
    (23:59:59.999999)."""
    import pandas as pd

    start = pd.to_datetime(start_date)
    end = pd.to_datetime(end_date)
    if _looks_like_month(end_date):
        end = end + pd.tseries.offsets.MonthEnd(0)
    if end.time() == datetime.min.time():
        # Snap a date-only end to the last microsecond of that day.
        end = end + pd.Timedelta(days=1) - pd.Timedelta(microseconds=1)
    return start.to_pydatetime(), end.to_pydatetime()


def _looks_like_month(text: str) -> bool:
    """'2024-02' / 'February 2024' / '2024 Feb' — no day component."""
    t = text.strip()
    if len(t) == 7 and t[4] in "-/" and t[:4].isdigit():
        return True
    parts = t.replace(",", " ").split()
    return len(parts) == 2 and any(p.isalpha() for p in parts)


# --------------------------------------------------------------------- files


def file_exists(path: Union[str, Path]) -> bool:
    return Path(path).is_file()


def directory_exists(path: Union[str, Path]) -> bool:
    return Path(path).is_dir()


def file_size(path: Union[str, Path]) -> int:
    return Path(path).stat().st_size


def md5_sum(path: Union[str, Path]) -> str:
    return _digest(path, hashlib.md5())


def sha256_sum(path: Union[str, Path]) -> str:
    return _digest(path, hashlib.sha256())


def _digest(path: Union[str, Path], h) -> str:
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def check_file(path: Union[str, Path]) -> bool:
    """File exists and is non-empty."""
    p = Path(path)
    return p.is_file() and p.stat().st_size > 0


def read_header(path: Union[str, Path]) -> str:
    with open(path) as fh:
        return fh.readline().rstrip("\n")


def write_string_to_file(text: str, path: Union[str, Path]) -> None:
    Path(path).write_text(text)


def create_folder(path: Union[str, Path]) -> None:
    Path(path).mkdir(parents=True, exist_ok=True)


# ----------------------------------------------------------------------- env


def validate_env_vars(names: Sequence[str]) -> None:
    missing = [n for n in names if not os.environ.get(n)]
    if missing:
        raise EnvironmentError(f"Missing environment variables: {missing}")


def merge_multi_dfs(df_list, on, how: str = "inner", fillna_val: Optional[Any] = None):
    """pandas fold-merge (reference helpers/python.py:579-658)."""
    from functools import reduce

    out = reduce(lambda a, b: a.merge(b, on=on, how=how), df_list)
    if fillna_val is not None:
        out = out.fillna(fillna_val)
    return out


def dump_environment_requirements(output_path: str, pin: bool = True) -> str:
    """Write the current environment's installed distributions to a
    requirements-style file; returns the text (reference
    helpers/python.py ``dump_environment_requirements``)."""
    from importlib import metadata

    lines = sorted(
        f"{d.metadata['Name']}=={d.version}" if pin else d.metadata["Name"]
        for d in metadata.distributions()
        if d.metadata and d.metadata.get("Name")
    )
    text = "\n".join(lines) + "\n"
    Path(output_path).write_text(text)
    return text


def parse_pyproject_metadata(pyproject_path: str) -> dict:
    """Project name/version/dependencies from a pyproject.toml
    (reference helpers/python.py ``parse_pyproject_metadata``)."""
    import tomllib

    data = tomllib.loads(Path(pyproject_path).read_text())
    project = data.get("project", {})
    return {
        "name": project.get("name"),
        "version": project.get("version"),
        "dependencies": project.get("dependencies", []),
        "optional_dependencies": project.get("optional-dependencies", {}),
    }
