"""Structured logging for Spark pipelines.

Capability parity: reference ``rdsa_utils/logging.py``:
- ``init_logger_basic`` / dev log level (:19-176)
- ``log_spark_df_schema`` decorator (:262-408) — logs schema before/
  after a DataFrame-returning function (public ``treeString()``, not
  the reference's ``_jdf`` call).
- ``log_rows_in_spark_df`` decorator (:411-522) — row counts before/
  after; caches the result so the count doesn't recompute the plan.
- ``timer_args`` / ``time_it`` (:179-204, helpers/python.py:316-348).
- ``print_full_table_and_raise_error`` (:207-259).

Scale note: ``log_rows_in_spark_df`` costs one action per decorated
call — opt-in instrumentation, never default-on in production paths.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

LOG_DEV_LEVEL = 15


def init_logger_basic(
    logger: Optional[logging.Logger] = None,
    level: int = logging.INFO,
) -> logging.Logger:
    """Console logger with a standard pipeline format; registers the
    custom ``DEV`` level (between DEBUG and INFO)."""
    if logging.getLevelName(LOG_DEV_LEVEL) != "DEV":
        logging.addLevelName(LOG_DEV_LEVEL, "DEV")
    logger = logger or logging.getLogger("rdsa_utils_spark")
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s"),
        )
        logger.addHandler(handler)
    logger.setLevel(level)
    return logger


def log_dev(logger: logging.Logger, message: str) -> None:
    logger.log(LOG_DEV_LEVEL, message)


def _schema_string(df: DataFrame) -> str:
    tree = getattr(df.schema, "treeString", None)
    return tree() if callable(tree) else df.schema.simpleString()


def log_spark_df_schema(
    _func: Optional[Callable] = None,
    *,
    logger: Optional[logging.Logger] = None,
    log_input: bool = True,
) -> Callable:
    """Decorator: log the schema of the returned DataFrame (and of the
    first DataFrame argument when ``log_input``)."""

    def decorate(func: Callable) -> Callable:
        log = logger or logging.getLogger("rdsa_utils_spark")

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            if log_input:
                for a in args:
                    if isinstance(a, DataFrame):
                        log.info("%s input schema:\n%s", func.__name__, _schema_string(a))
                        break
            result = func(*args, **kwargs)
            if isinstance(result, DataFrame):
                log.info("%s output schema:\n%s", func.__name__, _schema_string(result))
            return result

        return wrapper

    return decorate(_func) if callable(_func) else decorate


def log_rows_in_spark_df(
    _func: Optional[Callable] = None,
    *,
    logger: Optional[logging.Logger] = None,
) -> Callable:
    """Decorator: log row counts of DataFrame inputs/outputs. The
    returned frame is persisted (MEMORY_ONLY) before counting so the
    count and the caller's downstream action share one computation."""

    def decorate(func: Callable) -> Callable:
        log = logger or logging.getLogger("rdsa_utils_spark")

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            for a in args:
                if isinstance(a, DataFrame):
                    log.info("%s input rows: %d", func.__name__, a.count())
                    break
            result = func(*args, **kwargs)
            if isinstance(result, DataFrame):
                result = result.persist(StorageLevel.MEMORY_ONLY)
                log.info("%s output rows: %d", func.__name__, result.count())
            return result

        return wrapper

    return decorate(_func) if callable(_func) else decorate


def time_it(
    _func: Optional[Callable] = None,
    *,
    logger: Optional[logging.Logger] = None,
) -> Callable:
    """Decorator: wall-time the call."""

    def decorate(func: Callable) -> Callable:
        log = logger or logging.getLogger("rdsa_utils_spark")

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            try:
                return func(*args, **kwargs)
            finally:
                log.info("%s took %.3fs", func.__name__, time.perf_counter() - t0)

        return wrapper

    return decorate(_func) if callable(_func) else decorate


def timer_args(
    name: str,
    logger: Optional[Callable[[str], None]] = None,
) -> dict:
    """Keyword arguments for a ``codetiming.Timer``-style context
    timer (reference API parity: ``rdsa_utils/logging.py:179-204``,
    re-expressed without the codetiming/humanfriendly dependencies).

    Returns the same four keys the reference builds — ``name``,
    ``text`` (secs → formatted message), ``logger``, ``initial_text``
    — so existing ``Timer(**timer_args("step"))`` call sites port
    unchanged; the formatted text uses plain seconds.
    """
    log = logger or logging.getLogger("rdsa_utils_spark").info
    return {
        "name": name,
        "text": lambda secs: f"{name}: {secs:.3f}s",
        "logger": log,
        "initial_text": "Running {name}",
    }


def add_warning_message_to_function(
    _func: Optional[Callable] = None,
    *,
    message: Optional[str] = None,
    logger: Optional[logging.Logger] = None,
) -> Callable:
    """Decorator: log ``"<func_name>: <message>"`` at WARNING level on
    every call (reference: logging.py:525-583 — used to flag
    deprecated or sharp-edged helpers)."""

    def decorate(func: Callable) -> Callable:
        log = logger or logging.getLogger("rdsa_utils_spark")

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            log.warning("%s: %s", func.__name__, message or "")
            return func(*args, **kwargs)

        return wrapper

    return decorate(_func) if callable(_func) else decorate


def print_full_table_and_raise_error(
    df,
    message: str,
    stop_pipeline: bool = False,
    show_records: bool = True,
    logger: Optional[logging.Logger] = None,
) -> None:
    """Log a full (small!) table — pandas or Spark — and optionally
    raise. For Spark frames the caller bounds the size (``limit``)."""
    log = logger or logging.getLogger("rdsa_utils_spark")
    if show_records:
        if isinstance(df, DataFrame):
            body = df.toPandas().to_string()
        else:
            body = df.to_string()
        log.error("%s\n%s", message, body)
    else:
        log.error(message)
    if stop_pipeline:
        raise ValueError(message)


def init_logger_advanced(
    logger: Optional[logging.Logger] = None,
    level: int = logging.INFO,
    log_file: Optional[str] = None,
    fmt: str = "%(asctime)s %(levelname)s %(name)s: %(message)s",
    extra_handlers: Optional[list] = None,
) -> logging.Logger:
    """Logger with console + optional file + caller-supplied handlers
    (reference ``init_logger_advanced``, logging.py:99-176)."""
    logger = init_logger_basic(logger, level)
    formatter = logging.Formatter(fmt)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    for h in extra_handlers or []:
        if h.formatter is None:
            h.setFormatter(formatter)
        logger.addHandler(h)
    return logger
