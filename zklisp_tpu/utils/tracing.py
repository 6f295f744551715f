"""Lightweight tracing/timing instrumentation (reference: the `tracing`
crate with per-phase Instant logging, prove.rs:166-516).

Enable with ZKL_LOG=debug|info or programmatically via configure().
Phases log their wall-clock on exit at debug level.
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager

logger = logging.getLogger("zklisp_tpu")


def configure(level: str | None = None) -> None:
    level = level or os.environ.get("ZKL_LOG", "")
    if not level:
        return
    lvl = {"debug": logging.DEBUG, "info": logging.INFO,
           "warn": logging.WARNING, "error": logging.ERROR}.get(
               level.lower(), logging.INFO)
    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(handler)
    logger.setLevel(lvl)


configure()


@contextmanager
def phase(name: str, **fields):
    """Timed phase context: logs `name done elapsed_ms=...` at debug."""
    t0 = time.time()
    try:
        yield
    finally:
        extra = " ".join(f"{k}={v}" for k, v in fields.items())
        logger.debug("%s done elapsed_ms=%d %s", name,
                     int((time.time() - t0) * 1000), extra)
