"""Logging + lightweight metrics (PK_INFO/PK_WARN/PK_DEBUG analogues).

The reference has stdout log macros and a single exposed metric
(loglikelihood_per_frame).  Here: a namespaced stdlib logger plus a tiny
counter/timer registry: the runtime counts `audio_seconds` (Utterance) and
`frames_decoded` (Decoder/decode_batch) and times the `frontend`/`am`/
`decode`/`process` stages — queryable via `metrics()`.
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

logger = logging.getLogger("catears_tpu")


def info(msg: str, *args) -> None:
    logger.info(msg, *args)


def warn(msg: str, *args) -> None:
    logger.warning(msg, *args)


def debug(msg: str, *args) -> None:
    logger.debug(msg, *args)


_counters: Dict[str, float] = defaultdict(float)


def count(name: str, value: float = 1.0) -> None:
    _counters[name] += value


@contextmanager
def timed(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _counters[f"{name}_seconds"] += time.perf_counter() - t0


def metrics() -> Dict[str, float]:
    return dict(_counters)


def reset_metrics() -> None:
    _counters.clear()
