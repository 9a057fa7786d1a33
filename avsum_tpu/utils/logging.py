"""Structured logging (replaces the reference's stray ``print`` calls,
e.g. /root/reference/features/extractors.py:112-114; SURVEY.md §5.5).

Library code is quiet by default; training emits per-step scalars to a
JSONL file plus a human-readable logger.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional

_FORMAT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"


def get_logger(name: str = "avsum", level: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.propagate = False
    logger.setLevel(level or os.environ.get("AVSUM_LOG_LEVEL", "INFO"))
    return logger


class JsonlLogger:
    """Append-only JSONL scalar sink (one dict per line, wall-clock stamped)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = open(path, "a") if path else None

    def log(self, step: int, **scalars: Any) -> Dict[str, Any]:
        record = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            record[k] = float(v) if hasattr(v, "__float__") else v
        if self._fh is not None:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        return record

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self) -> "JsonlLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
