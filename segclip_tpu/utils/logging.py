"""Singleton logger writing to stderr + <output_dir>/log.txt and a jsonl
metric writer (replaces reference util.py:63-93 and adds structured
metrics)."""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Optional

_LOGGER: Optional[logging.Logger] = None


def get_logger(output_dir: Optional[str] = None,
               name: str = "segclip_tpu") -> logging.Logger:
    global _LOGGER
    if _LOGGER is not None:
        return _LOGGER
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s",
                            "%Y-%m-%d %H:%M:%S")
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _LOGGER = logger
    return logger


class MetricWriter:
    """Appends one JSON object per line to <output_dir>/metrics.jsonl."""

    def __init__(self, output_dir: str):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")

    def write(self, step: int, **metrics) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "item") or
                        isinstance(v, (int, float)) else v)
                    for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
