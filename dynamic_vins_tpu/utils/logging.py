"""Module loggers, mirroring the reference's three-logger layout.

Capability parity with `MyLogger` (`utils/log_utils.{h,cpp}`): three
named loggers — `vio` (backend, Debugv/Infov), `tracker` (frontend,
Debugt/Infot), `segmentor` (perception, Debugs) — with independent
levels configured from the run config, file + console sinks.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_LOGGERS = {}


def init_loggers(output_dir: str = "output",
                 vio_level: str = "info",
                 tracker_level: str = "info",
                 segmentor_level: str = "info",
                 console: bool = True):
    os.makedirs(output_dir, exist_ok=True)
    levels = {"vio": vio_level, "tracker": tracker_level,
              "segmentor": segmentor_level}
    for name, lvl in levels.items():
        lg = logging.getLogger(f"dvio.{name}")
        lg.setLevel(getattr(logging, lvl.upper(), logging.INFO))
        lg.handlers.clear()
        fh = logging.FileHandler(os.path.join(output_dir,
                                              f"{name}.log"), mode="w")
        fh.setFormatter(logging.Formatter(
            "%(asctime)s [%(levelname)s] %(message)s"))
        lg.addHandler(fh)
        if console:
            ch = logging.StreamHandler(sys.stderr)
            ch.setFormatter(logging.Formatter(
                f"[{name}] %(levelname)s %(message)s"))
            lg.addHandler(ch)
        lg.propagate = False
        _LOGGERS[name] = lg
    return _LOGGERS


def get(name: str) -> logging.Logger:
    """vio / tracker / segmentor logger (lazily initialized)."""
    if name not in _LOGGERS:
        lg = logging.getLogger(f"dvio.{name}")
        if not lg.handlers:
            lg.addHandler(logging.NullHandler())
        _LOGGERS[name] = lg
    return _LOGGERS[name]
