"""Structured logging (reference: platform-logging/Context facade).

Python logging with the reference's level set and an ANSI console handler;
per-process (host) log records carry the jax process index so multi-host
runs interleave legibly.
"""

from __future__ import annotations

import logging
import sys

_LEVELS = {
    "trace": 5,
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "error": logging.ERROR,
}

_COLORS = {
    5: "\x1b[90m",
    logging.DEBUG: "\x1b[36m",
    logging.INFO: "\x1b[32m",
    logging.WARNING: "\x1b[33m",
    logging.ERROR: "\x1b[31m",
}

logging.addLevelName(5, "TRACE")


class _AnsiFormatter(logging.Formatter):
    def format(self, record):
        color = _COLORS.get(record.levelno, "") if sys.stderr.isatty() else ""
        reset = "\x1b[0m" if color else ""
        base = super().format(record)
        return f"{color}{base}{reset}"


def get_logger(name: str = "dtpt", level: str = "info") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        try:
            import jax

            proc = jax.process_index() if jax.process_count() > 1 else None
        except Exception:
            proc = None
        tag = f"[h{proc}]" if proc is not None else ""
        h.setFormatter(
            _AnsiFormatter(
                f"%(asctime)s %(levelname)-5s {tag}%(name)s: %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        logger.addHandler(h)
        logger.propagate = False
    logger.setLevel(_LEVELS.get(level, logging.INFO))
    return logger
