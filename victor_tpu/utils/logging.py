"""Structured logging for the framework.

The reference's observability is bare `print()` statements
(victor/ccf_fit.py:402,408,449,478-479 etc.). Here every subsystem logs
through a namespaced stdlib logger (`victor_tpu.<name>`) with a single
shared console handler, so verbosity is controllable and output is
timestamped — including sampling progress (acceptance, R-hat) streamed
during runs.
"""

from __future__ import annotations

import logging
import os

_FORMAT = '%(asctime)s %(name)s %(levelname)s: %(message)s'
_configured = False


def _configure_root():
    global _configured
    if _configured:
        return
    root = logging.getLogger('victor_tpu')
    if not root.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt='%H:%M:%S'))
        root.addHandler(handler)
    level = os.environ.get('VICTOR_TPU_LOG', 'INFO').upper()
    root.setLevel(getattr(logging, level, logging.INFO))
    root.propagate = False
    _configured = True


def get_logger(name: str) -> logging.Logger:
    _configure_root()
    return logging.getLogger(f'victor_tpu.{name}')
