"""Portable-ops switch: force pure-XLA lowerings instead of Pallas kernels.

Multi-platform serving artifacts (serving/export.py) must not bake TPU-only
Pallas custom calls into their non-TPU branches, so tracing them needs the
portable pure-XLA op lowerings. The switch is a ``contextvars.ContextVar``
rather than a process-global environment variable so that concurrent tracing
in other threads (async prefetch compiling a train step, parallel exports)
never silently picks up the portable path — context variables are isolated
per thread/task. ``TPUREG_PORTABLE_OPS=1`` in the environment remains the
process-wide default for CLI use.
"""

from __future__ import annotations

import contextlib
import contextvars
import os

__all__ = ["portable_ops", "portable_ops_enabled"]

_PORTABLE: contextvars.ContextVar = contextvars.ContextVar(
    "tpureg_portable_ops", default=None
)


def portable_ops_enabled() -> bool:
    """True when ops should trace their pure-XLA (non-Pallas) lowerings."""
    v = _PORTABLE.get()
    if v is not None:
        return bool(v)
    return bool(os.environ.get("TPUREG_PORTABLE_OPS"))


@contextlib.contextmanager
def portable_ops(enabled: bool = True):
    """Scoped (thread-safe) override of the portable-ops switch."""
    token = _PORTABLE.set(bool(enabled))
    try:
        yield
    finally:
        _PORTABLE.reset(token)
