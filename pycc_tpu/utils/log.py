"""Leveled logging for solver progress.

The reference prints all solver output with bare ``print`` (e.g.
/root/reference/pycc/ccwfn.py — iteration lines, timings), which forces
callers to scrape or redirect stdout.  Here every module logs through the
``pycc_tpu`` logger instead:

    import pycc_tpu
    pycc_tpu.set_verbosity("quiet")   # warnings only
    pycc_tpu.set_verbosity("info")    # solver progress (default)
    pycc_tpu.set_verbosity("debug")   # + per-batch detail (Cholesky pivots)

The default handler writes bare messages to stdout, so the default
console experience is unchanged from the reference's.  Attach your own
``logging`` handlers to the "pycc_tpu" logger for structured capture.
"""

import logging
import sys

class _StdoutProxy:
    """Write through the CURRENT sys.stdout (not the one bound at import),
    so contextlib.redirect_stdout captures solver output exactly as it
    captured the reference's prints."""

    def write(self, s):
        sys.stdout.write(s)

    def flush(self):
        sys.stdout.flush()


logger = logging.getLogger("pycc_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(_StdoutProxy())
    _h.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)
    logger.propagate = False

_LEVELS = {"quiet": logging.WARNING, "warning": logging.WARNING,
           "info": logging.INFO, "debug": logging.DEBUG}


def set_verbosity(level):
    """Set the framework-wide log level: 'quiet' | 'info' | 'debug',
    or any ``logging`` level number."""
    logger.setLevel(_LEVELS.get(level, level))
