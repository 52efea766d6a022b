"""Utility tier: log-domain math, structured logging, errors, profiling."""

from poccala_tpu.utils.logmath import (
    LOG_2PI,
    NEG_INF,
    diag_gaussian_logpdf,
    log_matvec,
    logsumexp,
)

__all__ = [
    "LOG_2PI",
    "NEG_INF",
    "diag_gaussian_logpdf",
    "log_matvec",
    "logsumexp",
]
