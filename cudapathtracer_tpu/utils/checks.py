"""Staged numerical health checks — the reference's checkCudaErrors analogue.

The reference brackets every named pipeline stage with
getLastError + deviceSynchronize (integratorUtilities.cuh:463-474) and
reports error codes at the end of a render (deviceCode.cu:3488-3496). XLA
has no async launch errors to harvest, so the equivalent failure-detection
surface here is NUMERICAL: per-stage NaN/Inf/negative scans of the arrays a
stage produced, plus a structured end-of-render report. Checks are off by
default (they force device syncs) and enabled via `enable_checks(True)` or
CUDAPATHTRACER_TPU_CHECKS=1 — the moral twin of running under cuda-memcheck.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

_ENABLED = os.environ.get("CUDAPATHTRACER_TPU_CHECKS", "0") not in ("0", "")


def enable_checks(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def checks_enabled() -> bool:
    return _ENABLED


@dataclass
class StageReport:
    stage: str
    nan: int
    inf: int
    negative: int

    @property
    def ok(self) -> bool:
        return self.nan == 0 and self.inf == 0


@dataclass
class CheckLog:
    """Accumulates per-stage reports; `raise_on_error` mirrors the hard
    failure the reference's sync+error-string produces."""
    reports: list = field(default_factory=list)

    def check(self, stage: str, *arrays, allow_negative: bool = True,
              raise_on_error: bool = False):
        if not _ENABLED:
            return None
        nan = inf = neg = 0
        for a in arrays:
            h = np.asarray(a)
            nan += int(np.isnan(h).sum())
            inf += int(np.isinf(h).sum())
            neg += int((h < 0).sum()) if np.issubdtype(h.dtype, np.floating) else 0
        rep = StageReport(stage, nan, inf, neg if not allow_negative else 0)
        self.reports.append(rep)
        if raise_on_error and not rep.ok:
            raise FloatingPointError(
                f"stage {stage!r}: {rep.nan} NaN, {rep.inf} Inf values")
        return rep

    def summary(self) -> str:
        if not self.reports:
            return "checks disabled (set CUDAPATHTRACER_TPU_CHECKS=1)"
        bad = [r for r in self.reports if not r.ok]
        if not bad:
            return (f"render executed with no numerical errors "
                    f"({len(self.reports)} stages checked)")
        return "\n".join(f"STAGE ERROR {r.stage}: nan={r.nan} inf={r.inf}"
                         for r in bad)
