"""Preflight: host-side row-by-row constraint checking.

Mirrors the reference preflight (src/preflight.rs): instantiate the real
AIR, evaluate every transition on the trace domain and report the first
non-zero constraint with a row/constraint-index diagnostic.  Also checks
boundary assertions directly against trace cells.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from ..field.felt import Felt
from ..trace.table import TraceTable
from .zk_air import ZkLispAir


@dataclass
class PreflightViolation:
    kind: str            # "transition" | "assertion"
    row: int
    index: int           # constraint index or assertion index
    value: int
    detail: str = ""


def run_preflight(air: ZkLispAir, trace: TraceTable,
                  max_violations: int = 5) -> List[PreflightViolation]:
    """Evaluate all constraints on the trace domain; return violations."""
    n = trace.length
    violations: List[PreflightViolation] = []

    for col, step, val in air.get_assertions():
        got = trace.get(col, step)
        if got != val:
            violations.append(PreflightViolation(
                "assertion", step, col, got,
                f"expected {val} at col {col} step {step}"))
            if len(violations) >= max_violations:
                return violations

    for row in range(n - 1):
        cur = [Felt(v) for v in trace.row(row)]
        nxt = [Felt(v) for v in trace.row(row + 1)]
        periodic = air.periodic_values_at_row(row)
        res = air.evaluate_transition(cur, nxt, periodic)
        for i, v in enumerate(res):
            if v.v != 0:
                violations.append(PreflightViolation(
                    "transition", row, i, v.v,
                    f"constraint {i} nonzero at row {row}"))
                if len(violations) >= max_violations:
                    return violations
    return violations
