"""Self-gating for driver queries that have no SQL oracle.

The driver records a query as ``err`` when its callable raises; for the
rows-only (``no_oracle``) queries that is the ONLY failure signal the
driver can see, so each such query asserts its own correctness
invariant before returning (round-3 VERDICT item 1).  A silent
regression — e.g. the flagship's pairwise F1 dropping below the north
rule's 0.99 — now flips the driver row to ``err`` instead of producing
a green-looking run.

Fault-injection coverage: tests/test_gates.py breaks the pipeline on
purpose (oversized edge threshold) and asserts the gate fires.
"""

from __future__ import annotations


class GateError(AssertionError):
    """A rows-only driver query's self-check failed."""


def gate(ok: bool, msg: str, **ctx) -> None:
    """Raise :class:`GateError` with ``msg`` (plus ``ctx``) unless ``ok``."""
    if not ok:
        detail = f" [{', '.join(f'{k}={v!r}' for k, v in ctx.items())}]" if ctx else ""
        raise GateError(msg + detail)
