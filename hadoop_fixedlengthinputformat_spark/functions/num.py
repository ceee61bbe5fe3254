"""Cross-engine deterministic numeric helpers.

Per-row ``round(double, n)`` is FORBIDDEN in oracle'd queries: Spark
(java.math HALF_UP on the decimal expansion) and DuckDB (libm-based)
disagree on representation-boundary values, and the driver's value hash
needs bit-identical doubles.  ``snap`` is the sanctioned replacement —
``floor(x * 10^d + 0.5) / 10^d`` uses only exactly-rounded IEEE ops
(multiply, add, floor, divide), so any engine computing it over the same
input double produces the same bits.  Put the SAME formula in the DuckDB
oracle (see ``snap_sql``).

Transcendentals (``ln``, ``exp``, trig) differ between engines in the
last ulp, so snap them to 8 decimals BEFORE any further arithmetic
(the ``llm_bm25`` idf recipe), then snap the final result to 4.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def snap(col: Column, digits: int = 4) -> Column:
    """Round-half-up to ``digits`` decimals with exact IEEE ops only."""
    scale = 10 ** digits
    return F.floor(col * scale + 0.5) / scale


def snap_sql(expr: str, digits: int = 4) -> str:
    """The DuckDB-side twin of :func:`snap` (identical bit behavior)."""
    scale = 10 ** digits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
