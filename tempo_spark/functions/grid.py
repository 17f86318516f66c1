"""THE 1e-6 value grid — the repo's single cross-engine quantization.

Every exactness-contract operator (ACF/CCF/pairwise corr, changepoint,
seasonal decomposition, LTTB, drawdown, forecasts…) quantizes metric
values with the same hardened floor so decimal sufficient sums replay
bit-for-bit on an external engine. One definition so the contract can't
drift between operators.

NaN handling (round-11 review, the r9 "NaN > everything" class): a NaN
value quantizes to NULL — exactly like a NULL it is excluded from
statistics instead of poisoning them (Spark sorts/maxes NaN ABOVE every
real number, and the ANSI double→decimal cast of NaN ABORTS the job, so
an unguarded NaN either corrupts running peaks/percentiles silently or
kills the query deep in the plan)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def grid6(c) -> Column:
    """Hardened 1e-6 quantization; NULL for NULL *and NaN* inputs."""
    d = (F.col(c) if isinstance(c, str) else c).cast("double")
    return F.when(
        d.isNotNull() & ~F.isnan(d),
        F.floor(d * 1e6 + F.lit(0.5)) / F.lit(1e6),
    )
