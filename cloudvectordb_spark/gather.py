"""Driver-gather row budget (round 16).

Round 15 introduced eager driver gathers inside query builders to
collapse multiplicative lineage: bounded candidate sets, per-query
thetas, merged WAND bounds, exact recall baselines.  Every such gather
is bounded by construction for the declared queries (<= Q*k rows,
<= |query terms| rows, <= |probes|*k rows), but the builders are
library functions — a caller passing an oversized batch would
silently collect an unbounded frame to the driver (guide §5: the
driver should do almost no data work).  ``bounded_gather`` makes the
budget an enforced constant instead of a comment: it fetches at most
``budget + 1`` rows through a ``limit`` (CollectLimit — execution
stops fetching once the overage is witnessed instead of materializing
the whole frame on the driver) and raises if the budget is exceeded.

The gathered row SET is unchanged whenever the frame is within budget
(``limit(n)`` over a frame with <= n rows returns every row), and all
call sites consume the rows order-insensitively (keyed joins, single
aggregate rows, local relations that feed joins/sorts), so query
results are bit-identical to a bare ``collect()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# One absolute backstop for every eager in-builder gather.  Generous
# for any sane serving batch (the declared batches gather <= 80 rows)
# and far below driver-pressure territory at 8 bytes-per-field row
# widths.
GATHER_ROW_BUDGET = 32768


def bounded_gather(
    df: DataFrame, what: str, budget: int = GATHER_ROW_BUDGET
) -> list:
    """``df.collect()`` with an enforced row budget; raises ValueError
    instead of silently collecting an unbounded frame."""
    rows = df.limit(budget + 1).collect()
    if len(rows) > budget:
        raise ValueError(
            f"{what}: eager driver gather exceeded its {budget}-row "
            "budget — the input is too large for the lineage-"
            "collapsing fast path; serve it through the sharded "
            "scatter-gather path instead"
        )
    return rows
