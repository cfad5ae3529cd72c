"""Skew-mitigation utilities (SURVEY.md §7 hard-part 4; SCALE.md skew
playbook step beyond AQE).

AQE's skew-join split handles most cases at runtime; explicit salting is
the deterministic fallback when one join key dominates so heavily that
even split partitions of it won't fit an executor (e.g. a null-ish
default key, a viral document id). Salting trades a bounded fan-out of
the small side (x n_salts rows) for an even spread of the hot side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join a skew-prone frame against a modest one on ``on``,
    spreading each hot key over ``n_salts`` shuffle partitions.

    - ``skewed`` rows get salt = hash(salt_source, or all columns) mod n —
      derived from row CONTENT, never from partition layout, so the salt
      assignment is stable across runs and repartitionings. Caveat: exact
      duplicate rows share a salt; pass ``salt_source`` (a high-cardinality
      column) when duplicates are common.
    - ``small`` is exploded n_salts x (bounded, it's the small side).
    - Join key becomes (on, salt); result drops the salt column.
    """
    salt_col = F.pmod(
        F.hash(F.col(salt_source))
        if salt_source
        else F.hash(*[F.col(c) for c in skewed.columns]),
        F.lit(n_salts),
    )
    left = skewed.withColumn("_salt", salt_col)
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return left.join(right, [on, "_salt"], how).drop("_salt")
