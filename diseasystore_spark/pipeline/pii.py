"""PII detection and redaction — the scrubbing pass every public
training corpus gets before release (the C4/CCNet pipelines strip
emails and phone-shaped strings; see Raffel et al. 2020, public).

Everything is built-in regexp Column expressions (Java regex on the
JVM) — a map-only plan with zero shuffles and no Python in the row
path. The default patterns deliberately stay inside the regex subset
that Java regex and RE2 (DuckDB/Go engines) interpret identically —
ASCII classes, bounded repetition, word boundaries, non-capturing
groups; no lookaround, no backreferences — so a SQL oracle reproduces
the exact counts and redacted text (q56).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (pattern, replacement token). Insertion order is the
# redaction order (counts are always measured on the ORIGINAL text,
# so ordering only matters if one pattern could match inside another
# pattern's replacement token — the default tokens contain no digits
# or '@', so they are fixed points of every default pattern).
DEFAULT_PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
}


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Count and redact PII-shaped spans per document.

    Output: (id, text_redacted, n_<name> per pattern, n_pii_total).
    Counts are non-overlapping match counts on the original text;
    ``text_redacted`` applies the replacements sequentially in
    ``patterns`` insertion order. Scale shape: pure per-row
    projection — whole-stage-codegen'd, shuffle-free, trivially
    partition-parallel at any corpus size.
    """
    pats = DEFAULT_PII_PATTERNS if patterns is None else patterns
    if not pats:
        raise ValueError("patterns must contain at least one entry")
    red: Column = F.col(text_col)
    for rx, token in pats.values():
        red = F.regexp_replace(red, rx, token)
    counts = [
        F.regexp_count(F.col(text_col), F.lit(rx))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, (rx, _) in pats.items()
    ]
    out = df.select(F.col(id_col), red.alias("text_redacted"), *counts)
    total = reduce(
        Column.__add__, [F.col(f"n_{name}") for name in pats]
    )
    return out.withColumn("n_pii_total", total.cast("bigint"))


def k_anonymity_violations(
    df: DataFrame,
    quasi_cols: list[str | Column],
    k: int = 5,
) -> DataFrame:
    """Quasi-identifier combinations shared by FEWER than ``k`` rows —
    the k-anonymity audit a privacy review runs before a dataset
    release: any emitted combination re-identifies its members within
    a group smaller than k and needs suppression or coarsening.
    Aliased Column expressions are accepted alongside column names so
    binned quasi-identifiers (``F.floor(...).alias("bal_k")``) can be
    audited without materializing them first.

    Output: the quasi-identifier columns plus ``n bigint`` (group
    size), one row per violating combination. NULL counts as a value
    (a NULL-keyed group of 1 is still re-identifiable).

    Scale shape: ONE map-side-combinable groupBy on the
    quasi-identifier key — the audit over any corpus size is a single
    count shuffle plus a literal filter; no second pass, no window.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 never violates)")
    keys = [F.col(c) if isinstance(c, str) else c for c in quasi_cols]
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .where(F.col("n") < k)
    )
