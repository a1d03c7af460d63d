"""PII detection and scrubbing for text corpora.

Every public training-data pipeline (C4, Dolma, FineWeb, RefinedWeb) runs
a PII pass before release: find emails / phone numbers / SSN-shaped ids /
IP addresses, and either count them (risk report, filtering signal) or
rewrite them to typed placeholder tokens (scrubbing). The reference has no
text surface at all; this is the standard pass expressed Spark-first.

Shape: everything here is plain ``regexp_extract_all`` / ``regexp_replace``
column expressions — JVM-side, fused into the scan's WholeStageCodegen, no
UDF, no shuffle. At 100 TB the whole pass runs at IO speed as a map-only
stage; the only aggregation is the optional corpus rollup (one hash agg).

Pattern dialect: the regexes deliberately use only the syntax Java regex
and RE2 share (no lookbehind, no backreferences), with identical
leftmost-first greedy semantics — so a DuckDB oracle reproduces every
count and every scrubbed byte exactly. These are the standard pragmatic
patterns, not validators: a string SHAPED like an SSN is flagged whether
or not it was ever issued (that is the desired release-safety posture).

Scrub order is part of the contract: email -> ssn -> phone -> ip, so a
kind whose pattern could overlap a later one is already rewritten to a
placeholder before the later pattern runs. Counts are per-kind matches of
the ORIGINAL text (overlaps possible in pathological inputs, documented).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: scrub applies in THIS order (see module docstring)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}\b", "<PHONE>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("bigint")


def pii_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kinds: tuple[str, ...] = tuple(PII_PATTERNS),
) -> DataFrame:
    """Per-document PII match counts: ``(id_col, n_<kind>..., n_pii)``.

    Map-only codegen expressions — the per-doc risk signal a curation
    pipeline joins against its gate battery (e.g. drop documents whose
    ``n_pii`` exceeds a threshold, route the rest to scrubbing)."""
    t = F.col(text_col)
    counts = [
        _count(t, PII_PATTERNS[k][0]).alias(f"n_{k}") for k in kinds
    ]
    out = df.select(F.col(id_col), *counts)
    total = None
    for k in kinds:
        c = F.col(f"n_{k}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("bigint"))


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: tuple[str, ...] = tuple(PII_PATTERNS),
) -> DataFrame:
    """Rewrite every PII match to its typed placeholder token, in the
    documented kind order. ``out_col`` defaults to replacing ``text_col``
    in place. Map-only; idempotent (placeholders match no pattern)."""
    col = F.col(text_col)
    for k in kinds:
        pat, repl = PII_PATTERNS[k]
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out_col or text_col, col)


def pii_summary(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = tuple(PII_PATTERNS),
) -> DataFrame:
    """Corpus rollup: one row per kind — total matches and the count of
    documents containing at least one. One hash aggregation over the
    map-side counts; the result is |kinds| rows at any corpus size."""
    t = F.col(text_col)
    aggs = []
    for k in kinds:
        n = _count(t, PII_PATTERNS[k][0])
        aggs.append(F.sum(n).cast("bigint").alias(f"__n_{k}"))
        aggs.append(
            F.sum(F.when(n > 0, 1).otherwise(0)).cast("bigint").alias(f"__d_{k}")
        )
    row = df.agg(*aggs)
    # pivot the single agg row to |kinds| rows with inline — NOT a union
    # of per-kind selects, which would replay the corpus agg per branch
    return row.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("kind"),
                        F.col(f"__n_{k}").alias("n_matches"),
                        F.col(f"__d_{k}").alias("n_docs"),
                    )
                    for k in kinds
                ]
            )
        )
    ).orderBy("kind")
