"""Text-analysis column expressions for the documents pipeline.

Everything here is a pure ``pyspark.sql.functions`` composition (JVM-side,
whole-stage codegen, no Python): tokenization, word-shingling, quality
metrics, stopword-based language scoring, and content fingerprints.

Determinism: metrics avoid transcendental functions (libm results can differ
in the last ulp across engines), using only +,*,/ and round().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from momyre_spark.functions.numeric import round_half_up

# Tiny built-in stopword lists for the language-ID heuristic. The point is
# the *operator shape* (per-language token-hit scoring + argmax), not
# linguistic completeness — swap in real lists in production.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "en", "que", "los"],
    "de": ["der", "die", "das", "und", "zu", "den", "ist"],
    "fr": ["le", "la", "de", "et", "les", "des", "est"],
}

# A BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty-string safe)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_count(text: Column) -> Column:
    """Token count under the BPE-ish regex pre-tokenizer."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """:func:`shingles` over an already-materialized token array column.
    Pass a real column (withColumn), not an inline expression: ``toks`` is
    referenced n+2 times here, and each reference to an inline expression
    re-evaluates it (Catalyst does not CSE across references)."""
    n_out = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(
        *[F.slice(toks, i + 1, n_out).alias(f"s{i}") for i in range(n)]
    )
    gram = F.transform(z, lambda s: F.concat_ws(" ", *[s[f"s{i}"] for i in range(n)]))
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(gram)
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the dedup unit).

    Built as zip-of-shifted-slices rather than index-lookups in a transform
    lambda: a lambda that indexes back into ``tokens(text)`` forces the
    tokenizer to re-run per shingle (measured 17x slower on real documents —
    Catalyst does not hoist expensive subexpressions into HOF loops).
    Still re-tokenizes once per ``toks`` reference (n+2 times); hot paths
    should materialize the tokens and use :func:`shingles_from_tokens`."""
    return shingles_from_tokens(tokens(text), n)


def hashed_shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """:func:`hashed_shingles` over a materialized token array column."""
    n_out = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(
        *[F.slice(toks, i + 1, n_out).alias(f"s{i}") for i in range(n)]
    )
    gram = F.transform(z, lambda s: F.xxhash64(*[s[f"s{i}"] for i in range(n)]))
    return F.when(F.size(toks) < n, F.array().cast("array<long>")).otherwise(
        F.array_distinct(gram)
    )


def hashed_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as 64-bit hashes — no shingle strings
    are ever materialized: the n-token window is hashed directly from the
    zip struct (xxhash64 over n string columns). The cheap path for
    MinHash/LSH at corpus scale; collision probability ~2^-64 per pair."""
    return hashed_shingles_from_tokens(tokens(text), n)


def stopword_hits_from_tokens(toks: Column, lang: str) -> Column:
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))


def stopword_hits(text: Column, lang: str) -> Column:
    return stopword_hits_from_tokens(tokens(text), lang)


def stopword_ratio_from_tokens(toks: Column, lang: str = "en") -> Column:
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_hits_from_tokens(toks, lang) / n.cast("double")
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return stopword_ratio_from_tokens(tokens(text), lang)


def quality_score_from_tokens(text: Column, toks: Column) -> Column:
    """Deterministic [0,1] quality heuristic from a pre-tokenized column:
    mix of stopword presence, alphabetic density and length saturation (no
    transcendentals). Pass a *materialized* token column — re-deriving
    tokens inside each metric multiplies the regex tokenizer cost per row."""
    n = F.size(toks).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    total = F.length(F.regexp_replace(text, r"\s", ""))
    alpha_ratio = F.when(total == 0, F.lit(0.0)).otherwise(
        alpha.cast("double") / total.cast("double")
    )
    len_norm = F.least(n, F.lit(200.0)) / F.lit(200.0)
    return round_half_up(
        F.lit(0.3) * stopword_ratio_from_tokens(toks, "en")
        + F.lit(0.5) * alpha_ratio
        + F.lit(0.2) * len_norm,
        4,
    )


def quality_score(text: Column) -> Column:
    return quality_score_from_tokens(text, tokens(text))


def langid_from_tokens(toks: Column) -> Column:
    """Stopword-hit argmax over the built-in language profiles; ties resolve
    in fixed profile order, unknown when nothing hits."""
    hit_cols = {lang: stopword_hits_from_tokens(toks, lang) for lang in STOPWORDS}
    best = F.greatest(*hit_cols.values())
    expr = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # earlier profile wins ties
        expr = F.when((hit_cols[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def langid(text: Column) -> Column:
    return langid_from_tokens(tokens(text))


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Word n-grams WITHOUT dedup (frequency-preserving, unlike shingles()).
    Same zip-of-shifted-slices construction — see shingles() for why."""
    toks = tokens(text)
    n_out = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(
        *[F.slice(toks, i + 1, n_out).alias(f"s{i}") for i in range(n)]
    )
    gram = F.transform(z, lambda s: F.concat_ws(" ", *[s[f"s{i}"] for i in range(n)]))
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(gram)


def dup_token_fraction_from_tokens(toks: Column) -> Column:
    """Gopher-style repetition signal: fraction of tokens that repeat an
    earlier token (1 - distinct/total); 0 for empty documents."""
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    )


def digit_fraction(text: Column) -> Column:
    """Digits / non-whitespace chars (0 for whitespace-only text)."""
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    total = F.length(F.regexp_replace(text, r"\s", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        digits.cast("double") / total.cast("double")
    )


def symbol_fraction(text: Column) -> Column:
    """Non-alphanumeric / non-whitespace chars over non-whitespace chars —
    high values flag markup/boilerplate (Gopher symbol-to-word heuristic)."""
    sym = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    total = F.length(F.regexp_replace(text, r"\s", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        sym.cast("double") / total.cast("double")
    )


# PII patterns — RE2/Java-portable subset: no lookaround, no backrefs, so the
# DuckDB oracle (RE2) and Spark (java.util.regex) match identical spans.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{7,15}"


def pii_count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, then international phone numbers with
    typed placeholders. Order is load-bearing (phone must not eat IP octets)
    and mirrored exactly in the DuckDB oracle."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


def fingerprint(text: Column) -> Column:
    """Exact-dedup fingerprint: md5 of whitespace-normalized lowercase text."""
    return F.md5(F.concat_ws(" ", tokens(F.lower(text))))


def content_fingerprint(text: Column) -> Column:
    """Order-insensitive (bag-of-words) fingerprint: md5 over the sorted
    distinct token set."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.lower(text))))))


# HTML strip patterns: deliberately simple enough to mean the same thing in
# Java regex (Spark) and RE2 (DuckDB) — no backrefs, no lookarounds.
# two explicit patterns, not one with a backref — RE2 (DuckDB) has no \1
HTML_SCRIPT = r"(?s)<script[^>]*>.*?</script\s*>"
HTML_STYLE = r"(?s)<style[^>]*>.*?</style\s*>"
HTML_TAG = r"<[^>]+>"
HTML_ENTITIES = [
    ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"),
]


def strip_html(text: Column) -> Column:
    """Crawl-page -> text: drop script/style blocks wholesale, strip the
    remaining tags, decode the six common entities, collapse whitespace.
    Pure regexp_replace chain (codegen); order is load-bearing (script
    bodies must go BEFORE generic tag stripping; `&amp;` decodes LAST so
    double-encoded `&amp;lt;` does not re-decode) and mirrored in the
    oracle.
    """
    out = F.regexp_replace(text, HTML_SCRIPT, " ")
    out = F.regexp_replace(out, HTML_STYLE, " ")
    out = F.regexp_replace(out, HTML_TAG, " ")
    for ent, rep in [e for e in HTML_ENTITIES if e[0] != "&amp;"]:
        out = F.regexp_replace(out, ent, rep)
    out = F.regexp_replace(out, "&amp;", "&")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


# --------------------------------------------------------------- URLs -----
# Query params dropped during URL canonicalization: click-tracking noise
# that makes one page crawl as many URLs. The same regex runs in the DuckDB
# oracle (Java regex / RE2 compatible subset).
URL_TRACKING_PARAM = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)="


def canonicalize_url(url: Column) -> Column:
    """Crawl-dedup URL canonicalization, entirely in codegen'd expressions:

    - scheme + host lowercased; default ports (http:80 / https:443) dropped
    - fragment dropped
    - tracking params (``URL_TRACKING_PARAM``) removed, the rest SORTED so
      param order doesn't split one page into many keys
    - trailing slash stripped (except the root path); empty path -> ``/``
    - non-absolute inputs (no ``scheme://``) pass through UNCHANGED: a
      relative or malformed URL must not collapse into a shared degenerate
      key that dedup would treat as one page

    Built on regexp_extract/split/filter/array_sort — not ``parse_url`` —
    so the byte-for-byte identical transform runs under DuckDB for the
    oracle (java.net.URI's host/port splitting can't be mirrored exactly).
    """
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    auth = F.lower(F.regexp_extract(url, r"^[^:]+://([^/?#]*)", 1))
    host = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring_index(auth, ":", 1),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring_index(auth, ":", 1),
    ).otherwise(auth)
    path = F.regexp_extract(url, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    # query = between the FIRST '?' and any '#': anchored so a '?' that
    # only occurs inside the fragment is dropped with it
    qs = F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda x: (x != "") & ~x.rlike(URL_TRACKING_PARAM),
        )
    )
    q = F.array_join(params, "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", url).otherwise(canonical)
