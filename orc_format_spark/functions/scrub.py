"""PII scrubbing over the documents table — redaction as a JVM-side pass.

Not in the reference repo (SURVEY.md §2.7); a training-data-pipeline
addition per the task brief: before text reaches a tokenizer, emails,
URLs, and bare IPv4 addresses are replaced with typed placeholder
tokens, and per-document match counts are kept as curation metadata
(high PII density is itself a quality signal).

Scale shape: `regexp_replace` / `regexp_count` are Catalyst expressions
— whole-stage-codegen'd, map-side, zero shuffle, no Python in the path.
At 100 TB this is a pure scan-transform whose cost is the scan.

Determinism / oracle story: every pattern is written in the common
subset of Java regex (Spark) and RE2 (DuckDB) — no backreferences, no
lookaround, ASCII classes only — so the DuckDB oracle applies the SAME
pattern strings with `regexp_replace(..., 'g')` and
`len(regexp_extract_all(...))` and must reproduce the output
byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Common Java-regex/RE2 subset; order of application matters and is
# fixed: URL first (an email never contains '://', a URL may contain
# '@'), then email, then IPv4.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^ \t\n]+"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_ORDER = (
    (URL_RE, "<URL>", "n_urls"),
    (EMAIL_RE, "<EMAIL>", "n_emails"),
    (IPV4_RE, "<IP>", "n_ips"),
)


def scrub_text(text: Column) -> Column:
    """text with URLs, then emails, then IPv4s replaced by placeholders."""
    out = text
    for pat, repl, _ in _ORDER:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_urls, n_emails, n_ips, clean_text): counts are taken
    on the ORIGINAL text (each pattern independently), the cleaned text
    applies the replacements in the fixed URL -> email -> IPv4 order."""
    t = F.col(text_col)
    cols = [F.col(id_col)]
    for pat, _, cnt in _ORDER:
        cols.append(F.regexp_count(t, F.lit(pat)).alias(cnt))
    return docs.select(*cols, scrub_text(t).alias("clean_text"))


def scrub_pii_sql(
    table: str = "documents", id_col: str = "doc_id", text_expr: str = "text"
) -> str:
    """DuckDB oracle for :func:`scrub_pii` — same patterns, same count
    semantics (independent, on the original text), same replacement
    order. ``text_expr`` lets callers scrub a derived expression (the
    driver query injects synthetic PII so the counts are non-trivial)."""
    counts = ", ".join(
        f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS INT) AS {cnt}"
        for pat, _, cnt in _ORDER
    )
    clean = text_expr
    for pat, repl, _ in _ORDER:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return f"SELECT {id_col}, {counts}, {clean} AS clean_text FROM {table}"
