"""Text analysis for training-data pipelines: token counting, language
identification, quality scoring, document fingerprinting.

Not present in the reference (it is a file-format writer; SURVEY.md §2.7)
— these are the document-pipeline operations a 10^12-sequence ingest needs
before/alongside encoding. Everything here is pure `pyspark.sql.functions`
expressions (JVM-side, whole-stage-codegen'd, zero Python in the hot
path), deliberately restricted to constructs with exact ANSI-SQL parity so
the DuckDB oracle reproduces results bit-for-bit:

- counts/lengths are integer arithmetic (exact in both engines);
- the only divisions are int/int in double (exact IEEE for |x| < 2^53);
- regexes use the portable subset (classes, +, |) valid in both Java
  regex and RE2.

At 100 TB these are embarrassingly parallel map-side projections: no
shuffle, filters push down to the parquet scan, and only the referenced
columns are read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# word-ish / digit / punctuation pieces: a cheap BPE-rate estimator
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

# marker -> language vote tables for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of "),
    "es": (" el ", " la ", " de "),
    "fr": (" le ", " la ", " et "),
    "de": (" der ", " und ", " die "),
}
_LANG_ORDER = ("en", "es", "fr", "de")  # deterministic tie-break priority


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token estimate: words + digits + punctuation marks."""
    return F.regexp_count(text, F.lit(BPE_PATTERN))


def occurrences(text: Column, marker: str) -> Column:
    """Non-overlapping occurrence count of a literal marker."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return {
        lang: sum((occurrences(padded, m) for m in ms), F.lit(0))
        for lang, ms in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Marker-vote language guess with deterministic tie-break."""
    s = lang_scores(text)
    expr = F.lit("und")
    # build the when-chain in priority order: first language whose score
    # is >= all others wins
    chain = None
    for lang in _LANG_ORDER:
        cond = F.lit(True)
        for other in _LANG_ORDER:
            if other != lang:
                cond = cond & (s[lang] >= s[other])
        cond = cond & (s[lang] > 0)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    return chain.otherwise(expr)


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length, punctuation density,
    stopword rate, mean word length."""
    n = F.length(text)
    toks = ws_token_count(text)
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    stops = occurrences(F.concat(F.lit(" "), text, F.lit(" ")), " the ")
    nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    safe_toks = F.greatest(toks, F.lit(1))
    len_term = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct / F.greatest(n, F.lit(1)) * 10.0, F.lit(1.0))
    stop_term = F.least(stops / safe_toks * 8.0, F.lit(1.0))
    wordlen_term = F.least(nonspace / safe_toks / F.lit(8.0), F.lit(1.0))
    return (
        F.lit(0.25) * len_term
        + F.lit(0.25) * punct_term
        + F.lit(0.25) * stop_term
        + F.lit(0.25) * wordlen_term
    )


def fingerprint(text: Column) -> Column:
    """Whitespace-normalized content hash (md5 hex) for exact dedup."""
    return F.md5(F.regexp_replace(F.lower(text), r"\s+", " ").cast("binary"))


def text_profile(docs: DataFrame) -> DataFrame:
    """One profiling row per document (the pipeline's per-doc features)."""
    t = F.col("text")
    return docs.select(
        "doc_id",
        ws_token_count(t).alias("ws_tokens"),
        bpe_token_count(t).alias("bpe_tokens"),
        F.length(t).alias("n_chars"),
        lang_id(t).alias("lang_guess"),
        # floor-scaled to integer micro-units: identical IEEE evaluation
        # order on both engines -> identical integers (round() differs
        # between Spark's BigDecimal path and DuckDB's double path)
        F.floor(quality_score(t) * F.lit(1000000.0)).cast("long").alias("quality_e6"),
        fingerprint(t).alias("fingerprint"),
    )


# ---------------------------------------------------------------- oracles


def occurrences_sql(expr: str, marker: str) -> str:
    m = marker.replace("'", "''")
    return (
        f"CAST((length({expr}) - length(replace({expr}, '{m}', ''))) / {len(marker)} AS BIGINT)"
    )


def lang_id_sql(col: str = "text") -> str:
    padded = f"(' ' || {col} || ' ')"
    scores = {
        lang: "(" + " + ".join(occurrences_sql(padded, m) for m in ms) + ")"
        for lang, ms in LANG_MARKERS.items()
    }
    whens = []
    for lang in _LANG_ORDER:
        conds = [
            f"{scores[lang]} >= {scores[o]}" for o in _LANG_ORDER if o != lang
        ]
        conds.append(f"{scores[lang]} > 0")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


def quality_e6_sql() -> str:
    """DuckDB expression mirroring floor(quality_score(text)*1e6) with the
    exact same IEEE evaluation order as the Column version."""
    ws = (
        "CASE WHEN length(trim(text)) = 0 THEN 0 "
        "ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END"
    )
    punct = "(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))"
    stops = occurrences_sql("(' ' || text || ' ')", " the ")
    nonspace = "length(regexp_replace(text, '\\s', '', 'g'))"
    safe_toks = f"greatest(({ws}), 1)"
    quality = (
        f"0.25 * least(length(text) / 500.0, 1.0) "
        f"+ 0.25 * (1.0 - least({punct} / greatest(length(text), 1) * 10.0, 1.0)) "
        f"+ 0.25 * least({stops} / {safe_toks} * 8.0, 1.0) "
        f"+ 0.25 * least({nonspace} / {safe_toks} / 8.0, 1.0)"
    )
    return f"CAST(floor(({quality}) * 1000000.0) AS BIGINT)"


def text_profile_sql(table: str = "documents") -> str:
    ws = (
        "CASE WHEN length(trim(text)) = 0 THEN 0 "
        "ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END"
    )
    bpe = f"length(regexp_extract_all(text, '{BPE_PATTERN}'))"
    punct = "(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))"
    stops = occurrences_sql("(' ' || text || ' ')", " the ")
    nonspace = "length(regexp_replace(text, '\\s', '', 'g'))"
    toks = f"({ws})"
    safe_toks = f"greatest({toks}, 1)"
    # NOTE: operand order matches functions above token-for-token so both
    # engines evaluate the same IEEE double chain
    quality = (
        f"0.25 * least(length(text) / 500.0, 1.0) "
        f"+ 0.25 * (1.0 - least({punct} / greatest(length(text), 1) * 10.0, 1.0)) "
        f"+ 0.25 * least({stops} / {safe_toks} * 8.0, 1.0) "
        f"+ 0.25 * least({nonspace} / {safe_toks} / 8.0, 1.0)"
    )
    fp = "md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    return (
        f"SELECT doc_id, CAST({ws} AS INT) AS ws_tokens, "
        f"CAST({bpe} AS INT) AS bpe_tokens, "
        f"CAST(length(text) AS INT) AS n_chars, "
        f"{lang_id_sql()} AS lang_guess, "
        f"CAST(floor(({quality}) * 1000000.0) AS BIGINT) AS quality_e6, "
        f"{fp} AS fingerprint "
        f"FROM {table}"
    )
