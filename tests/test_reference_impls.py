"""Pure-Python reference implementations vs the Spark operators, over a
deterministic adversarial corpus (every length boundary, repeated
fragments, PII-ish strings). One Spark job per operator, row-by-row
equality against the independent reimplementation — the same oracle
discipline as the DuckDB SQL twins, from a second angle.
"""

import re

import numpy as np
import pytest

K, W, B, M = 8, 4, 257, 2_147_483_647


def _winnow_ref(text: str) -> list[int]:
    codes = [ord(c) for c in text]
    grams = []
    for i in range(len(codes) - K + 1):
        h = 0
        for c in codes[i : i + K]:
            h = (h * B + c) % M
        grams.append(h)
    if len(grams) >= W:
        sel = sorted({min(grams[p : p + W]) for p in range(len(grams) - W + 1)})
    elif grams:
        sel = [min(grams)]
    else:
        sel = []
    return sel


def _resize_ref(b: bytes, target: int = 32) -> bytes:
    if not b:
        return b""
    return bytes(b[(i * len(b)) // target] for i in range(target))


_SCRUB = [
    (re.compile(r"https?://[^ \t\n]+"), "<URL>"),
    (re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"), "<EMAIL>"),
    (re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"), "<IP>"),
]


def _scrub_ref(text: str) -> str:
    for pat, repl in _SCRUB:
        text = pat.sub(repl, text)
    return text


def _corpus() -> list[str]:
    rng = np.random.default_rng(31)
    alpha = list("abcdefgh THE the.,!?;: 0123456789@/:")
    out = []
    # every length through the winnow boundaries (0..K+W+2)
    for n in range(0, K + W + 3):
        out.append("".join(rng.choice(alpha, n)))
    # repeated fragments (minima collide), pii-ish, long randoms
    out += [
        "abcdefgh" * 5,
        "x" * 100,
        "see http://a.b/c?d=1 or mail a.b-c@d-e.fg now 1.2.3.4 end",
        "edge@case.c",  # TLD too short -> no match
        "999.999.999.999 10.0.0.256",  # \b digit runs still match by pattern
        "http://tab\tterminated and trailing http://end",
    ]
    for _ in range(40):
        out.append("".join(rng.choice(alpha, int(rng.integers(0, 400)))))
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [(i, t) for i, t in enumerate(_corpus())]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_winnow_matches_reference(corpus_df):
    from orc_format_spark.functions.text import winnow_fingerprints

    got = {
        r.doc_id: r.fingerprints_csv
        for r in winnow_fingerprints(corpus_df, k=K, window=W).collect()
    }
    for i, t in enumerate(_corpus()):
        want = ",".join(str(x) for x in _winnow_ref(t))
        assert got[i] == want, f"doc {i} ({t!r})"


def test_scrub_matches_reference_and_is_idempotent(corpus_df):
    from pyspark.sql import functions as F

    from orc_format_spark.functions.scrub import scrub_text

    out = corpus_df.select(
        "doc_id",
        scrub_text(F.col("text")).alias("once"),
        scrub_text(scrub_text(F.col("text"))).alias("twice"),
    ).collect()
    ref = {i: _scrub_ref(t) for i, t in enumerate(_corpus())}
    for r in out:
        assert r.once == ref[r.doc_id], f"doc {r.doc_id}"
        assert r.twice == r.once  # placeholders never re-match


def test_resize_matches_reference(corpus_df):
    from pyspark.sql import functions as F

    from orc_format_spark.functions.multimodal import resize_payload

    df = corpus_df.select("doc_id", F.col("text").cast("binary").alias("payload"))
    got = {int(r.doc_id): bytes(r.resized) for r in resize_payload(df, target=32).collect()}
    for i, t in enumerate(_corpus()):
        assert got[i] == _resize_ref(t.encode(), 32), f"doc {i}"
