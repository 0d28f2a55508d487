"""End-to-end Spark tests: tokenize -> salted group -> encode -> decode ->
detokenize must reproduce the input bit-identically (SURVEY.md section
5.2, test 3)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from orc_format_spark import (
    column_statistics,
    decode_blobs,
    detokenize,
    encode_groups,
    job_metrics,
    run_encode_job,
    tokenize_documents,
    verify_blobs,
    with_group_id,
    TOKENS_SCHEMA,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_tokenize_detokenize_identity(spark, docs):
    toks = tokenize_documents(docs)
    back = detokenize(toks)
    orig = docs.select(F.col("doc_id").cast("string"), "text")
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0
    row = toks.agg(F.sum("n_tok").alias("t")).first()
    assert row.t == docs.agg(F.sum(F.octet_length("text"))).first()[0]


def test_tokens_roundtrip_through_blobs(spark, docs):
    toks = tokenize_documents(docs)
    blobs = encode_groups(toks, num_groups=4, key_col="doc_id", size_col="n_tok")
    blobs.cache()
    assert blobs.count() <= 4
    decoded = decode_blobs(blobs, TOKENS_SCHEMA)
    orig = toks.select("doc_id", "tokens", "n_tok", "source")
    assert decoded.exceptAll(orig).count() == 0
    assert orig.exceptAll(decoded).count() == 0
    ok = verify_blobs(blobs).agg(F.min("ok")).first()[0]
    assert ok is True
    m = job_metrics(blobs).first()
    assert m.n_rows == docs.count()
    assert m.output_bytes < m.input_bytes  # text must actually compress
    blobs.unpersist()


def test_lineitem_roundtrip_mixed_types(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    cols = "l_orderkey l_partkey l_quantity l_returnflag l_shipdate".split()
    df = li.select(cols)
    blobs = encode_groups(df, num_groups=3, key_col="l_orderkey")
    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes)
    decoded = decode_blobs(blobs, schema)
    assert decoded.exceptAll(df).count() == 0
    assert df.exceptAll(decoded).count() == 0


def test_with_group_id_deterministic_and_skew_aware(spark, docs):
    toks = tokenize_documents(docs)
    g1 = with_group_id(toks, 16).select("doc_id", "group_id")
    g2 = with_group_id(toks, 16).select("doc_id", "group_id")
    assert g1.exceptAll(g2).count() == 0
    per_group = (
        with_group_id(toks, 8)
        .groupBy("group_id")
        .agg(F.sum("n_tok").alias("t"))
        .select("t")
        .collect()
    )
    sizes = np.array([r.t for r in per_group], float)
    assert sizes.max() / sizes.mean() < 3.0  # no pathological group


def test_run_encode_job_resume(spark, docs, tmp_path):
    toks = tokenize_documents(docs)
    out = str(tmp_path / "job1")
    blobs1 = run_encode_job(
        spark, toks, out, num_groups=6, waves=3, tokens_per_group=50_000
    )
    n1 = blobs1.count()
    assert n1 <= 6
    assert set(r.wave for r in blobs1.select("wave").distinct().collect()) == {0, 1, 2}
    # resume: nothing left to do, blobs unchanged
    blobs2 = run_encode_job(spark, toks, out, num_groups=6, waves=3)
    assert blobs2.count() == n1
    # simulate partial failure: drop state for wave 2, rerun appends nothing new
    decoded = decode_blobs(blobs1, TOKENS_SCHEMA)
    orig = toks.select("doc_id", "tokens", "n_tok", "source")
    assert decoded.exceptAll(orig).count() == 0


def test_column_statistics_matches_sql(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    st = column_statistics(li, ["l_orderkey", "l_quantity", "l_returnflag"])
    rows = {r.column: r for r in st.collect()}
    exp = li.agg(
        F.count(F.lit(1)),
        F.min("l_orderkey"),
        F.max("l_orderkey"),
        F.sum("l_orderkey"),
        F.min("l_quantity"),
        F.sum(F.octet_length("l_returnflag")),
    ).first()
    assert rows["l_orderkey"].n_values == exp[0]
    assert rows["l_orderkey"].min_long == exp[1]
    assert rows["l_orderkey"].max_long == exp[2]
    assert rows["l_orderkey"].sum_long == exp[3]
    assert rows["l_quantity"].min_double == exp[4]
    assert rows["l_returnflag"].sum_lengths == exp[5]


def test_encode_groups_staged_matches_direct(spark, docs, tmp_path):
    """The staged (JVM-shuffle -> partitioned parquet -> pyarrow) grouped
    encode must produce the same per-group checksums as the direct
    applyInArrow path — identical grouping, ordering, and codec choices."""
    from orc_format_spark import encode_groups_staged

    toks = tokenize_documents(docs)
    direct = {
        r.group_id: r.checksum
        for r in encode_groups(
            toks, num_groups=6, key_col="doc_id", size_col="n_tok"
        ).collect()
    }
    staged = {
        r.group_id: r.checksum
        for r in encode_groups_staged(
            toks, str(tmp_path / "stage"), num_groups=6,
            key_col="doc_id", size_col="n_tok",
        ).collect()
    }
    assert staged == direct


def test_read_encoded_roundtrip(spark, tmp_path):
    """write (run_encode_job) -> read_encoded: the user-facing façade."""
    from orc_format_spark import (
        TOKENS_SCHEMA,
        read_encoded,
        read_metrics,
        run_encode_job,
        tokenize_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = tokenize_documents(docs)
    out = str(tmp_path / "job")
    run_encode_job(spark, toks, out, num_groups=6, waves=2)
    back = read_encoded(spark, out, TOKENS_SCHEMA)
    assert back.count() == docs.count()
    pruned = read_encoded(spark, out, "doc_id string, n_tok int",
                          columns=["doc_id", "n_tok"])
    assert pruned.columns == ["doc_id", "n_tok"]
    assert pruned.count() == docs.count()
    m = read_metrics(spark, out)
    assert "blob" not in m.columns and m.count() >= 1


def test_run_encode_job_cross_version_resume_raises(spark, docs, tmp_path, monkeypatch):
    """A wave-resumed job must finish on the engine version it started
    with (blob byte-identity, job.py module docstring); a resume under a
    different ENCODER_VERSION raises up front."""
    import orc_format_spark.operators.job as job_mod

    toks = tokenize_documents(docs)
    out = str(tmp_path / "jobv")
    run_encode_job(spark, toks, out, num_groups=4, waves=2, tokens_per_group=50_000)
    monkeypatch.setattr(job_mod, "ENCODER_VERSION", "99.0-test")
    with pytest.raises(RuntimeError, match="engine version"):
        run_encode_job(spark, toks, out, num_groups=4, waves=2)


def test_run_encode_job_changed_params_resume_raises(spark, docs, tmp_path):
    """A resume that changes group->wave membership (different waves= or
    num_groups=) would skip done waves computed under the OLD membership
    — wrong data, so it must refuse up front. Same-params resume (the
    test above this guard was added for) stays a clean no-op."""
    toks = tokenize_documents(docs)
    out = str(tmp_path / "jobp")
    run_encode_job(spark, toks, out, num_groups=4, waves=2, tokens_per_group=50_000)
    with pytest.raises(RuntimeError, match="different job parameters"):
        run_encode_job(spark, toks, out, num_groups=4, waves=4)
    with pytest.raises(RuntimeError, match="different job parameters"):
        run_encode_job(spark, toks, out, num_groups=6, waves=2)
    with pytest.raises(RuntimeError, match="different job parameters"):
        run_encode_job(spark, toks, out, num_groups=4, waves=2, codec="rle_v1")


def test_heavy_threshold_widens_sample_instead_of_full_scan(spark):
    """Degenerate 1/128 hash sample: the estimator widens geometrically
    (RuntimeWarning per halving) instead of silently jumping to a
    full-table quantile pass; an empty input raises, not IndexError."""
    import warnings

    from orc_format_spark.operators.partitioning import heavy_threshold_estimate

    tiny = spark.createDataFrame(
        [(f"doc{i}", 10 * (i + 1)) for i in range(3)], "doc_id string, n_tok int"
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        thr = heavy_threshold_estimate(tiny, "n_tok", "doc_id")
    assert thr in (10.0, 20.0, 30.0)
    widen = [w for w in rec if issubclass(w.category, RuntimeWarning)]
    assert widen, "expected explicit widening warnings on a degenerate sample"
    empty = tiny.filter("n_tok < 0")
    with pytest.raises(ValueError, match="no non-null"):
        heavy_threshold_estimate(empty, "n_tok", "doc_id")


def test_dedup_keep_first_no_payload_window_sort(spark, docs):
    """dedup_keep_first: correct results AND the cheap 100 TB plan — a
    narrow min-aggregate + semi-join, no row_number Window sorting the
    document payload through shuffle buffers."""
    from orc_format_spark.functions.dedup import dedup_keep_first

    dupes = docs.select("doc_id", "text").union(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text").filter(
            "doc_id % 5 = 0"
        )
    )
    out = dedup_keep_first(dupes)
    assert out.count() == docs.count()
    # every kept row is the minimum doc_id of its content group
    assert out.filter(F.col("doc_id") >= 1_000_000).count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "payload must not pass through a window sort"


def test_char_varchar_roundtrip(spark):
    """Reference-type parity for Schema::Char(n)/VarChar(n)
    (schema.rs:17-18): the reference's data writer treats both exactly
    as String (data.rs:63 — same DATA+LENGTH streams; only the footer
    type kind differs), and Spark likewise surfaces char/varchar columns
    to Arrow as (padded) strings. The container therefore roundtrips
    them as string payloads, and decode accepts char(n)/varchar(n) DDL."""
    from orc_format_spark import decode_blobs, encode_groups

    df = spark.sql(
        "SELECT id, CAST(concat('c', id) AS CHAR(8)) AS c8, "
        "CAST(concat('v', id) AS VARCHAR(12)) AS v12 "
        "FROM range(200)"
    )
    blobs = encode_groups(df, num_groups=2, key_col="id")
    out = decode_blobs(blobs, "id bigint, c8 char(8), v12 varchar(12)")
    got = {r.id: (r.c8, r.v12) for r in out.collect()}
    want = {r.id: (r.c8, r.v12) for r in df.collect()}
    assert got == want
    # whatever value representation Spark produced for the char cast
    # (padded or not, version-dependent) survives the container exactly
    assert got[7] == want[7]


def test_run_encode_job_blob_sink(spark, docs, tmp_path):
    """Sink-mode job: waves carry blob_path lineage, the blobstore holds
    deterministic group files, read_encoded decodes through them, resume
    re-runs nothing, and the result matches the inline-blob layout."""
    import os

    from orc_format_spark import (
        TOKENS_SCHEMA,
        read_encoded,
        read_metrics,
        run_encode_job,
        tokenize_documents,
    )

    toks = tokenize_documents(docs)
    out = str(tmp_path / "job_sink")
    blobs = run_encode_job(
        spark, toks, out, num_groups=6, waves=3, blob_sink=True
    )
    assert "blob_path" in blobs.columns and "blob" not in blobs.columns
    store = sorted(os.listdir(f"{out}/blobstore"))
    assert store == [f"group-{g:08d}.ofs" for g in range(6)]
    decoded = read_encoded(spark, out, TOKENS_SCHEMA)
    orig = detokenize(decoded).select("doc_id", "text").collect()
    assert sorted(str(r.doc_id) for r in orig) == sorted(
        str(r.doc_id) for r in docs.collect()
    )
    assert read_metrics(spark, out).count() == 6
    # resume: nothing re-runs, blobstore untouched (same mtimes)
    mt = {f: os.path.getmtime(f"{out}/blobstore/{f}") for f in store}
    run_encode_job(spark, toks, out, num_groups=6, waves=3, blob_sink=True)
    assert {f: os.path.getmtime(f"{out}/blobstore/{f}") for f in store} == mt
    # byte parity with the inline layout
    out2 = str(tmp_path / "job_inline")
    inline = run_encode_job(spark, toks, out2, num_groups=6, waves=3)
    by_gid = {r.group_id: r.blob for r in inline.collect()}
    for r in blobs.collect():
        with open(r.blob_path, "rb") as f:
            assert f.read() == by_gid[r.group_id]


def test_encode_groups_compressed_shuffle_matches_rows(spark, docs, monkeypatch):
    """shuffle="compressed" (map-side chunklet encode -> compressed-byte
    exchange -> merge/re-sort/re-encode) must emit byte-identical blobs
    and lineage to the row-shuffle path. The flush threshold is forced
    tiny so every group really merges multiple chunklets."""
    from orc_format_spark.operators import encode as enc_mod

    monkeypatch.setattr(enc_mod, "_CHUNKLET_FLUSH_BYTES", 64 * 1024)
    toks = tokenize_documents(docs).repartition(8)
    by_rows = {
        r.group_id: (bytes(r.blob), r.checksum, r.lineage)
        for r in encode_groups(
            toks, num_groups=6, key_col="doc_id", size_col="n_tok"
        ).collect()
    }
    by_comp = {
        r.group_id: (bytes(r.blob), r.checksum, r.lineage)
        for r in encode_groups(
            toks, num_groups=6, key_col="doc_id", size_col="n_tok",
            shuffle="compressed",
        ).collect()
    }
    assert by_comp == by_rows


def test_encode_groups_compressed_shuffle_mixed_types(spark):
    """Compressed-shuffle parity on a mixed-type table (ints, doubles,
    strings, dates) — the chunklet roundtrip must be lossless for every
    column writer, not just token arrays."""
    li = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(
            "l_orderkey", "l_partkey", "l_quantity", "l_returnflag",
            "l_shipdate",
        )
        .withColumn(
            "rid", F.monotonically_increasing_id()
        )
        .repartition(5)
    )
    a = {
        r.group_id: (bytes(r.blob), r.lineage)
        for r in encode_groups(li, num_groups=3, key_col="rid").collect()
    }
    b = {
        r.group_id: (bytes(r.blob), r.lineage)
        for r in encode_groups(
            li, num_groups=3, key_col="rid", shuffle="compressed"
        ).collect()
    }
    assert a == b


def test_cluster_by_shrinks_blobs_and_roundtrips(spark):
    """cluster_by orders each group's rows before encoding: decoded
    multiset unchanged, compressed size strictly smaller on run-friendly
    data, and the rows/compressed shuffle strategies stay byte-identical
    under clustering."""
    from orc_format_spark import decode_blobs

    # sf0.01: at ~600 rows/group the orderkey delta structure still wins;
    # the date-clustering payoff needs runs longer than a tiny group
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_shipdate"
    )
    plain = encode_groups(li, num_groups=2, key_col="l_orderkey").collect()
    clus = encode_groups(
        li, num_groups=2, key_col="l_orderkey", cluster_by=["l_shipdate"]
    ).collect()
    assert sum(len(r.blob) for r in clus) < sum(len(r.blob) for r in plain)
    schema = ", ".join(f"{c} {t}" for c, t in li.dtypes)
    blobs = encode_groups(
        li, num_groups=2, key_col="l_orderkey", cluster_by=["l_shipdate"]
    )
    back = decode_blobs(blobs, schema)
    a = sorted(map(tuple, li.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    comp = {
        r.group_id: (bytes(r.blob), r.checksum)
        for r in encode_groups(
            li, num_groups=2, key_col="l_orderkey",
            cluster_by=["l_shipdate"], shuffle="compressed",
        ).collect()
    }
    assert comp == {r.group_id: (bytes(r.blob), r.checksum) for r in clus}


def test_decode_schema_mismatch_is_loud(spark, docs):
    """Declaring a decode schema whose names don't match the blob's
    stored columns raises a clear ValueError in the worker — never a
    JVM ArrayIndexOutOfBounds (encode_groups consumes the grouping
    column, so off-by-one schemas are an easy mistake)."""
    toks = tokenize_documents(docs.limit(50))
    blobs = encode_groups(toks, num_groups=2, key_col="doc_id")
    bad = decode_blobs(blobs, "group_id int, " + TOKENS_SCHEMA)
    with pytest.raises(Exception, match="decode schema mismatch"):
        bad.count()


def test_ddl_names_nested_types():
    from orc_format_spark.operators.encode import _ddl_names

    assert _ddl_names(
        "`a` array<int>, b struct<x:int,y:string>, c map<string,int>, "
        "d decimal(20,2), e string"
    ) == ["a", "b", "c", "d", "e"]


def test_suggest_cluster_by_picks_measured_winner(spark):
    """The advisor encodes the sample under each candidate ordering and
    returns the measured winner — l_shipdate beats key order on
    lineitem, l_suppkey loses to it (verified offline at full scale)."""
    from orc_format_spark.operators.partitioning import suggest_cluster_by

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_shipdate"
    )
    out = suggest_cluster_by(
        li,
        key_col="l_orderkey",
        candidates=["l_shipdate", "l_suppkey"],
        sample_rows=60_000,  # full table: deterministic verdict
    )
    assert out["cluster_by"] == ["l_shipdate"]
    assert out["bytes"]["l_shipdate"] < out["bytes"]["l_orderkey"]
    assert out["bytes"]["l_suppkey"] > out["bytes"]["l_shipdate"]
    # a genuine hash sample (not the full table) still runs end to end
    sampled = suggest_cluster_by(
        li, key_col="l_orderkey", candidates=["l_shipdate"], sample_rows=2_000
    )
    assert 0 < sampled["sample_rows"] < 60_000
    with pytest.raises(ValueError, match="empty input"):
        suggest_cluster_by(li.filter("l_orderkey < 0"), key_col="l_orderkey")


def test_run_encode_job_cluster_by_resume_stable(spark, tmp_path):
    """cluster_by participates in the job's determinism contract: a
    resumed run reproduces the same blob bytes, and decode returns the
    same multiset as the input."""
    from orc_format_spark import read_encoded

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_shipdate"
    )
    out = str(tmp_path / "jobc")
    b1 = run_encode_job(
        spark, li, out, num_groups=4, waves=2, size_col=None,
        key_col="l_orderkey", cluster_by=["l_shipdate"],
    )
    sums1 = {r.group_id: r.checksum for r in b1.collect()}
    b2 = run_encode_job(  # resume: nothing to do, same checksums
        spark, li, out, num_groups=4, waves=2, size_col=None,
        key_col="l_orderkey", cluster_by=["l_shipdate"],
    )
    assert {r.group_id: r.checksum for r in b2.collect()} == sums1
    back = read_encoded(
        spark, out, "l_orderkey bigint, l_partkey bigint, l_shipdate timestamp_ntz"
    )
    assert back.exceptAll(li).count() == 0 and li.exceptAll(back).count() == 0


def test_stats_prune_blobs(spark):
    """Stripe elimination: blob-level stats written by stats=True let
    prune_blobs drop whole blobs JVM-side; a predicate decode over the
    pruned set equals the unpruned filter exactly, an impossible
    predicate eliminates every blob, and pruning never changes results
    (unknown stats are kept, residual filter is exact)."""
    import datetime

    from pyspark.sql import functions as F

    from orc_format_spark import decode_blobs, encode_groups, prune_blobs

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    g = li.withColumn("group_id", F.floor(F.col("l_orderkey") / F.lit(200)))
    blobs = encode_groups(g, key_col="l_orderkey", stats=True).cache()
    total = blobs.count()
    assert total == 8
    kept = prune_blobs(blobs, ("l_orderkey", ">=", 1200))
    assert kept.count() == 2  # ranges [1200,1400) and [1400,1499]
    sch = "l_orderkey bigint, l_quantity double, l_shipdate timestamp_ntz"
    got = decode_blobs(blobs, sch, predicate=("l_orderkey", ">=", 1200))
    want = li.filter("l_orderkey >= 1200")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # temporal conjunct before the data's min date: provably empty,
    # every blob eliminated before any decode
    early = datetime.datetime(1990, 1, 1)
    assert prune_blobs(blobs, ("l_shipdate", "<", early)).count() == 0
    assert decode_blobs(blobs, sch, predicate=("l_shipdate", "<", early)).count() == 0
    # stats-less blobs: prune_blobs refuses loudly, predicate decode
    # still works (chunk-level + residual only)
    plain = encode_groups(g, key_col="l_orderkey")
    with pytest.raises(ValueError, match="no 'stats' column"):
        prune_blobs(plain, ("l_orderkey", ">=", 1200))
    assert (
        decode_blobs(plain, sch, predicate=("l_orderkey", ">=", 1200)).count()
        == want.count()
    )
    blobs.unpersist()


def test_prune_blobs_jvm_matches_python(spark):
    """The JVM-expression prune path keeps exactly the blobs the Python
    _chunk_may_match evaluator keeps, across value domains (int range,
    float, string, temporal, missing column, all-null column), and its
    plan carries no Python stage. == predicates route to the UDF (Bloom
    power) by design."""
    import datetime

    from pyspark.sql import functions as F

    from orc_format_spark import encode_groups, prune_blobs

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey",
        "l_quantity",
        "l_returnflag",
        "l_shipdate",
        F.lit(None).cast("bigint").alias("nullcol"),
        # fractional bounds: int predicates against these must compare
        # in the double domain — decimal(38,0) try_cast ROUNDS "1.6"
        # to 2 and would wrongly prune strict boundaries like "< 2"
        (F.col("l_quantity") + F.lit(0.6)).alias("fracq"),
    )
    g = li.withColumn("group_id", F.floor(F.col("l_orderkey") / F.lit(200)))
    blobs = encode_groups(g, key_col="l_orderkey", stats=True).cache()
    cases = [
        ("l_orderkey", ">=", 1200),
        ("l_orderkey", "<", 200),
        ("l_orderkey", "<=", 0),
        ("l_orderkey", ">", 1498),
        ("l_orderkey", "!=", 5),
        ("l_quantity", ">=", 30.0),
        ("l_quantity", "<", -1.0),
        ("l_returnflag", ">=", "R"),
        ("l_returnflag", "<", "A"),
        ("l_shipdate", "<", datetime.datetime(1996, 1, 1)),
        ("l_shipdate", ">=", datetime.datetime(2002, 1, 1)),
        ("l_shipdate", "<", datetime.date(1996, 1, 1)),  # cross-domain: keep
        ("no_such_col", ">=", 5),  # unknown column: keep
        ("nullcol", ">=", 5),  # all-null blobs: drop everywhere
        # int predicate vs fractional float bounds (stats lo ~1.6):
        # "< 2" must keep (1.6 < 2) even though round("1.6")==2
        ("fracq", "<", 2),
        ("fracq", "<=", 1),
        ("fracq", ">", 50),
        ("fracq", ">=", 51),
        ("fracq", "!=", 3),
        [("l_orderkey", ">=", 600), ("l_quantity", "<=", 10.0)],  # AND list
    ]
    for pred in cases:
        jvm = prune_blobs(blobs, pred)
        plan = jvm._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan, f"python stage leaked: {pred}"
        got = {r.group_id for r in jvm.select("group_id").collect()}
        want = {
            r.group_id
            for r in prune_blobs(blobs, pred, force_python=True)
            .select("group_id")
            .collect()
        }
        assert got == want, f"JVM/Python prune disagree for {pred}: {got} vs {want}"
    # == stays on the UDF path so Bloom bitsets participate
    eq = prune_blobs(blobs, ("l_orderkey", "==", 7))
    assert "ArrowEvalPython" in eq._jdf.queryExecution().executedPlan().toString()
    blobs.unpersist()


def test_prune_keep_condition_fuzz(spark):
    """Randomized JVM-vs-Python prune parity over writer-shaped stats
    JSON: per trial a fixed column typing (the real-blob invariant —
    every blob of one table shares column types), 200 random stats rows
    (bounds / [null,null] / missing), and typed range predicates.
    Predicates are usually typed to the column but sometimes CROSS-typed
    (a str value against numeric bounds etc.) — the Python evaluator
    keeps on TypeError and the JVM expression must never lexicographic-
    compare across domains into a wrong prune.
    Invariants: the JVM keep set is a SUPERSET of the Python keep set
    (the expression path may wrongly keep, never wrongly prune — the
    residual decode filter is exact), and the two sets are EQUAL when
    every conjunct value is a string, a temporal, or an int within the
    double-exact domain (|v| <= 2^53); only float values and ints past
    2^53 retain the deliberate widen-only slack."""
    import datetime
    import json

    from orc_format_spark import prune_blobs

    rng = np.random.default_rng(47)
    I64 = 2**62

    def bound(domain):
        if domain == "int":
            return int(
                rng.choice(
                    [
                        int(rng.integers(-25, 26)),
                        int(rng.integers(-I64, I64)),
                        2**53 + int(rng.integers(0, 9)),
                    ]
                )
            )
        if domain == "float":
            k = int(rng.integers(-25, 26))
            return float(
                rng.choice([k + 0.6, k + 0.5, float(k), k * 1e12 + 0.25])
            )
        if domain == "str":
            return f"s{int(rng.integers(0, 10))}"
        base = datetime.datetime(2020, 1, 1) + datetime.timedelta(
            hours=int(rng.integers(0, 500))
        )
        return base

    def value(domain):
        if domain in ("int", "float"):
            # int vs float predicates are BOTH well-typed on a numeric
            # column; near-boundary ints exercise the rounding trap
            if rng.random() < 0.6:
                return int(
                    rng.choice(
                        [int(rng.integers(-25, 26)), 2**53 + 4, -(2**60)]
                    )
                )
            return float(int(rng.integers(-25, 26)) + 0.5)
        if domain == "str":
            return f"s{int(rng.integers(0, 10))}"
        v = bound("dt")
        return v.date() if rng.random() < 0.3 else v

    OPS = ["!=", "<", "<=", ">", ">="]
    for trial in range(12):
        domains = {
            c: str(rng.choice(["int", "float", "str", "dt"]))
            for c in ("a", "b", "c")
        }
        rows = []
        for i in range(200):
            d = {}
            for col, dom in domains.items():
                r = rng.random()
                if r < 0.10:
                    continue  # column missing from this blob's stats
                if r < 0.20:
                    d[col] = [None, None]  # all-null column
                    continue
                lo, hi = sorted((bound(dom), bound(dom)))
                if dom == "dt":
                    d[col] = {"t": "iso", "lo": lo.isoformat(), "hi": hi.isoformat()}
                else:
                    d[col] = [lo, hi]
            rows.append((i, json.dumps(d, sort_keys=True)))
        rows.append((990, None))  # null stats: always kept
        df = spark.createDataFrame(rows, "group_id long, stats string")
        parsed = {i: (json.loads(s) if s is not None else None) for i, s in rows}
        for _ in range(4):
            preds = []
            for _ in range(int(rng.integers(1, 3))):
                col = str(rng.choice(["a", "b", "c", "zz"]))
                dom = domains.get(col, "int")
                if rng.random() < 0.2:  # cross-typed predicate
                    dom = str(rng.choice(["int", "float", "str", "dt"]))
                preds.append((col, str(rng.choice(OPS)), value(dom)))
            jvm = {r.group_id for r in prune_blobs(df, preds).collect()}
            py = {
                r.group_id
                for r in prune_blobs(df, preds, force_python=True).collect()
            }
            assert jvm >= py, (
                f"JVM wrongly pruned {py - jvm} for {preds} "
                f"(trial {trial}, domains {domains})"
            )
            exact = all(
                isinstance(v, (str, datetime.date, datetime.datetime))
                or (
                    isinstance(v, int)
                    and not isinstance(v, bool)
                    and abs(v) <= 2**53
                )
                for _, _, v in preds
            )
            if exact:
                assert jvm == py, (
                    f"JVM over-kept {jvm - py} in the exact domain for "
                    f"{preds} (trial {trial}, domains {domains})"
                )


def test_ddl_names_backticked_with_spaces():
    """Backtick-quoted field names containing spaces must not truncate
    at the first space (a plain .split()[0] turned '`my col` int' into
    'my' and raised a spurious decode schema mismatch)."""
    from orc_format_spark.operators.encode import _ddl_names

    assert _ddl_names("`my col` int, x long") == ["my col", "x"]
    assert _ddl_names(
        "a struct<b: int, c: decimal(10,2)>, `w s` string"
    ) == ["a", "w s"]


def test_decode_type_mismatch_is_loud(spark):
    """Declaring the wrong TYPE (not just wrong names) raises a clear
    ValueError naming column/stored/declared — cross-kind declarations
    like date-for-timestamp must never silently truncate or surface as
    a JVM accessor UnsupportedOperationException."""
    from orc_format_spark import decode_blobs

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    )
    blobs = encode_groups(li, num_groups=1, key_col="l_orderkey")
    with pytest.raises(Exception, match="decode schema mismatch.*l_shipdate"):
        decode_blobs(blobs, "l_orderkey bigint, l_shipdate date").count()
    # in-kind width change is a lossless cast, not an error
    ok = decode_blobs(blobs, "l_orderkey int, l_shipdate timestamp_ntz")
    assert ok.count() == li.count()


def test_char_varchar_roundtrip(spark):
    """Char(n)/VarChar(n) map to the string path (the reference treats
    them the same way, writer.rs: String branch): Spark surfaces both
    as padded/plain strings in Arrow, the container encodes them as
    string columns, and the decoded values — including CHAR's trailing
    pad — roundtrip exactly."""
    from orc_format_spark import decode_blobs

    df = spark.sql(
        """
        SELECT id,
               CAST(concat('c', id % 7) AS CHAR(6)) AS c_fixed,
               CAST(concat('v', repeat('x', CAST(id % 5 AS INT))) AS VARCHAR(12)) AS v_var
        FROM range(500)
        """
    )
    blobs = encode_groups(df, num_groups=2, key_col="id")
    back = decode_blobs(blobs, "id bigint, c_fixed string, v_var string")
    want = sorted(map(tuple, df.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want
    # Spark's cast treats char/varchar as string (CharVarcharUtils
    # warning; no pad) — whatever bytes Spark produces, the container
    # must return them unchanged, which `got == want` above pins.
    assert dict(back.dtypes)["c_fixed"] == "string"


def test_dedup_keep_first_null_text_not_merged(spark):
    """md5(NULL) is NULL and groupBy merges NULLs: without the sentinel
    key, every NULL-text doc except one would be silently dropped as a
    'duplicate'. NULL content is not equal content — all survive."""
    from orc_format_spark.functions.dedup import dedup_keep_first

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "same"), (4, "same"), (5, None)],
        "doc_id long, text string",
    )
    out = dedup_keep_first(df)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 3, 5]


def test_decode_blobs_nested_projection(spark):
    """Dotted columns= through the Spark-level decode: declare the
    pruned struct shape in the DDL schema; pruned siblings never
    decode."""
    from orc_format_spark import decode_blobs, encode_groups

    rows = [(i, {"a": i, "inner": {"x": i * 2, "y": f"y{i}"}})
            for i in range(1000)]
    df = spark.createDataFrame(
        rows, "k long, s struct<a:long, inner:struct<x:long, y:string>>"
    )
    blobs = encode_groups(
        df.withColumn("group_id", (df.k / 250).cast("long")), key_col="k"
    )
    out = decode_blobs(
        blobs, "s struct<inner:struct<y:string>>, k bigint",
        columns=["s.inner.y", "k"],
    )
    got = sorted((r.k, r.s.inner.y) for r in out.collect())
    assert got == [(i, f"y{i}") for i in range(1000)]


def test_decode_blobs_nested_projection_evolution(spark):
    """Dotted projection composes with evolution=True: the top-level
    column resolves the shadow/keep logic, the sub-struct pruning
    happens in decode_table, and a declared-but-unstored scalar still
    null-fills alongside."""
    from orc_format_spark import decode_blobs, encode_groups

    rows = [(i, {"a": i, "inner": {"x": i * 2, "y": f"y{i}"}})
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "k long, s struct<a:long, inner:struct<x:long, y:string>>"
    )
    blobs = encode_groups(
        df.withColumn("group_id", (df.k / 50).cast("long")), key_col="k"
    )
    out = decode_blobs(
        blobs, "s struct<inner:struct<y:string>>, k bigint, extra int",
        columns=["s.inner.y", "k", "extra"], evolution=True,
    )
    got = sorted((r.k, r.s.inner.y, r.extra) for r in out.collect())
    assert got == [(i, f"y{i}", None) for i in range(200)]
