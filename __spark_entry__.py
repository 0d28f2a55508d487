"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship: tokenize sf0.001 documents -> salted grouping ->
              auto-codec encode -> per-blob decode verification; returns
              the blob/lineage table with a per-group roundtrip `ok` flag.
``queries`` — one entry per implemented operator family (SURVEY.md §2):
              every codec is exercised as encode->decode roundtrip whose
              oracle is simply the original data (lossless identity), plus
              the statistics aggregators with explicit SQL oracles.
``oracle_sql`` — DuckDB-runnable ANSI SQL equivalents.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _roundtrip(df: DataFrame, key_col: str, codec: str = "auto", num_groups: int = 4) -> DataFrame:
    from orc_format_spark import decode_blobs, encode_groups

    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes)
    blobs = encode_groups(df, num_groups=num_groups, codec=codec, key_col=key_col)
    return decode_blobs(blobs, schema)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: tokens pipeline + verification."""
    from orc_format_spark import encode_groups, tokenize_documents, verify_blobs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = tokenize_documents(docs)
    blobs = encode_groups(
        toks, num_groups=8, codec="auto", key_col="doc_id", size_col="n_tok"
    )
    ver = verify_blobs(blobs).select("group_id", "ok")
    return (
        blobs.join(ver, "group_id")
        .select(
            "group_id",
            "n_rows",
            "n_values",
            "input_bytes",
            "output_bytes",
            "checksum",
            "codecs",
            "ok",
        )
        .orderBy("group_id")
    )


# --------------------------------------------------------------- queries


def q_tokens_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tokenize -> encode(auto) -> decode -> detokenize == original text."""
    from orc_format_spark import (
        TOKENS_SCHEMA,
        decode_blobs,
        detokenize,
        encode_groups,
        tokenize_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokenize_documents(docs)
    blobs = encode_groups(toks, num_groups=8, key_col="doc_id", size_col="n_tok")
    decoded = decode_blobs(blobs, TOKENS_SCHEMA)
    return detokenize(decoded).select("doc_id", "text")


def q_rle_v1_roundtrip(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"
    )
    return _roundtrip(li, "l_orderkey", codec="rle_v1")


def q_rle_v2_roundtrip(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    return _roundtrip(o, "o_orderkey", codec="rle_v2")


def q_for_bitpack_roundtrip(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    return _roundtrip(c, "c_custkey", codec="for_bitpack")


def q_dict_roundtrip(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"
    )
    return _roundtrip(li, "l_orderkey", codec="dict_str")


def q_fsst_roundtrip(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return _roundtrip(d, "doc_id", codec="fsst")


def q_float_raw_roundtrip(spark, sf_dir):
    """Float list column through the container; output exploded to scalar
    (vec_id, dim, value) rows so the driver's canonicalizer can sort/hash
    (pandas cannot sort list cells)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    rt = _roundtrip(e, "vec_id")
    return rt.select("vec_id", F.posexplode("embedding").alias("dim", "value"))


def q_double_roundtrip(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    return _roundtrip(li, "l_orderkey")


def q_bool_rle_roundtrip(spark, sf_dir):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_quantity") > F.lit(25.0)).alias("flag"),
        )
    )
    return _roundtrip(li, "l_orderkey")


def q_timestamp_roundtrip(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "ts")
    return _roundtrip(ev, "event_id")


def q_decimal_roundtrip(spark, sf_dir):
    """Decimal through the container; final cast to string on BOTH sides
    (Spark Decimal vs DuckDB->pandas float64 hash differently otherwise)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").cast("decimal(18,2)").alias("dval"),
    )
    rt = _roundtrip(li, "l_orderkey")
    return rt.withColumn("dval", F.col("dval").cast("string"))


def q_nulls_roundtrip(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("val"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("sval"),
    )
    return _roundtrip(o, "o_orderkey")


def q_string_raw_roundtrip(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "props"
    )
    return _roundtrip(ev, "event_id")


def q_stats_longs(spark, sf_dir):
    from orc_format_spark import column_statistics

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return column_statistics(li, ["l_orderkey", "l_partkey", "l_suppkey"]).select(
        "column", "n_values", "n_present", "min_long", "max_long", "sum_long"
    )


def q_stats_strings(spark, sf_dir):
    from orc_format_spark import column_statistics

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return column_statistics(li, ["l_returnflag", "l_linestatus"]).select(
        "column", "n_values", "n_present", "min_str", "max_str", "sum_lengths"
    )


def q_stats_doubles(spark, sf_dir):
    from orc_format_spark import column_statistics

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return column_statistics(li, ["l_quantity", "l_discount"]).select(
        "column", "n_values", "n_present", "min_double", "max_double", "sum_double"
    )


def q_struct_map_roundtrip(spark, sf_dir):
    """Struct + map columns through the blob container (W9/W11 parity).
    The container roundtrips the full nested values; the output is
    flattened back to scalars so it is canon-hashable and a plain SQL
    oracle can reproduce it."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        F.struct("event_type", "value").alias("s"),
        F.create_map(F.lit("type"), F.col("event_type")).alias("m"),
    )
    rt = _roundtrip(ev, "event_id")
    return rt.select(
        "event_id",
        F.col("s.event_type").alias("s_event_type"),
        F.col("s.value").alias("s_value"),
        F.col("m")[F.lit("type")].alias("m_type"),
    )


def q_text_profile(spark, sf_dir):
    """Text analysis: token counts, lang-ID, quality score, fingerprint."""
    from orc_format_spark.functions.text import text_profile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_profile(docs)


def _docs_with_dups(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    return docs.union(dups)


def q_exact_dedup(spark, sf_dir):
    """Exact dedup groups over docs + synthetic duplicates."""
    from orc_format_spark.functions.dedup import exact_duplicate_groups

    return exact_duplicate_groups(_docs_with_dups(spark, sf_dir))


def q_ngram_jaccard(spark, sf_dir):
    """Exact char-4-gram Jaccard near-dup pairs (first 80 docs)."""
    from orc_format_spark.functions.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_jaccard_pairs(docs, n=4, threshold=0.35, max_doc_id=80)


def q_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidates (no SQL oracle: xxhash64-based)."""
    from orc_format_spark.functions.dedup import lsh_candidate_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    return lsh_candidate_pairs(docs, n=4, num_perm=32, bands=8)


def q_simhash(spark, sf_dir):
    """SimHash near-dup pairs (no SQL oracle: xxhash64-based)."""
    from orc_format_spark.functions.dedup import simhash_near_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    return simhash_near_pairs(docs, n=4, max_hamming=10)


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (int-quantized, exact)."""
    from orc_format_spark.functions.similarity import near_duplicate_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return near_duplicate_pairs(emb, threshold_e6=300000, max_id=300)


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-5 neighbors for the first 10 vectors."""
    from orc_format_spark.functions.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return brute_force_topk(emb, k=5, n_queries=10)


def q_ann_lsh(spark, sf_dir):
    """Sign-bit-bucketed approximate top-k (no SQL oracle: approximate)."""
    from orc_format_spark.functions.similarity import lsh_bucketed_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_bucketed_topk(emb, k=5, n_queries=10, sign_dims=6)


def q_multimodal_features(spark, sf_dir):
    """Binary payload -> feature vectors via Arrow-batched mapInArrow;
    the feature array is serialized to a CSV string so the driver's
    canonicalizer can sort/hash the frame."""
    from orc_format_spark.functions.multimodal import extract_features, with_payload

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = extract_features(with_payload(docs))
    return feats.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform("features", lambda x: x.cast("string"))
        ).alias("features_csv"),
    )


def q_frame_sample(spark, sf_dir):
    """Every-16th-byte payload sampling (video frame-sample shape;
    rows-only check)."""
    from orc_format_spark.functions.multimodal import frame_sample, with_payload

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return frame_sample(with_payload(docs), stride=16)


def q_stream_encode_roundtrip(spark, sf_dir):
    """Structured Streaming encode (availableNow) -> decode -> detokenize;
    oracle: the original documents table."""
    import shutil
    import tempfile

    from orc_format_spark import (
        TOKENS_SCHEMA,
        decode_blobs,
        detokenize,
        tokenize_documents,
    )
    from orc_format_spark.streaming import encode_stream

    work = tempfile.mkdtemp(prefix="ofs_stream_")
    try:
        src = f"{work}/tokens"
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        tokenize_documents(docs).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        q = encode_stream(stream, f"{work}/blobs", f"{work}/ckpt", num_groups=4)
        q.awaitTermination(300)
        blobs = spark.read.parquet(f"{work}/blobs")
        out = detokenize(decode_blobs(blobs, TOKENS_SCHEMA)).select("doc_id", "text")
        out = out.cache()
        out.count()  # materialize before the scratch dir disappears
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_curation_pipeline(spark, sf_dir):
    """End-to-end training-data curation: quality-filter -> exact dedup
    (keep lowest doc_id) -> tokenize -> auto-codec encode -> decode ->
    detokenize. The oracle replays the same filter+dedup in SQL; the
    encode/decode leg is lossless so the results must match exactly."""
    from orc_format_spark import (
        TOKENS_SCHEMA,
        decode_blobs,
        detokenize,
        encode_groups,
        tokenize_documents,
    )
    from orc_format_spark.functions.dedup import dedup_keep_first
    from orc_format_spark.functions.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = docs.filter(
        F.floor(quality_score(F.col("text")) * F.lit(1000000.0)).cast("long")
        >= F.lit(400000)
    )
    deduped = dedup_keep_first(kept.select("doc_id", "text", "source"))
    toks = tokenize_documents(deduped)
    blobs = encode_groups(toks, num_groups=4, key_col="doc_id", size_col="n_tok")
    return detokenize(decode_blobs(blobs, TOKENS_SCHEMA)).select("doc_id", "text")


def q_codec_lineage(spark, sf_dir):
    """Codec auto-selection lineage (no SQL oracle: rows-only check)."""
    from orc_format_spark import encode_groups, tokenize_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokenize_documents(docs)
    blobs = encode_groups(toks, num_groups=4, key_col="doc_id", size_col="n_tok")
    return blobs.select(
        "group_id", "n_rows", "n_values", "input_bytes", "output_bytes", "codecs"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tokens_roundtrip": q_tokens_roundtrip,
        "rle_v1_roundtrip": q_rle_v1_roundtrip,
        "rle_v2_roundtrip": q_rle_v2_roundtrip,
        "for_bitpack_roundtrip": q_for_bitpack_roundtrip,
        "dict_roundtrip": q_dict_roundtrip,
        "fsst_roundtrip": q_fsst_roundtrip,
        "float_raw_roundtrip": q_float_raw_roundtrip,
        "double_roundtrip": q_double_roundtrip,
        "bool_rle_roundtrip": q_bool_rle_roundtrip,
        "timestamp_roundtrip": q_timestamp_roundtrip,
        "decimal_roundtrip": q_decimal_roundtrip,
        "nulls_roundtrip": q_nulls_roundtrip,
        "string_raw_roundtrip": q_string_raw_roundtrip,
        "stats_longs": q_stats_longs,
        "stats_strings": q_stats_strings,
        "stats_doubles": q_stats_doubles,
        "codec_lineage": q_codec_lineage,
        "curation_pipeline": q_curation_pipeline,
        "stream_encode_roundtrip": q_stream_encode_roundtrip,
        "struct_map_roundtrip": q_struct_map_roundtrip,
        "text_profile": q_text_profile,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "embedding_neardup": q_embedding_neardup,
        "ann_topk": q_ann_topk,
        "ann_lsh": q_ann_lsh,
        "multimodal_features": q_multimodal_features,
        "frame_sample": q_frame_sample,
    }


def oracle_sql() -> dict[str, str]:
    from orc_format_spark.functions.dedup import ngram_jaccard_pairs_sql
    from orc_format_spark.functions.multimodal import extract_features_sql
    from orc_format_spark.functions.similarity import (
        brute_force_topk_sql,
        near_duplicate_pairs_sql,
    )
    from orc_format_spark.functions.text import quality_e6_sql, text_profile_sql

    stats_longs = " UNION ALL ".join(
        f"SELECT '{c}' AS column, COUNT(*) AS n_values, COUNT({c}) AS n_present, "
        f"CAST(MIN({c}) AS BIGINT) AS min_long, CAST(MAX({c}) AS BIGINT) AS max_long, "
        f"CAST(SUM({c}) AS BIGINT) AS sum_long FROM lineitem"
        for c in ("l_orderkey", "l_partkey", "l_suppkey")
    )
    stats_strings = " UNION ALL ".join(
        f"SELECT '{c}' AS column, COUNT(*) AS n_values, COUNT({c}) AS n_present, "
        f"MIN({c}) AS min_str, MAX({c}) AS max_str, "
        f"CAST(SUM(OCTET_LENGTH(CAST({c} AS BLOB))) AS BIGINT) AS sum_lengths FROM lineitem"
        for c in ("l_returnflag", "l_linestatus")
    )
    stats_doubles = " UNION ALL ".join(
        f"SELECT '{c}' AS column, COUNT(*) AS n_values, COUNT({c}) AS n_present, "
        f"CAST(MIN({c}) AS DOUBLE) AS min_double, CAST(MAX({c}) AS DOUBLE) AS max_double, "
        f"CAST(SUM({c}) AS DOUBLE) AS sum_double FROM lineitem"
        for c in ("l_quantity", "l_discount")
    )
    return {
        "tokens_roundtrip": "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents",
        "rle_v1_roundtrip": "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber FROM lineitem",
        "rle_v2_roundtrip": "SELECT o_orderkey, o_custkey FROM orders",
        "for_bitpack_roundtrip": "SELECT c_custkey, c_nationkey FROM customer",
        "dict_roundtrip": "SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus FROM lineitem",
        "fsst_roundtrip": "SELECT doc_id, text FROM documents",
        "float_raw_roundtrip": (
            "SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) "
            "AS dim, unnest(embedding) AS value FROM embeddings"
        ),
        "double_roundtrip": "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem",
        "bool_rle_roundtrip": "SELECT l_orderkey, l_linenumber, l_quantity > 25.0 AS flag FROM lineitem",
        "timestamp_roundtrip": "SELECT event_id, ts FROM events",
        "decimal_roundtrip": (
            "SELECT l_orderkey, l_linenumber, "
            "CAST(CAST(l_orderkey AS DECIMAL(18,2)) AS VARCHAR) AS dval FROM lineitem"
        ),
        "nulls_roundtrip": (
            "SELECT o_orderkey, "
            "CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS val, "
            "CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END AS sval "
            "FROM orders"
        ),
        "string_raw_roundtrip": "SELECT event_id, event_type, props FROM events",
        "stats_longs": stats_longs,
        "stats_strings": stats_strings,
        "stats_doubles": stats_doubles,
        "stream_encode_roundtrip": (
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents"
        ),
        "curation_pipeline": (
            "WITH kept AS ("
            f"SELECT doc_id, text FROM documents WHERE {quality_e6_sql()} >= 400000"
            "), dd AS ("
            "SELECT doc_id, text, row_number() OVER ("
            "PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) "
            "ORDER BY doc_id) AS rn FROM kept) "
            "SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM dd WHERE rn = 1"
        ),
        "text_profile": text_profile_sql(),
        "exact_dedup": (
            "WITH alldocs AS ("
            "SELECT doc_id, text FROM documents "
            "UNION ALL "
            "SELECT doc_id + 1000000 AS doc_id, text FROM documents "
            "WHERE doc_id % 7 = 0) "
            "SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint, "
            "COUNT(*) AS n_copies, MIN(doc_id) AS keep_doc_id "
            "FROM alldocs GROUP BY 1"
        ),
        "struct_map_roundtrip": (
            "SELECT event_id, event_type AS s_event_type, value AS s_value, "
            "event_type AS m_type FROM events"
        ),
        "ngram_jaccard": ngram_jaccard_pairs_sql(n=4, threshold=0.35, max_doc_id=80),
        "embedding_neardup": near_duplicate_pairs_sql(threshold_e6=300000, max_id=300),
        "ann_topk": brute_force_topk_sql(k=5, n_queries=10),
        "multimodal_features": extract_features_sql(),
    }
