"""Deduplication operators for training-data pipelines.

Exact dedup (content-hash groupBy), n-gram Jaccard near-dup pairs,
MinHash+LSH candidate generation, and SimHash — the dedup ladder a
10^12-document ingest runs before encoding. Not in the reference repo
(SURVEY.md §2.7); first-class additions per the task brief.

Scale shapes:
- exact dedup: one hash-shuffle on the 16-byte fingerprint (not the
  payload); at 100 TB this is the cheapest possible global pass.
- n-gram Jaccard is exact but quadratic in colliding docs — it is the
  *verification* stage. The *candidate* stage at scale is MinHash/LSH
  (band-bucket join: shuffle ~num_bands small keys per doc, never all
  pairs) or SimHash band matching; both below.
- Everything uses JVM-side built-ins (higher-order functions, xxhash64)
  — no Python in any hot path.

Oracle parity: exact-dedup and Jaccard use only constructs DuckDB
reproduces bit-for-bit (md5, integer counts, int/int double division with
matching operand order). MinHash/SimHash default to Spark's xxhash64 (the
cheap JVM hash for the 100 TB path) but accept ``hasher="md5"``, a 60-bit
integer drawn from the md5 hex both engines share — fully deterministic
and SQL-reproducible, so the driver checks those operators against real
DuckDB oracles instead of rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import fingerprint


def md5_hash60(col: Column, seed: int | None = None) -> Column:
    """60-bit non-negative integer hash that DuckDB reproduces exactly:
    the first 15 hex chars of md5(value [|| '#' || seed]) read base-16.
    DuckDB twin: CAST('0x' || substr(md5(x [|| '#seed']), 1, 15) AS BIGINT).
    """
    x = F.concat(col, F.lit(f"#{seed}")) if seed is not None else col
    return F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")


def _md5_hash60_sql(expr: str, seed: int | None = None) -> str:
    x = f"{expr} || '#{seed}'" if seed is not None else expr
    return f"CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


_MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def _minhash_affine(s: int) -> tuple[int, int]:
    """Deterministic (a, b) for the s-th affine permutation h -> a*h+b
    mod p. a is odd and non-zero; values < 2^31 so a*h < 2^62."""
    a = ((s * 0x9E3779B1 + 0x7F4A7C15) % (_MINHASH_P - 1)) | 1
    b = (s * 0x85EBCA6B + 0xC2B2AE35) % _MINHASH_P
    return a, b


def exact_duplicate_groups(docs: DataFrame) -> DataFrame:
    """One row per distinct content: copies count + the doc kept.
    NULL text is not equal content — each NULL-text doc is its own
    group via the same per-doc sentinel as :func:`dedup_keep_first`."""
    key = F.coalesce(
        fingerprint(F.col("text")),
        F.concat(F.lit("null:"), F.col("doc_id").cast("string")),
    )
    return (
        docs.select("doc_id", key.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def dedup_keep_first(docs: DataFrame) -> DataFrame:
    """Drop exact duplicates, keeping the lowest doc_id of each group.

    Shape: ONE pass, ONE shuffle — ``groupBy(fingerprint).agg(
    min_by(struct(*row), doc_id))``. min_by's map-side partial keeps at
    most one candidate row per (fingerprint, partition), so the exchange
    carries ~distinct-content volume, and the upstream plan (which may
    be an expensive scrub/score pipeline) is computed exactly once — the
    earlier semi-join shape recomputed it for both join sides and a
    row_number window would pull every document body through sort
    buffers. doc_id uniqueness makes the winner deterministic.

    NULL text: md5(NULL) is NULL and groupBy merges NULLs, which would
    silently drop every NULL-text doc but one as a "duplicate" — so the
    grouping key coalesces to a per-row unique sentinel (doc_id-based),
    keeping each NULL-text doc its own group. NULL content is not equal
    content."""
    cols = docs.columns
    # "null:" cannot collide with a real fingerprint (md5 hex has no ':')
    key = F.coalesce(
        fingerprint(F.col("text")),
        F.concat(F.lit("null:"), F.col("doc_id").cast("string")),
    )
    picked = (
        docs.groupBy(key.alias("fingerprint"))
        .agg(F.min_by(F.struct(*cols), F.col("doc_id")).alias("r"))
    )
    return picked.select(*[F.col(f"r.{c}").alias(c) for c in cols])


def char_ngrams(text: Column, n: int) -> Column:
    """Distinct character n-grams of ``text`` (empty array if too short)."""
    return F.when(
        F.length(text) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(text) - F.lit(n - 1)),
                lambda i: F.substring(text, i, F.lit(n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def gram_postings(
    docs: DataFrame, n: int = 4, max_df: int | None = None
) -> DataFrame:
    """(doc_id, g) inverted-index postings of distinct char n-grams,
    optionally dropping grams whose document frequency exceeds ``max_df``.

    The df ceiling is the 100 TB safety valve: without it a stop-gram
    (" the") present in every document makes that join key quadratic in
    corpus size. With it, any gram contributes at most max_df^2 candidate
    pairs. The cap costs one extra map-side-combined agg on the gram key.
    """
    grams = docs.select(
        "doc_id", F.explode(char_ngrams(F.col("text"), n)).alias("g")
    )
    if max_df is None:
        return grams
    kept = (
        grams.groupBy("g")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("g")
    )
    return grams.join(kept, "g").select("doc_id", "g")


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 4,
    threshold: float = 0.5,
    max_doc_id: int | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity pairs >= threshold.

    Inverted-index join on the shared gram (never a cross join): shuffle
    keys are grams, pair counts aggregate map-side first. With ``max_df``
    set, grams occurring in more than max_df docs are excluded from the
    *join* (bounding the worst join key at max_df rows); denominators
    still count every gram, so the score is a lower bound of true
    Jaccard — the standard stop-gram-pruned near-dup semantics.
    """
    d = docs
    if max_doc_id is not None:
        d = d.filter(F.col("doc_id") < max_doc_id)
    grams = d.select(
        "doc_id", F.explode(char_ngrams(F.col("text"), n)).alias("g")
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    joinable = gram_postings(d, n, max_df) if max_df is not None else grams
    a = joinable.alias("a")
    b = joinable.alias("b")
    common = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard_e6", F.floor(jac * F.lit(1000000.0)).cast("long"))
        .filter(jac >= F.lit(threshold))
        .select("doc_a", "doc_b", "common", "na", "nb", "jaccard_e6")
    )


def ngram_jaccard_pairs_sql(
    n: int = 4, threshold: float = 0.5, max_doc_id: int | None = None,
    max_df: int | None = None, table: str = "documents",
) -> str:
    where = f"WHERE length(text) >= {n}"
    if max_doc_id is not None:
        where += f" AND doc_id < {max_doc_id}"
    joinable = "grams"
    capped = ""
    if max_df is not None:
        capped = f""", kept AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= {max_df}
), joinable AS (
  SELECT grams.doc_id, grams.g FROM grams JOIN kept USING (g)
)"""
        joinable = "joinable"
    return f"""
WITH grams AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, length(text) - {n} + 2),
                   i -> substr(text, CAST(i AS INT), {n})))) AS g
  FROM {table} {where}
){capped}, sizes AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM {joinable} a JOIN {joinable} b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, common, sa.n_grams AS na, sb.n_grams AS nb,
       CAST(floor(common / (sa.n_grams + sb.n_grams - common) * 1000000.0)
            AS BIGINT) AS jaccard_e6
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE common / (sa.n_grams + sb.n_grams - common) >= {threshold}
"""


def benchmark_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 24,
    min_common: int = 3,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing at least
    ``min_common`` distinct character ``n``-grams with any benchmark
    (eval-set) document — the overlap check a training pipeline runs
    before a corpus ships. Returns (doc_id, bench_id, common).

    Scale shape: the benchmark side is metadata-scale next to the corpus
    (thousands of eval rows vs 10^12 training rows), so its gram
    postings are BROADCAST and the corpus side is probed map-side — the
    only shuffle is the (doc_id, bench_id) partial-count agg, whose key
    fan-out per corpus gram is bounded by |bench|, never by corpus df.
    ``char_ngrams`` is distinct-per-doc, so count(*) counts distinct
    shared grams. Long grams (n≈24+) are the standard contamination
    signal; short grams measure vocabulary, not leakage."""
    cg = docs.select(
        "doc_id", F.explode(char_ngrams(F.col("text"), n)).alias("g")
    )
    bg = bench.select(
        F.col("doc_id").alias("bench_id"),
        F.explode(char_ngrams(F.col("text"), n)).alias("g"),
    )
    return (
        cg.join(F.broadcast(bg), "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= min_common)
    )


def benchmark_contamination_sql(
    n: int = 24,
    min_common: int = 3,
    corpus_where: str = "doc_id >= 40",
    bench_where: str = "doc_id < 40",
    table: str = "documents",
) -> str:
    """DuckDB oracle for ``benchmark_contamination`` (same gram
    machinery as ``ngram_jaccard_pairs_sql``)."""
    grams = (
        f"unnest(list_distinct(list_transform("
        f"range(1, length(text) - {n} + 2), "
        f"i -> substr(text, CAST(i AS INT), {n})))) AS g"
    )
    return f"""
WITH cg AS (
  SELECT doc_id, {grams} FROM {table}
  WHERE ({corpus_where}) AND length(text) >= {n}
), bg AS (
  SELECT doc_id AS bench_id, {grams} FROM {table}
  WHERE ({bench_where}) AND length(text) >= {n}
)
SELECT cg.doc_id, bg.bench_id, COUNT(*) AS common
FROM cg JOIN bg USING (g)
GROUP BY 1, 2
HAVING COUNT(*) >= {min_common}
"""


# ------------------------------------------------------------ MinHash/LSH


def minhash_signatures(
    docs: DataFrame,
    n: int = 4,
    num_perm: int = 32,
    hasher: str = "xxh",
    bands: int = 8,
) -> DataFrame:
    """num_perm-wide MinHash signature per doc.

    ``hasher="xxh"`` (default) uses JVM xxhash64 — the cheap 100 TB path.
    ``hasher="md5"`` uses the DuckDB-reproducible 60-bit md5 hash
    (``md5_hash60``) so the whole pipeline can be checked against a SQL
    oracle; both are pure JVM expressions.

    Structure (both hashers): ONE base hash per gram PER BAND (seed =
    band index), then ``num_perm/bands`` affine permutations over the
    prime field p=2^31-1 within each band — ``bands`` hashes per gram
    instead of ``num_perm`` (4x cheaper at 32/8, measured 3.8x on the
    ladder's LSH stage vs the old per-seed form at ~2x its recall,
    BENCH.md §8). The base
    seed varies BY BAND because band collisions must be independent for
    the 1-(1-j^r)^b recall guarantee: with a single corpus-wide base
    draw, the fate of the corpus' most frequent shared grams under that
    one draw correlates every band (measured recall 0.035-0.35 across
    draws at true ~0.16 on the sf0.01 corpus); per-band seeds measured
    at the independent-coordinate theory value. All arithmetic stays
    < 2^62.
    """
    if num_perm % bands != 0:
        raise ValueError(f"num_perm {num_perm} not divisible by bands {bands}")
    rows_per = num_perm // bands
    p = _MINHASH_P
    ab = [_minhash_affine(s) for s in range(num_perm)]

    def base_for(band: int):
        if hasher == "md5":
            def h(g):
                return md5_hash60(g, band) % F.lit(p)
        else:
            def h(g):
                return F.pmod(F.xxhash64(g, F.lit(band)), F.lit(p))
        return F.array_sort(F.array_distinct(F.transform(F.col("grams"), h)))

    def affine_min(band: int, a: int, b: int):
        # factory: Spark introspects lambda arity, so no default args
        return F.array_min(
            F.transform(
                F.col(f"hb{band}"),
                lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(p),
            )
        )

    pre = [F.col("doc_id")] + [
        base_for(band).alias(f"hb{band}") for band in range(bands)
    ]
    sig = F.array(
        *[affine_min(s // rows_per, *ab[s]) for s in range(num_perm)]
    )
    # docs shorter than n have no grams -> all-null signatures that would
    # collide into one LSH bucket per band (O(m^2) spurious pairs); gate on
    # gram availability, not signature width (which is always num_perm)
    return (
        docs.filter(F.length(F.col("text")) >= n)
        .select("doc_id", char_ngrams(F.col("text"), n).alias("grams"))
        .select(*pre)
        .select("doc_id", sig.alias("signature"))
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    n: int = 4,
    num_perm: int = 32,
    bands: int = 8,
    hasher: str = "xxh",
) -> DataFrame:
    """LSH banding over MinHash signatures -> candidate near-dup pairs.

    Docs agreeing on all rows of any band land in one bucket; the join is
    on (band, bucket-hash) — at 100 TB this shuffles ``bands`` small keys
    per doc instead of comparing pairs.
    """
    rows = num_perm // bands
    sigs = minhash_signatures(docs, n, num_perm, hasher, bands=bands)

    def bucket_of(b):
        sl = F.slice(F.col("signature"), b * rows + 1, rows)
        csv = F.concat_ws(",", F.transform(sl, lambda x: x.cast("string")))
        # md5-of-csv bucket: engine-agnostic and shuffle-narrow
        return F.md5(csv)

    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), bucket_of(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_candidate_pairs_sql(
    n: int = 4,
    num_perm: int = 32,
    bands: int = 8,
    max_doc_id: int | None = None,
    table: str = "documents",
) -> str:
    """DuckDB oracle for ``lsh_candidate_pairs(..., hasher='md5')``."""
    rows = num_perm // bands
    where = f"WHERE length(text) >= {n}"
    if max_doc_id is not None:
        where += f" AND doc_id < {max_doc_id}"
    p = _MINHASH_P
    perm_rows = ", ".join(
        f"({s}, {a}, {b})"
        for s, (a, b) in ((s, _minhash_affine(s)) for s in range(num_perm))
    )
    return f"""
WITH grams AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, length(text) - {n} + 2),
                   i -> substr(text, CAST(i AS INT), {n})))) AS g
  FROM {table} {where}
), hb AS (
  SELECT DISTINCT doc_id, bb AS band,
         CAST('0x' || substr(md5(g || '#' || CAST(bb AS VARCHAR)), 1, 15)
              AS BIGINT) % {p} AS h
  FROM grams CROSS JOIN range(0, {bands}) tb(bb)
), perms(s, a, b) AS (VALUES {perm_rows}),
mh AS (
  SELECT doc_id, s, MIN((h * a + b) % {p}) AS v
  FROM hb JOIN perms ON hb.band = s // {rows}
  GROUP BY doc_id, s
), sigs AS (
  SELECT doc_id, list(v ORDER BY s) AS signature FROM mh GROUP BY doc_id
), banded AS (
  SELECT doc_id, bb AS band,
         md5(array_to_string(signature[bb*{rows}+1 : bb*{rows}+{rows}], ','))
         AS bucket
  FROM sigs CROSS JOIN range(0, {bands}) t(bb)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


# --------------------------------------------------------------- SimHash


def simhash64(docs: DataFrame, n: int = 4, hasher: str = "xxh") -> DataFrame:
    """SimHash per doc, computed entirely JVM-side (63 bits for the
    default xxhash64; 60 bits for the DuckDB-reproducible md5 hash).

    Each gram votes +-1 on every bit of its hash; the sign of each
    bit-sum forms the fingerprint. Implemented as explode -> N
    conditional sums in ONE aggregation (partial aggregation map-side, no
    Python).
    """
    nbits = 60 if hasher == "md5" else 63  # xxh bit 63 is the sign bit
    grams = docs.select(
        "doc_id", F.explode(char_ngrams(F.col("text"), n)).alias("g")
    )
    h = md5_hash60(F.col("g")) if hasher == "md5" else F.xxhash64("g")
    grams = grams.withColumn("h", h)
    bit_sums = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << k)) != 0, 1).otherwise(-1)
        ).alias(f"b{k}")
        for k in range(nbits)
    ]
    agg = grams.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for k in range(nbits):
        term = F.when(F.col(f"b{k}") > 0, F.lit(1 << k)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, n: int = 4, max_hamming: int = 8, hasher: str = "xxh"
) -> DataFrame:
    """Candidate pairs whose SimHashes agree on >= 1 of four bands
    (16-bit for xxh, 15-bit for md5), verified by exact Hamming distance
    <= max_hamming."""
    band_bits = 15 if hasher == "md5" else 16
    sh = simhash64(docs, n, hasher)
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), band_bits * b)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("bits"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bits")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.withColumn("hamming", ham).filter(ham <= max_hamming).select(
        "doc_a", "doc_b", "hamming"
    )


def simhash_near_pairs_sql(
    n: int = 4,
    max_hamming: int = 8,
    max_doc_id: int | None = None,
    table: str = "documents",
) -> str:
    """DuckDB oracle for ``simhash_near_pairs(..., hasher='md5')``."""
    where = f"WHERE length(text) >= {n}"
    if max_doc_id is not None:
        where += f" AND doc_id < {max_doc_id}"
    h = _md5_hash60_sql("g")
    return f"""
WITH grams AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, length(text) - {n} + 2),
                   i -> substr(text, CAST(i AS INT), {n})))) AS g
  FROM {table} {where}
), hashed AS (
  SELECT doc_id, {h} AS h FROM grams
), bits AS (
  SELECT doc_id, k,
         SUM(CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM hashed CROSS JOIN range(0, 60) t(k)
  GROUP BY doc_id, k
), sims AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << k) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
), banded AS (
  SELECT doc_id, simhash, bb AS band,
         (simhash >> (15 * bb)) & 32767 AS bits
  FROM sims CROSS JOIN range(0, 4) t(bb)
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
"""


def fingerprint_sentinel_sql(
    doc_id: str = "doc_id", text: str = "text"
) -> str:
    """DuckDB twin of the Spark-side NULL-text sentinel fingerprint:
    md5 of normalized text, or a per-doc 'null:<doc_id>' key so NULL
    content never merges into one duplicate group (mirrors
    :func:`dedup_keep_first` / :func:`exact_duplicate_groups`)."""
    fp = f"md5(regexp_replace(lower({text}), '\\s+', ' ', 'g'))"
    return f"COALESCE({fp}, 'null:' || CAST({doc_id} AS VARCHAR))"


def exact_duplicate_groups_sql(table: str = "documents") -> str:
    return (
        f"SELECT {fingerprint_sentinel_sql()} AS fingerprint, "
        f"COUNT(*) AS n_copies, "
        f"MIN(doc_id) AS keep_doc_id FROM {table} GROUP BY 1"
    )


# ---------------------------------------------------------- dedup ladder


def dedup_ladder(
    docs: DataFrame,
    n: int = 4,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.35,
    hasher: str = "xxh",
    materialize: str = "cache",
) -> DataFrame:
    """The full dedup ladder as ONE composed pipeline — the pass a
    training-data ingest runs before encoding:

    1. **exact**: :func:`dedup_keep_first` drops byte-identical content
       (one fingerprint shuffle, payload never sorted);
    2. **candidates**: :func:`lsh_candidate_pairs` over the survivors
       (band-bucket join — ``bands`` small keys per doc, never
       all-pairs);
    3. **verify**: exact n-gram Jaccard on CANDIDATE PAIRS ONLY, via
       ``array_intersect`` on per-doc distinct-gram arrays.

    Returns verified near-dup pairs among the exact-dedup survivors:
    (doc_a, doc_b, common, na, nb, jaccard_e6).

    Scale shape of the verify stage: the candidate doc-id set is
    LSH-bounded (orders of magnitude below corpus), so it is broadcast
    and the corpus gram arrays are filtered MAP-SIDE before any
    exchange — the only gram arrays that shuffle belong to docs that
    appear in a candidate pair. If the candidate set ever outgrows
    broadcast range, swap the two broadcasts below for shuffled
    semi-joins: same results, one extra corpus-keyed exchange.

    Stage boundaries are MATERIALIZED (``materialize="cache"``,
    MEMORY_AND_DISK): ``uniq`` and ``cand`` are each referenced by
    several downstream subtrees, and Spark has no cross-subtree
    common-plan reuse — composed lazily, the exact-dedup aggregation
    re-executes once per reference (the unmaterialized plan audit shows
    the corpus scanned 24x). A 100 TB ingest writes the deduped corpus
    back to storage between ladder stages anyway; persist() marks the
    same boundary here. The cached frames stay registered on the
    session (Spark evicts LRU); pass ``materialize="none"`` for pure
    lazy composition.
    """
    uniq = dedup_keep_first(docs).select("doc_id", "text")
    if materialize == "cache":
        from pyspark.storagelevel import StorageLevel

        uniq = uniq.persist(StorageLevel.MEMORY_AND_DISK)
    cand = lsh_candidate_pairs(
        uniq, n=n, num_perm=num_perm, bands=bands, hasher=hasher
    )
    if materialize == "cache":
        from pyspark.storagelevel import StorageLevel

        cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    return verify_candidate_pairs(uniq, cand, n=n, threshold=threshold)


def verify_candidate_pairs(
    docs: DataFrame,
    cand: DataFrame,
    n: int = 4,
    threshold: float = 0.35,
) -> DataFrame:
    """Ladder stage 3 standalone: exact n-gram Jaccard over CANDIDATE
    PAIRS ONLY (``cand`` = (doc_a, doc_b)). The candidate doc-id set is
    broadcast so gram arrays are built map-side for candidate docs
    alone; the verify join carries candidate volume, never corpus
    volume. Returns (doc_a, doc_b, common, na, nb, jaccard_e6)."""
    cand_docs = (
        cand.select(
            F.explode(F.array(F.col("doc_a"), F.col("doc_b"))).alias("doc_id")
        )
        .distinct()
    )
    grams = (
        docs.filter(F.length("text") >= n)
        .join(F.broadcast(cand_docs), "doc_id")
        .select("doc_id", char_ngrams(F.col("text"), n).alias("grams"))
    )
    ga = grams.select(
        F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a")
    )
    gb = grams.select(
        F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b")
    )
    scored = (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("grams_a", "grams_b")).alias("common"),
            F.size("grams_a").alias("na"),
            F.size("grams_b").alias("nb"),
        )
    )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        scored.withColumn(
            "jaccard_e6", F.floor(jac * F.lit(1000000.0)).cast("long")
        )
        .filter(jac >= F.lit(threshold))
        .select("doc_a", "doc_b", "common", "na", "nb", "jaccard_e6")
    )


def dedup_ladder_sql(
    n: int = 4,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.35,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`dedup_ladder` with ``hasher='md5'`` —
    composes the exact-dedup window, the full
    :func:`lsh_candidate_pairs_sql` pipeline over the deduped docs, and
    a ``list_intersect`` verify with the identical int/int double
    division + floor as the Spark side."""
    fp = fingerprint_sentinel_sql()
    lsh = lsh_candidate_pairs_sql(n=n, num_perm=num_perm, bands=bands, table="dd")
    return f"""
WITH dd AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY {fp} ORDER BY doc_id) AS rn
    FROM {table}
  ) WHERE rn = 1
), cand AS (
  {lsh}
), g AS (
  SELECT doc_id, list_distinct(
    list_transform(range(1, length(text) - {n} + 2),
                   i -> substr(text, CAST(i AS INT), {n}))) AS grams
  FROM dd WHERE length(text) >= {n}
)
SELECT doc_a, doc_b, common, na, nb,
       CAST(floor(common / (na + nb - common) * 1000000.0) AS BIGINT)
       AS jaccard_e6
FROM (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(ga.grams, gb.grams)) AS common,
         len(ga.grams) AS na, len(gb.grams) AS nb
  FROM cand c
  JOIN g ga ON ga.doc_id = c.doc_a
  JOIN g gb ON gb.doc_id = c.doc_b
)
WHERE common / (na + nb - common) >= {threshold}
"""
