"""Iceberg table lifecycle: rewrite (compaction) snapshots and snapshot
expiration — the metadata-maintenance half of running the encode engine
against a long-lived table.

Contracts under test: a rewrite atomically swaps files while keeping
every pre-rewrite snapshot time-travelable (manifests are immutable);
expiration deletes exactly the metadata (and optionally data) that no
surviving snapshot references."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orc_format_spark.sources import iceberg_meta as im

SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def _pfile(path, start, n, source="web"):
    t = pa.table(
        {
            "doc_id": [f"d{start + i:05d}" for i in range(n)],
            "n_tok": pa.array([2] * n, pa.int32()),
            "source": [source] * n,
        },
        schema=SCHEMA,
    )
    pq.write_table(t, path)
    return str(path)


def test_rewrite_swaps_files_keeps_history(tmp_path):
    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    small = [
        _pfile(tmp_path / f"s{i}.parquet", 10 * i, 10) for i in range(4)
    ]
    s1 = im.append_snapshot(tdir, small[:2], ts_ms=2_000)
    s2 = im.append_snapshot(tdir, small[2:], ts_ms=3_000)
    big = _pfile(tmp_path / "big.parquet", 0, 40)
    s3 = im.rewrite_snapshot(tdir, small, [big], commit_key="compact-1", ts_ms=4_000)
    # current view: only the compacted file
    assert [p for p, n in im.list_data_files(tdir)] == [big]
    assert im.list_data_files(tdir)[0][1] == 40
    # time travel: both pre-rewrite snapshots intact
    assert sorted(p for p, _ in im.list_data_files(tdir, snapshot_id=s1)) == sorted(small[:2])
    assert sorted(p for p, _ in im.list_data_files(tdir, snapshot_id=s2)) == sorted(small)
    # idempotent per commit_key
    assert im.rewrite_snapshot(tdir, small, [big], commit_key="compact-1") == s3
    md = im.read_table_metadata(tdir)
    snap = im._current_snapshot(md)
    assert snap["summary"]["operation"] == "replace"
    assert snap["summary"]["deleted-data-files"] == "4"


def test_rewrite_partial_and_untouched_manifests(tmp_path):
    """A rewrite touching one manifest carries the other forward
    unchanged (same manifest file path — no rewrite amplification)."""
    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    a = _pfile(tmp_path / "a.parquet", 0, 10)
    b = _pfile(tmp_path / "b.parquet", 10, 10)
    im.append_snapshot(tdir, [a], ts_ms=2_000)
    im.append_snapshot(tdir, [b], ts_ms=3_000)
    before = {
        mf["manifest_path"]
        for mf in im._read_manifest_list(
            im._current_snapshot(im.read_table_metadata(tdir))
        )
    }
    c = _pfile(tmp_path / "c.parquet", 0, 10)
    im.rewrite_snapshot(tdir, [a], [c], ts_ms=4_000)
    after = im._read_manifest_list(
        im._current_snapshot(im.read_table_metadata(tdir))
    )
    assert sorted(p for p, _ in im.list_data_files(tdir)) == sorted([b, c])
    # b's manifest is carried forward byte-identically (same path)
    carried = {mf["manifest_path"] for mf in after} & before
    assert len(carried) == 1


def test_rewrite_missing_file_raises(tmp_path):
    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    a = _pfile(tmp_path / "a.parquet", 0, 10)
    im.append_snapshot(tdir, [a], ts_ms=2_000)
    with pytest.raises(ValueError, match="not live"):
        im.rewrite_snapshot(tdir, [str(tmp_path / "nope.parquet")], [], ts_ms=3_000)


def test_rewrite_partitioned(tmp_path):
    tdir = str(tmp_path / "tbl")
    im.create_table(
        tdir, SCHEMA, partition_spec=[("source", "identity")], ts_ms=1_000
    )
    a = _pfile(tmp_path / "a.parquet", 0, 10, "web")
    b = _pfile(tmp_path / "b.parquet", 10, 10, "web")
    im.append_snapshot(tdir, [(a, {"source": "web"}), (b, {"source": "web"})], ts_ms=2_000)
    big = _pfile(tmp_path / "big.parquet", 0, 20, "web")
    with pytest.raises(ValueError, match="partitioned rewrite"):
        im.rewrite_snapshot(tdir, [a, b], [big], ts_ms=3_000)
    im.rewrite_snapshot(tdir, [a, b], [(big, {"source": "web"})], ts_ms=3_000)
    stats: dict = {}
    got = im.list_data_files(tdir, partition_filter={"source": "web"}, scan_stats=stats)
    assert [p for p, _ in got] == [big]


def test_expire_snapshots(tmp_path):
    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    files = [_pfile(tmp_path / f"f{i}.parquet", 10 * i, 10) for i in range(3)]
    s1 = im.append_snapshot(tdir, [files[0]], ts_ms=2_000)
    s2 = im.append_snapshot(tdir, [files[1]], ts_ms=3_000)
    s3 = im.append_snapshot(tdir, [files[2]], ts_ms=4_000)
    with pytest.raises(ValueError, match="keep_last or older_than_ms"):
        im.expire_snapshots(tdir)
    res = im.expire_snapshots(tdir, keep_last=2, ts_ms=5_000)
    assert res["expired"] == 1
    md = im.read_table_metadata(tdir)
    assert [s["snapshot-id"] for s in md["snapshots"]] == [s2, s3]
    assert md["current-snapshot-id"] == s3
    # s1's manifest survives (s2/s3 reference it: append carries forward)
    assert sorted(p for p, _ in im.list_data_files(tdir)) == sorted(files)
    assert sorted(p for p, _ in im.list_data_files(tdir, snapshot_id=s2)) == sorted(files[:2])
    with pytest.raises(ValueError, match="snapshot .* not found"):
        im.list_data_files(tdir, snapshot_id=s1)
    # nothing further to expire
    assert im.expire_snapshots(tdir, keep_last=2, ts_ms=6_000)["expired"] == 0


def test_expire_after_rewrite_deletes_orphans(tmp_path):
    """After compaction + expiration of the pre-rewrite history, the
    small files' manifests AND (opt-in) the small data files themselves
    are physically removed; the compacted current snapshot is intact."""
    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    small = [_pfile(tmp_path / f"s{i}.parquet", 10 * i, 10) for i in range(3)]
    im.append_snapshot(tdir, small, ts_ms=2_000)
    big = _pfile(tmp_path / "big.parquet", 0, 30)
    im.rewrite_snapshot(tdir, small, [big], ts_ms=3_000)
    res = im.expire_snapshots(
        tdir, keep_last=1, delete_orphan_data=True, ts_ms=4_000
    )
    assert res["expired"] == 1
    assert res["data_files_deleted"] == 3
    assert all(not os.path.exists(p) for p in small)
    assert os.path.exists(big)
    assert [p for p, _ in im.list_data_files(tdir)] == [big]
    md = im.read_table_metadata(tdir)
    assert len(md["snapshots"]) == 1
    # older_than_ms variant keeps everything newer
    assert (
        im.expire_snapshots(tdir, older_than_ms=3_500, ts_ms=5_000)["expired"] == 0
    )


def test_compact_then_rewrite_end_to_end(spark, tmp_path):
    """Full maintenance cycle on a live table: encode-splits output
    equality before/after a rewrite driven by real parquet rewrites."""
    from orc_format_spark.sources import iceberg

    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    small = [_pfile(tmp_path / f"s{i}.parquet", 10 * i, 10) for i in range(4)]
    im.append_snapshot(tdir, small, ts_ms=2_000)
    rows_before = sorted(
        r.doc_id for r in iceberg.read_tokens_table(spark, tdir).collect()
    )
    # "compaction job": concatenate the files (here driver-side; at scale
    # a distributed rewrite), then swap via rewrite_snapshot
    merged = pa.concat_tables([pq.read_table(p) for p in sorted(small)])
    big = str(tmp_path / "big.parquet")
    pq.write_table(merged, big)
    im.rewrite_snapshot(tdir, small, [big], commit_key="c0", ts_ms=3_000)
    rows_after = sorted(
        r.doc_id for r in iceberg.read_tokens_table(spark, tdir).collect()
    )
    assert rows_before == rows_after
    splits = iceberg.list_iceberg_splits(spark, tdir)
    assert [s[1] for s in splits] == [big]


def test_expire_many_snapshots_sharing_manifests(tmp_path):
    """Expired snapshots share manifests (appends carry them forward);
    expiration must resolve all references before deleting anything."""
    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    files = [_pfile(tmp_path / f"f{i}.parquet", 10 * i, 10) for i in range(4)]
    for i, f in enumerate(files):
        im.append_snapshot(tdir, [f], ts_ms=2_000 + i)
    big = _pfile(tmp_path / "big.parquet", 0, 40)
    im.rewrite_snapshot(tdir, files, [big], ts_ms=6_000)
    # expire the 4 appends at once (keep only the rewrite)
    res = im.expire_snapshots(tdir, keep_last=1, delete_orphan_data=True, ts_ms=7_000)
    assert res["expired"] == 4
    assert res["data_files_deleted"] == 4
    assert [p for p, _ in im.list_data_files(tdir)] == [big]
    # every surviving manifest-list entry still resolves
    md = im.read_table_metadata(tdir)
    for mf in im._read_manifest_list(im._current_snapshot(md)):
        assert os.path.exists(mf["manifest_path"])


# --------------------------------------------- positional deletes (MoR)


def test_delete_commit_and_entries(tmp_path):
    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    a = _pfile(tmp_path / "a.parquet", 0, 10)
    b = _pfile(tmp_path / "b.parquet", 10, 10)
    im.append_snapshot(tdir, [a, b], ts_ms=2_000)
    with pytest.raises(ValueError, match="not live"):
        im.append_delete_snapshot(tdir, [(str(tmp_path / "x.parquet"), 0)])
    with pytest.raises(ValueError, match="empty delete set"):
        im.append_delete_snapshot(tdir, [])
    s = im.append_delete_snapshot(
        tdir, [(a, 1), (a, 3), (b, 0)], commit_key="d0", ts_ms=3_000
    )
    assert im.append_delete_snapshot(tdir, [(a, 1)], commit_key="d0") == s
    assert im.list_delete_entries(tdir) == [(a, 1), (a, 3), (b, 0)]
    # data listing unaffected by the delete manifest
    assert sorted(p for p, _ in im.list_data_files(tdir)) == sorted([a, b])
    # pre-delete snapshot has no entries
    md = im.read_table_metadata(tdir)
    pre = md["snapshots"][0]["snapshot-id"]
    assert im.list_delete_entries(tdir, snapshot_id=pre) == []
    assert md["snapshots"][-1]["summary"]["operation"] == "delete"


def test_merge_on_read(spark, tmp_path):
    """read_tokens_table anti-joins live positional deletes via the
    parquet _metadata columns; time travel sees the undeleted view."""
    from orc_format_spark.sources import iceberg

    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    a = _pfile(tmp_path / "a.parquet", 0, 10)
    b = _pfile(tmp_path / "b.parquet", 10, 10)
    s1 = im.append_snapshot(tdir, [a, b], ts_ms=2_000)
    im.append_delete_snapshot(tdir, [(a, 0), (a, 9), (b, 5)], ts_ms=3_000)
    got = sorted(r.doc_id for r in iceberg.read_tokens_table(spark, tdir).collect())
    expect = sorted(
        f"d{i:05d}" for i in range(20) if i not in (0, 9, 15)
    )
    assert got == expect


def test_split_encode_refuses_dirty_files(spark, tmp_path):
    from orc_format_spark.sources import iceberg

    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    a = _pfile(tmp_path / "a.parquet", 0, 10)
    im.append_snapshot(tdir, [a], ts_ms=2_000)
    im.append_delete_snapshot(tdir, [(a, 2)], ts_ms=3_000)
    with pytest.raises(ValueError, match="positional deletes"):
        iceberg.list_iceberg_splits(spark, tdir)


def test_rewrite_applies_and_retires_deletes(spark, tmp_path):
    """Compaction materializes the merge-on-read view and retires the
    delete entries; the split-encode path unblocks."""
    from orc_format_spark.sources import iceberg

    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    a = _pfile(tmp_path / "a.parquet", 0, 10)
    im.append_snapshot(tdir, [a], ts_ms=2_000)
    im.append_delete_snapshot(tdir, [(a, 2), (a, 7)], ts_ms=3_000)
    merged = iceberg.read_tokens_table(spark, tdir)  # MoR view: 8 rows
    keep = sorted(r.doc_id for r in merged.collect())
    assert len(keep) == 8
    compacted = str(tmp_path / "compacted.parquet")
    t = pq.read_table(a)
    mask = [i not in (2, 7) for i in range(t.num_rows)]
    pq.write_table(t.filter(pa.array(mask)), compacted)
    im.rewrite_snapshot(tdir, [a], [compacted], ts_ms=4_000)
    assert im.list_delete_entries(tdir) == []  # retired: target not live
    splits = iceberg.list_iceberg_splits(spark, tdir)
    assert [s[1] for s in splits] == [compacted]
    got = sorted(r.doc_id for r in iceberg.read_tokens_table(spark, tdir).collect())
    assert got == keep


# ----------------------------------------------- equality deletes (MoR)


def test_equality_delete_commit_and_entries(tmp_path):
    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    a = _pfile(tmp_path / "a.parquet", 0, 10, source="web")
    im.append_snapshot(tdir, [a], ts_ms=2_000)
    with pytest.raises(ValueError, match="empty equality-delete set"):
        im.append_equality_delete_snapshot(tdir, [], ["source"])
    with pytest.raises(ValueError, match="not in the current schema"):
        im.append_equality_delete_snapshot(tdir, [{"nope": 1}], ["nope"])
    with pytest.raises(ValueError, match="missing equality column"):
        im.append_equality_delete_snapshot(tdir, [{"source": "x"}, {}], ["source"])
    s = im.append_equality_delete_snapshot(
        tdir, [{"source": "web"}], ["source"], commit_key="e0", ts_ms=3_000
    )
    assert (
        im.append_equality_delete_snapshot(
            tdir, [{"source": "other"}], ["source"], commit_key="e0"
        )
        == s
    )
    entries = im.list_equality_delete_entries(tdir)
    assert len(entries) == 1 and entries[0]["cols"] == ["source"]
    assert entries[0]["seq"] == 2
    # positional listing unaffected; data listing unaffected
    assert im.list_delete_entries(tdir) == []
    assert sorted(p for p, _ in im.list_data_files(tdir)) == [a]
    # pre-delete snapshot has no equality entries
    md = im.read_table_metadata(tdir)
    pre = md["snapshots"][0]["snapshot-id"]
    assert im.list_equality_delete_entries(tdir, snapshot_id=pre) == []
    assert md["snapshots"][-1]["summary"]["added-equality-deletes"] == "1"


def test_equality_delete_refuses_float_columns(tmp_path):
    tdir = str(tmp_path / "tbl")
    schema = pa.schema([("doc_id", pa.string()), ("score", pa.float64())])
    im.create_table(tdir, schema, ts_ms=1_000)
    t = pa.table({"doc_id": ["d0"], "score": [1.5]}, schema=schema)
    p = str(tmp_path / "a.parquet")
    pq.write_table(t, p)
    im.append_snapshot(tdir, [p], ts_ms=2_000)
    with pytest.raises(ValueError, match="unsupported"):
        im.append_equality_delete_snapshot(tdir, [{"score": 1.5}], ["score"])


def test_equality_merge_on_read_sequence_rule(spark, tmp_path):
    """An equality delete erases matching rows only from files that
    PRECEDE it; the same values re-appended afterwards survive (the
    upsert pattern). Null values match null-safely."""
    from orc_format_spark.sources import iceberg

    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    a = _pfile(tmp_path / "a.parquet", 0, 6, source="web")       # seq 1
    b = _pfile(tmp_path / "b.parquet", 6, 4, source="books")     # seq 1
    im.append_snapshot(tdir, [a, b], ts_ms=2_000)
    im.append_equality_delete_snapshot(                          # seq 2
        tdir, [{"source": "web"}], ["source"], ts_ms=3_000
    )
    c = _pfile(tmp_path / "c.parquet", 2, 3, source="web")       # seq 3
    im.append_snapshot(tdir, [c], ts_ms=4_000)
    im.append_equality_delete_snapshot(                          # seq 4
        tdir, [{"doc_id": "d00003"}, {"doc_id": "d00008"}], ["doc_id"], ts_ms=5_000
    )
    got = sorted(r.doc_id for r in iceberg.read_tokens_table(spark, tdir).collect())
    # a (seq1 web) fully erased by seq2; c (seq3 web) survives seq2 but
    # loses d00003 to the seq4 doc_id delete; b loses d00008.
    assert got == ["d00002", "d00004", "d00006", "d00007", "d00009"]


def test_equality_delete_null_matching(spark, tmp_path):
    from orc_format_spark.sources import iceberg

    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    t = pa.table(
        {
            "doc_id": ["d0", "d1", "d2"],
            "n_tok": pa.array([1, 1, 1], pa.int32()),
            "source": ["web", None, None],
        },
        schema=SCHEMA,
    )
    p = str(tmp_path / "a.parquet")
    pq.write_table(t, p)
    im.append_snapshot(tdir, [p], ts_ms=2_000)
    im.append_equality_delete_snapshot(
        tdir, [{"source": None}], ["source"], ts_ms=3_000
    )
    got = sorted(r.doc_id for r in iceberg.read_tokens_table(spark, tdir).collect())
    assert got == ["d0"]


def test_split_encode_refuses_equality_dirty_files(spark, tmp_path):
    from orc_format_spark.sources import iceberg

    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    a = _pfile(tmp_path / "a.parquet", 0, 10)
    im.append_snapshot(tdir, [a], ts_ms=2_000)
    im.append_equality_delete_snapshot(
        tdir, [{"doc_id": "d00001"}], ["doc_id"], ts_ms=3_000
    )
    with pytest.raises(ValueError, match="equality delete"):
        iceberg.list_iceberg_splits(spark, tdir)
    # a file appended AFTER the delete is clean — but the pre-delete file
    # still blocks the scan until compaction
    b = _pfile(tmp_path / "b.parquet", 10, 5)
    im.append_snapshot(tdir, [b], ts_ms=4_000)
    with pytest.raises(ValueError, match="equality delete"):
        iceberg.list_iceberg_splits(spark, tdir)


def test_rewrite_retires_equality_deletes(spark, tmp_path):
    """Re-sequencing every pre-delete data file (compaction of the MoR
    view) leaves the equality delete applicable to nothing; the listing
    retires it and split-encode unblocks."""
    from orc_format_spark.sources import iceberg

    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    a = _pfile(tmp_path / "a.parquet", 0, 10, source="web")
    im.append_snapshot(tdir, [a], ts_ms=2_000)
    im.append_equality_delete_snapshot(
        tdir, [{"doc_id": "d00002"}, {"doc_id": "d00007"}], ["doc_id"], ts_ms=3_000
    )
    keep = sorted(r.doc_id for r in iceberg.read_tokens_table(spark, tdir).collect())
    assert len(keep) == 8
    compacted = str(tmp_path / "compacted.parquet")
    t = pq.read_table(a)
    mask = [i not in (2, 7) for i in range(t.num_rows)]
    pq.write_table(t.filter(pa.array(mask)), compacted)
    im.rewrite_snapshot(tdir, [a], [compacted], ts_ms=4_000)
    assert im.list_equality_delete_entries(tdir) == []  # applies to nothing
    splits = iceberg.list_iceberg_splits(spark, tdir)
    assert [s[1] for s in splits] == [compacted]
    got = sorted(r.doc_id for r in iceberg.read_tokens_table(spark, tdir).collect())
    assert got == keep


def test_equality_delete_dropped_column_raises(tmp_path):
    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    a = _pfile(tmp_path / "a.parquet", 0, 5)
    im.append_snapshot(tdir, [a], ts_ms=2_000)
    im.append_equality_delete_snapshot(
        tdir, [{"source": "web"}], ["source"], ts_ms=3_000
    )
    im.evolve_schema(tdir, drop=["source"], ts_ms=4_000)
    with pytest.raises(ValueError, match="dropped field id"):
        im.list_equality_delete_entries(tdir)


# ------------------------------------------------------ schema evolution


def test_evolve_schema_metadata(tmp_path):
    tdir = str(tmp_path / "tbl")
    im.create_table(
        tdir, SCHEMA, partition_spec=[("source", "identity")], ts_ms=1_000
    )
    last0 = im.read_table_metadata(tdir)["last-column-id"]
    sch = im.evolve_schema(tdir, add=[("lang", "string"), ("score", "double")], ts_ms=2_000)
    md = im.read_table_metadata(tdir)
    assert md["current-schema-id"] == 1 and len(md["schemas"]) == 2
    names = [f["name"] for f in sch["fields"]]
    assert names == ["doc_id", "n_tok", "source", "lang", "score"]
    assert md["last-column-id"] == last0 + 2
    # ids are fresh, never reused
    ids = [f["id"] for f in sch["fields"]]
    assert ids[-2:] == [last0 + 1, last0 + 2]
    im.evolve_schema(tdir, drop=["lang"], ts_ms=3_000)
    sch3 = im.evolve_schema(tdir, add=[("lang", "string")], ts_ms=4_000)
    # re-added name gets a NEW id (old stats maps can never misbind)
    assert next(f["id"] for f in sch3["fields"] if f["name"] == "lang") == last0 + 3
    with pytest.raises(ValueError, match="partition source"):
        im.evolve_schema(tdir, drop=["source"])
    with pytest.raises(ValueError, match="unknown column"):
        im.evolve_schema(tdir, drop=["nope"])
    with pytest.raises(ValueError, match="already exists"):
        im.evolve_schema(tdir, add=[("doc_id", "string")])
    with pytest.raises(ValueError, match="unsupported added type"):
        im.evolve_schema(tdir, add=[("m", "map<int,int>")])


def test_evolution_read_semantics(spark, tmp_path):
    """Old files under the evolved schema: added column reads null,
    dropped column disappears, no data rewrite."""
    from orc_format_spark.sources import iceberg

    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    a = _pfile(tmp_path / "a.parquet", 0, 5)
    im.append_snapshot(tdir, [a], ts_ms=2_000)
    im.evolve_schema(tdir, add=[("score", "double")], drop=["n_tok"], ts_ms=3_000)
    df = iceberg.read_tokens_table(spark, tdir)
    assert df.columns == ["doc_id", "source", "score"]
    rows = df.collect()
    assert len(rows) == 5 and all(r.score is None for r in rows)
    # a post-evolution file carries the new column; both eras coexist
    t = pa.table(
        {
            "doc_id": [f"e{i}" for i in range(3)],
            "source": ["web"] * 3,
            "score": [0.5, 1.5, 2.5],
        }
    )
    b = str(tmp_path / "b.parquet")
    pq.write_table(t, b)
    im.append_snapshot(tdir, [b], ts_ms=4_000)
    got = iceberg.read_tokens_table(spark, tdir)
    assert got.count() == 8
    scores = {r.doc_id: r.score for r in got.collect()}
    assert scores["e1"] == 1.5 and scores["d00001"] is None


# --------------------------------------------------- incremental scans


def test_incremental_splits_since_snapshot(spark, tmp_path):
    """since_snapshot_id plans only files appended after the watermark;
    a rewrite re-sequences its output so compacted data is re-encoded;
    an unknown watermark raises."""
    from orc_format_spark.sources import iceberg

    tdir = str(tmp_path / "tbl")
    im.create_table(tdir, SCHEMA, ts_ms=1_000)
    a = _pfile(tmp_path / "a.parquet", 0, 10)
    s1 = im.append_snapshot(tdir, [a], ts_ms=2_000)
    b = _pfile(tmp_path / "b.parquet", 10, 10)
    s2 = im.append_snapshot(tdir, [b], ts_ms=3_000)
    inc = iceberg.list_iceberg_splits(spark, tdir, since_snapshot_id=s1)
    assert sorted({f for _, f, _ in inc}) == [b]
    assert iceberg.list_iceberg_splits(spark, tdir, since_snapshot_id=s2) == []
    # full scan unchanged
    full = iceberg.list_iceberg_splits(spark, tdir)
    assert sorted({f for _, f, _ in full}) == sorted([a, b])
    # rewrite a -> c: c gets a fresh sequence number, so it IS the delta
    c = str(tmp_path / "c.parquet")
    pq.write_table(pq.read_table(a), c)
    im.rewrite_snapshot(tdir, [a], [c], ts_ms=4_000)
    inc2 = iceberg.list_iceberg_splits(spark, tdir, since_snapshot_id=s2)
    assert sorted({f for _, f, _ in inc2}) == [c]
    with pytest.raises(ValueError, match="unknown snapshot id"):
        iceberg.list_iceberg_splits(spark, tdir, since_snapshot_id=999)
