"""Distributed spherical k-means — the offline centroid trainer behind
the ``centroids=`` injection point of :func:`similarity.ivf_topk`,
:func:`semantic.assign_ivf_lists`, and :func:`semantic.semantic_dedup`.

Not in the reference repo (it is a file-format writer); this is the
standard IVF/SemDeDup practice (train k centroids offline where
k ~ sqrt(corpus), broadcast them, assign map-side) made runnable on the
corpus itself, Spark-first:

- **Init is deterministic metadata**: the k vectors with the smallest
  ``xxhash64(id)`` (a global top-k — TakeOrderedAndProject, never a full
  sort), hash-spread across the corpus regardless of id layout.
- **Each Lloyd iteration is one map pass + one tiny shuffle.** A
  broadcast centroid matrix rides into an Arrow-batched kernel that
  assigns every vector to its max-cosine centroid with one matmul and
  emits per-(partition, cluster) PARTIAL sums — at most k rows per
  partition, each O(D) doubles. The only exchange groups k*P partial
  rows (metadata-scale) by cluster id; payload vectors never shuffle.
- **Spherical update**: partials sum unit-normalized vectors; the new
  centroid is the renormalized mean — cosine k-means, matching the
  cosine assignment used everywhere else. An emptied cluster keeps its
  previous centroid (deterministic, no resampling).

Determinism: given a fixed input partitioning the result is exactly
reproducible — partials are summed in partition-id order inside the
final kernel, so float accumulation order is pinned. Across different
partitionings the usual float-sum caveat applies (document, don't
pretend): centroids may differ in the last ulp; downstream assignment
is exact GIVEN the centroids either way.

Returns a plain (k, D) float64 ndarray — precisely what the
``centroids=`` ndarray path consumes.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F

from ..worker_env import limit_worker_threads


def train_kmeans_centroids(
    emb: DataFrame,
    k: int = 64,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train ``k`` spherical (cosine) centroids with ``iters`` Lloyd
    iterations over ``emb``; returns a (k', D) float64 ndarray with
    k' <= k (deduplicated init vectors can shrink it). Zero-norm vectors
    are excluded from training, mirroring the assignment kernels."""
    import pyarrow as pa

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    vecs = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).filter(
        F.aggregate(
            F.col("_v"), F.lit(0.0), lambda acc, x: acc + x * x
        )
        > 0
    )

    # deterministic hash-spread init: global top-k by xxhash64(id) is a
    # TakeOrderedAndProject (per-partition heap + driver merge of k rows)
    init_rows = (
        vecs.withColumn("_h", F.xxhash64(F.col("_id")))
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    if not init_rows:
        raise ValueError("train_kmeans_centroids: no non-zero vectors")
    cent = np.array([r["_v"] for r in init_rows], dtype=np.float64)
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    cent = np.unique(cent, axis=0)  # duplicate init vectors collapse

    partial_ddl = "pid int, cid int, n long, s array<double>"

    for _ in range(iters):
        cmat = cent  # captured by the kernel closure -> broadcast once
        dims = cmat.shape[1]

        def partials(batches):
            limit_worker_threads()
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            acc_n = np.zeros(len(cmat), np.int64)
            acc_s = np.zeros((len(cmat), dims), np.float64)
            seen = False
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                seen = True
                t = pa.Table.from_batches([batch])
                col = t.column("_v").combine_chunks()
                flat = col.flatten().to_numpy(zero_copy_only=False)
                if flat.size != len(col) * dims:
                    raise ValueError(
                        f"embedding dims vary: {flat.size} values over "
                        f"{len(col)} vectors (expected {dims}/vector)"
                    )
                x = flat.reshape(len(col), dims)
                xn = x / np.linalg.norm(x, axis=1, keepdims=True)
                best = np.argmax(xn @ cmat.T, axis=1)
                np.add.at(acc_n, best, 1)
                np.add.at(acc_s, best, xn)
            if not seen:
                return
            live = np.nonzero(acc_n)[0]
            yield pa.record_batch(
                [
                    pa.array(np.full(len(live), pid, np.int32), pa.int32()),
                    pa.array(live.astype(np.int32), pa.int32()),
                    pa.array(acc_n[live], pa.int64()),
                    pa.array(
                        acc_s[live].tolist(), pa.list_(pa.float64())
                    ),
                ],
                names=["pid", "cid", "n", "s"],
            )

        def reduce_cluster(tbl: pa.Table) -> pa.Table:
            limit_worker_threads()
            # explicit submodule import: bare `pyarrow` does not expose
            # .compute until something imports it; don't rely on the
            # pyspark worker having done so
            import pyarrow.compute as pc

            order = pc.sort_indices(tbl.column("pid"))
            t = tbl.take(order)  # pin float accumulation order
            cid = t.column("cid")[0].as_py()
            n = int(pc.sum(t.column("n")).as_py())
            sv = t.column("s").combine_chunks()
            flat = sv.flatten().to_numpy(zero_copy_only=False)
            total = flat.reshape(len(sv), dims).sum(axis=0)
            return pa.table(
                {
                    "cid": pa.array([cid], pa.int32()),
                    "n": pa.array([n], pa.int64()),
                    "s": pa.array([total.tolist()], pa.list_(pa.float64())),
                }
            )

        agg = (
            vecs.mapInArrow(partials, partial_ddl)
            .groupBy("cid")
            .applyInArrow(reduce_cluster, "cid int, n long, s array<double>")
            .collect()  # k rows, O(k*D) doubles — metadata-scale
        )
        new = cent.copy()  # emptied clusters keep their centroid
        for r in agg:
            mean = np.asarray(r.s, np.float64) / r.n
            norm = np.linalg.norm(mean)
            if norm > 0:
                new[r.cid] = mean / norm
        cent = new

    return cent
