"""Similarity search over embedding columns (``array<float>``).

Two tiers, as a 100-TB ANN story needs:

* ``cosine_topk`` — exact brute force: broadcast the (small) query set,
  score every corpus vector with codegen'd array expressions
  (``zip_with`` + ``aggregate``), take top-k per query with a window.
  Cost O(|queries| * |corpus|) — the correctness baseline and the
  re-ranker for candidates.
* ``signbucket_topk`` — LSH-style scale path: vectors bucket by the sign
  pattern of their leading components (a fixed, data-independent
  hyperplane family), and scoring happens only within buckets — the
  cross product shrinks by ~2^m. Deterministic and ANSI-SQL-expressible,
  so the oracle verifies it end-to-end.

All math is done in double precision and cosine is rounded to 6dp before
ranking (vec_id tie-break) so results are reproducible across engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from news_data_pipeline_spark.functions.exact import settled_round
from news_data_pipeline_spark.operators.fanout import fan_out


def _as_double(col) -> Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Queries are broadcast (they're the small side by construction); the
    corpus is scanned once with no shuffle until the per-query top-k,
    which AQE plans as a partial top-k per partition. Norms are hoisted
    to one computation per VECTOR before the join — higher-order array
    expressions are interpreted (not codegen'd), so evaluating them per
    PAIR would cost |queries|x more.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("q_vec"),
    ).withColumn("q_nrm", l2_norm(F.col("q_vec")))
    # fan_out: the per-(query, vector) array folds below pipeline onto
    # the corpus scan — a one-task scan would serialize all the math
    c = fan_out(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(vec_col).alias("c_vec"),
        )
    ).withColumn("c_nrm", l2_norm(F.col("c_vec")))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                # nullif: a zero-norm vector (empty doc, padding row)
                # must score null, not abort the job with ANSI
                # DIVIDE_BY_ZERO
                / F.nullif(F.col("q_nrm") * F.col("c_nrm"), F.lit(0.0)),
                6,
            ).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lo: float = 0.5,
    hi: float = 0.95,
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-``k`` corpus vectors whose cosine falls in ``[lo, hi)`` — close
    enough to be informative negatives, below the near-duplicate band
    where a "negative" is really an unlabeled positive (the classic
    false-negative trap in DPR/E5-style training data).

    Same conventions as ``cosine_topk`` (6dp cosine, neighbor-id
    tie-break, self-pairs excluded, null/zero-norm vectors drop), so
    the mined pairs and the retrieval eval share one geometry. The
    band bounds compare against the ROUNDED score — deterministic
    cross-engine, no half-open boundary drift.

    Scale shape: identical to ``cosine_topk`` — queries broadcast, one
    corpus scan, partial top-k per partition. At billions of vectors,
    mine from an ANN shortlist instead (``pq_ivf_rerank_topk`` with a
    large ``rerank``, then band-filter): the band's upper cut makes
    recall loss harmless, since any neighbor the index misses is by
    construction far from the decision boundary.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("q_vec"),
    ).withColumn("q_nrm", l2_norm(F.col("q_vec")))
    c = fan_out(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(vec_col).alias("c_vec"),
        )
    ).withColumn("c_nrm", l2_norm(F.col("c_vec")))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                / F.nullif(F.col("q_nrm") * F.col("c_nrm"), F.lit(0.0)),
                6,
            ).alias("cosine_sim"),
        )
        .where(
            (F.col("cosine_sim") >= lo) & (F.col("cosine_sim") < hi)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def sign_bucket(vec: Column, m: int = 8) -> Column:
    """Bucket key = sign bits of the first ``m`` components.

    A fixed axis-aligned hyperplane family: data-independent,
    deterministic, and expressible in ANSI SQL for oracle verification.
    """
    bits = [
        # F.get is null out-of-bounds (no ANSI error, unlike element_at),
        # so vectors shorter than m bucket with '0' bits instead of
        # failing the job — DuckDB list indexing is null OOB too, so the
        # oracle agrees.
        F.when(F.get(vec, i) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(m)
    ]
    return F.concat(*bits)


def signbucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
) -> DataFrame:
    """Approximate top-k: score only within matching sign buckets.

    The join is a plain equi-join on the bucket key, so it shuffles by
    bucket instead of cross-producting — the scale path, with
    ``cosine_topk`` as the exact re-ranker when recall must be 1.0.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("q_vec"),
        sign_bucket(_as_double(vec_col), m).alias("bucket"),
    ).withColumn("q_nrm", l2_norm(F.col("q_vec")))
    c = fan_out(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(vec_col).alias("c_vec"),
            sign_bucket(_as_double(vec_col), m).alias("bucket"),
        )
    ).withColumn("c_nrm", l2_norm(F.col("c_vec")))
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                # nullif: a zero-norm vector (empty doc, padding row)
                # must score null, not abort the job with ANSI
                # DIVIDE_BY_ZERO
                / F.nullif(F.col("q_nrm") * F.col("c_nrm"), F.lit(0.0)),
                6,
            ).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def multitable_signbucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    tables: int = 4,
) -> DataFrame:
    """OR-amplified sign-LSH top-k: ``tables`` independent bucket
    families, a pair is a candidate if it collides in ANY table —
    the classic Charikar random-hyperplane scheme's recall lever
    (single-table ``signbucket_topk`` misses any true neighbor whose
    signs differ in the one projection; each extra table multiplies
    the miss probability). Table ``t`` buckets on the sign bits of
    components ``[t*m, t*m + m)`` — axis-aligned and deterministic,
    the same oracle-expressible family as ``sign_bucket``; vectors
    shorter than ``tables*m`` degrade to '0' bits, never fail.

    Plan shape: each side explodes to ``tables`` (id, bucket) rows —
    a bounded linear fan-out — and candidates come from the per-table
    bucket equi-join (shuffle by bucket, never a cross product). A
    pair colliding in several tables scores identically each time, so
    OR-amplification's dedup is one ``distinct`` over the scored
    candidate rows (bounded by candidates, not corpus²). Exact
    re-rank on recall-critical paths stays ``cosine_topk``.
    """

    def table_buckets(vec: Column) -> Column:
        return F.array(
            *[
                F.concat(
                    F.lit(f"{t}:"),
                    *[
                        F.when(
                            F.get(vec, t * m + j) >= 0, F.lit("1")
                        ).otherwise(F.lit("0"))
                        for j in range(m)
                    ],
                )
                for t in range(tables)
            ]
        )

    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(vec_col).alias("q_vec"),
            F.explode(table_buckets(_as_double(vec_col))).alias("bucket"),
        )
        .withColumn("q_nrm", l2_norm(F.col("q_vec")))
    )
    c = (
        fan_out(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                _as_double(vec_col).alias("c_vec"),
            )
        )
        .select(
            "neighbor_id",
            "c_vec",
            F.explode(table_buckets(F.col("c_vec"))).alias("bucket"),
        )
        .withColumn("c_nrm", l2_norm(F.col("c_vec")))
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                / F.nullif(F.col("q_nrm") * F.col("c_nrm"), F.lit(0.0)),
                6,
            ).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim").isNotNull())
        # OR-amplification: a pair colliding in several tables is the
        # same candidate — identical score, so distinct IS the dedup
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors, scored with Arrow-batched BLAS.

    The scale path for the exact scorer: same semantics as
    ``cosine_topk`` (round-6dp cosine, neighbor-id tie-break, zero-norm
    vectors dropped), but the |Q|x|C| scoring runs as one matrix
    multiply per Arrow batch inside ``mapInPandas`` instead of an
    interpreted array fold per pair. The query matrix rides a broadcast
    variable (queries are the small side by construction); each corpus
    partition emits only its local top-k per query, so the shuffle into
    the final global top-k carries ``partitions * |Q| * k`` rows — not
    scores. Local-then-global top-k is exact because both stages use
    the same total order (rounded cosine desc, neighbor id asc).

    Per-pair float math differs from the JVM fold only in summation
    order (BLAS is blocked/pairwise, the fold is sequential), i.e. in
    the last ulp before the 6dp round — so this variant is for
    throughput, while ``cosine_topk`` stays the oracle-verified twin.
    ``tests/test_joins_similarity.py`` pins the two paths equal on
    exactly-representable vectors.
    """
    import numpy as np
    import pandas as pd

    id_type = corpus.schema[id_col].dataType.simpleString()
    q_rows = (
        queries.select(F.col(id_col), _as_double(vec_col).alias("v"))
        .where(F.col("v").isNotNull())
        .collect()
    )
    if not q_rows:
        empty = "query_id {t}, neighbor_id {t}, cosine_sim double, rank int".format(
            t=id_type
        )
        return corpus.sparkSession.createDataFrame([], empty)
    q_ids = np.array([r[0] for r in q_rows])
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_nrm = np.linalg.norm(Q, axis=1)
    keep = q_nrm > 0.0  # zero-norm queries score null everywhere: drop
    q_ids, Q, q_nrm = q_ids[keep], Q[keep], q_nrm[keep]
    Qt = (Q / q_nrm[:, None]).T  # (d, |Q|), pre-normalized once
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, Qt))

    out_schema = (
        f"query_id {id_type}, neighbor_id {id_type}, cosine_sim double"
    )

    def score(batches):
        ids_b, Qt_b = bq.value
        nq = ids_b.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(list(pdf[vec_col]), dtype=np.float64)
            nrm = np.linalg.norm(C, axis=1)
            ok = nrm > 0.0
            if not ok.any():
                continue
            C, nrm = C[ok], nrm[ok]
            n_ids = pdf[id_col].to_numpy()[ok]
            sims = np.round((C / nrm[:, None]) @ Qt_b, 6)  # (n, |Q|)
            # self-pairs out of the running before top-k selection
            self_mask = n_ids[:, None] == ids_b[None, :]
            sims[self_mask] = -np.inf
            kk = min(k, sims.shape[0])
            # per-query local top-k: argsort on (sim desc, neighbor asc)
            order = np.lexsort((n_ids[:, None].repeat(nq, 1), -sims), axis=0)[:kk]
            qi = np.repeat(np.arange(nq)[None, :], kk, 0).ravel()
            ni = order.ravel()
            sel = sims[ni, qi]
            fin = np.isfinite(sel)
            yield pd.DataFrame(
                {
                    "query_id": ids_b[qi[fin]],
                    "neighbor_id": n_ids[ni[fin]],
                    "cosine_sim": sel[fin],
                }
            )

    local = fan_out(corpus.select(id_col, _as_double(vec_col).alias(vec_col))).mapInPandas(
        score, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def kmeans_iterate(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 1,
) -> DataFrame:
    """Lloyd iterations in-engine: the IVF centroid-training step that
    ``ivf_topk`` takes as an injectable input.

    Per iteration: assign every vector to its nearest centroid (one
    broadcast pass, same rounded-distance + cid tie-break rule as
    ``ivf_topk`` so training and probing agree on cell boundaries),
    then recompute each centroid as the element-wise mean of its
    members — posexplode to (cid, pos, component), one map-side-
    combinable average per (cid, pos), reassemble ordered by position.
    Cost per iteration: one broadcast join + two groupBys; nothing
    quadratic. Empty cells keep their previous centroid (standard Lloyd
    behavior) rather than vanishing.

    This function RUNS ``iters`` jobs at call time (like any ``fit``):
    each iteration collects the ``nlist`` centroid rows — and only
    those — to the driver and re-plants them as a literal frame for the
    next pass. The literal keeps every iteration's plan the same size
    (the alternative — chaining plans — embeds the previous iteration
    twice per pass, and Catalyst analysis blows up exponentially; a
    ``localCheckpoint`` would fix the plan but pins non-reliable blocks
    that outlive the call, survive ``clearCache``, and vanish with a
    lost executor instead of recomputing). The returned frame is a
    plain literal: lazy, composable, nothing retained.

    Returns (cid, centroid) with components rounded to 6dp — the
    cross-engine-stable precision the distance rounding expects.
    """
    spark = corpus.sparkSession
    cents = centroids.select(
        F.col("cid"), _as_double("centroid").alias("c_vec")
    )
    cent_schema = cents.schema
    vecs = fan_out(
        corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    )
    rows = [(r["cid"], r["c_vec"]) for r in cents.collect()]
    for _ in range(iters):
        cents = spark.createDataFrame(rows, cent_schema)
        c2 = cents.withColumn("c2", dot(F.col("c_vec"), F.col("c_vec")))
        # the SHARED assignment rule (_assign_cells) — training must
        # use the same rounded-distance + cid tie-break as probing
        assigned = _assign_cells(vecs, c2, "id", "v", "id", 1).select(
            "cid", "v"
        )
        by_pos = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
        )
        new_cents = by_pos.groupBy("cid").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("c_vec")
        )
        updated = {r["cid"]: r["c_vec"] for r in new_cents.collect()}
        # empty cells keep their previous centroid
        rows = [(cid, updated.get(cid, vec)) for cid, vec in rows]
    return spark.createDataFrame(rows, cent_schema).select(
        "cid", F.col("c_vec").alias("centroid")
    )


def _assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    n_cells: int,
) -> DataFrame:
    """Nearest-``n_cells`` centroid assignment shared by IVF probing,
    k-means training, and semantic dedup: broadcast the (cid, c_vec, c2)
    centroid frame, rank by 6dp-rounded -2*dot(v,c) + ||c||^2 with
    centroid-id tie-break — ONE assignment rule, so trained cells,
    probed cells, and dedup cells can never disagree.

    Physical shape (r14): for ``n_cells == 1`` — every corpus-sized
    assignment in the family — the argmin is ROW-LOCAL: the bounded
    centroid frame collapses to a one-row array via ``collect_list``
    (nlist structs, broadcast), and each vector picks its cell with an
    ``array_min`` over per-centroid (dist, cid) structs. Zero shuffle,
    zero sort — the window form shuffled the 16x-fanned-out vector
    payload and sorted it per id just to keep row 1 (guide §2.4: the
    assignment is algebraically a map). Ordering is identical: struct
    comparison is lexicographic (dist asc, cid asc), a NULL distance
    (null vector/centroid) coalesces to -inf exactly where the window's
    ``asc_nulls_first`` put it, and NaN sorts greatest in both forms.
    ``n_cells > 1`` (query-side probing — bounded rows by construction)
    keeps the window form, which a handful of query rows never feels.
    """
    base = fan_out(
        df.select(F.col(id_col).alias(out_id), _as_double(vec_col).alias("v"))
    )
    if n_cells == 1:
        # one row carrying the whole (bounded) centroid frame; the
        # size guard keeps the empty-centroids case emitting zero rows
        # exactly like the cross join did
        cents = (
            centroids.agg(
                F.collect_list(F.struct("cid", "c_vec", "c2")).alias(
                    "__cents"
                )
            ).where(F.size("__cents") > 0)
        )
        best = F.array_min(
            F.transform(
                F.col("__cents"),
                lambda c: F.struct(
                    F.coalesce(
                        F.round(
                            -2 * dot(F.col("v"), c["c_vec"]) + c["c2"], 6
                        ),
                        F.lit(float("-inf")),
                    ).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        )
        return base.join(F.broadcast(cents), how="cross").select(
            out_id, best["cid"].alias("cid"), "v"
        )
    scored = base.join(F.broadcast(centroids), how="cross")
    w = Window.partitionBy(out_id).orderBy(
        F.round(-2 * dot(F.col("v"), F.col("c_vec")) + F.col("c2"), 6),
        F.asc("cid"),
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= n_cells)
        .select(out_id, "cid", "v")
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    nlist: int = 16,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: coarse-quantize
    the corpus into ``nlist`` k-means cells, then score cosine ONLY
    within each cell and keep pairs at ``cosine >= threshold``.

    This is the embedding twin of LSH banding, with the partition
    function learned from the data instead of fixed hyperplanes: a
    semantic duplicate lands in its twin's cell (they share a nearest
    centroid long before they share a paraphrase), so the all-pairs
    product shrinks to sum(cell²) — and cells are capacity-bounded by
    the centroid count, which an offline k-means job (``kmeans_iterate``)
    keeps balanced. Feed the pairs to ``graph.connected_components``
    for cluster labels, then ``dedup.keep_best_per_cluster`` to pick
    survivors. Default centroids: first ``nlist`` corpus vectors by id
    (deterministic, oracle-reproducible) — inject a trained frame in
    production.
    """
    if centroids is None:
        centroids = (
            corpus.orderBy(id_col)
            .limit(nlist)
            .select(
                F.col(id_col).alias("cid"), _as_double(vec_col).alias("c_vec")
            )
        )
    centroids = centroids.withColumn("c2", dot(F.col("c_vec"), F.col("c_vec")))
    cells = _assign_cells(corpus, centroids, id_col, vec_col, "id", 1)
    v = cells.withColumn("nrm", l2_norm(F.col("v")))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.cid") == F.col("b.cid"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                dot(F.col("a.v"), F.col("b.v"))
                / F.nullif(F.col("a.nrm") * F.col("b.nrm"), F.lit(0.0)),
                6,
            ).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the corpus
    into ``nlist`` cells, probe each query's ``nprobe`` nearest cells.

    The other classic ANN sharding besides sign-bucket LSH: corpus cost
    is one broadcast pass over ``nlist`` centroids (assignment), query
    cost |C|·nprobe/nlist scoring instead of |C|. ``centroids`` is an
    injectable (id, vector) frame — in production an offline k-means
    job; by default the first ``nlist`` corpus vectors by id, which is
    deterministic and oracle-reproducible. Squared L2 to centroids uses
    the dot-product identity (||a||²-2a·c+||c||²), rounded to 6dp with
    centroid-id tie-break so cell assignment is reproducible across
    engines.
    """
    if centroids is None:
        centroids = (
            corpus.orderBy(id_col).limit(nlist)
            .select(F.col(id_col).alias("cid"), _as_double(vec_col).alias("c_vec"))
        )
    else:
        # Explicit naming wins: (id_col, vec_col) if present, else
        # kmeans_iterate's (cid, centroid) output so training composes
        # directly. A frame carrying neither pair is a caller error —
        # raise instead of guessing (a stray 'cid' column next to the
        # intended id_col must not silently repoint the selection).
        cols = set(centroids.columns)
        if {id_col, vec_col} <= cols:
            cid_src, vec_src = id_col, vec_col
        elif {"cid", "centroid"} <= cols:
            cid_src, vec_src = "cid", "centroid"
        else:
            raise ValueError(
                f"ivf_topk centroids must carry ({id_col!r}, {vec_col!r}) "
                f"or ('cid', 'centroid'); got {sorted(cols)}"
            )
        centroids = centroids.select(
            F.col(cid_src).alias("cid"), _as_double(vec_src).alias("c_vec")
        )

    # ||c||^2 hoisted once per centroid; dot(v,v) is rank-invariant per
    # vector, so assignment ordering needs only -2*dot(v,c) + ||c||^2 —
    # one interpreted array fold per (vector, centroid) instead of three
    centroids = centroids.withColumn("c2", dot(F.col("c_vec"), F.col("c_vec")))

    def assign(df: DataFrame, out_id: str, n_cells: int) -> DataFrame:
        return _assign_cells(df, centroids, id_col, vec_col, out_id, n_cells)

    corpus_cells = assign(corpus, "neighbor_id", 1)
    query_cells = assign(queries, "query_id", nprobe).select(
        "query_id", "cid", F.col("v").alias("q_vec")
    ).withColumn("q_nrm", l2_norm(F.col("q_vec")))
    scored = (
        corpus_cells.withColumn("c_nrm", l2_norm(F.col("v")))
        .join(F.broadcast(query_cells), on="cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("q_vec"), F.col("v"))
                / F.nullif(F.col("q_nrm") * F.col("c_nrm"), F.lit(0.0)),
                6,
            ).alias("cosine_sim"),
        )
        # a query probing nprobe cells can meet the same corpus vector
        # only once (each corpus vector lives in exactly one cell)
        .where(F.col("cosine_sim").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _cov_moments(df: DataFrame, vec_col: str) -> DataFrame:
    """Shared (i, j, __exy, __ex, __ey) moment aggregate over the
    double-exploded components — embedding_covariance projects it to
    cov; pca_project reuses the SAME single pass for both the
    covariance and the per-dimension means (no second corpus scan)."""
    v = fan_out(
        df.select(_as_double(vec_col).alias("v")).where(
            F.col("v").isNotNull()
        )
    )
    pairs = v.select(
        F.posexplode("v").alias("i", "xi"), F.col("v")
    ).select("i", "xi", F.posexplode("v").alias("j", "xj"))
    return pairs.groupBy("i", "j").agg(
        F.avg(F.col("xi") * F.col("xj")).alias("__exy"),
        F.avg("xi").alias("__ex"),
        F.avg("xj").alias("__ey"),
        F.count(F.lit(1)).alias("__n"),
    )


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Sample covariance matrix of an embedding column as scalar
    ``(i, j, cov)`` rows (population normalization, 6dp).

    cov[i,j] = avg(x_i * x_j) - avg(x_i) * avg(x_j): three plain
    aggregates over the double-exploded components, all map-side
    combined — one shuffle of d^2 partial sums per partition, nothing
    driver-side, no d x d matrix object until a consumer collects the
    d^2 scalar rows (64-dim => 4096 rows; trivially collectable at any
    corpus size because the output depends on d, not rows). Null
    vectors are skipped; rows must share one dimensionality — a ragged
    corpus averages each (i, j) entry over only the rows long enough to
    have both components, so entries come from inconsistent subsets
    (``pca_project`` detects this via the per-pair counts and raises;
    validate dimensionality first if consuming this frame directly).

    The double explode is O(rows * d^2) expansion — the right plan up
    to a few hundred dimensions, where d^2 stays ~10^4-10^5 per row and
    everything remains codegen'd; for thousand-dim embeddings switch to
    an Arrow ``mapInPandas`` partial X^T X (the ``cosine_topk_arrow``
    pattern) and merge partials with the same aggregate.
    """
    return _cov_moments(df, vec_col).select(
        "i",
        "j",
        # + 0.0 folds IEEE -0.0 to +0.0: repr-sorting canonicalizers
        # order the two zeros differently and misalign row streams
        # settled half-up (engine/version-stable round); the moment
        # AVERAGES themselves are double sums whose order the
        # determinism probe + oracle gate watch (see module docs)
        (
            settled_round(F.col("__exy") - F.col("__ex") * F.col("__ey"), 6)
            + F.lit(0.0)
        ).alias("cov"),
    )


def pca_fit(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    k: int = 2,
):
    """Fit the PCA model: ``(W, mu, eigvals, C)`` as numpy arrays —
    the (d, k) projection matrix (decreasing-eigenvalue order,
    sign-canonicalized), the per-dimension means, the top-``k``
    eigenvalues, and the settled d x d covariance the eigensolve ran
    on (identical cell-for-cell to ``embedding_covariance``'s published
    values). ONE distributed moment pass; the eigensolve is driver-side
    on the tiny d x d matrix. Split out of ``pca_project`` so invariant
    checks (projected variance == eigenvalue, cross-component
    covariance == 0) can reach the model the projection used.
    """
    import math

    import numpy as np

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # ONE distributed pass: the shared moment aggregate carries both
    # the covariance entries and the per-dimension means (round-6 cov
    # to match embedding_covariance's published values exactly)
    cov_rows = _cov_moments(df, vec_col).collect()
    if not cov_rows:
        raise ValueError("pca_project: no non-null vectors to fit on")
    # ragged corpora make the per-(i, j) averages run over mutually
    # inconsistent row subsets — refuse loudly instead of fitting a
    # silently wrong covariance
    if len({r["__n"] for r in cov_rows}) > 1:
        raise ValueError(
            "pca_project: vectors have inconsistent dimensionality "
            "(per-dimension-pair counts differ); filter to one "
            "dimension first"
        )
    d = max(r["i"] for r in cov_rows) + 1
    if k > d:
        raise ValueError(f"k={k} exceeds dimensionality d={d}")
    C = np.zeros((d, d))
    mu = np.zeros(d)
    for r in cov_rows:
        # same settle as embedding_covariance publishes (Python round
        # is half-even; floor(x*1e6+0.5) is the engine-shared half-up)
        C[r["i"], r["j"]] = (
            math.floor((r["__exy"] - r["__ex"] * r["__ey"]) * 1e6 + 0.5) / 1e6
        )
        mu[r["i"]] = r["__ex"]
    vals, vecs = np.linalg.eigh((C + C.T) / 2.0)
    order = np.argsort(vals)[::-1][:k]
    W = vecs[:, order]  # (d, k)
    flip = np.sign(W[np.abs(W).argmax(axis=0), np.arange(k)])
    flip[flip == 0] = 1.0
    W = W * flip
    return W, mu, vals[order], C


def pca_project(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 2,
) -> DataFrame:
    """Project embeddings onto their top-``k`` principal components:
    ``(id, pc)`` with ``pc`` an ``array<double>`` of length ``k``.

    Scale shape: the ONLY distributed work is ONE covariance-moment
    aggregate (see ``_cov_moments`` — d^2 scalar rows, corpus-size
    independent, and it carries the centering means so no second
    corpus scan is needed); the eigendecomposition runs driver-side on the tiny
    d x d matrix (64x64 here — microseconds, and the classic split for
    PCA at corpus scale: data-sized work distributed, model-sized work
    local), and the d x k projection matrix returns as a broadcast
    literal applied with codegen'd array math. Deterministic sign
    convention: each eigenvector is flipped so its largest-magnitude
    component is positive (eigh's sign is otherwise arbitrary and would
    flip across BLAS builds).

    Means are subtracted before projection (PCA is centered by
    definition). Components come out in DECREASING eigenvalue order.
    """
    W, mu, _, _ = pca_fit(df, vec_col=vec_col, k=k)
    d, k = W.shape
    w_lit = F.array(
        *[
            F.array(*[F.lit(float(W[i, c])) for i in range(d)])
            for c in range(k)
        ]
    )
    mu_lit = F.array(*[F.lit(float(m)) for m in mu])
    centered = F.zip_with(
        _as_double(vec_col), mu_lit, lambda x, m: x - m
    )
    proj = F.transform(
        w_lit,
        lambda col_w: F.round(
            F.aggregate(
                F.zip_with(centered, col_w, lambda x, w: x * w),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ),
    )
    return df.select(F.col(id_col), proj.alias("pc"))
