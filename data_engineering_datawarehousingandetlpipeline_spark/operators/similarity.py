"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring what a 100 TB vector pipeline needs:

- **brute-force cosine top-k** — exact; the crossJoin is bounded by
  broadcasting the (small) query side, so the big side streams through one
  codegen stage with no shuffle. This is the correctness baseline and the
  right choice whenever |queries| × |corpus| fits a scan budget.
- **LSH-bucketed ANN** (random-hyperplane signs) — approximate; documents
  hash to sign-pattern buckets, candidates come only from the query's
  bucket, turning O(Q×N) into O(Q×bucket). The hyperplanes are a
  deterministic md5-derived pseudo-random matrix so results are
  reproducible across engines and runs (no ``Math.random`` anywhere).

All vector math is built-in array expressions (``zip_with`` +
``aggregate``) over DOUBLE — JVM-side, vectorized, no Python UDF. Cosines
are rounded to 6 decimals before ranking so Spark/DuckDB float summation
agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_datawarehousingandetlpipeline_spark.session import spread

#: rounding applied to cosine before thresholding/ranking (engine parity).
COSINE_SCALE = 6


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    da, db = _as_double(a), _as_double(b)
    # try_divide: a zero vector has norm 0 — NULL cosine in both engines
    # instead of an ANSI divide-by-zero failure.
    return F.round(F.try_divide(dot(da, db), norm(da) * norm(db)), COSINE_SCALE)


def cosine_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (small) broadcasts; the corpus scans once. Ranking uses
    row_number over (query | cosine desc, id asc) — deterministic ties.
    Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes.

    Component j ∈ {−1, +1} by the parity of one md5-derived hex digit —
    reproducible in any engine/language, which keeps the ANN index stable
    across the fleet (a real deployment would persist the matrix; a
    content-derived one needs no storage or broadcast).
    """
    import hashlib

    comps: list[float] = []
    counter = 0
    while len(comps) < dim:
        digest = hashlib.md5(f"plane|{seed}|{counter}".encode()).hexdigest()
        for ch in digest:
            if len(comps) >= dim:
                break
            comps.append(1.0 if int(ch, 16) % 2 == 1 else -1.0)
        counter += 1
    return comps


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit b set iff dot(vec, plane_b) >= 0."""
    dv = _as_double(vec)
    bucket = F.lit(0).cast("bigint")
    for b, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(p) for p in plane])
        # round before the sign test so last-bit float drift between engines
        # cannot flip a bucket bit (same contract as the cosine rounding).
        bucket = bucket + F.when(
            F.round(dot(dv, plane_col), COSINE_SCALE) >= 0, F.lit(2**b)
        ).otherwise(0)
    return bucket


def cosine_top_k_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates share the query's random-hyperplane bucket.

    Recall < 1 by construction (bucket boundaries); at scale the win is
    that each query scores only ~N/2^planes candidates. Same deterministic
    ranking contract as :func:`cosine_top_k`.
    """
    planes = [hyperplane(b, dim) for b in range(n_planes)]
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _seq_norm(vec: list[float]) -> float:
    """Driver-side norm with the SAME sequential float64 fold as dot/norm.

    Bit-identical to ``sqrt(aggregate(zip_with(v,v,*),0.0,+))`` and to the
    oracle's ``sqrt(list_dot_product(v,v))`` — required so precomputing
    centroid norms cannot drift from computing them in-engine.
    """
    import math

    acc = 0.0
    for x in vec:
        acc += x * x
    return math.sqrt(acc)


def _centroid_rank_array(
    dv: Column, nv: Column, centroids: list[tuple[int, list[float]]]
) -> Column:
    """Centroid ids sorted by similarity to a vector (desc, id-asc ties).

    ``dv``/``nv`` are the pre-projected double vector and its norm (computed
    once per row — a lambda cannot hoist them). The centroid matrix is ONE
    array-of-arrays literal indexed inside a single ``transform``, and
    centroid norms are precomputed driver-side with the identical fold —
    keeping the expression tree small (planning time on wide literal trees
    otherwise dwarfs execution). (-cos, cid) structs sort ascending =
    cosine descending with deterministic ties. No shuffle, no join.
    """
    mat = F.array(*[F.array(*[F.lit(x) for x in cvec]) for _, cvec in centroids])
    norms = F.array(*[F.lit(_seq_norm(cvec)) for _, cvec in centroids])
    ids = F.array(*[F.lit(cid) for cid, _ in centroids])
    return F.array_sort(
        F.transform(
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda i: F.struct(
                (-F.round(dot(dv, mat[i]) / (nv * norms[i]), COSINE_SCALE)).alias(
                    "negs"
                ),
                ids[i].alias("cid"),
            ),
        )
    )


def cosine_top_k_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN top-k: coarse quantize, probe the nearest clusters.

    The inverted-file structure: every corpus vector is assigned to its
    nearest centroid (coarse quantizer); a query scores only vectors in its
    ``n_probe`` nearest clusters. Centroids here are the first
    ``n_centroids`` corpus vectors — deterministic and engine-reproducible
    (a production build would k-means them; the index mechanics are
    identical). At scale: assignment is a shuffle-free scan (centroid
    literals in the expression), the probe set broadcasts, and the only
    wide operation is the final per-query top-k — the IVF win is scoring
    ~n_probe/n_centroids of the corpus instead of all of it.
    """
    cent_rows = (
        corpus.filter(F.col(id_col) < n_centroids)
        .select(F.col(id_col).cast("int"), _as_double(F.col(vec_col)))
        .collect()
    )
    centroids = [(int(r[0]), [float(x) for x in r[1]]) for r in cent_rows]

    corpus_pre = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        _as_double(F.col(vec_col)).alias("dv"),
    ).withColumn("nv", norm(F.col("dv")))
    assigned = corpus_pre.select(
        "neighbor_id",
        "vec",
        _centroid_rank_array(F.col("dv"), F.col("nv"), centroids)[0]["cid"].alias(
            "cid"
        ),
    )
    query_pre = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        _as_double(F.col(vec_col)).alias("dv"),
    ).withColumn("nv", norm(F.col("dv")))
    probes = query_pre.select(
        "query_id",
        "query_vec",
        F.explode(
            F.transform(
                F.slice(
                    _centroid_rank_array(F.col("dv"), F.col("nv"), centroids),
                    1,
                    n_probe,
                ),
                lambda s: s["cid"],
            )
        ).alias("cid"),
    )
    scored = (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join.

    Pairs must share an LSH bucket (prunes the quadratic blow-up), then the
    exact cosine filters at ``threshold``. Output (id_a, id_b, cos_sim),
    id_a < id_b.
    """
    planes = [hyperplane(b, dim) for b in range(n_planes)]
    tagged = spread(df).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    left = tagged.select(
        F.col("vid").alias("id_a"), F.col("vec").alias("vec_a"), "bucket"
    )
    right = tagged.select(
        F.col("vid").alias("id_b"), F.col("vec").alias("vec_b"), "bucket"
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("vec_a"), F.col("vec_b")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )
