"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a random-
hyperplane LSH bucketed variant as the scale path. Dot products are
pure ``zip_with``/``aggregate`` higher-order functions — JVM-side,
no Python in the loop.

Scale notes: brute force is O(N) per query but embarrassingly
parallel and shuffle-free until the final top-k (a
TakeOrderedAndProject, which aggregates only k rows per partition).
The LSH path prunes candidates to matching buckets; signature
computation is a projection, bucketing a cheap shuffle on small keys.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d != 0, dot(a, b) / d).otherwise(F.lit(0.0))


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def cosine_topk(
    df: DataFrame, query_vec: list[float],
    vec_col: str = "embedding", id_col: str = "vec_id", k: int = 10,
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.

    The plan is scan → project(score) → TakeOrderedAndProject: no
    shuffle of the embeddings themselves; each task keeps its local
    top-k and the driver merges k*numPartitions rows.
    """
    q = _query_lit(query_vec)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    score = cosine(vec, q)
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (
        df.select(F.col(id_col), score.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join(
    df: DataFrame, queries: DataFrame,
    vec_col: str = "embedding", id_col: str = "vec_id",
    q_vec_col: str = "embedding", q_id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Batch k-NN: for every query row, top-k neighbors from df.

    Broadcast the (small) query set; per base row compute scores for
    all queries (cross product stays map-side), then per-query top-k
    via window rank. Use LSH bucketing instead when queries are many.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(q_id_col).alias("query_id"),
        F.transform(F.col(q_vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    base = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("bv"),
    )
    scored = base.crossJoin(F.broadcast(q)).select(
        "query_id", "neighbor_id", cosine(F.col("bv"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k)


def lsh_hyperplanes(dim: int, num_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for signature LSH."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)
    ]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product bit signature packed into a long."""
    sig: Column = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(dot(vec, p) >= 0, F.lit(1 << i).cast("long")) \
            .otherwise(F.lit(0).cast("long"))
        sig = sig + bit
    return sig


def cosine_topk_lsh(
    df: DataFrame, query_vec: list[float],
    vec_col: str = "embedding", id_col: str = "vec_id",
    k: int = 10, num_planes: int = 16, max_hamming: int = 2,
    seed: int = 42, round_digits: int | None = 6,
) -> DataFrame:
    """Approximate top-k: prune to vectors whose LSH signature is
    within ``max_hamming`` bits of the query signature, then exact
    cosine on the survivors.

    The signature column should be precomputed & persisted for a real
    corpus (signature is query-independent); here it is computed
    inline for self-containment.
    """
    planes = lsh_hyperplanes(len(query_vec), num_planes, seed)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qsig_val = 0
    for i, plane in enumerate(planes):
        s = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
        if s >= 0:
            qsig_val |= 1 << i
    sig = lsh_signature(vec, planes)
    pruned = df.withColumn("__sig", sig).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig_val))) <= max_hamming
    )
    return cosine_topk(pruned, query_vec, vec_col, id_col, k, round_digits)


def cosine_pairs_blocked(
    df: DataFrame, threshold: float,
    vec_col: str = "embedding", id_col: str = "vec_id",
    n_blocks: int = 16,
) -> DataFrame:
    """Exact cosine-similarity self-join (all unordered pairs with
    cosine >= threshold) with NO BroadcastNestedLoopJoin.

    The naive form ``a JOIN b ON a.id < b.id`` is a theta join Spark
    can only run as a BNLJ — the whole table broadcast to every task,
    the anti-pattern at corpus scale. Instead the O(N^2) comparison
    matrix is tiled into ``n_blocks`` stripes realized as a shuffle
    equi-join on the stripe key (the 1-bucket-theta pattern): side A
    carries each vector once (keyed by its own stripe), side B
    replicates each vector ``n_blocks`` times (one replica per
    stripe), so every ordered pair meets exactly once and
    ``id_a < id_b`` keeps the unordered half.

    Cost model: shuffle volume N + N*n_blocks rows; comparisons
    N^2/n_blocks per stripe across n_blocks parallel reducers — the
    quadratic work is unavoidable for an EXACT join but is now evenly
    spread and never driver-broadcast. Pick n_blocks ~ target
    parallelism. For sub-quadratic approximate dedup at corpus scale
    use MinHash/SimHash banding (operators/dedup) or the signature
    prune in :func:`cosine_topk_lsh`; this exact form is the
    verify-stage scorer those candidate generators feed.
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # norms are computed ONCE per row here; recomputing them inside
    # the pair loop would triple the O(d) work in the quadratic stage
    base = df.select(F.col(id_col), vec.alias("__v")) \
        .withColumn("__n", norm(F.col("__v")))
    blk = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                 F.lit(n_blocks)).cast("int")
    a = base.select(F.col(id_col).alias("id_a"),
                    F.col("__v").alias("va"),
                    F.col("__n").alias("na"), blk.alias("__blk"))
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))
        .alias("__blk"))
    # both sides are the full vector corpus: pin the stripe join to
    # sort-merge (broadcast/hash builds OOM once estimates are off;
    # see operators/dedup.minhash_dedup scale note)
    pairs = a.hint("merge").join(b, "__blk") \
        .filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "cos", dot(F.col("va"), F.col("vb"))
            / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )


def semantic_dedup_pairs(
    df: DataFrame, dim: int,
    vec_col: str = "embedding", id_col: str = "vec_id",
    num_planes: int = 8, threshold: float = 0.2, seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic near-dup edges: bucket the corpus by
    its FULL hyperplane-LSH signature (the deterministic analog of
    the paper's k-means cluster assignment), then exact cosine on
    same-bucket pairs only.

    Scale shape: one shuffle on the signature (2^num_planes buckets
    spread the corpus), and the quadratic step is confined to a
    bucket — at N vectors and B buckets the compare count is
    ~N^2/B instead of N^2, and each bucket's pairs are generated by
    a sort-merge equi-join on the signature, never a BNLJ. Output
    (id_a, id_b, cosine) edges feed
    :func:`rsyslog_spark.operators.dedup.connected_components` /
    ``dedup_by_components`` to pick one representative per cluster.
    """
    planes = lsh_hyperplanes(dim, num_planes, seed)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = df.select(
        F.col(id_col), vec.alias("__v"),
        lsh_signature(vec, planes).alias("__sig"),
    ).withColumn("__n", norm(F.col("__v")))
    # full-corpus self-join on the bucket key: pin to sort-merge
    # (statless sources can look tiny and trigger a broadcast build)
    a, b = sig.hint("merge").alias("a"), sig.alias("b")
    cos = dot(F.col("a.__v"), F.col("b.__v")) / (F.col("a.__n")
                                                 * F.col("b.__n"))
    return (
        a.join(b, [F.col("a.__sig") == F.col("b.__sig"),
                   F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ivf_index(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: MLlib KMeans centroids + per-vector
    bucket assignment (the inverted-file layout: vectors partitioned
    by nearest centroid).

    Returns (df + ``ivf_bucket`` column, centroid list). At 100 TB the
    index build samples for fit and the assignment is one map stage;
    store the result partitioned by bucket so probes touch only
    ``nprobe``/k of the data.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("__fv", array_to_vector(
        F.col(vec_col).cast("array<double>")))
    model = KMeans(k=k, seed=seed, featuresCol="__fv",
                   predictionCol="ivf_bucket").fit(feat)
    out = model.transform(feat).drop("__fv")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return out, centroids


def ivf_topk(
    indexed: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: rank centroids against the query on the driver
    (k floats — negligible), scan only the ``nprobe`` nearest buckets,
    brute-force cosine inside them. The scale path for ANN beyond
    LSH banding: bucket pruning is partition pruning when the index
    is written partitioned by ``ivf_bucket``."""
    import math as _m

    def _cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = _m.sqrt(sum(x * x for x in a)) or 1.0
        nb = _m.sqrt(sum(x * x for x in b)) or 1.0
        return d / (na * nb)

    ranked = sorted(range(len(centroids)),
                    key=lambda i: -_cos(centroids[i], query_vec))
    probe = ranked[:nprobe]
    q = _query_lit(query_vec)
    sim = cosine(F.col(vec_col).cast("array<double>"), q)
    return (
        indexed.filter(F.col("ivf_bucket").isin(probe))
        .select(id_col, "ivf_bucket", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def ivf_index_deterministic(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    lloyd_iters: int = 1,
    round_digits: int = 6,
) -> tuple[DataFrame, list[list[float]]]:
    """Engine-portable IVF coarse quantizer: seeded-sample init +
    rounded Lloyd refinement.  Unlike :func:`ivf_index` (MLlib
    KMeans, implementation-defined assignment) every step here is
    deterministic and reproducible in plain SQL, so the whole IVF
    path is oracle-checkable:

    * init — the ``k`` vectors with the smallest ``md5(cast(id as
      string))`` (a portable seeded sample; ties broken by id),
    * assign — argmin over ``round(|c|^2 - 2 v.c, round_digits)``
      (monotone in squared L2; the constant ``|v|^2`` is dropped),
      ties broken by bucket index,
    * update — per-dimension mean, rounded to ``round_digits``
      (rounding pins the value against summation-order drift between
      engines); empty buckets keep their previous centroid.

    Distributed shape is the classic KMeans loop: assignment is a
    pure column expression over ``k`` centroid literals (map-only,
    whole-stage codegen), the update is one posexplode + groupBy
    (k*dim result rows collected to the driver — the same
    reduce-to-driver any distributed KMeans does).  Returns
    (df + ``ivf_bucket`` column, centroid list).
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col), vec.alias("__v"))
    init_rows = (base
                 .orderBy(F.md5(F.col(id_col).cast("string")),
                          F.col(id_col))
                 .limit(k).collect())
    cents = [[float(x) for x in r["__v"]] for r in init_rows]

    def _assign(cs: list[list[float]]) -> Column:
        scored = []
        for i, c in enumerate(cs):
            cc = sum(x * x for x in c)
            score = F.round(
                F.lit(cc) - 2.0 * dot(F.col("__v"), _query_lit(c)),
                round_digits)
            scored.append(F.struct(score.alias("d"),
                                   F.lit(i).alias("b")))
        return F.array_min(F.array(*scored))["b"]

    for _ in range(max(0, lloyd_iters)):
        assigned = base.withColumn("__b", _assign(cents))
        means = (assigned
                 .select("__b", F.posexplode(F.col("__v"))
                         .alias("__i", "__x"))
                 .groupBy("__b", "__i")
                 .agg(F.round(F.avg("__x"), round_digits).alias("__m"))
                 .collect())
        by_bucket: dict[int, dict[int, float]] = {}
        for r in means:
            by_bucket.setdefault(r["__b"], {})[r["__i"]] = r["__m"]
        cents = [
            [by_bucket[b][i] for i in range(len(cents[b]))]
            if b in by_bucket else cents[b]
            for b in range(k)
        ]
    out = df.withColumn("__v", vec).withColumn(
        "ivf_bucket", _assign(cents)).drop("__v")
    return out, cents


def lsh_index(
    df: DataFrame, dim: int, vec_col: str = "embedding",
    num_planes: int = 16, seed: int = 42,
) -> DataFrame:
    """Precompute the query-independent LSH signature column — the
    production shape for repeated ANN queries: write the indexed
    frame once (ideally partitioned/bucketed by ``lsh_sig`` so a
    probe prunes files), then serve any number of queries through
    :func:`cosine_topk_lsh_indexed` without re-hashing the corpus."""
    planes = lsh_hyperplanes(dim, num_planes, seed)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn("lsh_sig", lsh_signature(vec, planes))


def cosine_topk_lsh_indexed(
    indexed: DataFrame, query_vec: list[float],
    vec_col: str = "embedding", id_col: str = "vec_id",
    k: int = 10, num_planes: int = 16, max_hamming: int = 2,
    seed: int = 42, round_digits: int | None = 6,
) -> DataFrame:
    """Probe an :func:`lsh_index` frame: Hamming-prune on the stored
    ``lsh_sig``, exact cosine re-rank on survivors. Same answers as
    :func:`cosine_topk_lsh` (same plane family) at a fraction of the
    per-query cost."""
    planes = lsh_hyperplanes(len(query_vec), num_planes, seed)
    qsig = 0
    for i, plane in enumerate(planes):
        if sum(float(a) * float(b)
               for a, b in zip(query_vec, plane)) >= 0:
            qsig |= 1 << i
    pruned = indexed.filter(
        F.bit_count(F.col("lsh_sig").bitwiseXOR(F.lit(qsig)))
        <= max_hamming)
    return cosine_topk(pruned, query_vec, vec_col, id_col, k,
                       round_digits)


def pq_train(
    df: DataFrame, vec_col: str = "embedding",
    m_subvectors: int = 8, k_codes: int = 16, seed: int = 42,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split vectors into ``m``
    subvectors and fit a ``k``-centroid KMeans per subspace (the PQ
    half of IVF-PQ; compresses a d-dim float vector to m small codes).

    Returns codebooks[m][k][d/m]. Training samples through MLlib —
    at corpus scale fit on a sample; encoding (below) is pure column
    work over the full data.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    first = df.select(F.size(vec_col).alias("d")).first()
    d = first["d"]
    if d % m_subvectors:
        raise ValueError(f"dim {d} not divisible by m={m_subvectors}")
    sub = d // m_subvectors
    books: list[list[list[float]]] = []
    for mi in range(m_subvectors):
        feat = df.select(array_to_vector(
            F.slice(F.col(vec_col).cast("array<double>"),
                    mi * sub + 1, sub)).alias("__fv"))
        model = KMeans(k=k_codes, seed=seed + mi, featuresCol="__fv",
                       predictionCol="__c").fit(feat)
        books.append([list(map(float, c))
                      for c in model.clusterCenters()])
    return books


def _sq_l2(a: Column, centroid: list[float]) -> Column:
    """Squared L2 distance between an array column and a literal."""
    return F.aggregate(
        F.zip_with(a, F.array(*[F.lit(float(x)) for x in centroid]),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def pq_encode(
    df: DataFrame, codebooks: list[list[list[float]]],
    vec_col: str = "embedding", out_col: str = "pq_codes",
) -> DataFrame:
    """Assign each subvector its nearest-centroid code — pure column
    expressions (m×k literal-distance exprs, all codegen'd; no UDF).
    The encoded column is m small ints: the 32x+ compressed
    representation ANN serving stores instead of raw floats."""
    m = len(codebooks)
    k = len(codebooks[0])
    sub = len(codebooks[0][0])
    vec = F.col(vec_col).cast("array<double>")
    codes = []
    for mi in range(m):
        sl = F.slice(vec, mi * sub + 1, sub)
        dists = F.array(*[_sq_l2(sl, codebooks[mi][ci])
                          for ci in range(k)])
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int"))
    return df.withColumn(out_col, F.array(*codes))


def pq_topk(
    encoded: DataFrame, codebooks: list[list[list[float]]],
    query_vec: list[float], k: int = 10,
    codes_col: str = "pq_codes", id_col: str = "vec_id",
    vec_col: str | None = "embedding", rerank: int = 50,
    round_digits: int | None = 6,
) -> DataFrame:
    """ADC (asymmetric distance computation) probe: the query's
    distance to every centroid is a driver-side m×k table (tiny);
    each row's approximate distance is m lookups summed — no float
    vectors touched. The best ``rerank`` candidates get exact cosine
    when ``vec_col`` is present (the standard PQ + rerank serving
    shape)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    lut = []
    for mi in range(m):
        qs = query_vec[mi * sub:(mi + 1) * sub]
        lut.append([sum((a - b) ** 2 for a, b in zip(qs, c))
                    for c in codebooks[mi]])
    adc: Column = F.lit(0.0)
    for mi in range(m):
        adc = adc + F.element_at(
            F.array(*[F.lit(float(x)) for x in lut[mi]]),
            F.element_at(F.col(codes_col), mi + 1) + 1)
    cand = encoded.withColumn("__adc", adc) \
        .orderBy("__adc").limit(max(rerank, k))
    if vec_col is None:
        return cand.select(id_col, F.round("__adc", 6).alias("adc")) \
            .limit(k)
    return cosine_topk(cand, query_vec, vec_col, id_col, k,
                       round_digits)
