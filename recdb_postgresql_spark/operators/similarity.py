"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the IVF variant is the
scale path: assign every vector to its nearest of K fixed centroids
(one broadcast join), then search only the probe's cell(s). With
deterministic centroids (the first K vectors by id) the whole operator
is SQL-expressible and oracle-checkable — no RNG anywhere.

At 100 TB: centroids come from a sampled KMeans (MLlib) instead, the
assignment is still one broadcast join + argmin, and each cell is a
partition-pruned parquet bucket; the brute-force scorer then runs per
cell. The plan shape below is exactly that, minus the trained
centroids.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from recdb_postgresql_spark.functions.layout import spread_small
from recdb_postgresql_spark.functions.vector import cosine_sim, dot


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "qid", qvec_col: str = "qvec",
                     round_to: int = 6) -> DataFrame:
    """(qid, vec_id, cos, rank<=k) — exact cosine top-k per query.

    queries is small (broadcast); ranking ties break on vec_id for
    determinism. Scores are rounded BEFORE ranking so the ordering is
    reproducible across engines.
    """
    scored = (spread_small(emb).crossJoin(F.broadcast(queries))
              .where(F.col(id_col) != F.col(qid_col))
              .select(F.col(qid_col).alias("qid"), F.col(id_col),
                      F.round(cosine_sim(F.col(vec_col), F.col(qvec_col)),
                              round_to).alias("cos")))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def ivf_assign(emb: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               cid_col: str = "cid", cvec_col: str = "cvec",
               n: int = 1) -> DataFrame:
    """(vec_id, cell): the ``n`` nearest centroids by cosine (tie ->
    lowest cid). One broadcast join + window top-n; with n=1 this is
    the partitioning key for bucketed ANN storage, with n>1 it is the
    probe set (queries) or multi-assignment (near-dup recall)."""
    scored = (spread_small(emb).crossJoin(F.broadcast(centroids))
              .select(F.col(id_col), F.col(cid_col),
                      F.round(cosine_sim(F.col(vec_col), F.col(cvec_col)), 9)
                      .alias("sim")))
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col(cid_col))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= n)
            .select(id_col, F.col(cid_col).alias("cell")))


def first_k_centroids(emb: DataFrame, k: int = 16, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Deterministic centroids: the k lowest-id vectors. Good enough to
    exercise/verify the IVF plumbing (and to oracle-check it — no
    RNG); ``kmeans_centroids`` is the production path."""
    return (emb.orderBy(id_col).limit(k)
            .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")))


def kmeans_centroids(emb: DataFrame, k: int = 16, id_col: str = "vec_id",
                     vec_col: str = "embedding", seed: int = 42,
                     max_iter: int = 10,
                     sample_fraction: float | None = None) -> DataFrame:
    """Trained IVF centroids via MLlib KMeans — the production
    replacement for ``first_k_centroids``: balanced cells mean the
    per-cell brute-force work is even instead of hostage to whichever
    vectors happen to have low ids.

    At 100 TB, train on a sample (``sample_fraction``): KMeans quality
    saturates long before the full corpus, and the fit then reads a
    few million vectors instead of everything — the standard
    IVF-build recipe (train on sample, assign everything). The
    returned (cid, cvec) frame is k rows (driver-built from the fitted
    centers, like any broadcast dimension); centroid floats are
    optimizer-dependent, so queries built on it get the driver's
    rows-only check rather than a value-hash oracle."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = emb.select(array_to_vector(
        F.col(vec_col).cast("array<double>")).alias("features"))
    if sample_fraction is not None:
        train = train.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=k, seed=seed, maxIter=max_iter,
                   featuresCol="features").fit(train)
    centers = [(i, [float(x) for x in c])
               for i, c in enumerate(model.clusterCenters())]
    return emb.sparkSession.createDataFrame(
        centers, schema="cid int, cvec array<double>")


def write_ivf_index(emb: DataFrame, centroids: DataFrame, path: str,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Persist the corpus as an on-disk IVF index: parquet partitioned
    BY CELL (``.../cell=7/part-*.parquet``). This is the piece that
    turns IVF from a per-query shuffle into storage layout: at query
    time only the probed cells' directories are even LISTED, so a
    100 TB corpus with 10k cells and nprobe=2 reads ~0.02% of its
    files (static partition pruning — pinned in
    tests/test_scale_layout.py). Same layout trick as
    ``sinks.write_bucketed``, keyed by learned cell instead of a
    column hash."""
    assign = ivf_assign(emb, centroids, id_col, vec_col)
    (emb.join(assign, id_col)
     .write.partitionBy("cell").mode("overwrite").parquet(path))


def append_ivf_index(emb: DataFrame, centroids: DataFrame, path: str,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> None:
    """Advance the persisted IVF index with a batch of new vectors —
    assigned with the SAME centroids the index was built with (they
    are part of the layout, like the LSH hyperparameters) and appended
    into the matching ``cell=`` directories. Probes pick the new
    vectors up with no rebuild and keep pruning unprobed cells; the
    recall characteristics only drift as far as the frozen centroids
    do, the usual IVF-serving trade (rebuild when drift matters)."""
    assign = ivf_assign(emb, centroids, id_col, vec_col)
    (emb.join(assign, id_col)
     .write.partitionBy("cell").mode("append").parquet(path))


def ivf_topk_indexed(spark, path: str, queries: DataFrame,
                     centroids: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "qid", qvec_col: str = "qvec",
                     round_to: int = 6, nprobe: int = 1) -> DataFrame:
    """``ivf_topk`` against a ``write_ivf_index`` layout: assign each
    query its ``nprobe`` cells, collect that tiny cell list to the
    driver (|queries| x nprobe ints — the one legitimate collect: it
    becomes the pruning predicate), and scan ONLY those partitions.
    The scored candidate join is the same broadcast + window top-k
    plan as the in-memory variant."""
    q_assign = ivf_assign(
        queries.select(F.col(qid_col).alias(id_col),
                       F.col(qvec_col).alias(vec_col)),
        centroids, id_col, vec_col, n=nprobe) \
        .withColumnRenamed(id_col, qid_col) \
        .withColumnRenamed("cell", "qcell")
    probes = queries.join(q_assign, qid_col)
    cells = [r.qcell for r in probes.select("qcell").distinct().collect()]
    data = spark.read.parquet(path).where(F.col("cell").isin(cells))
    cand = (data.join(F.broadcast(probes), F.col("cell") == F.col("qcell"))
            .where(F.col(id_col) != F.col(qid_col)))
    scored = cand.select(F.col(qid_col).alias("qid"), F.col(id_col),
                         F.round(cosine_sim(F.col(vec_col), F.col(qvec_col)),
                                 round_to).alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def write_ivfpq_index(emb: DataFrame, centroids: DataFrame, codebooks,
                      path: str, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> None:
    """Persist the FULLY compressed corpus: PQ codes partitioned BY
    COARSE CELL (``.../cell=7/part-*.parquet``) plus the codebooks and
    centroids as sidecar parquet. Combines both storage levers — a
    probe prunes unvisited cell directories (static partition pruning,
    like ``write_ivf_index``) AND the files it does read hold m code
    bytes per vector instead of d floats. The raw vectors live
    elsewhere (cold); this index is the serving footprint."""
    import numpy as np

    spark = emb.sparkSession
    books = np.asarray(codebooks, dtype=np.float64)
    m, k, sub = books.shape
    codes = pq_encode(emb, books, id_col, vec_col)
    assign = ivf_assign(emb, centroids, id_col, vec_col)
    (codes.join(assign, id_col)
     .write.partitionBy("cell").mode("overwrite")
     .parquet(os.path.join(path, "codes")))
    rows = [(int(j), int(c), books[j, c].tolist())
            for j in range(m) for c in range(k)]
    spark.createDataFrame(rows, "j int, c int, v array<double>") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "codebooks"))
    centroids.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "centroids"))


def ivfpq_topk_indexed(spark, path: str, queries: DataFrame, k: int = 10,
                       qid_col: str = "qid", qvec_col: str = "qvec",
                       nprobe: int = 2, round_to: int = 6) -> DataFrame:
    """ADC top-k against a ``write_ivfpq_index`` layout: codebooks and
    centroids load from their sidecars (model-metadata-sized), each
    query's ``nprobe`` cells become a static partition-pruning
    predicate (the one legitimate collect), and ONLY those cells' code
    files are read — never a raw vector, never an unprobed directory."""
    import numpy as np

    brows = spark.read.parquet(os.path.join(path, "codebooks")).collect()
    m = 1 + max(r.j for r in brows)
    k_codes = 1 + max(r.c for r in brows)
    sub = len(brows[0].v)
    books = np.zeros((m, k_codes, sub))
    for r in brows:
        books[r.j, r.c] = r.v
    centroids = spark.read.parquet(os.path.join(path, "centroids"))
    q_assign = ivf_assign(
        queries.select(F.col(qid_col).alias("vec_id"),
                       F.col(qvec_col).alias("embedding")),
        centroids, n=nprobe)
    cells = [r.cell for r in q_assign.select("cell").distinct().collect()]
    codes = (spark.read.parquet(os.path.join(path, "codes"))
             .where(F.col("cell").isin(cells))
             .select("vec_id", "codes"))
    return pq_topk(codes, books, queries, k, qid_col=qid_col,
                   qvec_col=qvec_col, round_to=round_to)


def sq8_quantize(emb: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """(id, qvec array<int>): symmetric per-vector int8 scalar
    quantization — q_i = round(x_i / scale) with scale = max|x| / 127,
    so every component lands in [-127, 127].

    The 100 TB memory lever for ANN: a quantized corpus is 4x smaller
    than float32 (scan bandwidth and executor cache drop with it), and
    because COSINE is scale-invariant the per-vector scale cancels —
    cos(qa, qb) IS the quantized approximation, no dequantization
    anywhere. Integer dot products are exact in double arithmetic, so
    the operator is bit-reproducible against a SQL oracle (no
    accumulation-order tolerance at all). Deterministic (no RNG);
    recall loss comes only from the ~0.8% per-component rounding."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.greatest(F.array_max(F.transform(v, lambda x: F.abs(x)))
                       / F.lit(127.0), F.lit(1e-300))  # zero-vector guard
    return spread_small(emb).select(
        F.col(id_col),
        F.transform(v, lambda x: F.round(x / scale).cast("int")).alias("qvec"))


def sq8_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid", qvec_col: str = "qvec",
             round_to: int = 6) -> DataFrame:
    """(qid, vec_id, cos, rank<=k): exact-scan top-k over the int8
    QUANTIZED vectors — brute-force's memory-optimized sibling (4x
    less scan traffic; compose with IVF cells for sub-linear work the
    same way ``ivf_topk`` does)."""
    qdata = sq8_quantize(emb, id_col, vec_col)
    qquery = (sq8_quantize(queries.select(F.col(qid_col).alias(id_col),
                                          F.col(qvec_col).alias(vec_col)),
                           id_col, vec_col)
              .select(F.col(id_col).alias(qid_col),
                      F.col("qvec").alias("qq")))
    scored = (qdata.crossJoin(F.broadcast(qquery))
              .where(F.col(id_col) != F.col(qid_col))
              .select(F.col(qid_col).alias("qid"), F.col(id_col),
                      F.round(cosine_sim(F.col("qvec"), F.col("qq")),
                              round_to).alias("cos")))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def pq_train(emb: DataFrame, m: int = 8, k: int = 256,
             id_col: str = "vec_id", vec_col: str = "embedding",
             sample: int = 8192, iters: int = 10):
    """Product-Quantization codebooks (Jégou et al.): the vector
    splits into ``m`` subvectors, each subspace gets its own
    ``k``-centroid codebook — a vector compresses to m code bytes
    (32x for 64-dim float32), and ADC scoring needs only a per-query
    lookup table. The memory-bound ANN standard beside the
    recall-bound IVF and the 4x SQ8.

    Training is driver-side Lloyd on a DETERMINISTIC hash-ordered
    sample (same train-on-sample recipe as ``kmeans_centroids``;
    init = first k distinct sampled subvectors in hash order, so the
    whole fit is reproducible — no RNG). Returns a numpy array
    (m, k, d/m) — model metadata, like centroids."""
    import numpy as np

    from recdb_postgresql_spark.functions.hashing import md5_long

    rows = (emb.select(F.col(vec_col).alias("v"),
                       md5_long(F.col(id_col).cast("string")).alias("_h"))
            .orderBy("_h").limit(int(sample)).collect())
    if not rows:
        raise ValueError("pq_train: empty input")
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = np.zeros((m, k, sub))
    for j in range(m):
        xs = x[:, j * sub:(j + 1) * sub]
        uniq = np.unique(xs, axis=0)
        kk = min(k, len(uniq))
        cent = uniq[:kk].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(kk):
                pts = xs[assign == c]
                if len(pts):
                    cent[c] = pts.mean(axis=0)
        books[j, :kk] = cent
        if kk < k:
            books[j, kk:] = cent[0]  # duplicate filler, never harmful
    return books


def pq_encode(emb: DataFrame, codebooks, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int> of length m): each subvector mapped to
    its nearest codebook centroid — one Arrow map pass with the
    broadcast (m, k, d/m) codebooks, zero shuffle. The codes ARE the
    compressed corpus; at 100 TB this is what sits in memory/storage
    while the raw vectors stay cold."""
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, k, sub = books.shape

    def enc(it):
        for pdf in it:
            if not len(pdf):
                continue
            x = np.array(list(pdf["v"]), dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub:(j + 1) * sub]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c
                d2 = (-2.0 * xs @ books[j].T
                      + (books[j] ** 2).sum(axis=1)[None, :])
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({"id": pdf["id"], "codes": list(codes)})

    return (emb.select(F.col(id_col).alias("id"),
                       F.col(vec_col).alias("v"))
            .mapInPandas(enc, schema="id long, codes array<int>")
            .select(F.col("id").alias(id_col), "codes"))


def pq_topk(codes: DataFrame, codebooks, queries: DataFrame, k: int = 10,
            id_col: str = "vec_id", qid_col: str = "qid",
            qvec_col: str = "qvec", round_to: int = 6) -> DataFrame:
    """(qid, vec_id, score, rank): ADC top-k — each query precomputes
    one (m x k) dot-product table against the codebooks (driver-free:
    inside the Arrow batch), and every corpus vector scores as m table
    lookups summed, never touching the raw floats. Approximate dot
    product; queries and codebooks should be built on L2-normalized
    vectors if cosine semantics are wanted. Scores round before
    ranking (ties by id) like every ANN scorer here."""
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, kk, sub = books.shape
    q = queries.select(F.col(qid_col).alias("qid"),
                       F.col(qvec_col).alias("qv"))

    def score(it):
        for pdf in it:
            # a batch can interleave several queries after the
            # replicating crossJoin — handle each qid's slice
            for qid, grp in pdf.groupby("_qid", sort=False):
                cds = np.array(list(grp["codes"]), dtype=np.int64)
                qv = np.asarray(grp["_qv"].iloc[0], dtype=np.float64)
                table = np.stack([books[j] @ qv[j * sub:(j + 1) * sub]
                                  for j in range(m)])     # (m, k)
                s = table[np.arange(m)[None, :], cds].sum(axis=1)
                yield pd.DataFrame({"qid": int(qid), "vec_id": grp["id"],
                                    "score": np.round(s, round_to)})

    joined = (codes.select(F.col(id_col).alias("id"), "codes")
              .crossJoin(F.broadcast(q.select(F.col("qid").alias("_qid"),
                                              F.col("qv").alias("_qv")))))
    scored = joined.mapInPandas(
        score, schema="qid long, vec_id long, score double")
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.col("vec_id"))
    return (scored.where(F.col("vec_id") != F.col("qid"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def hyperplane_planes(spark, n_planes: int = 8, dim: int = 64) -> DataFrame:
    """(p, plane array<double>): deterministic pseudo-random hyperplanes
    from the portable md5 family — coeff(p,d) =
    (md5_long('hp{p}:{d}') % 2001 - 1000)/1000 in [-1, 1]. No RNG, so
    the identical planes regenerate in any SQL engine."""
    from recdb_postgresql_spark.functions.hashing import md5_long

    return spark.range(n_planes).select(
        F.col("id").cast("int").alias("p"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: ((md5_long(F.concat(F.lit("hp"),
                                          F.col("id").cast("string"),
                                          F.lit(":"), d.cast("string")))
                        % 2001 - 1000) / 1000.0)).alias("plane"))


def lsh_signatures(emb: DataFrame, planes: DataFrame,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(id, sig): the n-bit random-hyperplane signature — bit p is the
    sign of dot(v, plane_p). One broadcast join + one groupBy; sig is
    the LSH bucket key for cosine similarity (SimHash for vectors)."""
    dotted = (spread_small(emb).crossJoin(F.broadcast(planes))
              .select(F.col(id_col), "p",
                      dot(F.col(vec_col), F.col("plane")).alias("dp")))
    return (dotted.groupBy(id_col)
            .agg(F.sum(F.when(F.col("dp") >= 0,
                              F.expr("shiftleft(CAST(1 AS BIGINT), p)"))
                       .otherwise(F.lit(0).cast("long"))).alias("sig")))


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
             n_planes: int = 8, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid", qvec_col: str = "qvec",
             round_to: int = 6, multi_probe: bool = True) -> DataFrame:
    """Approximate top-k: score only vectors whose full hyperplane
    signature lands in the query's probe set. The complementary LSH
    scale path to ``ivf_topk`` — bucket count 2^n_planes needs no
    centroid training and adapts to any data distribution; recall < 1
    by design.

    ``multi_probe`` (the standard recall fix for sign-LSH) also probes
    every 1-bit-flipped bucket: the query's probe set becomes its exact
    signature plus ``n_planes`` neighbors — still a pure equi-join on
    (sig == probe), candidate volume grows ~(n_planes+1)x while recall
    jumps from the single-bucket sliver toward brute-force (measured
    9 -> 48 of 50 possible rows at sf0.01). A vector matches at most
    one probe per query (probe values are distinct), so no dedup
    shuffle is needed."""
    planes = hyperplane_planes(emb.sparkSession, n_planes, dim)
    sigs = lsh_signatures(emb, planes, id_col, vec_col)
    qsigs = (lsh_signatures(
        queries.select(F.col(qid_col).alias(id_col),
                       F.col(qvec_col).alias(vec_col)),
        planes, id_col, vec_col)
        .withColumnRenamed(id_col, qid_col)
        .withColumnRenamed("sig", "qsig"))
    qp = queries.join(qsigs, qid_col)
    probes = qp.select(qid_col, qvec_col, F.col("qsig").alias("psig"))
    if multi_probe:
        flips = (qp.select(
            qid_col, qvec_col, "qsig",
            F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("p"))
            .select(qid_col, qvec_col,
                    F.col("qsig").bitwiseXOR(
                        F.expr("shiftleft(CAST(1 AS BIGINT), p)")).alias("psig")))
        probes = probes.unionByName(flips)
    cand = (emb.join(sigs, id_col)
            .join(F.broadcast(probes), F.col("sig") == F.col("psig"))
            .where(F.col(id_col) != F.col(qid_col)))
    scored = cand.select(F.col(qid_col).alias("qid"), F.col(id_col),
                         F.round(cosine_sim(F.col(vec_col), F.col(qvec_col)),
                                 round_to).alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def ivf_topk(emb: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid", qvec_col: str = "qvec",
             round_to: int = 6, nprobe: int = 1) -> DataFrame:
    """Approximate top-k: score only vectors in the query's ``nprobe``
    nearest cells. (qid, vec_id, cos, rank) — recall < 1 by design; the
    candidate set shrinks by ~|cells|/nprobe versus brute force.
    ``nprobe`` is the classic IVF recall knob: data vectors stay
    single-assigned (the index is unchanged), only each query fans out
    to nprobe cell keys in the same broadcast join — recall rises with
    zero reindexing cost. A vector is in exactly one cell, so a (query,
    vector) pair matches at most one probe — no dedup shuffle."""
    assign = ivf_assign(emb, centroids, id_col, vec_col)
    q_assign = ivf_assign(
        queries.select(F.col(qid_col).alias(id_col), F.col(qvec_col).alias(vec_col)),
        centroids, id_col, vec_col, n=nprobe).withColumnRenamed(id_col, qid_col) \
        .withColumnRenamed("cell", "qcell")
    cand = (emb.join(assign, id_col)
            .join(F.broadcast(queries.join(q_assign, qid_col)),
                  F.col("cell") == F.col("qcell"))
            .where(F.col(id_col) != F.col(qid_col)))
    scored = cand.select(F.col(qid_col).alias("qid"), F.col(id_col),
                         F.round(cosine_sim(F.col(vec_col), F.col(qvec_col)),
                                 round_to).alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def rrf_fuse(rankings, k0: int = 60, k: int = 10, id_col: str = "doc_id",
             rank_col: str = "rank", group_cols=()) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.) of N ranked lists:
    rrf(d) = sum over lists containing d of 1/(k0 + rank). The standard
    way to combine lexical (BM25) and semantic (ANN) retrieval without
    score calibration — ranks are comparable where raw scores are not.

    Each input is a (id, rank) frame (plus ``group_cols`` for per-query
    fusion). Inputs are top-N lists, so the union is tiny relative to
    the corpus — the expensive work happened in the retrievers; fusion
    is one aggregate over len(rankings) x N x n_queries rows. rrf is
    rounded BEFORE the top-k ordering so ranking is reproducible across
    engines; ties break by ascending id."""
    from functools import reduce

    cols = [*group_cols, id_col, rank_col]
    u = reduce(lambda a, b: a.unionByName(b),
               [r.select(*cols) for r in rankings])
    scores = (u.groupBy(*group_cols, id_col)
              .agg(F.round(F.sum(F.lit(1.0) / (F.lit(float(k0))
                                               + F.col(rank_col))), 6)
                   .alias("rrf"),
                   F.count(F.lit(1)).alias("n_lists")))
    # Both branches return the SAME schema (…, rrf, n_lists, rank):
    # downstream code must not have to rely on implicit row order,
    # which any shuffle would destroy. The UNGROUPED branch must not
    # window the full score set (Window.partitionBy() is one task) —
    # orderBy().limit(k) runs as a parallel TakeOrdered, and the rank
    # column is then computed over just those k rows (ADVICE r7).
    order = [F.desc("rrf"), F.col(id_col)]
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(*order)
        return (scores.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k))
    topk = scores.orderBy(*order).limit(k)
    w = Window.partitionBy().orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w))


def knn_classify(labeled: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label", qid_col: str = "qid",
                 qvec_col: str = "qvec") -> DataFrame:
    """(qid, pred_label, votes): k-NN majority-vote classification over
    an embedding corpus — the zero-training ML-serving primitive (label
    a new item by its nearest labeled neighbors). Deterministic: cosine
    rounds before ranking (brute_force_topk's contract), vote ties
    break by ascending label — so the WHOLE classifier, retrieval
    included, is SQL-expressible and hash-checkable, which no trained
    model here can claim.

    Scale shape: exactly brute_force_topk's (broadcast queries, one
    window top-k) plus a votes-sized aggregate; at corpus scale swap
    the retrieval for ``ivf_topk``/the persisted IVF index — the vote
    step is retrieval-agnostic."""
    top = brute_force_topk(labeled, queries, k, id_col, vec_col,
                           qid_col, qvec_col)
    lab = labeled.select(F.col(id_col), F.col(label_col).alias("_lbl"))
    votes = (top.join(lab, id_col)
             .groupBy("qid", "_lbl")
             .agg(F.count(F.lit(1)).alias("votes")))
    w = Window.partitionBy("qid").orderBy(F.desc("votes"), F.col("_lbl"))
    return (votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("qid", F.col("_lbl").alias("pred_label"),
                    F.col("votes").cast("long").alias("votes")))


def mmr_rerank(candidates: DataFrame, item_vecs: DataFrame,
               k: int = 10, lam: float = 0.7,
               user_col: str = "user", item_col: str = "item",
               score_col: str = "score",
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Greedy Maximal Marginal Relevance re-rank (Carbonell &
    Goldstein): per user, iteratively select the candidate maximizing
    ``lam * score - (1 - lam) * max cosine to the already-selected``
    — the standard diversity pass between a recommender's top-N and
    the page it serves (a plain top-k happily shows ten near-identical
    items). Output (user, item, score, mmr_rank), rank 1..k.

    Candidates with no row in ``item_vecs`` are dropped by the vector
    join (an item the similarity space doesn't know can't be diversity-
    scored) — pad ``item_vecs`` with a zero vector per unknown item if
    pass-through is wanted.

    Greedy selection is inherently sequential IN k but embarrassingly
    parallel ACROSS users: one join attaches each candidate's vector,
    then an Arrow-batched applyInPandas runs the tiny O(k * n_cand * d)
    greedy per user — no driver collect, state bounded by one user's
    candidate list. Deterministic: ties break by ascending item id;
    callers should pre-normalize scores if they want ``lam`` to mean
    the same thing across models. Not SQL-expressible (sequential
    argmax chain) — pinned by hand-checked pytest cases instead of a
    DuckDB oracle."""
    import numpy as np
    import pandas as pd

    vecs = item_vecs.select(F.col(id_col).alias("item"),
                            F.col(vec_col).alias("_v"))
    joined = candidates.select(
        F.col(user_col).alias("user"), F.col(item_col).alias("item"),
        F.col(score_col).alias("score")).join(vecs, "item")

    def greedy(pdf):
        mat = np.array(list(pdf["_v"]), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                          1e-300)
        # deterministic processing order: item id ascending
        order = np.argsort(pdf["item"].to_numpy(), kind="stable")
        items = pdf["item"].to_numpy()[order]
        scores = pdf["score"].to_numpy()[order]
        mat = mat[order]
        n = len(items)
        picked: list[int] = []
        max_sim = np.zeros(n)
        free = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            obj = lam * scores - (1.0 - lam) * max_sim
            obj[~free] = -np.inf
            best = int(np.argmax(obj))  # argmax takes FIRST max ->
            free[best] = False          # lowest item id on ties
            picked.append(best)
            sims = mat @ mat[best]
            max_sim = np.maximum(max_sim, sims)
        return pd.DataFrame({
            "user": pdf["user"].iloc[0],
            "item": items[picked],
            "score": scores[picked],
            "mmr_rank": np.arange(1, len(picked) + 1, dtype=np.int32),
        })

    return joined.groupBy("user").applyInPandas(
        greedy, schema="user long, item long, score double, "
                       "mmr_rank int")


def dim_stats(emb: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(dim, mean, std, min_val, max_val): per-dimension profile of an
    embedding column — the data-QA pass that catches dead dimensions
    (std 0), scale drift between embedding-model versions, and
    clipped values before they poison ANN recall (cosine is
    scale-invariant per vector but IVF cell balance is not).

    Scale shape: posexplode to (dim, double) pairs — narrow rows —
    then ONE aggregate keyed on dim (64-1024 groups): partial
    aggregation collapses everything map-side, so the shuffle carries
    |dims| x |partitions| rows, independent of corpus size."""
    return (emb.select(F.posexplode(F.col(vec_col)).alias("dim", "x"))
            .select("dim", F.col("x").cast("double").alias("x"))
            .groupBy("dim")
            .agg(F.round(F.avg("x"), 6).alias("mean"),
                 F.round(F.stddev_samp("x"), 6).alias("std"),
                 F.round(F.min("x"), 6).alias("min_val"),
                 F.round(F.max("x"), 6).alias("max_val"))
            .select(F.col("dim").cast("int").alias("dim"),
                    "mean", "std", "min_val", "max_val"))


def unit_normalize(emb: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(id, unit): L2-normalize each vector map-side — after this,
    cosine becomes a plain dot product, which halves the per-pair
    arithmetic of every downstream scorer and lets a matmul path use
    the raw product directly. Zero vectors pass through unchanged
    (norm 0 -> kept as zeros, not NaN)."""
    from recdb_postgresql_spark.functions.vector import l2_norm

    nrm = l2_norm(F.col(vec_col))
    unit = F.when(nrm > 0, F.transform(
        F.col(vec_col), lambda x: x.cast("double") / nrm)) \
        .otherwise(F.transform(F.col(vec_col),
                               lambda x: x.cast("double")))
    return emb.select(F.col(id_col), unit.alias("unit"))


def mahalanobis_outliers(emb: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         top_k: int = 20) -> DataFrame:
    """(id, maha): top-``top_k`` embedding outliers by DIAGONAL
    Mahalanobis distance — each dimension standardized by its own
    corpus mean/variance, distances summed across dims. The vector-QA
    companion to ``dim_stats``: catches corrupt encodes / wrong-model
    rows that unit-norm cosine hides (they still normalize to SOME
    direction). Dead dimensions (variance 0) carry no information and
    are excluded rather than dividing by zero.

    Scale shape: per-dim moments are the ``dim_stats`` aggregate
    (shuffle = dims x partitions); scoring joins the dim-count-sized
    stats table BROADCAST onto the exploded points and collapses
    map-side into one sum per vector; top-k is TakeOrdered on the
    ROUNDED score (deterministic ties by id), never a full sort."""
    pts = (emb.select(F.col(id_col),
                      F.posexplode(F.col(vec_col)).alias("dim", "x"))
           .select(id_col, "dim", F.col("x").cast("double").alias("x")))
    st = (pts.groupBy("dim")
          .agg(F.avg("x").alias("mu"), F.var_samp("x").alias("var"))
          .where(F.col("var") > 0))
    scored = (pts.join(F.broadcast(st), "dim")
              .groupBy(id_col)
              .agg(F.sum((F.col("x") - F.col("mu")) ** 2 / F.col("var"))
                   .alias("d2")))
    return (scored.select(id_col, F.round(F.sqrt("d2"), 6).alias("maha"))
            .orderBy(F.desc("maha"), id_col).limit(top_k))


def silhouette_simplified(emb: DataFrame, centroids: DataFrame,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """(cid, n, mean_sil): simplified (centroid-based) silhouette per
    cluster — a = cosine distance to the OWN centroid, b = distance
    to the nearest OTHER centroid, s = (b-a)/max(a,b) — the cluster-
    quality readout (tight + separated -> 1, boundary -> 0, likely
    misassigned -> <0) at O(n*k) cost instead of exact silhouette's
    O(n²) pairwise matrix; the standard big-data form (sklearn calls
    it the simplified silhouette).

    One broadcast centroid join + per-vector top-2 window (the
    ivf_assign shape), per-point scores quantized to 1e-12 ints so
    cluster means are partitioning-invariant; with deterministic
    centroids (first_k_centroids) the whole report is
    oracle-checkable, with kmeans_centroids it is the same plan under
    the rows-only contract."""
    from pyspark.sql import Window

    scored = (spread_small(emb).crossJoin(F.broadcast(centroids))
              .select(F.col(id_col),
                      F.col("cid"),
                      F.round(cosine_sim(F.col(vec_col), F.col("cvec")),
                              9).alias("sim")))
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), "cid")
    top2 = (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 2))
    piv = (top2.groupBy(id_col)
           .agg(F.max(F.when(F.col("rn") == 1, F.col("cid")))
                .alias("cell"),
                F.max(F.when(F.col("rn") == 1, F.col("sim")))
                .alias("s1"),
                F.max(F.when(F.col("rn") == 2, F.col("sim")))
                .alias("s2")))
    a = F.lit(1.0) - F.col("s1")
    b = F.lit(1.0) - F.col("s2")
    s = F.try_divide(b - a, F.greatest(a, b))
    sq = F.round(s * F.lit(1e12), 0).cast("long")
    return (piv.select("cell", sq.alias("sq"))
            .groupBy(F.col("cell").alias("cid"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("sq") / F.lit(1e12) / F.count("sq"), 6)
                 .alias("mean_sil"))
            .orderBy("cid"))
