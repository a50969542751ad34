"""Streaming training-data ingest: unbounded-horizon exact dedup
against the persisted hash index.

``rollup.dedup_stream`` handles the in-flight case — state lives in
the streaming engine, bounded by the watermark horizon, so a duplicate
arriving a week later passes through. A corpus ingest pipeline needs
the OTHER contract: a content seen in ANY earlier batch is a
duplicate, forever. That state can't live in stream memory at 100 TB;
it lives on disk as the bucketed hash index
(``dedup.write_hash_index`` — billions of 16-byte rows that never
shuffle), and each micro-batch anti-joins against it through
``foreachBatch``.

Per batch: survivors = ``dedup_against_index`` (intra-batch dups
collapse too), optionally appended to a clean-corpus parquet sink,
then their hashes appended to the index with the same bucket layout
(``dedup.append_hash_index``) so the NEXT batch dedups against them.
The survivor frame is materialized (localCheckpoint) before the index
append — both writes must see the pre-append index state, not
re-evaluate against their own output.

Exactly-once caveat (same as every foreachBatch sink pair): a batch
that crashes between the corpus write and the index append is
re-delivered by checkpoint recovery, and the corpus sink would see its
rows twice. The index append is idempotent-by-content (re-appending
the same hashes only wastes space on the min-id rows); a production
corpus sink makes the pair atomic by writing batch-id-named files —
kept out of this class for clarity.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from recdb_postgresql_spark.functions.hashing import md5_long
from recdb_postgresql_spark.operators.dedup import (append_hash_index,
                                                    append_lsh_index,
                                                    dedup_against_index,
                                                    lsh_verified_pairs,
                                                    neardup_against_index,
                                                    word_shingles)


class StreamingIndexDeduper:
    """Attach with ``writeStream.foreachBatch(deduper.on_batch)``;
    ``on_batch`` also works called directly with a batch DataFrame
    (foreachBatch's point — the batch path IS the streaming path).

    Requires the index table to exist (seed it with
    ``dedup.write_hash_index``, possibly on an empty frame)."""

    def __init__(self, spark: SparkSession, index_table: str,
                 clean_path: Optional[str] = None,
                 id_col: str = "doc_id", text_col: str = "text",
                 hash_fn=md5_long, buckets: int = 32):
        self.spark = spark
        self.index_table = index_table
        self.clean_path = clean_path
        self.id_col, self.text_col = id_col, text_col
        self.hash_fn = hash_fn
        self.buckets = buckets
        self.batches = 0
        self.survivor_count = 0

    def on_batch(self, batch_df: DataFrame,
                 batch_id: Optional[int] = None) -> DataFrame:
        survivors = dedup_against_index(
            batch_df, self.spark, self.index_table,
            id_col=self.id_col, text_col=self.text_col,
            hash_fn=self.hash_fn).localCheckpoint()
        if self.clean_path:
            (survivors.drop("content_hash").write.mode("append")
             .parquet(self.clean_path))
        append_hash_index(
            survivors.selectExpr("content_hash",
                                 f"{self.id_col} AS canonical_id"),
            self.index_table, buckets=self.buckets)
        # under foreachBatch, `survivors` is bound to the micro-batch's
        # cloned session while the NEXT batch's anti-join reads the
        # index through self.spark — whose cached file listing the
        # clone's append does not invalidate. Without this refresh,
        # batch N+1 silently dedups against the pre-batch-N index.
        self.spark.catalog.refreshTable(self.index_table)
        self.batches += 1
        self.survivor_count += survivors.count()
        return survivors


class StreamingNearDupDeduper:
    """The NEAR-dup twin of ``StreamingIndexDeduper``: unbounded-horizon
    MinHash-LSH dedup with state on disk as the persisted LSH index
    (``dedup.write_lsh_index`` — seed it first, possibly on an empty
    frame). Attach with ``writeStream.foreachBatch(deduper.on_batch)``
    or call ``on_batch`` directly.

    Per batch: batch docs whose verified Jaccard against ANY indexed
    doc clears ``threshold`` are dropped; with ``intra_batch=True``
    (default) a doc that near-duplicates a SMALLER-id doc in the same
    batch is dropped too (the greedy keep-min rule — deterministic,
    one LSH pass; a chain a~b~c keeps only what has no smaller
    near-dup neighbor, which can drop more than component-canonical
    clustering would — the usual streaming trade). Survivors are
    appended to the clean sink and to BOTH index tables under the
    write-time bucket specs, so the next batch probes them shuffle-free.

    The LSH hyperparameters are part of the index layout and must
    match the seed's. Same exactly-once caveat as the exact deduper;
    re-appending a re-delivered batch's band/shingle rows ADDS
    duplicate index rows, which cost space and candidate fan-out but
    never correctness (the verify recomputes true Jaccard)."""

    def __init__(self, spark: SparkSession, index_table: str,
                 clean_path: Optional[str] = None, threshold: float = 0.5,
                 id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3, num_hashes: int = 8, rows_per_band: int = 2,
                 hash_fn=md5_long, buckets: int = 32,
                 intra_batch: bool = True):
        self.spark = spark
        self.index_table = index_table
        self.clean_path = clean_path
        self.threshold = threshold
        self.id_col, self.text_col = id_col, text_col
        self.n, self.num_hashes = n, num_hashes
        self.rows_per_band = rows_per_band
        self.hash_fn = hash_fn
        self.buckets = buckets
        self.intra_batch = intra_batch
        self.batches = 0
        self.survivor_count = 0
        self.dropped_count = 0

    def on_batch(self, batch_df: DataFrame,
                 batch_id: Optional[int] = None) -> DataFrame:
        kw = dict(id_col=self.id_col, text_col=self.text_col, n=self.n,
                  num_hashes=self.num_hashes,
                  rows_per_band=self.rows_per_band, hash_fn=self.hash_fn)
        matches = neardup_against_index(
            batch_df, self.spark, self.index_table,
            threshold=self.threshold, **kw)
        drop = matches.select(F.col("new_id").alias(self.id_col))
        if self.intra_batch:
            sh = word_shingles(batch_df, id_col=self.id_col,
                               text_col=self.text_col, n=self.n)
            pairs = lsh_verified_pairs(
                sh, threshold=self.threshold, num_hashes=self.num_hashes,
                rows_per_band=self.rows_per_band, hash_fn=self.hash_fn)
            drop = drop.unionByName(
                pairs.select(F.col("id2").alias(self.id_col)))
        survivors = batch_df.join(drop.distinct(), self.id_col,
                                  "left_anti").localCheckpoint()
        if self.clean_path:
            survivors.write.mode("append").parquet(self.clean_path)
        append_lsh_index(survivors, self.index_table,
                         buckets=self.buckets, **kw)
        for suf in ("_bands", "_sh"):
            self.spark.catalog.refreshTable(self.index_table + suf)
        self.batches += 1
        n_sur = survivors.count()
        self.survivor_count += n_sur
        self.dropped_count += batch_df.count() - n_sur
        return survivors


class StreamingMerger:
    """Streaming CDC apply: each micro-batch of change rows (upserts +
    ``delete_col`` tombstones) MERGEs into an ``EventStore`` through
    ``writeStream.foreachBatch(merger.on_batch)`` — the standard
    "CDC stream -> warehouse table" sink (Debezium-style feeds).

    Each batch is ONE transactional ``EventStore.merge`` commit
    (partition-scoped copy-on-write when the store is partitioned),
    so readers never observe a half-applied batch and time travel
    steps batch by batch. A batch may contain several changes to the
    SAME key; ``merge`` requires unique source keys, so the batch is
    first collapsed to its LAST change per key, ordered by
    ``seq_col`` (the CDC sequence / log offset — REQUIRED: relying on
    arrival order inside a shuffled batch would be nondeterministic).

    Exactly-once: checkpoint-recovery re-delivers a batch whose merge
    already committed; re-merging the same collapsed changes is
    idempotent on table STATE (same final rows), so the sink is
    effectively exactly-once for state even though the commit log
    gains a duplicate version."""

    def __init__(self, store, keys, seq_col: Optional[str] = None,
                 update_cols=None, insert: bool = True,
                 delete_col: Optional[str] = None,
                 update_exprs=None, pre_aggregate=None):
        """Exactly one of ``seq_col`` / ``pre_aggregate`` chooses the
        batch-collapse strategy:

        - ``seq_col``: last change per key wins (CDC replacement
          semantics — idempotent on checkpoint redelivery).
        - ``pre_aggregate``: a callable batch_df -> one-row-per-key
          frame (e.g. a groupBy().agg of partial counts), paired with
          ``update_exprs`` for ADDITIVE merges — the
          continuous-aggregate / hypertable-rollup maintenance step
          (each micro-batch's partials fold into the summary store).
          CAVEAT, stated plainly: additive merges are NOT idempotent —
          a batch redelivered after a crash between commit and
          checkpoint double-counts; production pairs this with a
          processed-batch-id ledger."""
        if (seq_col is None) == (pre_aggregate is None):
            raise ValueError(
                "exactly one of seq_col / pre_aggregate is required")
        self.store = store
        self.keys = list(keys)
        self.seq_col = seq_col
        self.update_cols = update_cols
        self.insert = insert
        self.delete_col = delete_col
        self.update_exprs = update_exprs
        self.pre_aggregate = pre_aggregate
        self.batches = 0

    def on_batch(self, batch_df: DataFrame,
                 batch_id: Optional[int] = None) -> None:
        from pyspark.sql import Window

        if self.pre_aggregate is not None:
            last = self.pre_aggregate(batch_df).localCheckpoint()
        else:
            w = Window.partitionBy(*self.keys).orderBy(
                F.col(self.seq_col).desc())
            last = (batch_df.withColumn("_rn", F.row_number().over(w))
                    .where(F.col("_rn") == 1).drop("_rn", self.seq_col)
                    .localCheckpoint())  # materialize BEFORE merge
            # mutates the manifest the lazy plan would re-read
        if last.rdd.isEmpty():
            return
        self.store.merge(last, self.keys, update_cols=self.update_cols,
                         insert=self.insert, delete_col=self.delete_col,
                         update_exprs=self.update_exprs)
        self.batches += 1


class StreamingSpanScrubber:
    """The SUBSTRING-dedup member of the streaming ingest family:
    where the exact/LSH dedupers DROP whole duplicate documents, this
    one SCRUBS duplicated passages out of otherwise-novel ones (Lee
    et al. substring dedup, incremental form). State on disk is the
    bucketed positional-gram index (``text.write_span_index`` — seed
    it first, possibly on an empty frame).

    Per batch: every maximal shared span of >= ``min_span`` words
    against ANY indexed document (``text.spans_against_index`` — zero
    index-side Exchange) is cut from the batch copy (the indexed
    corpus keeps its copy — keep-first across time); the scrubbed
    text (lowercased by the span tokenization, like
    ``strip_duplicate_spans``) is appended to the clean sink and its
    grams to the index, so the NEXT batch scrubs against it too.
    Duplicated passages BETWEEN two documents of the same batch are
    handled by a second, intra-batch pass (``strip_duplicate_spans``,
    keep-first by id) after the index probe, so the sink and the
    index stay span-clean within the batch too (ADVICE r8). Same
    exactly-once caveat as the siblings; re-appended gram rows cost
    space and candidate fan-out, never correctness."""

    def __init__(self, spark: SparkSession, index_table: str,
                 clean_path: Optional[str] = None,
                 id_col: str = "doc_id", text_col: str = "text",
                 k: int = 5, min_span: int = 6, buckets: int = 32):
        self.spark = spark
        self.index_table = index_table
        self.clean_path = clean_path
        self.id_col, self.text_col = id_col, text_col
        self.k, self.min_span = k, min_span
        self.buckets = buckets
        self.batches = 0
        self.scrubbed_docs = 0
        self.words_removed = 0

    def on_batch(self, batch_df: DataFrame,
                 batch_id: Optional[int] = None) -> DataFrame:
        from recdb_postgresql_spark.operators.text import (
            append_span_index, spans_against_index,
            strip_duplicate_spans)

        spans = spans_against_index(batch_df, self.spark,
                                    self.index_table,
                                    id_col=self.id_col,
                                    text_col=self.text_col,
                                    k=self.k, min_span=self.min_span)
        covered = (spans.select(
            F.col("new_id").alias(self.id_col),
            F.explode(F.sequence(
                F.col("start_new"),
                F.col("start_new") + F.col("span_words") - 1))
            .alias("p"))
            .distinct()
            .groupBy(self.id_col).agg(F.collect_set("p").alias("_cov")))
        toks = F.split(F.lower(F.col(self.text_col)), " ")
        kept = F.filter(
            toks,
            lambda w, i: ~F.exists(
                F.col("_cov"),
                lambda p: p == (i + F.lit(1)).cast("bigint")))
        scrubbed = (batch_df.join(covered, self.id_col, "left")
                    .withColumn("_cov", F.coalesce(
                        F.col("_cov"), F.array().cast("array<bigint>")))
                    .withColumn("_kept", kept)
                    .withColumn("n_removed",
                                (F.size(toks) - F.size(F.col("_kept")))
                                .cast("long"))
                    .withColumn(self.text_col,
                                F.array_join(F.col("_kept"), " "))
                    .drop("_cov", "_kept"))
        # intra-batch pass: spans shared by two docs that ARRIVED
        # TOGETHER are invisible to the pre-batch index probe above —
        # scrub them keep-first-by-id before anything is persisted.
        intra = strip_duplicate_spans(
            scrubbed.select(self.id_col, self.text_col),
            id_col=self.id_col, text_col=self.text_col,
            k=self.k, min_span=self.min_span)
        scrubbed = (scrubbed
                    .withColumnRenamed("n_removed", "_nr_index")
                    .drop(self.text_col)
                    .join(intra, self.id_col)
                    .withColumn("n_removed",
                                (F.col("_nr_index") + F.col("n_removed"))
                                .cast("long"))
                    .withColumnRenamed("clean_text", self.text_col)
                    .drop("_nr_index")
                    .localCheckpoint())
        if self.clean_path:
            scrubbed.write.mode("append").parquet(self.clean_path)
        append_span_index(scrubbed, self.index_table,
                          id_col=self.id_col, text_col=self.text_col,
                          k=self.k, buckets=self.buckets)
        self.spark.catalog.refreshTable(self.index_table + "_grams")
        self.batches += 1
        stats = scrubbed.agg(
            F.count(F.lit(1)),
            F.sum((F.col("n_removed") > 0).cast("long")),
            F.sum("n_removed")).collect()[0]
        self.scrubbed_docs += int(stats[1] or 0)
        self.words_removed += int(stats[2] or 0)
        return scrubbed


class StreamingDriftMonitor:
    """PSI drift monitoring per micro-batch against a FROZEN baseline
    — the loop a scoring service runs beside its model: the baseline
    distribution is fixed at deploy time, every incoming batch gets a
    population-stability-index score, and a PSI above the alert
    threshold (industry convention: 0.25 action / 0.1 watch) flags
    the batch before it poisons downstream aggregates or retrains.

    The baseline is summarized ONCE at construction into bins-sized
    driver metadata (equal-width cells over the baseline min/max with
    edge clamping + Laplace-smoothed shares — the exact
    ``profile.psi_drift`` convention, so a batch score here equals
    the batch's row in that operator). Per batch the cost is ONE
    map-side bucket pass + one bins-sized aggregate over the batch
    alone — the baseline is never rescanned, which is what makes the
    monitor viable at stream rates. Same exactly-once caveat as the
    sibling ingest classes (alerts are at-least-once under replay)."""

    def __init__(self, spark: SparkSession, baseline: DataFrame,
                 val_col: str = "value", bins: int = 10,
                 alert_threshold: float = 0.25):
        import math

        if bins < 2:
            raise ValueError("bins must be >= 2")
        self.val_col, self.bins = val_col, int(bins)
        self.alert_threshold = float(alert_threshold)
        v = F.col(val_col).cast("double")
        lo, hi = baseline.where(v.isNotNull()) \
            .agg(F.min(v), F.max(v)).collect()[0]
        if lo is None:
            raise ValueError("baseline has no non-null values")
        self.lo, self.hi = float(lo), float(hi)
        counts = {r["bin"]: r["n"] for r in self._bucketed(baseline)}
        total = sum(counts.values())
        smooth = 0.5 * self.bins
        self._base_share = [
            (counts.get(b, 0) + 0.5) / (total + smooth)
            for b in range(self.bins)]
        self._log = math.log
        self.history: list[dict] = []

    def _bucketed(self, df: DataFrame):
        v = F.col(self.val_col).cast("double")
        if self.hi == self.lo:
            b = F.lit(0)
        else:
            w = (self.hi - self.lo) / float(self.bins)
            b = F.least(F.lit(self.bins - 1),
                        F.greatest(F.lit(0),
                                   F.floor((v - F.lit(self.lo))
                                           / F.lit(w)).cast("int")))
        return (df.where(v.isNotNull())
                .select(b.alias("bin"))
                .groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
                .collect())

    def on_batch(self, batch_df: DataFrame,
                 batch_id: int | None = None) -> dict:
        counts = {r["bin"]: r["n"] for r in self._bucketed(batch_df)}
        total = sum(counts.values())
        smooth = 0.5 * self.bins
        psi = 0.0
        for b in range(self.bins):
            p_new = (counts.get(b, 0) + 0.5) / (total + smooth)
            p_old = self._base_share[b]
            psi += (p_new - p_old) * self._log(p_new / p_old)
        row = {"batch_id": batch_id, "n_rows": int(total),
               "psi": round(psi, 6),
               "alert": psi >= self.alert_threshold}
        self.history.append(row)
        return row


class StreamingDistinctMonitor:
    """Running distinct-count monitoring per micro-batch via the
    explicit HLL register table (``functions/sketch.hll_build`` /
    ``hll_merge``) — "how many unique users have we EVER seen, and
    how many were new in this batch", answered without storing or
    rescanning identity sets.

    State is the <=2^b-row register table (kept as a driver-side dict
    — it IS that small by construction); each batch builds its own
    register table in one map-side MAX aggregate, merges by MAX, and
    the estimate delta vs the pre-batch state approximates the
    batch's NEW distinct keys. Merge-by-MAX makes replayed batches
    IDEMPOTENT — re-merging the same registers changes nothing, so
    unlike the counting monitors the totals here are exactly-once
    under replay by construction."""

    def __init__(self, spark: SparkSession, key_col: str = "user_id",
                 b: int = 10):
        self.spark, self.key_col, self.b = spark, key_col, int(b)
        self._regs: dict[int, int] = {}
        self.history: list[dict] = []

    def _estimate(self) -> float:
        from recdb_postgresql_spark.functions.sketch import (
            _hll_alpha)
        import math

        m = 1 << self.b
        z = sum(2.0 ** -self._regs.get(i, 0) for i in range(m))
        v_zero = sum(1 for i in range(m) if i not in self._regs)
        e = _hll_alpha(m) * m * m / z
        if e <= 2.5 * m and v_zero > 0:
            return m * math.log(m / v_zero)
        return e

    def on_batch(self, batch_df: DataFrame,
                 batch_id: int | None = None) -> dict:
        from recdb_postgresql_spark.functions.sketch import hll_build

        before = self._estimate() if self._regs else 0.0
        rows = hll_build(batch_df, self.key_col, b=self.b).collect()
        for r in rows:
            i = int(r["idx"])
            self._regs[i] = max(self._regs.get(i, 0), int(r["rho"]))
        after = self._estimate()
        report = {"batch_id": batch_id,
                  "est_total_distinct": round(after, 2),
                  "est_new_distinct": round(max(after - before, 0.0), 2)}
        self.history.append(report)
        return report

    def attach(self, stream_df: DataFrame, **options):
        """foreachBatch wiring, same contract as the sibling
        monitors: returns the DataStreamWriter."""
        return (stream_df.writeStream
                .foreachBatch(lambda df, bid: self.on_batch(df, bid))
                .options(**options))


class StreamingHeavyHittersMonitor:
    """Running top-talkers per micro-batch via Misra-Gries summary
    merge (``functions/sketch.misra_gries``) — "which keys dominate
    the stream so far", in k counters of driver state however long
    the stream runs. The MG sibling of ``StreamingDistinctMonitor``:
    each batch reduces to its own <=k-row summary (distributed,
    mapInPandas two-level), then merges into the running summary with
    the (k+1)-th-weight decrement — the Agarwal et al. mergeable-
    summaries step, so the additive guarantee (est in
    [true - N/(k+1)*levels, true]) survives arbitrarily many batches.

    Unlike the HLL monitor, MG merge is NOT idempotent (counts add),
    so replayed batches double-count — pair with the upstream
    exactly-once dedup stage when replay is possible (same caveat as
    the counting monitors, documented here on purpose)."""

    def __init__(self, spark: SparkSession, key_col: str = "user_id",
                 k: int = 32):
        self.spark, self.key_col, self.k = spark, key_col, int(k)
        self._counters: dict[str, int] = {}
        self.n_seen = 0
        self.history: list[dict] = []

    def _merge(self, batch_summary: dict[str, int]) -> None:
        c = self._counters
        for key, w in batch_summary.items():
            c[key] = c.get(key, 0) + w
        if len(c) > self.k:
            # subtract the (k+1)-th largest weight, drop <= 0
            kth = sorted(c.values(), reverse=True)[self.k]
            dead = []
            for key in c:
                c[key] -= kth
                if c[key] <= 0:
                    dead.append(key)
            for key in dead:
                del c[key]

    def on_batch(self, batch_df: DataFrame,
                 batch_id: int | None = None) -> dict:
        from pyspark.sql import functions as F

        from recdb_postgresql_spark.functions.sketch import misra_gries

        n = batch_df.count()
        summary = {r["key"]: int(r["est_count"]) for r in
                   misra_gries(batch_df, F.col(self.key_col),
                               self.k).collect()}
        self._merge(summary)
        self.n_seen += n
        top = sorted(self._counters.items(),
                     key=lambda kv: (-kv[1], kv[0]))[:5]
        report = {"batch_id": batch_id, "batch_rows": n,
                  "total_rows": self.n_seen,
                  "top": [{"key": key, "est_count": w}
                          for key, w in top]}
        self.history.append(report)
        return report

    def attach(self, stream_df: DataFrame, **options):
        return (stream_df.writeStream
                .foreachBatch(lambda df, bid: self.on_batch(df, bid))
                .options(**options))


class StreamingQuantileMonitor:
    """Running latency/value quantiles per micro-batch via the
    DDSketch-style bucket table (``functions/sketch.ddq_build``) —
    "what are p50/p90/p99 over everything seen so far" without
    storing values. State is the <512-row bucket dict; each batch
    sketches itself in one map-side aggregate and merges by SUM.

    Count-merge means replays ADD (like the counting monitors, unlike
    the HLL monitor's idempotent MAX) — pair with upstream
    exactly-once delivery or a batch-id guard when totals must be
    exact; quantile POSITIONS degrade gracefully under modest
    double-counting because both numerator and denominator inflate.
    The per-batch report carries running estimates at the requested
    quantiles plus batch/total counts."""

    def __init__(self, spark: SparkSession, val_col: str = "value",
                 ps=(0.5, 0.9, 0.99), scale: int = 1_000_000,
                 sub_bits: int = 3):
        self.spark, self.val_col = spark, val_col
        self.ps = list(ps)
        self.scale, self.sub_bits = int(scale), int(sub_bits)
        self._buckets: dict[tuple[int, int], int] = {}
        self.history: list[dict] = []

    def _quantiles(self) -> dict[float, float]:
        items = sorted(self._buckets.items(),
                       key=lambda kv: kv[0][1] << kv[0][0])
        total = sum(c for _, c in items)
        out = {}
        import math

        for p in self.ps:
            r = max(math.ceil(p * total), 1)
            cum = 0
            val = None
            for (shift, sub), c in items:
                cum += c
                if cum >= r:
                    lb, ub = sub << shift, (sub + 1) << shift
                    val = (lb + ub) / 2.0 / self.scale
                    break
            out[p] = val
        return out

    def on_batch(self, batch_df: DataFrame,
                 batch_id: int | None = None) -> dict:
        from recdb_postgresql_spark.functions.sketch import ddq_build

        rows = ddq_build(batch_df, self.val_col, scale=self.scale,
                         sub_bits=self.sub_bits).collect()
        n_batch = 0
        for r in rows:
            k = (int(r["shift"]), int(r["sub"]))
            self._buckets[k] = self._buckets.get(k, 0) + int(r["cnt"])
            n_batch += int(r["cnt"])
        qs = self._quantiles()
        report = {"batch_id": batch_id, "n_batch": n_batch,
                  "n_total": sum(self._buckets.values())}
        for p, v in qs.items():
            report[f"p{int(p * 100)}"] = v
        self.history.append(report)
        return report

    def attach(self, stream_df: DataFrame, **options):
        return (stream_df.writeStream
                .foreachBatch(lambda df, bid: self.on_batch(df, bid))
                .options(**options))
