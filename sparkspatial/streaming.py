"""Structured Streaming ingestion (engine extension).

The reference is strictly batch ETL (SURVEY.md §2.10) — this module is
the engine's forward-looking ingestion path: a stream of pages is
geotagged and aggregated into per-cell windowed counts with a
watermark for late events. Resumability of *batch* stages lives in
checkpoint.py; streaming queries use Spark's own checkpointLocation.

All transformations reuse the batch operators (geotag/assign_cells are
plain column expressions), so stream and batch share one code path —
the Kappa-style property that matters at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cells
from .geocode import lat_sql, lon_sql

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string, domain string")


def read_pages_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def streaming_grid_counts(pages: DataFrame, res: int = 8,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """pages stream -> per-(time-window, cell) page counts.

    Watermark bounds state for late pages; the aggregation is the same
    cell arithmetic as the batch path (tiles.assign_cells).
    """
    geo = (pages
           .withColumn("lat", F.expr(lat_sql("domain", "url", "spark")))
           .withColumn("lon", F.expr(lon_sql("domain", "url", "spark")))
           .withColumn("cell", F.expr(cells.cell_sql("lat", "lon", res))))
    return (geo.withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"), F.col("cell"))
            .agg(F.count(F.lit(1)).alias("page_count"),
                 F.approx_count_distinct("domain").alias("approx_domains"))
            .select(F.col("w.start").alias("window_start"), "cell",
                    "page_count", "approx_domains"))


def streaming_sessionize(events: DataFrame, gap_seconds: int = 1800,
                         watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming sessionization via the built-in
    `session_window` (watermarked, merging state managed by Spark).

    Spark-first choice: the native session window beats a hand-rolled
    stateful operator for gap-based sessions. Custom state in Spark 4
    would use transformWithStateInPandas — probed in this build: its
    Python runner crashes at init (`ImportError: google.protobuf`; the
    protobuf package is not in this container and installs are
    disallowed), and the older applyInPandasWithState is deprecated
    and hangs. So the engine's stateful streaming uses the JVM-native
    operators (session_window, watermarked aggs,
    dropDuplicatesWithinWatermark), which cover every streaming op
    here. Emits one row per closed session.
    """
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.col("user_id"),
                     F.session_window("ts", f"{gap_seconds} seconds"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.col("session_window.start").alias("session_start"),
                    "n_events"))


def run_to_memory(stream_df: DataFrame, name: str = "stream_out",
                  output_mode: str = "complete"):
    """Drive a bounded stream to completion into an in-memory sink
    (test/smoke harness). `output_mode='append'` for non-aggregating
    row streams (Spark rejects 'complete' without an aggregation)."""
    q = (stream_df.writeStream.outputMode(output_mode)
         .format("memory").queryName(name).start())
    q.processAllAvailable()
    q.stop()
    return name


def streaming_spatial_join(pages: DataFrame, zone_index,
                           lat_col: str = "lat", lon_col: str = "lon",
                           poly_id: str = "zone_id") -> DataFrame:
    """Stream->static spatial join against a prebuilt ZoneIndex.

    The batch join's exact shape — point cell-encode, equi-join on
    `cell` against the (static, broadcastable) exploded cover, JVM
    envelope prefilter, codegen'd even-odd PIP refine — is legal
    inside a streaming query because every step is stateless per row:
    a stream-static equi-join + filters. One code path for batch and
    stream (Kappa), with the polygon side built once per zone-set
    version, exactly how a continuous ingest of 10^12 pages would pin
    its dimension state.
    """
    from pyspark.sql import functions as F

    from . import join as joinmod

    geo = (pages
           .withColumn(lat_col, F.expr(lat_sql("domain", "url", "spark")))
           .withColumn(lon_col, F.expr(lon_sql("domain", "url", "spark")))
           .withColumn("cell", F.expr(
               cells.cell_sql(lat_col, lon_col, zone_index.res))))
    cover = F.broadcast(zone_index.cover)
    coarse = (geo.join(cover, on="cell", how="inner")
              .where((F.col(lon_col) >= F.col("minx"))
                     & (F.col(lon_col) <= F.col("maxx"))
                     & (F.col(lat_col) >= F.col("miny"))
                     & (F.col(lat_col) <= F.col("maxy"))))
    refined = coarse.where(joinmod.pip_jvm_predicate(lat_col, lon_col))
    return refined.select("url", "warc_ts", lat_col, lon_col, poly_id)


def streaming_building_overlay(pages: DataFrame, poly_index, *,
                               half_w: float | None = None,
                               half_h: float | None = None) -> DataFrame:
    """Stream->static polygon x polygon overlay: each page geotags,
    becomes a building quad (join.rect_probes_from_points — the same
    construction as the batch driver query and the pipeline CLI), and
    joins the PREBUILT polygonal zone cover
    (join.build_poly_zone_index) through the batch operator itself —
    with probe_rect every probe-side step (bbox project,
    sequence-explode cover, cell equi-join with reference-cell dedup,
    stateless Arrow refine) is legal inside a streaming query.
    broadcast stays on auto: an oversized zone cover falls back to a
    stream-static shuffle equi-join instead of force-broadcasting."""
    from . import join as joinmod

    geo = (pages
           .withColumn("lat", F.expr(lat_sql("domain", "url", "spark")))
           .withColumn("lon", F.expr(lon_sql("domain", "url", "spark"))))
    b = joinmod.rect_probes_from_points(
        geo,
        half_w=half_w if half_w is not None else joinmod.RECT_HALF_W_DEG,
        half_h=half_h if half_h is not None else joinmod.RECT_HALF_H_DEG)
    return joinmod.spatial_join_polygons(
        b, probe_id="url", probe_rect=True, index=poly_index)


def streaming_zone_counts(pages: DataFrame, zone_index,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Streamed per-(window, zone) page counts over the spatial join."""
    matched = streaming_spatial_join(pages, zone_index)
    return (matched.withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"),
                     F.col("zone_id"))
            .agg(F.count(F.lit(1)).alias("page_count"))
            .select(F.col("w.start").alias("window_start"), "zone_id",
                    "page_count"))


def streaming_dedup(pages: DataFrame, key_cols=("url",),
                    ts_col: str = "warc_ts",
                    watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: drop re-crawled/duplicate keys within
    the watermark horizon via the native
    `dropDuplicatesWithinWatermark` stateful operator.

    Continuous-ingest twin of text.exact_dedup: a recrawl of the same
    url arriving within `watermark` of the first copy is dropped;
    state for a key is reclaimed once the watermark passes it, so
    state size is bounded by (arrival rate x horizon), not corpus
    size — the property that keeps an unbounded 10^12-page ingest
    feasible. (Plain dropDuplicates on a stream never expires state.)

    Exactly-once note: emitted rows flow append-mode; the operator
    guarantees no duplicate key WITHIN the horizon and at-least-one
    copy overall, the standard contract for streaming dedup.
    """
    return (pages.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(list(key_cols)))


def streaming_near_dup_alerts(pages: DataFrame, corpus_bands: DataFrame,
                              *, n_hashes: int = 8, bands: int = 4,
                              ts_col: str = "warc_ts",
                              watermark: str = "2 hours",
                              broadcast: bool = True) -> DataFrame:
    """Streaming near-duplicate detection against a STATIC corpus
    index: each arriving page's MinHash band keys equi-join the
    prebuilt (doc_id, band, bh) banded-signature index
    (`text.band_keys` over `text.minhash_signatures` of the corpus,
    built once like a ZoneIndex); a hit alerts (url, doc_id).

    Per-row signatures come from `text.minhash_pandas` (one Arrow
    stage — the batch path's window-lead rolling is illegal on a
    stream), bit-identical to the batch signatures, so stream alerts
    == batch LSH candidates for the same rows (pinned in tests). Band
    hashing itself stays JVM (xxhash64). Multiple band collisions of
    the same (url, doc_id) are collapsed by
    dropDuplicatesWithinWatermark — bounded state, not a global
    distinct.
    """
    from . import text as textmod

    sig_schema = (f"url string, {ts_col} timestamp, "
                  + ", ".join(f"mh{j} long" for j in range(n_hashes)))

    def _sig(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = textmod.minhash_pandas(pdf["text"].tolist(), n_hashes)
            out = pdf[["url", ts_col]].copy()
            for j in range(n_hashes):
                out[f"mh{j}"] = mat[:, j]
            yield out

    sigs = pages.mapInPandas(_sig, schema=sig_schema)
    stream_bands = textmod.band_keys(sigs, id_col="url", bands=bands,
                                     keep_cols=(ts_col,))
    # broadcast=False: an index too big for broadcast (10^9+ corpus
    # rows x bands) shuffle-joins instead — stream-static equi-joins
    # support both distributions
    idx = F.broadcast(corpus_bands) if broadcast else corpus_bands
    hits = stream_bands.join(idx, on=["band", "bh"], how="inner")
    return (hits.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["url", "doc_id"])
            .select("url", "doc_id", ts_col))


def streaming_knn(queries: DataFrame, points: DataFrame, k: int, *,
                  index=None, res: int = 10, point_id: str = "url",
                  lat_col: str = "lat", lon_col: str = "lon",
                  qid_col: str = "qid", qlat_col: str = "qlat",
                  qlon_col: str = "qlon", sink=None):
    """Streaming exact kNN: a stream of query points against a STATIC
    corpus, via foreachBatch reusing the batch operator verbatim.

    The certification loop (adaptive rings + localCheckpoint rounds)
    is a multi-job iterative plan — illegal inline in a streaming
    query (non-time windows and loops don't stream) — but each
    micro-batch is an ordinary DataFrame inside foreachBatch, and kNN
    is per-query independent, so per-batch results are EXACTLY the
    batch operator's results for those queries (pinned in tests).
    The corpus side follows the build-once index stance: pass a
    persisted `knn.KnnIndex` so micro-batches pay only the
    ring-join + window, never the corpus aggregation.

    `sink(result_df, epoch_id)` receives each batch's (qid, point_id,
    dist_m, rnk) frame; returns the unstarted writeStream builder so
    the caller adds checkpointLocation/trigger and starts it.
    """
    from . import knn as knnmod

    def _batch(bdf: DataFrame, epoch_id: int) -> None:
        out = knnmod.knn_join(points, bdf, k, res=res, index=index,
                              point_id=point_id, lat_col=lat_col,
                              lon_col=lon_col, qid_col=qid_col,
                              qlat_col=qlat_col, qlon_col=qlon_col)
        if sink is not None:
            sink(out, epoch_id)

    return queries.writeStream.foreachBatch(_batch)


def streaming_cosine_topk(queries: DataFrame, corpus: DataFrame, k: int, *,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          qid_col: str = "qid", qvec_col: str = "qvec",
                          q_blocks: int = 1, c_blocks: int = 8,
                          sink=None):
    """Streaming exact cosine top-k: a stream of query vectors against
    a STATIC corpus, via foreachBatch reusing
    :func:`sim.cosine_topk_blocked` verbatim.

    The re-rank window partitions by qid (a non-time window — illegal
    inline in a streaming query), but each micro-batch is an ordinary
    DataFrame inside foreachBatch and top-k is per-query independent,
    so per-batch results are EXACTLY the batch operator's results for
    those queries (pinned in tests). Persist the corpus DataFrame for
    the build-once stance: micro-batches then pay only the block
    product against the cached corpus, never the source re-scan.

    `q_blocks` defaults to 1 here (not the batch operator's 4): a
    micro-batch of queries fits one query block, and every extra
    query block replicates — and shuffles — the ENTIRE static corpus
    once more per batch (review-caught r4). Raise it only for very
    large micro-batches.

    `sink(result_df, epoch_id)` receives each batch's (qid, id_col,
    cos, rnk) frame; returns the unstarted writeStream builder so the
    caller adds checkpointLocation/trigger and starts it.
    """
    from . import sim as simmod

    def _batch(bdf: DataFrame, epoch_id: int) -> None:
        out = simmod.cosine_topk_blocked(
            corpus, bdf, k, id_col=id_col, vec_col=vec_col,
            qid_col=qid_col, qvec_col=qvec_col,
            q_blocks=q_blocks, c_blocks=c_blocks)
        if sink is not None:
            sink(out, epoch_id)

    return queries.writeStream.foreachBatch(_batch)
