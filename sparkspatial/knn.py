"""kNN via k-ring cell expansion with exact distance re-rank.

Extension beyond the reference (SURVEY.md §2.3: "kNN is required by the
north_rule"). For each query point: candidates are points whose cell
lies in the query's k-ring; candidates re-rank by exact haversine; the
result is certified exact when the k-th distance fits inside the
guaranteed-covered window of the searched ring, else the query re-runs
with a larger ring.

Ring growth is adaptive PER QUERY (r4): each uncertified query jumps
straight to the ring its own round-1 evidence suggests — the density
estimate (points observed inside the certified disc, which scales
with ring^2 just like the window, so sqrt(4k/seen) growth holds and
the disc/window area ratio only makes it conservative) — instead of
every query sharing one global doubling schedule. Certification is
re-checked exactly each round, so the jump heuristic can only affect
round count, never correctness. Dense-area queries finish in round 1;
sparse ones converge in ~2 rounds where doubling needed log2(need).

The loop is DataFrame-native: queries, ring-cell expansion,
certification, and the done/remaining split all stay distributed (no
per-round toPandas of query state, no IN-list literals in the plan) —
only one scalar stats row per round reaches the driver, so the
operator survives query sets of 10^5+ rows. Round count is the serial
bottleneck at cluster scale (each round is a job barrier), so the
round body is a single eager localCheckpoint: rank, certification
flag, and growth evidence all materialize in one pass (three window
functions over one exchange), and the done/remaining split reads the
checkpointed result.

Coverage bounds are exact on the engine's sphere (R = 6371008.8 m,
matching geom.haversine_deg): one degree of latitude is pi*R/180 m; the
minimum great-circle distance to a point outside a +-W-degree longitude
window at latitude <= phi_max is 2*R*asin(cos(phi_max)*sin(W_rad/2)).
Ties break deterministically by (distance, point id).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import cells, geom

# exact meters per degree of latitude on the engine's sphere; the
# strict lower bound (for conservative padding) shaves a hair off it
M_PER_DEG_LAT = math.pi * geom.EARTH_RADIUS_M / 180.0
M_PER_DEG_LAT_LB = M_PER_DEG_LAT * (1.0 - 1e-9)

# broadcast the ring-cell table while |queries| * ring cells is small
BROADCAST_MAX_RING_ROWS = 4_000_000

# map-side candidate prefilter: drop dist > cover(ring) before the
# top-k window. EXACT with IDENTICAL per-round certification
# outcomes: certification requires kth < cover, so every member of
# a certified top-k survives the filter (dropped points are
# strictly farther than cover >= kth and cannot displace or tie
# one), and a query whose true kth lands at/beyond cover has < k
# in-disc survivors, failing certification with or without the
# filter — the filter changes no result, only the rows exchanged
# into the window (~7x fewer on the bench corpus: the ring window
# spans ~(2 ring+1)^2 cells, the certified disc is a fraction of
# it). Side effect on SCHEDULE (not results): the observed kth is
# capped at cover and cand_n counts in-disc points only, so ring
# growth is density-driven (see the growth comment in the loop);
# round counts may differ from an unfiltered loop. phi > 1
# (tighter discs) was measured and REJECTED: at phi=4, 11/113
# bench queries fell under k survivors and paid an extra full
# round, a net loss.
PREFILTER_PHI = 1.0

# Density-aware prefilter (r6): a query whose ring window holds far
# more points than k needs only a small disc around itself, not the
# whole guaranteed-covered disc. Each round estimates the window's
# point count from the index's per-cell totals and shrinks the filter
# radius so the disc is expected to hold DENSITY_TARGET_K * k points
# — still >> k, so failing certification from the shrink is a
# Poisson-tail event (P[X < 10 | E=80] ~ 3e-9 under local
# uniformity); non-uniform windows (a hot blob near a sparse query)
# fail certification exactly as an undersized ring always did and
# grow normally. EXACTNESS is untouched by ANY radius choice: the
# effective radius never exceeds the covered radius, and
# certification compares the k-th distance against the SAME effective
# radius, so a certified top-k provably saw every competitor (the
# PREFILTER_PHI argument above, applied to min(cover, r_est)).
# Measured r6: the hot-cell bench window shipped ~10^8 candidate rows
# into the per-qid top-k exchange without this (19.4 s); with it the
# exchange is ~10^5 rows.
DENSITY_TARGET_K = 8.0

# The probe costs a fixed ~2 extra broadcast exchanges per round
# (measured +0.3 s at local[32]) and its benefit scales with how many
# candidate rows it prunes, so it only engages when the location
# index is big enough that an unpruned hot window could actually
# flood the top-k exchange. Below this many locations the whole index
# scans in one cheap stage and the pre-r6 plan is strictly faster
# (sf0.1 A/B: 1.16 s without probe vs 1.47 s with). A prebuilt
# KnnIndex knows its size for free (persist() counts it); the inline
# path can't know and stays conservative (probe on).
DENSITY_PROBE_MIN_LOCS = 1_000_000


def _ring_cells(queries: DataFrame, res: int) -> DataFrame:
    """(qid, qlat, qlon, ring) -> one row per (query, k-ring cell).

    Pure-JVM twin of :func:`cells.kring` (same wrap/clamp semantics,
    pinned by pytest against the numpy version): two
    ``explode(sequence(...))`` generators stay inside codegen, so ring
    expansion costs no Python stage and the broadcast side evaluates
    without an Arrow round-trip. Latitude rows beyond the poles drop;
    longitude wraps via ``pmod``; when the ring spans the whole grid
    width the x range collapses to one absolute 0..n-1 pass so no
    (qid, cell) pair ever duplicates (a duplicate would double-count a
    candidate point in the top-k window)."""
    n = 1 << res
    gx = cells.grid_idx_sql("qlon", res, "x")
    gy = cells.grid_idx_sql("qlat", res, "y")
    return (queries
            .selectExpr("qid", "qlat", "qlon", "ring",
                        f"{gx} AS _gx", f"{gy} AS _gy")
            .withColumn("_y", F.explode(F.expr(
                "sequence(_gy - ring, _gy + ring)")))
            .where((F.col("_y") >= 0) & (F.col("_y") < n))
            .withColumn("_x", F.explode(F.expr(
                f"CASE WHEN 2 * ring + 1 >= {n} THEN sequence(0, {n - 1}) "
                f"ELSE transform(sequence(_gx - ring, _gx + ring), "
                f"v -> pmod(v, {n})) END")))
            .selectExpr("qid", "qlat", "qlon", "ring",
                        cells.compose_cell_sql("_x", "_y", res) + " AS cell"))


def _cover_m_col(ring, res: int):
    """Guaranteed-covered radius (meters) of a searched k-ring as a
    Column over (qlat, ring) — everything within this haversine
    distance of the query provably lies inside the ring window, so a
    k-th neighbor closer than it certifies the result exact. `ring` is
    a Column (per-query adaptive radius).

    lat direction: the window spans >= ring*cell_h degrees, and one
    degree of latitude is exactly pi*R/180 m on the sphere.
    lon direction: min distance to a point outside a +-W-degree window
    at |lat| <= phi_max is 2*R*asin(cos(phi_max)*sin(min(W,360)/2))
    (haversine >= cos(lat1)*cos(lat2)*sin^2(dlon/2) term).
    """
    ring = ring.cast("double")
    h_deg = ring * F.lit(180.0 / (1 << res))
    w_deg = ring * F.lit(360.0 / (1 << res))
    r_m = geom.EARTH_RADIUS_M
    cover_lat = F.radians(h_deg) * F.lit(r_m)
    phi_max = F.least(F.abs(F.col("qlat")) + h_deg, F.lit(90.0))
    half_w = F.least(F.radians(w_deg) / 2.0, F.lit(math.pi / 2.0))
    cover_lon = (F.lit(2.0 * r_m)
                 * F.asin(F.cos(F.radians(phi_max)) * F.sin(half_w)))
    return F.least(cover_lat, cover_lon)


class KnnIndex:
    """Precomputed point-side kNN state: one row per distinct
    (cell, lat, lon) location with its point count and the `k_max`
    smallest point ids.

    EXACT collapse of co-located points — the dominant skew shape of
    web-geotagged data, where every page of a domain shares one
    geocode: all points at one location are equidistant from any
    query, and ties rank by id, so only a location's k smallest ids
    can ever reach a global top-k. The candidate window then sees
    ``min(k, n_pts)`` rows per location instead of ``n_pts``
    (measured 2.6M -> ~30k window rows on the 600k-page bench corpus).
    For all-distinct locations the index degenerates to the points
    table and the plan matches the naive one.

    Build-once pattern (SURVEY.md §2.8 P2/P3, same stance as
    ZoneIndex): one window pass over the points table, reusable
    across knn_join calls while the point set is unchanged.
    `persist()` pins it (caller owns the lifetime).

    Staleness contract: knn_join validates PARAMETERS (res, column
    names, k_max) loudly, but cannot detect that `points` changed
    since the index was built — like ZoneIndex, the caller owns
    rebuilding on data change; a stale index silently answers from
    the old point set (and the max_ring brute-force fallback would
    answer from the new one).
    """

    def __init__(self, loc: DataFrame, res: int, k_max: int,
                 point_id: str, lat_col: str, lon_col: str):
        self.loc = loc
        self.res = res
        self.k_max = k_max
        self.point_id = point_id
        self.lat_col = lat_col
        self.lon_col = lon_col
        # per-cell point totals — the density side table of the r6
        # prefilter (see DENSITY_TARGET_K). Derived from loc, so it
        # can never disagree with the candidate set; ~|occupied
        # cells| rows (collapsed locations collapse further here).
        self.cell_counts = (loc.groupBy("cell")
                            .agg(F.sum("n_pts").alias("c_pts")))
        # known after persist(); gates the density probe (see
        # DENSITY_PROBE_MIN_LOCS) without costing a job
        self.n_loc: int | None = None

    def persist(self) -> "KnnIndex":
        from . import session as _session
        self.loc = self.loc.persist()
        self.n_loc = self.loc.count()
        _session.register_persisted(self.loc)
        self.cell_counts = (self.loc.groupBy("cell")
                            .agg(F.sum("n_pts").alias("c_pts")).persist())
        self.cell_counts.count()
        _session.register_persisted(self.cell_counts)
        return self

    def release(self) -> None:
        self.loc.unpersist()
        self.cell_counts.unpersist()


def build_knn_index(points: DataFrame, *, res: int = 10, k_max: int = 64,
                    point_id: str = "url", lat_col: str = "lat",
                    lon_col: str = "lon") -> KnnIndex:
    """One shuffle over the points table -> KnnIndex (see class doc).

    Window (not collect_list-then-slice) keeps per-location state
    bounded at k_max rows even for a location with millions of
    co-located points — the 100-TB-safe shape; the groupBy after it
    reuses the window's hash partitioning (no second exchange).
    """
    pts = points.withColumn(
        "cell", F.expr(cells.cell_sql(lat_col, lon_col, res)))
    wloc = Window.partitionBy("cell", lat_col, lon_col)
    ranked = (pts
              .withColumn("_r", F.row_number().over(
                  wloc.orderBy(F.col(point_id).asc())))
              .withColumn("n_pts", F.count(F.lit(1)).over(wloc)))
    loc = (ranked.where(F.col("_r") <= k_max)
           .groupBy("cell", lat_col, lon_col)
           .agg(F.first("n_pts").alias("n_pts"),
                F.sort_array(F.collect_list(point_id)).alias("top_ids")))
    return KnnIndex(loc, res, k_max, point_id, lat_col, lon_col)


def knn_join(points: DataFrame, queries: DataFrame, k: int, *,
             res: int = 10, point_id: str = "url",
             lat_col: str = "lat", lon_col: str = "lon",
             qid_col: str = "qid", qlat_col: str = "qlat",
             qlon_col: str = "qlon",
             initial_ring: int = 1, max_ring: int = 64,
             index: KnnIndex | None = None) -> DataFrame:
    """Exact kNN: returns (qid, point_id, dist_m, rnk) with rnk 1..k.

    Query state never collects to the driver: each round is a
    (ring-cell x location-index) cell equi-join + ONE window pass
    computing the top-k rank, the certification flag, and the
    ring-growth evidence together, materialized by a single eager
    localCheckpoint; the done/remaining split reads the checkpointed
    frame. One scalar stats row per round (count + ring-row sum, for
    loop exit and the broadcast decision) is the only driver-side
    data. Uncertified queries grow their ring adaptively (see module
    docstring); certification is exact, so growth only affects round
    count.

    `index`: a prebuilt (usually persisted) KnnIndex over `points` —
    must match res/point_id/lat/lon and have k_max >= k. Without it
    the index builds inline (one extra shuffle over points per call).
    """
    spark = points.sparkSession
    if index is not None:
        if (index.res != res or index.point_id != point_id
                or index.lat_col != lat_col or index.lon_col != lon_col):
            raise ValueError(
                "KnnIndex was built with different res/point_id/lat/lon "
                f"({index.res}, {index.point_id!r}, {index.lat_col!r}, "
                f"{index.lon_col!r})")
        if index.k_max < k:
            raise ValueError(
                f"KnnIndex k_max={index.k_max} < requested k={k}")
        loc = index.loc
        cell_counts = index.cell_counts
        use_probe = index.n_loc is None \
            or index.n_loc >= DENSITY_PROBE_MIN_LOCS
    else:
        use_probe = True
        # lazy localCheckpoint: materializes inside round 1's window
        # job and pins the built index so rounds 2+ reuse the stored
        # blocks instead of re-running the build shuffle per round
        loc = (build_knn_index(points, res=res, k_max=k, point_id=point_id,
                               lat_col=lat_col, lon_col=lon_col)
               .loc.localCheckpoint(eager=False))
        cell_counts = (loc.groupBy("cell")
                       .agg(F.sum("n_pts").alias("c_pts")))

    remaining = (queries.select(F.col(qid_col).cast("string").alias("qid"),
                                F.col(qlat_col).cast("double").alias("qlat"),
                                F.col(qlon_col).cast("double").alias("qlon"))
                 .withColumn("ring", F.lit(int(initial_ring)).cast("int"))
                 # lazy like the in-loop checkpoints: round 1's stats
                 # job materializes it, saving one job per call
                 .localCheckpoint(eager=False))

    results: list[DataFrame] = []
    exhausted: list[DataFrame] = []
    while True:
        # one tiny job: loop-exit count + exact ring-row total for the
        # broadcast decision (remaining is checkpointed or a shallow
        # anti-join over checkpointed frames, so this is cheap). The
        # null-qid count rides the same job: qid is the partition/join
        # key, so a NULL qid would merge queries in the top-k window
        # AND never leave `remaining` (null-unsafe anti-join) — reject
        # loudly instead of looping to max_ring and emitting dupes.
        n_remaining, ring_rows, n_null = remaining.agg(
            F.count(F.lit(1)),
            F.sum((F.col("ring").cast("long") * 2 + 1)
                  * (F.col("ring").cast("long") * 2 + 1)),
            F.count(F.when(F.col("qid").isNull(), 1))).first()
        if n_null:
            raise ValueError(
                f"knn_join: {n_null} query rows have NULL {qid_col!r} — "
                "qid is the top-k key and must be non-null")
        if not n_remaining:
            break
        ring_df = _ring_cells(remaining, res)
        # density probe (r6, see DENSITY_TARGET_K): expected point
        # count of each query's window from the index's per-cell
        # totals — one scan of the (persisted) cell_counts table with
        # the tiny ring table broadcast as the build side; the
        # per-query scalar then rides the ring rows into the
        # candidate join
        base_cov = _cover_m_col(F.col("ring"), res) / F.lit(PREFILTER_PHI)
        if use_probe:
            qdens = (F.broadcast(ring_df.select("qid", "cell"))
                     .join(cell_counts, "cell", "inner")
                     .groupBy("qid").agg(F.sum("c_pts").alias("n_window")))
            w_cells = F.col("ring").cast("double") * 2.0 + 1.0
            h_m = (w_cells * F.lit(180.0 / (1 << res))
                   * F.lit(M_PER_DEG_LAT))
            w_m = (w_cells * F.lit(360.0 / (1 << res))
                   * F.lit(M_PER_DEG_LAT)
                   * F.greatest(F.cos(F.radians(F.col("qlat"))),
                                F.lit(1e-6)))
            r_est = F.sqrt(F.lit(DENSITY_TARGET_K * k) * h_m * w_m
                           / (F.lit(math.pi) * F.col("n_window")))
            cov_eff = F.when(
                F.col("n_window") > F.lit(DENSITY_TARGET_K * k),
                F.least(base_cov, r_est)).otherwise(base_cov)
            ring_df = (ring_df.join(F.broadcast(qdens), "qid", "left")
                       .withColumn("_cov_eff", cov_eff)
                       .drop("n_window"))
        else:
            # small index: the probe's fixed broadcast cost exceeds
            # its pruning benefit — keep the full covered disc (plan
            # identical to the unprobed one, certification unchanged)
            ring_df = ring_df.withColumn("_cov_eff", base_cov)
        if ring_rows <= BROADCAST_MAX_RING_ROWS:
            ring_df = F.broadcast(ring_df)
        dist = haversine_col(F.col("qlat"), F.col("qlon"),
                             F.col(lat_col), F.col(lon_col))
        # candidate = (query, LOCATION) pair; dist computes once per
        # location, then the capped id list explodes to <= k rows —
        # all JVM, and the explode is what keeps a 10^4-point
        # co-located cell from flooding the window below. The cheap
        # latitude-arc cut runs before the haversine: |dlat| meters
        # NEVER exceeds the haversine distance on the sphere, so it
        # drops no row the exact predicate would keep, and it spares
        # the libm calls on the ~97% of hot-window rows outside the
        # effective disc
        cand = (loc.join(ring_df, on="cell", how="inner")
                .where(F.abs(F.col(lat_col) - F.col("qlat"))
                       * F.lit(M_PER_DEG_LAT_LB) <= F.col("_cov_eff"))
                .withColumn("dist_m", dist)
                .where(F.col("dist_m") <= F.col("_cov_eff"))
                .select("qid", "ring", "n_pts", "dist_m",
                        F.col("qlat"), "_cov_eff",
                        F.posexplode(F.slice("top_ids", 1, k))
                        .alias("_pos", point_id)))

        w_rank = Window.partitionBy("qid").orderBy(F.col("dist_m").asc(),
                                                   F.col(point_id).asc())
        w_all = Window.partitionBy("qid")
        # three windows, one exchange: rnk (sorted), cand_n (growth
        # evidence; each location counts its FULL population once, on
        # its _pos==0 row), kth (certification); then the exact
        # certification flag. All materialize in ONE checkpoint.
        kth = F.max(F.when(F.col("rnk") == k, F.col("dist_m"))).over(w_all)
        flagged = (cand
                   .withColumn("rnk", F.row_number().over(w_rank))
                   .withColumn("cand_n", F.sum(
                       F.when(F.col("_pos") == 0, F.col("n_pts"))).over(w_all))
                   .where(F.col("rnk") <= k)
                   .withColumn("kth", kth)
                   # certify against the SAME radius the filter used:
                   # kth < cov_eff <= cover proves every competitor
                   # was inside the window AND survived the filter
                   .withColumn("ok", F.col("kth").isNotNull()
                               & (F.col("kth") < F.col("_cov_eff")))
                   .select("qid", point_id, "dist_m", "rnk", "ok",
                           "cand_n", "ring")
                   .localCheckpoint(eager=True))

        results.append(flagged.where("ok")
                       .select("qid", point_id, "dist_m", "rnk"))

        # uncertified queries: keep zero-candidate ones (absent from
        # flagged) via left_anti against the certified qid set, join
        # the growth evidence back, and jump the ring. ok/cand_n/kth
        # are constant per qid and row_number guarantees exactly one
        # rnk=1 row per qid, so both sets are plain filters over the
        # checkpointed frame — no distinct/groupBy exchange.
        done_q = flagged.where("ok AND rnk = 1").select("qid")
        ev = flagged.where("NOT ok AND rnk = 1").select("qid", "cand_n")
        not_done = (remaining.join(done_q, "qid", "left_anti")
                    .join(ev, "qid", "left"))
        exhausted.append(not_done.where(F.col("ring") >= max_ring)
                         .select("qid", "qlat", "qlon"))

        # growth: enough ring to expect ~4k in-disc candidates under
        # the observed density. cand_n counts points inside the
        # certified disc, whose area scales with ring^2 exactly like
        # the window's, so sqrt(4k/cand_n) is the right growth factor
        # (the disc/window area ratio only biases it conservative —
        # bigger jumps, never smaller). A kth-vs-cover margin term
        # would be dead code here: the prefilter caps every observed
        # dist at cover, so an uncertified query's kth is NULL (fewer
        # than k in-disc survivors) or == cover. >=2x keeps the
        # doubling worst case, <=8x bounds one bad estimate.
        # Heuristic only — certification re-checks exactly next round.
        g_density = F.ceil(F.sqrt(F.lit(4.0 * k)
                                  / F.greatest(F.col("cand_n"), F.lit(1))))
        growth = F.least(F.greatest(F.lit(2), g_density), F.lit(8))
        # lazy localCheckpoint: materializes inside next round's stats
        # job (no extra job here) and keeps lineage flat — without it
        # the remaining-plan is an anti-join chain that deepens and
        # re-evaluates every round (quadratic in round count on
        # sparse data driving many rounds)
        remaining = (not_done.where(F.col("ring") < max_ring)
                     .withColumn("ring",
                                 F.least(F.col("ring").cast("long") * growth,
                                         F.lit(int(max_ring)))
                                 .cast("int"))
                     .select("qid", "qlat", "qlon", "ring")
                     .localCheckpoint(eager=False))

    # ring expansion exhausted (queries far from all data, or fewer
    # than k points exist): exact brute-force for those queries —
    # bounded, since only uncertified-at-max_ring queries reach here.
    # One isEmpty probe total (not per round).
    if exhausted:
        ex = exhausted[0]
        for e in exhausted[1:]:
            ex = ex.unionByName(e)
        if not ex.isEmpty():
            results.append(knn_bruteforce(points, ex, k,
                                          point_id=point_id,
                                          lat_col=lat_col, lon_col=lon_col))

    if not results:
        return spark.createDataFrame(
            [], f"qid string, {point_id} string, dist_m double, rnk int")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def haversine_col(lat1, lon1, lat2, lon2):
    """Haversine meters as a Column expression (shared by kNN/range)."""
    return 2.0 * F.lit(geom.EARTH_RADIUS_M) * F.asin(F.sqrt(
        F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)))


def range_join(points: DataFrame, queries: DataFrame, radius_m: float, *,
               res: int = 10, point_id: str = "url",
               lat_col: str = "lat", lon_col: str = "lon",
               qid_col: str = "qid", qlat_col: str = "qlat",
               qlon_col: str = "qlon",
               broadcast: bool = True) -> DataFrame:
    """Within-radius join: all (query, point) pairs with haversine
    distance <= radius_m (the buffer/overlay range query; a range
    join the reference lacks — SURVEY.md §2.3 note).

    Each query's circle bbox explodes into covering cells
    (conservative spherical padding: exact lat arc, exact lon chord
    inversion); points equi-join on cell; the exact haversine
    predicate filters JVM-side.

    Query state stays distributed: the longitude window is a JVM
    column expression, the join resolution comes from ONE scalar
    aggregate (min+max window width), and the circle covers expand in
    an Arrow stage — no per-query toPandas, so the operator survives
    10^5+ query rows (the kNN-loop discipline; r1 verdict flagged the
    old driver-side collect). `broadcast=False` shuffles the cover
    instead of broadcasting for huge query sets.

    Resolution is PER QUERY (r4): each query covers at the finest of
    <= 4 levels whose bbox stays under 256 cells, so one polar/wide
    query no longer coarsens the index for the whole set (pre-r4 a
    single global res came from max(dlon)). The cell id encodes its
    res, so mixed-res covers join against `join.point_cells`' <= 4-way
    point-side expansion on plain cell equality; when every query
    agrees on one level the plan is identical to the single-res one.

    Covers WRAP at the antimeridian (r4 fix): a circle straddling
    +-180 splits into two lon ranges (pre-r4 the cover clamped at the
    seam and silently missed the far-side points).
    """
    import pandas as pd

    from . import join as joinmod

    spark = points.sparkSession
    qdf = queries.select(F.col(qid_col).cast("string").alias("qid"),
                         F.col(qlat_col).cast("double").alias("qlat"),
                         F.col(qlon_col).cast("double").alias("qlon"))
    dlat = radius_m / M_PER_DEG_LAT_LB
    # exact longitude window: a point within radius_m satisfies
    # sin(dlon/2) <= sin(radius/(2R)) / cos(phi_max)  (haversine bound)
    sin_half = math.sin(radius_m / (2.0 * geom.EARTH_RADIUS_M))
    phi_max = F.radians(F.least(F.abs(F.col("qlat")) + F.lit(dlat),
                                F.lit(90.0)))
    s = F.lit(sin_half) / F.greatest(F.cos(phi_max), F.lit(1e-12))
    dlon_col = F.when(s >= 1.0, F.lit(180.0)) \
        .otherwise(F.degrees(2.0 * F.asin(F.least(s, F.lit(1.0)))))
    qdf = qdf.withColumn("dlon", dlon_col)

    # level ladder: finest level for the narrowest window, coarsest
    # for the widest, at most 4 levels between them. min/max(dlon) are
    # the ONLY scalars that reach the driver; the per-query level
    # assignment below uses the same closed form, and dlon is
    # monotone in the level formula, so every assigned level lies in
    # [res_for(max_dlon), res_for(min_dlon)].
    row = qdf.agg(F.min("dlon"), F.max("dlon")).first()
    if row[0] is None:
        return spark.createDataFrame(
            [], f"qid string, {point_id} string, dist_m double")

    def _res_for(d: float) -> int:
        r = res
        while r > 0:
            nx = 2.0 * d / (360.0 / (1 << r)) + 2
            ny = 2.0 * dlat / (180.0 / (1 << r)) + 2
            if nx * ny <= 256:
                break
            r -= 1
        return r

    r_hi, r_lo = _res_for(float(row[0])), _res_for(float(row[1]))
    levels = sorted({r_lo, *(max(r_lo, r_hi - i) for i in range(3))})
    pts = joinmod.point_cells(points, levels,
                              lat_col=lat_col, lon_col=lon_col)

    def _cover(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"qid": pd.Series([], dtype=str),
                                    "qlat": [], "qlon": [], "cell": []})
                continue
            qlat = pdf["qlat"].to_numpy(np.float64)
            qlon = pdf["qlon"].to_numpy(np.float64)
            dlon = pdf["dlon"].to_numpy(np.float64)
            qid = pdf["qid"].to_numpy()
            # largest level whose bbox stays under 256 cells (count
            # grows with the level, so ascending assignment ends on
            # the finest admissible one)
            lvl = np.full(len(pdf), levels[0], dtype=np.int64)
            for r in levels[1:]:
                nx = 2.0 * dlon / (360.0 / (1 << r)) + 2
                ny = 2.0 * dlat / (180.0 / (1 << r)) + 2
                lvl[nx * ny <= 256.0] = r
            # antimeridian wrap: a window crossing +-180 becomes two
            # boxes; a window spanning the full ring (dlon >= 180)
            # stays ONE box pinned to [-180, 180] — pinning matters:
            # an unpinned [qlon-180, qlon+180] box would be clamped
            # by covering_cells and silently drop the arc beyond the
            # seam whenever qlon != 0 (review-caught r4)
            lo, hi = qlon - dlon, qlon + dlon
            full = dlon >= 180.0
            lo = np.where(full, -180.0, lo)
            hi = np.where(full, 180.0, hi)
            wrap_e = (hi > 180.0) & ~full
            wrap_w = (lo < -180.0) & ~full
            boxes = [(np.arange(len(pdf)),
                      np.where(wrap_w, -180.0, lo),
                      np.where(wrap_e, 180.0, hi))]
            if wrap_e.any():
                i = np.flatnonzero(wrap_e)
                boxes.append((i, np.full(len(i), -180.0), hi[i] - 360.0))
            if wrap_w.any():
                i = np.flatnonzero(wrap_w)
                boxes.append((i, lo[i] + 360.0, np.full(len(i), 180.0)))
            frames = []
            for r in levels:
                for pos, blo, bhi in boxes:
                    m = lvl[pos] == r
                    if not m.any():
                        continue
                    p = pos[m]
                    idx, cell = cells.covering_cells_many(
                        blo[m], qlat[p] - dlat, bhi[m], qlat[p] + dlat,
                        int(r), max_cells_per_box=10 ** 9)
                    frames.append(pd.DataFrame(
                        {"qid": qid[p][idx], "qlat": qlat[p][idx],
                         "qlon": qlon[p][idx], "cell": cell}))
            out = pd.concat(frames, ignore_index=True) if frames else \
                pd.DataFrame({"qid": pd.Series([], dtype=str),
                              "qlat": [], "qlon": [], "cell": []})
            if len(boxes) > 1:
                # near-global windows: the clamped split boxes can
                # overlap at the seam columns — dedup so no (query,
                # point) pair ever joins twice
                out = out.drop_duplicates(["qid", "cell"])
            yield out

    ring_df = qdf.mapInPandas(
        _cover, schema="qid string, qlat double, qlon double, cell long")
    if broadcast:
        ring_df = F.broadcast(ring_df)
    cand = pts.join(ring_df, on="cell", how="inner")
    dist = haversine_col(F.col("qlat"), F.col("qlon"),
                         F.col(lat_col), F.col(lon_col))
    return (cand.withColumn("dist_m", dist)
            .where(F.col("dist_m") <= radius_m)
            .select("qid", point_id, "dist_m"))


def knn_bruteforce(points: DataFrame, queries: DataFrame, k: int, *,
                   point_id: str = "url", lat_col: str = "lat",
                   lon_col: str = "lon", qid_col: str = "qid",
                   qlat_col: str = "qlat", qlon_col: str = "qlon") -> DataFrame:
    """Cross-join oracle (FIXTURES.md B.5) — small inputs only."""
    dist = 2.0 * F.lit(geom.EARTH_RADIUS_M) * F.asin(F.sqrt(
        F.pow(F.sin(F.radians(F.col(lat_col) - F.col(qlat_col)) / 2), 2)
        + F.cos(F.radians(F.col(qlat_col))) * F.cos(F.radians(F.col(lat_col)))
        * F.pow(F.sin(F.radians(F.col(lon_col) - F.col(qlon_col)) / 2), 2)))
    w = Window.partitionBy(qid_col).orderBy(F.col("dist_m").asc(),
                                            F.col(point_id).asc())
    return (queries.crossJoin(points)
            .withColumn("dist_m", dist)
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select(F.col(qid_col).alias("qid"), point_id, "dist_m", "rnk"))
