"""Capture formatted physical plans of the headline queries into
PLANS.md — the evidence that each plan is the intended one:

- flagship nearest-landmark join: a single map-only Arrow stage, NO
  Exchange anywhere before the final rollup;
- sphere_radius_join (scan strategy): mapInPandas + broadcast of the
  12-row query dim only;
- q5 star join: broadcasts for the dim tables, one shuffle for the
  fact aggregation, whole-stage codegen around the relational glue;
- q1: PushedFilters + pruned ReadSchema at the parquet scan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geographiclib_go_spark.session import build_session  # noqa: E402


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main():
    from geographiclib_go_spark import queries as Q
    from geographiclib_go_spark.operators import nearest as nno
    from geographiclib_go_spark.operators import tiling
    from geographiclib_go_spark.plans import pipeline as pl
    from geographiclib_go_spark.sources import images as im
    from pyspark.sql import functions as F

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = build_session(app="plans", master="local[8]")

    sections = []

    images = im.generate_images(spark, 1000) \
        .select("image_id", "phash", "lat", "lon")
    tiles = tiling.assign_tiles(images, 6)
    near = nno.nearest_dim_join(tiles, pl.DEFAULT_LANDMARKS, k=1)
    flag = (near.groupBy("tile_id", "nn_id")
            .agg(F.count("*").alias("n_images")))
    sections.append((
        "Flagship: tile + nearest-landmark join + rollup",
        "Everything before the final HashAggregate/Exchange pair is ONE "
        "map-only stage (generate -> tile UDF -> nearest UDF): the join "
        "itself introduces no Exchange — the dim table lives in the UDF "
        "closure.  At 10^12 rows the only shuffle is the tiny per-tile "
        "rollup.",
        formatted(flag)))

    sections.append((
        "sphere_radius_join (scan strategy)",
        "The radius join is a mapInPandas over the points plus a "
        "broadcast of the 12-row query dim for output annotation; no "
        "shuffle of the points.",
        formatted(Q.sphere_radius_join(spark, sf))))

    sections.append((
        "q5_nation_volume (star join)",
        "Dim tables broadcast (explicit hints), fact side aggregated "
        "through one Exchange; relational glue runs inside "
        "WholeStageCodegen spans.",
        formatted(Q.q5_nation_volume(spark, sf))))

    sections.append((
        "q1_pricing_summary (scan-filter-aggregate)",
        "The shipdate filter reaches the parquet scan (PushedFilters) "
        "and ReadSchema carries only the referenced columns.",
        formatted(Q.q1_pricing_summary(spark, sf))))

    sections.append((
        "raster_coverage (raster<->vector patches)",
        "rasterize_patches is ONE MapInPandas over the anchor table — "
        "pixels never become rows, no Exchange before the query's own "
        "ORDER BY.  Scaling is governed purely by anchor partitioning.",
        formatted(Q.raster_coverage(spark, sf))))

    sections.append((
        "doc_minhash_pairs (LSH band join + verify)",
        "What to look for (r2 audit fixes): exactly ONE "
        "ArrowEvalPython[jaccard] node (the nondeterministic marker "
        "stops Catalyst duplicating the verify UDF into the filter), "
        "and the band table feeding BOTH self-join sides from "
        "InMemoryTableScan (the signature UDF runs once, not per "
        "side).  The join itself is an equi-join on (band, exact "
        "band-value struct) — only colliding buckets pair up, no "
        "cross product anywhere.",
        formatted(Q.doc_minhash_pairs(spark, sf))))

    sections.append((
        "events_asof_view (as-of join)",
        "The as-of join is union + one Window exchange on the key + "
        "last-ignorenulls fill — NO range cross product, no "
        "BroadcastNestedLoopJoin anywhere.  The single Exchange "
        "hashes on user_id; everything else is map-side.",
        formatted(Q.events_asof_view(spark, sf))))

    # kNN ring round (large-query-side strategy): capture the shape of
    # one expansion round — cell equi-join (no broadcast of the big
    # cover side), window top-k, and the distributed done-set
    # semi-join.  Built lazily here (strategy='ring' on a small side
    # would execute driver rounds if collected; formatted() only
    # inspects the plan of the first round's output lineage).
    from geographiclib_go_spark.operators import spatial_join as sj
    pts = Q._customer_points(spark, sf)
    qside = pts.selectExpr("c_custkey as qid", "lat", "lon").limit(500)
    ring = sj.knn_join(pts.select("lat", "lon", "c_custkey"), qside,
                       k=2, res=3, strategy="ring", max_rounds=1)
    sections.append((
        "knn_join ring round (large query side)",
        "Per-round state is fully distributed: the done-set is an "
        "agg+filter DataFrame joined back LeftSemi (results) / "
        "LeftAnti (next round's unresolved) — no driver-held id "
        "lists, no isin() literals in the plan.  The cover join is a "
        "plain cell equi-join so AQE can pick the join strategy and "
        "split skewed cells.",
        formatted(ring)))

    # geodesic crossings: must be ONE map-only MapInPandas stage —
    # the route ships in the closure, the sparse fan-out is emitted
    # flat, and there is no Exchange anywhere
    from geographiclib_go_spark.operators import intersect as ixo
    segs = Q._customer_segments(spark, sf)
    xing = ixo.route_intersections(segs, Q._ROUTE_LATS, Q._ROUTE_LONS,
                                   Q.SPHERE_A, 0.0)
    sections.append((
        "route_crossings (geodesic segment x route intersections)",
        "Zero Exchange: sphere closed-form seed + (for f != 0) the "
        "iterated ellipsoidal-gnomonic refine all run inside one "
        "MapInPandas over the segment table; output rows are the "
        "flat crossing fan-out.",
        formatted(xing)))

    sections.append((
        "track_simplify (geodesic Douglas-Peucker)",
        "The per-track groupBy Exchange plus the r4 explicit fan-out "
        "repartition (AQE's byte-based coalescing under-parallelizes "
        "the compute-heavy DP stage at small scale); the batch DP "
        "kernel is a single ArrowEvalPython over collected tracks; the "
        "final Exchange is the query's own ORDER BY.  Position -> seq "
        "mapping stays JVM-side (transform over the collected struct).",
        formatted(Q.track_simplify(spark, sf))))

    sections.append((
        "track_map_match (HMM Viterbi onto route segments)",
        "Same trajectory shape: groupBy Exchange + explicit "
        "Viterbi-stage fan-out (measured 3/32 cores under AQE "
        "coalescing before r4, 7.8 s -> 3.2 s after), one "
        "ArrowEvalPython running the [T,S,S] Viterbi over every track "
        "in the batch; the 10-segment route lives in the UDF closure — "
        "no join for the dim side.",
        formatted(Q.track_map_match(spark, sf))))

    sections.append((
        "region_dissolve (lat-row interval union)",
        "r4 plan: map-side explode to LAT ROWS only (intervals, not "
        "cells), ONE window Exchange on (group, lat row) whose "
        "running max IS the union, then the integer area aggregation "
        "— cost independent of each box's lon extent (6.9 s -> 1.5 s "
        "at sf0.1).  No Python anywhere; all BIGINT inside "
        "WholeStageCodegen.",
        formatted(Q.region_dissolve(spark, sf))))

    sections.append((
        "events_interval_join (dedup-free bucketed interval join)",
        "Both sides explode to 6 h buckets (JVM sequence), hash "
        "equi-join on the bucket key, and the canonical-bucket filter "
        "replaces any distinct pass — there is exactly one join "
        "Exchange pair and NO aggregation/distinct node between join "
        "and output.",
        formatted(Q.events_interval_join(spark, sf))))

    sections.append((
        "events_value_sketch_quantiles (mergeable quantile sketch)",
        "The sketch is one partial+final HashAggregate pair on "
        "(type, e, m) — map-side combine shrinks every partition to a "
        "few hundred bucket rows before the Exchange; the quantile "
        "extraction windows over the tiny bucket table.  Compare "
        "events_value_percentiles, which must shuffle raw values.",
        formatted(Q.events_value_sketch_quantiles(spark, sf))))

    sections.append((
        "docs_incremental_dedup (asymmetric ingest LSH, persisted index)",
        "The corpus band table is a lineage SNAPSHOT (the probe plan "
        "reads it as a plain parquet Scan — no corpus signature UDF "
        "anywhere in this plan); only the 20% batch side runs the "
        "MinHash kernel.  The candidate equi-join is on (band, "
        "band_key), batch against the snapshot scan only, so no "
        "corpus x corpus pair is ever formed, and the Jaccard refine "
        "joins corpus text for candidate ids alone.",
        formatted(Q.docs_incremental_dedup(spark, sf))))

    sections.append((
        "lineitem_bloom_semi (Bloom pre-shuffle pruning)",
        "The probed branch is Scan -> Filter(bit expressions over the "
        "literal word array) -> partial HashAggregate -> Exchange: "
        "the Bloom probe prunes BEFORE the shuffle, with zero Python "
        "and no join on the fact side.  The register build on the "
        "small side is one partial+final bit_or aggregate pair.",
        formatted(Q.lineitem_bloom_semi(spark, sf))))

    sections.append((
        "doc_heavy_hitters (Count-Min register probe)",
        "Register build: MapInPandas (tokenize+hash+bincount combine "
        "inside the batch) -> partial+final sum on (row, col).  "
        "Estimate: candidates explode to depth cells and probe the "
        "register table through a BroadcastHashJoin; top-20 is "
        "TakeOrderedAndProject, never a single-partition window.",
        formatted(Q.doc_heavy_hitters(spark, sf))))

    sections.append((
        "doc_tf_cosine_pairs (shingle inverted-index join)",
        "Candidates come from the rare-shingle self-join (equi-join "
        "on tri after the df<=max_df filter — bounded fan-out per "
        "key).  The TF posting table is built from a LeftSemi-pruned "
        "document scan (candidate ids only, r4 trim), so the token "
        "explode + TF aggregate never see non-candidate docs; the "
        "verify is a pair of equi-joins back to that pruned posting "
        "table plus one aggregation.  All joins are hash equi-joins; "
        "nothing is all-pairs.",
        formatted(Q.doc_tf_cosine_pairs(spark, sf))))

    from geographiclib_go_spark.operators import clustering as _cl
    _pts = Q._place_points(spark, sf)
    _ids = _pts.select(F.col("c_custkey").cast("long").alias("qid"),
                       "lat", "lon")
    sections.append((
        "pts_dbscan eps-neighborhood self-join (eps_self_edges)",
        "DBSCAN step 1 at cover scale (r4): cell resolution is chosen "
        "FROM eps (~1-2 cells per eps radius), the cap-cover explode "
        "feeds ONE hash equi-join on _cell, and the exact geodesic "
        "kernel (ArrowEvalPython) runs only on src < dst candidates — "
        "the Filter sits BELOW the kernel projection.  The mirrored "
        "direction and the self-loops are the two Union branches of "
        "pure relational ops (no second kernel pass).",
        formatted(_cl.eps_self_edges(_ids, 200_000.0,
                                     a=Q.SPHERE_A, f=0.0))))

    sections.append((
        "customer_moran (Moran's I over a cell lattice)",
        "One HashAggregate pair builds the cell table; the scalar "
        "totals (n, sum, sum of squares) broadcast back; the queen "
        "neighborhood is a map-side 8-way explode feeding a single "
        "hash equi-join on the neighbor cell key — there is NO "
        "distance predicate and no nested-loop node anywhere.  All "
        "arithmetic is BIGINT inside WholeStageCodegen.",
        formatted(Q.customer_moran(spark, sf))))

    sections.append((
        "customer_hilbert_locality (layout run-count locality)",
        "The Hilbert/Morton ranks are unrolled integer CASE chains in "
        "WholeStageCodegen — zero Python.  The 81-row box dim joins "
        "via an explicit BroadcastHashJoin (range predicate on a "
        "broadcast is fine: the stream side stays map-only); the "
        "run counts are two hash LeftAnti self-joins over the cached "
        "inbox table (InMemoryTableScan feeds all three consumers) — "
        "no sort is ever performed to count contiguous runs.",
        formatted(Q.customer_hilbert_locality(spark, sf))))

    sections.append((
        "emb_kmeans (3 unrolled Lloyd iterations, k=10)",
        "Per iteration: the k-row centroid table joins the points via "
        "BroadcastHashJoin (map-only assign; distances are zip_with/"
        "aggregate JVM expressions) and the centroid update is ONE "
        "partial+final HashAggregate pair — so 3 iterations cost "
        "exactly 3 small shuffles of k rows each plus 3 broadcast "
        "scans of the fact table.  No Python, no driver-side loop "
        "state: the unrolled lineage IS the iteration.",
        formatted(Q.emb_kmeans(spark, sf))))

    sections.append((
        "emb_ivfpq_topk (IVF-PQ ADC probe over the persisted code table)",
        "The probe side is entirely broadcast: queries carry their "
        "M x ksub integer ADC lookup tables as literal-free JVM "
        "columns, explode to nprobe coarse cells, and BroadcastHashJoin "
        "the cell-partitioned code snapshot — per candidate the score "
        "is 4 element_at lookups + 3 adds inside WholeStageCodegen, no "
        "Python anywhere, and the only Exchange is the per-query top-k "
        "window.  Against a cell-partitioned snapshot the cell join is "
        "a partition-pruned scan of the compressed (4 ints/vector) "
        "index — raw vectors are never read at probe time.",
        formatted(Q.emb_ivfpq_topk(spark, sf))))

    sections.append((
        "image_zonal_stats (vector zones x decoded raster)",
        "Generate -> cell encode -> BroadcastHashJoin against the "
        "tiny zone cell cover -> ray-cast PIP refine (ArrowEvalPython "
        "filter) -> decode-only MapInPandas is ONE map-only chain: "
        "the only Exchange in the whole plan is the final 4-group "
        "partial+final HashAggregate pair.  The cover join prunes "
        "decode work to in-zone rows BEFORE any pixel bytes move — "
        "at 10^12 images the cost is one scan of the placements plus "
        "decode of only the zone hits.",
        formatted(Q.image_zonal_stats(spark, sf))))

    sections.append((
        "track_lat_envelope (Clairaut per-leg latitude bounds)",
        "One Window exchange on user_id builds the legs; everything "
        "after — kernel azimuths (ArrowEvalPython, AZIMUTH caps only) "
        "and the vertex-latitude CASE mapping in JVM trig columns — "
        "is map-side.  The final Exchange is the query's own ORDER "
        "BY, not part of the operator.",
        formatted(Q.track_lat_envelope(spark, sf))))

    sections.append((
        "doc_ngram_jaccard_pairs (exact Jaccard via AllPairs/PPJoin)",
        "Four-part shape to check: (1) the shingle-set UDF is ONE "
        "ArrowEvalPython feeding an InMemoryTableScan reused by the "
        "df-count, the prefix build, and BOTH verify array sides; "
        "(2) candidate generation is an equi-join on hw of the "
        "PREFIX index only (row_number window + filter BEFORE the "
        "join), with the length and positional filters evaluated "
        "inside the join's codegen span; (3) the verify is two "
        "equi-joins against the compact array table plus a JVM "
        "array_intersect — no Arrow round-trip, no row-explode "
        "shuffle; (4) no cross product anywhere.",
        formatted(Q.doc_ngram_jaccard_pairs(spark, sf))))

    sections.append((
        "route_corridor_images (corridor join: cover prune -> refine)",
        "The shape that matters at 10^12 rows: the generator scan "
        "feeds ONE tile-kernel ArrowEvalPython, an InSet Filter "
        "against the ~1.4k-cell corridor cover (a query-compile-time "
        "constant — JVM hash-set probe, no join, no exchange) prunes "
        "~97% of rows BEFORE the cross-track distance kernel runs, "
        "and the ONLY Exchange in the whole plan is the query's own "
        "ORDER BY.  Check: exactly two ArrowEvalPython nodes (cell, "
        "distance) — a broadcast semi-join variant duplicates the "
        "cell UDF under a pushed isnotnull join predicate.",
        formatted(Q.route_corridor_images(spark, sf))))

    sections.append((
        "image_resize_stats (binary->binary transform chain)",
        "generate -> resize (MapInPandas) -> re-decode stats "
        "(MapInPandas) is ONE map-only chain: zero Exchange nodes "
        "before the query's own ORDER BY.  At 10^12 images the cost "
        "is a single scan; partition count is the only scaling "
        "lever.",
        formatted(Q.image_resize_stats(spark, sf))))

    sections.append((
        "video_frame_sample (video -> image fan-out)",
        "The frame fan-out happens INSIDE the MapInPandas stage (rows "
        "multiply in the Arrow batch, not through a join or explode "
        "shuffle); decode stats append to the same stage chain.  "
        "Zero Exchange nodes before the ORDER BY.",
        formatted(Q.video_frame_sample(spark, sf))))

    sections.append((
        "doc_decontaminate (eval-suite broadcast semi-join)",
        "The eval slice's distinct n-grams BROADCAST (benchmarks are "
        "tiny next to the corpus); the train side is Generate "
        "(explode) -> BroadcastHashJoin LeftSemi with NO shuffle of "
        "train n-grams.  Only matching rows (the contamination mass) "
        "reach the doc_id distinct; the per-source rollup is the "
        "final pair of HashAggregate exchanges.",
        formatted(Q.doc_decontaminate(spark, sf))))

    sections.append((
        "doc_bm25_topk (map-only scoring + TakeOrdered)",
        "tf per term is a higher-order array filter inside Project — "
        "no Generate, no per-token shuffle.  The 1-row corpus stats "
        "broadcast back (BroadcastNestedLoopJoin of a single row) and "
        "the result is TakeOrderedAndProject: the whole 10^12-doc "
        "scoring pass is one scan.",
        formatted(Q.doc_bm25_topk(spark, sf))))

    sections.append((
        "image_tile_rebalance (salted two-phase top-K)",
        "Check the TWO ObjectHashAggregate exchange pairs: phase 1 "
        "keys on (tile, pmod(xxhash64(id), 32)) and keeps each salt "
        "group's sorted top-8; phase 2 merges <= 32*8 candidates per "
        "tile.  No window over tile_id anywhere — a hot tile is never "
        "sorted in a single task.",
        formatted(Q.image_tile_rebalance(spark, sf))))

    sections.append((
        "doc_pagerank (unrolled iterations, one shuffle per round)",
        "Each of the 3 unrolled rounds is an equi-join of the cached "
        "edge multiset to the rank frame plus ONE partial/final "
        "HashAggregate pair keyed on dst — look for the InMemoryScan "
        "of the edges (materialized once) and the absence of any "
        "driver-side loop artifact: the whole iterative computation "
        "is a single Catalyst plan.",
        formatted(Q.doc_pagerank(spark, sf))))

    sections.append((
        "image_near_dup_keep_best (argmax without a window sort)",
        "After the components join, the survivor pick is ONE "
        "HashAggregate pair over min(struct(-npx, id)) — look for the "
        "absence of any Window/Sort over component_id: a hot cluster "
        "contributes partial aggregates from every input partition "
        "instead of serializing into one task.",
        formatted(Q.image_near_dup_keep_best(spark, sf))))

    sections.append((
        "doc_regex_scrub (JVM regexp codegen, map-only)",
        "regexp_count/regexp_replace/length all live inside one "
        "WholeStageCodegen Project over the parquet scan; the only "
        "exchange is the tiny per-source HashAggregate pair.  No "
        "Python anywhere.",
        formatted(Q.doc_regex_scrub(spark, sf))))

    sections.append((
        "emb_quality_gate (quantize + aggregate, one shuffle)",
        "The quantizer, squared-norm fold, and spike max are all "
        "higher-order array expressions inside Project; the per-label "
        "partial/final HashAggregate pair is the only exchange.",
        formatted(Q.emb_quality_gate(spark, sf))))

    sections.append((
        "doc_seq_pack (per-shard packing window, no global sort)",
        "The running-offset window is partitioned BY SHARD — look "
        "for Window with partition spec [shard] above an Exchange "
        "hashpartitioning(shard): shards pack in parallel and no "
        "single-partition global Sort exists anywhere.  The chunk "
        "explode and fill arithmetic are codegen expressions; the "
        "final per-(shard, chunk) rollup is one partial/final "
        "HashAggregate pair.",
        formatted(Q.doc_seq_pack(spark, sf))))

    sections.append((
        "doc_lm_score (vocab-bounded counts, join-and-aggregate)",
        "The unigram/bigram count subplans each end in one "
        "partial/final HashAggregate pair (vocabulary-sized "
        "outputs); scoring is two equi-joins plus the broadcast "
        "1-row V join (look for BroadcastExchange with a single-row "
        "HashAggregate input) and one per-doc HashAggregate.  The "
        "ln/smoothing arithmetic is codegen; no Python anywhere.",
        formatted(Q.doc_lm_score(spark, sf))))

    out = ["# PLANS — formatted physical plans of the headline queries",
           "",
           "Generated by scripts/explain_plans.py (sf0.01, local[8]). "
           "Commentary states what to look for in each plan.",
           ""]
    for title, why, plan in sections:
        out += [f"## {title}", "", why, "", "```", plan.strip(), "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md ({sum(len(s[2]) for s in sections)} chars of plans)")
    spark.stop()


if __name__ == "__main__":
    main()
