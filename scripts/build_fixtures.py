"""Precompute kernel-exact fixture parquet for the ellipsoidal
queries DuckDB cannot express (VERDICT r2 item 3).

DuckDB has no Karney kernel, so the driver's hash gate for the WGS84
queries is closed differently: this script runs the pure-numpy
kernels (no Spark) over EVERY customer point that can occur at any
test scale factor (c_custkey 0..14999 covers sf <= 0.1; the point is
a closed-form function of c_custkey only, queries._customer_points)
and writes the results to parquet committed in
geographiclib_go_spark/fixtures/.  The oracle SQL joins the sf's
actual customer table against the fixture, so the driver hash-checks
the distributed Spark plan against the kernel at any sf.

Fixtures:

- ellip_point_landmark_dist.parquet (c_custkey, qid, dist_m):
  exhaustive WGS84 inverse distance from every customer point to
  each of the 12 landmarks.  The oracle takes MIN over the sf's
  customers per landmark — an EXHAUSTIVE nearest oracle that is
  INDEPENDENT of the ring-kNN search logic it checks.

- ellip_route_nearest.parquet (c_custkey, seg, s_along_r, dist_r):
  the geodesic-intercept route proximity for every customer point,
  computed by the same sphere-prefilter + Newton-refine kernels the
  Spark operator ships (per-row results are batch-independent, so
  driver-side numpy and executor-side Arrow agree bitwise).

Determinism: everything derives from c_custkey and the fixed
LANDMARKS / route constants; re-running reproduces the files
byte-for-byte (pyarrow stores raw float64).

Usage: python scripts/build_fixtures.py [max_custkey_exclusive]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geographiclib_go_spark import queries as Q  # noqa: E402
from geographiclib_go_spark.kernels import caps as C  # noqa: E402
from geographiclib_go_spark.kernels import inverse as kinv  # noqa: E402
from geographiclib_go_spark.kernels.geodesic import (  # noqa: E402
    WGS84_A, WGS84_F, wgs84_model)
from geographiclib_go_spark.operators import route as rt  # noqa: E402

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "geographiclib_go_spark", "fixtures")


def customer_points(n: int):
    ck = np.arange(n, dtype=np.int64)
    lat = ((ck * 9973) % 17000) / 100.0 - 85.0
    lon = ((ck * 7919) % 36000) / 100.0 - 180.0
    return ck, lat, lon


def build_landmark_dist(n: int, out_dir: str = None) -> str:
    ck, lat, lon = customer_points(n)
    g = wgs84_model()
    cks, qids, dists = [], [], []
    for qid, qlat, qlon in Q.LANDMARKS:
        d = kinv.gen_inverse(g, lat, lon,
                             np.full(n, float(qlat)),
                             np.full(n, float(qlon)),
                             C.DISTANCE)["s12"]
        cks.append(ck)
        qids.append(np.full(n, qid, dtype=np.int64))
        dists.append(d)
    tbl = pa.table({
        "c_custkey": np.concatenate(cks),
        "qid": np.concatenate(qids),
        "dist_m": np.concatenate(dists),
    })
    path = os.path.join(out_dir or FIXTURE_DIR,
                        "ellip_point_landmark_dist.parquet")
    pq.write_table(tbl, path)
    return path


def build_route_nearest(n: int, out_dir: str = None) -> str:
    ck, lat, lon = customer_points(n)
    rla = np.asarray(Q._ROUTE_LATS, dtype=np.float64)
    rlo = np.asarray(Q._ROUTE_LONS, dtype=np.float64)
    g = wgs84_model()
    frames = rt.route_frames(rla, rlo)
    d, phi = rt.segment_distances(lat, lon, frames, g.a,
                                  return_foot=True)
    seg = d.argmin(axis=1).astype(np.int64)
    arc = frames[4]
    frac = np.clip(phi[np.arange(n), seg] / arc[seg], 0.0, 1.0)
    t, dist = rt.intercept_on_segments(
        g, rla[:-1], rlo[:-1], rla[1:], rlo[1:], seg, lat, lon,
        t0_frac=frac)
    # raw doubles — the oracle SQL applies the same ROUND as the
    # Spark query, keeping rounding semantics engine-side on both
    # paths (np.round is half-to-even, Spark round is half-up)
    tbl = pa.table({
        "c_custkey": ck,
        "seg": seg.astype(np.int32),
        "s_along": t,
        "dist_m": dist,
    })
    path = os.path.join(out_dir or FIXTURE_DIR,
                        "ellip_route_nearest.parquet")
    pq.write_table(tbl, path)
    return path


def build_route_crossings(n: int, out_dir: str = None) -> str:
    """WGS84 geodesic intersections of the per-customer segments with
    the route (operators/intersect.py): sphere closed-form seed +
    iterated ellipsoidal-gnomonic refine, same code the Spark
    operator ships."""
    from geographiclib_go_spark.operators import intersect as ix
    ck, lat1, lon1 = customer_points(n)
    lat2 = lat1 / 2.0 + 20.0
    lon2 = lon1 + 30.0
    rla = np.asarray(Q._ROUTE_LATS, dtype=np.float64)
    rlo = np.asarray(Q._ROUTE_LONS, dtype=np.float64)
    frames = rt.route_frames(rla, rlo)
    g = wgs84_model()
    hit, ilat, ilon, _fi, _fr = ix.sphere_segment_intersections(
        lat1, lon1, lat2, lon2, frames)
    ii, jj = np.nonzero(hit)
    plat, plon = ix.refine_intersections_gnomonic(
        g, lat1[ii], lon1[ii], lat2[ii], lon2[ii],
        rla[:-1][jj], rlo[:-1][jj], rla[1:][jj], rlo[1:][jj],
        ilat[ii, jj], ilon[ii, jj])
    tbl = pa.table({
        "c_custkey": ck[ii],
        "seg": jj.astype(np.int32),
        "ilat": plat,
        "ilon": plon,
    })
    path = os.path.join(out_dir or FIXTURE_DIR,
                        "ellip_route_crossings.parquet")
    pq.write_table(tbl, path)
    return path


def build_images_phash(n: int = 5000, out_dir: str = None) -> str:
    """(image_id, fmt, phash) for the first n generated images —
    pure-numpy replication of the distributed generator's phash
    chain (sources/images.phash_for_ids, equality pytest-gated).
    Pins the image-table dedup oracles."""
    from geographiclib_go_spark.sources import images as im
    ids = np.arange(n, dtype=np.uint64)
    ph = im.phash_for_ids(ids)
    lossy = (im.splitmix64(ids ^ np.uint64(13))
             % np.uint64(100)) < np.uint64(30)
    tbl = pa.table({
        "image_id": [f"img_{int(i):012d}" for i in ids],
        "fmt": np.where(lossy, "jpeg-sim", "ppm"),
        "phash": ph,
    })
    path = os.path.join(out_dir or FIXTURE_DIR, "images_phash.parquet")
    pq.write_table(tbl, path)
    return path


def build_images_invariants(n: int = 5000, out_dir: str = None) -> str:
    """(image_id, caption, fmt, pix_sum, sse, n_px) — the per-row
    decode/caption invariant ground truth
    (images.row_invariants_for_ids)."""
    from geographiclib_go_spark.sources import images as im
    inv = im.row_invariants_for_ids(np.arange(n, dtype=np.uint64))
    tbl = pa.table({
        "image_id": inv["image_id"],
        "caption": inv["caption"],
        "fmt": list(inv["fmt"]),
        "pix_sum": inv["pix_sum"],
        "sse": inv["sse"],
        "n_px": inv["n_px"],
    })
    path = os.path.join(out_dir or FIXTURE_DIR,
                        "images_invariants.parquet")
    pq.write_table(tbl, path)
    return path


def build_images_embed(n: int = 5000, out_dir: str = None) -> str:
    """(image_id, embedding BIGINT[64]) — the integer pixel-embedding
    ground truth (images.pixel_embed_for_ids: stored-pixel block sums
    via np.add.reduceat, an independent pooling implementation from
    the engine UDF's reshape-sum).  Pins the image_embed_knn oracle:
    DuckDB replays the full kNN from these vectors."""
    from geographiclib_go_spark.sources import images as im
    ids = np.arange(n, dtype=np.uint64)
    emb = im.pixel_embed_for_ids(ids)
    tbl = pa.table({
        "image_id": [f"img_{int(i):012d}" for i in ids],
        "embedding": pa.array(emb.tolist(), type=pa.list_(pa.int64())),
    })
    path = os.path.join(out_dir or FIXTURE_DIR, "images_embed.parquet")
    pq.write_table(tbl, path)
    return path


def build_images_tiles(n: int = 5000, res: int = 6,
                       out_dir: str = None) -> str:
    """(image_id, tile_id) — pure-numpy replication of the generator's
    placement chain (phash -> latlon_for_ids incl. hot-disc skew) fed
    through the SAME cells.cell_from_latlon quadtree encode the Spark
    tile kernel uses.  Pins the image x tile composition oracle
    (queries.tile_image_brightness)."""
    from geographiclib_go_spark.operators import cells
    from geographiclib_go_spark.sources import images as im
    ids = np.arange(n, dtype=np.uint64)
    ph = im.phash_for_ids(ids)
    lat, lon = im.latlon_for_ids(ids, ph)
    tile = cells.cell_from_latlon(np.asarray(lat, dtype=np.float64),
                                  np.asarray(lon, dtype=np.float64),
                                  res).astype(np.int64)
    tbl = pa.table({
        "image_id": [f"img_{int(i):012d}" for i in ids],
        "tile_id": tile,
    })
    path = os.path.join(out_dir or FIXTURE_DIR, "images_tiles.parquet")
    pq.write_table(tbl, path)
    return path


def simplify_track_points(n: int):
    """The track_simplify layout (queries._track_points) in numpy:
    exact integer numerators / 100.0, bit-identical to Spark SQL."""
    npts = Q._SIMPLIFY_NPTS
    c = np.repeat(np.arange(n, dtype=np.int64), npts)
    i = np.tile(np.arange(npts, dtype=np.int64), n)
    num_lat = (((c * 9973) % 9000) - 4500 + i * ((c % 7) - 3)
               + ((c * 31 + i * i * 17) % 11) - 5)
    num_lon = (((c * 7919) % 24000) - 12000 + i * (((c * 13) % 9) - 4)
               + ((c * 47 + i * i * 29) % 13) - 6)
    lat = (num_lat / 100.0).reshape(n, npts)
    lon = (num_lon / 100.0).reshape(n, npts)
    return lat, lon


def _dp_recursive_instrumented(u, thr):
    """dp_recursive's exact control flow plus decision-margin
    capture: min |top1 - thr| (split decision) and min strict
    top1-top2 gap (argmax decision), plus exact-tie count."""
    from geographiclib_go_spark.operators import simplify as sy
    L = u.shape[0]
    keep = np.zeros(L, dtype=bool)
    keep[0] = keep[L - 1] = True
    min_split, min_gap, ties = np.inf, np.inf, 0
    stack = [(0, L - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        r = sy._dev_ratio(u[i], u[j], u[i + 1:j])
        k_rel = 0
        best = r[0]
        for t in range(1, r.shape[0]):
            if r[t] > best:
                best = r[t]
                k_rel = t
        min_split = min(min_split, abs(best - thr))
        if r.shape[0] > 1:
            second = np.partition(r, -2)[-2]
            if second == best and np.count_nonzero(r == best) > 1:
                ties += 1
            elif second < best:
                min_gap = min(min_gap, best - second)
        if best > thr:
            k = i + 1 + k_rel
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep, min_split, min_gap, ties


def _points_in_ring_southray(lat, lon, ring_lats, ring_lons):
    """Even-odd containment via the point's SOUTHWARD meridian ray —
    the opposite ray direction from operators/pip.points_in_ring
    (northward).  The two count DISJOINT crossing sets whose total is
    the ring's full even-odd parity, so for every off-boundary point
    they must agree; the fixture builder asserts that agreement on
    all generated placements before committing the fixture."""
    from geographiclib_go_spark.kernels import geomath as gm
    from geographiclib_go_spark.operators import pip

    lat = gm.arr(lat)
    lon = gm.arr(lon)
    rla = gm.arr(ring_lats)
    rlo = gm.arr(ring_lons)
    if rla.size < 3:
        return np.zeros(lat.shape, dtype=bool)

    dlon, _ = gm.ang_diff(lon[:, None], rlo[None, :])
    la = np.broadcast_to(rla[None, :], dlon.shape)
    d1, d2 = dlon, np.roll(dlon, -1, axis=1)
    la1, la2 = la, np.roll(la, -1, axis=1)
    straddle = ((d1 <= 0) != (d2 <= 0)) & \
        (np.abs(d1) + np.abs(d2) < 180.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(straddle, (0.0 - d1) / (d2 - d1), 0.0)
        lat_x = la1 + (la2 - la1) * t
    south_cross = straddle & (lat_x < lat[:, None])
    crossings = south_cross.sum(axis=1)
    _, s_inside = pip.pole_inside(rla, rlo)
    return (crossings % 2 == 1) ^ bool(s_inside)


def build_images_zones(n: int = 5000, out_dir: str = None) -> str:
    """(image_id, zone_id) memberships of every generated image in the
    IMAGE_ZONES analysis polygons (multi-membership emits one row per
    containing zone).  Decision path: pure-numpy placement replication
    (phash -> latlon_for_ids) fed through the SOUTHWARD-ray even-odd
    test above, cross-checked against the northward-ray
    pip.points_in_ring the Spark pip_join refine uses — a genuine
    two-algorithm parity gate, then DuckDB replays the join+aggregate.
    Pins queries.image_zonal_stats."""
    from geographiclib_go_spark.operators import pip
    from geographiclib_go_spark.sources import images as im

    ids = np.arange(n, dtype=np.uint64)
    ph = im.phash_for_ids(ids)
    lat, lon = im.latlon_for_ids(ids, ph)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    out_ids, out_zone = [], []
    for zid in sorted(im.IMAGE_ZONES):
        rla, rlo = im.IMAGE_ZONES[zid]
        south = _points_in_ring_southray(lat, lon, rla, rlo)
        north = pip.points_in_ring(lat, lon, rla, rlo)
        if not np.array_equal(south, north):
            raise AssertionError(
                f"zone {zid}: N-ray and S-ray containment disagree "
                f"on {int((south != north).sum())} points")
        hits = np.nonzero(south)[0]
        out_ids.extend(f"img_{int(ids[i]):012d}" for i in hits)
        out_zone.extend([zid] * hits.size)
    tbl = pa.table({
        "image_id": out_ids,
        "zone_id": np.asarray(out_zone, dtype=np.int64),
    })
    path = os.path.join(out_dir or FIXTURE_DIR, "images_zones.parquet")
    pq.write_table(tbl, path)
    return path


def build_images_placements(n: int = 5000, out_dir: str = None) -> str:
    """(image_id, lat, lon) — pure-numpy replication of the
    distributed generator's placement chain (phash_for_ids ->
    latlon_for_ids incl. hot-disc skew; bit-equality with the Spark
    generator is pytest-gated).  Pins the corridor-join oracle
    (queries.route_corridor_images): DuckDB runs the EXHAUSTIVE
    per-(image, segment) cross-track trig over these placements, so
    the hash gate proves the engine's cell-cover prefilter lossless."""
    from geographiclib_go_spark.sources import images as im
    ids = np.arange(n, dtype=np.uint64)
    ph = im.phash_for_ids(ids)
    lat, lon = im.latlon_for_ids(ids, ph)
    tbl = pa.table({
        "image_id": [f"img_{int(i):012d}" for i in ids],
        "lat": np.asarray(lat, dtype=np.float64),
        "lon": np.asarray(lon, dtype=np.float64),
    })
    path = os.path.join(out_dir or FIXTURE_DIR,
                        "images_placements.parquet")
    pq.write_table(tbl, path)
    return path


def build_images_resized(n: int = 5000, out_w: int = 16,
                         out_h: int = 16, out_dir: str = None) -> str:
    """(image_id, pix_sum) — exact int64 pixel sums after the
    nearest-neighbor resize to (out_w, out_h) of every image's STORED
    pixels (images.resized_pix_sums_for_ids).  Pins the resize
    transform oracle (queries.image_resize_stats)."""
    from geographiclib_go_spark.sources import images as im
    ids = np.arange(n, dtype=np.uint64)
    ps = im.resized_pix_sums_for_ids(ids, out_w, out_h)
    tbl = pa.table({
        "image_id": [f"img_{int(i):012d}" for i in ids],
        "pix_sum": ps,
    })
    path = os.path.join(out_dir or FIXTURE_DIR,
                        "images_resized.parquet")
    pq.write_table(tbl, path)
    return path


def build_images_flipped(n: int = 5000, out_dir: str = None) -> str:
    """(image_id, w, h, wsum) — mirror-sensitive weighted checksums
    after the horizontal flip of every image's STORED pixels
    (images.flipped_wsums_for_ids).  Pins the flip-augmentation
    oracle (queries.image_augment_flip)."""
    from geographiclib_go_spark.sources import images as im
    ids = np.arange(n, dtype=np.uint64)
    ws = im.flipped_wsums_for_ids(ids)
    size_pick = (im.splitmix64(ids ^ np.uint64(7))
                 % np.uint64(2)).astype(np.int64)
    wh = np.asarray((16, 32), np.int32)[size_pick]
    tbl = pa.table({
        "image_id": [f"img_{int(i):012d}" for i in ids],
        "w": wh,
        "h": wh,
        "wsum": ws,
    })
    path = os.path.join(out_dir or FIXTURE_DIR,
                        "images_flipped.parquet")
    pq.write_table(tbl, path)
    return path


def build_pq256_topk(out_dir: str = None) -> str:
    """(qid, vec_id, adc, rank) — the full IVF-PQ probe at realistic
    parameters (ksub=256, m=16, k-means-trained codebooks) replayed
    INDEPENDENTLY in numpy over the entire 100k-vector deterministic
    corpus: train on the bounded sample, encode every vector, probe
    each query's nprobe cells, ADC-score, rank with ties to the
    lower vec_id.  Exact int64 end to end, so this fixture IS the
    DuckDB oracle for queries.emb_ivfpq256_topk — the distributed
    Arrow encode/probe must hash-match it bit-for-bit."""
    from geographiclib_go_spark.operators import pq_arrow as pqa
    from geographiclib_go_spark.queries import _PQ256 as p
    from geographiclib_go_spark.sources import vectors as vx

    sample = vx.q_for_ids(np.arange(p["train_n"]), p["dim"])
    seeds = pqa.train_coarse_kmeans(sample, p["n_cells"], p["iters"])
    books = pqa.train_codebooks_kmeans(sample, p["m"], p["ksub"],
                                       p["iters"], seeds=seeds)
    x = vx.q_for_ids(np.arange(p["n"]), p["dim"])
    cell, codes = pqa.numpy_encode(x, books, seeds)
    rows = pqa.numpy_adc_topk(x[:p["n_queries"]], books, seeds,
                              cell, codes, p["k"], p["nprobe"])
    tbl = pa.table({
        "qid": pa.array([r[0] for r in rows], pa.int64()),
        "vec_id": pa.array([r[1] for r in rows], pa.int64()),
        "adc": pa.array([r[2] for r in rows], pa.int64()),
        "rank": pa.array([r[3] for r in rows], pa.int32()),
    })
    path = os.path.join(out_dir or FIXTURE_DIR, "pq256_topk.parquet")
    pq.write_table(tbl, path)
    return path


def build_pq256_rerank(out_dir: str = None) -> str:
    """(qid, vec_id, dist, rank) — the TWO-STAGE probe (ADC top-100
    shortlist, exact integer re-rank) replayed independently in
    numpy over the full corpus.  The DuckDB oracle for
    queries.emb_ivfpq256_rerank_topk."""
    from geographiclib_go_spark.operators import pq_arrow as pqa
    from geographiclib_go_spark.queries import (_PQ256 as p,
                                                _PQ256_RERANK,
                                                _pq256_artifacts)
    from geographiclib_go_spark.sources import vectors as vx

    books, seeds = _pq256_artifacts()
    x = vx.q_for_ids(np.arange(p["n"]), p["dim"])
    cell, codes = pqa.numpy_encode(x, books, seeds)
    rows = pqa.numpy_rerank_topk(x[:p["n_queries"]], x, books, seeds,
                                 cell, codes, p["k"], _PQ256_RERANK,
                                 p["nprobe"])
    tbl = pa.table({
        "qid": pa.array([r[0] for r in rows], pa.int64()),
        "vec_id": pa.array([r[1] for r in rows], pa.int64()),
        "dist": pa.array([r[2] for r in rows], pa.int64()),
        "rank": pa.array([r[3] for r in rows], pa.int32()),
    })
    path = os.path.join(out_dir or FIXTURE_DIR,
                        "pq256_rerank.parquet")
    pq.write_table(tbl, path)
    return path


def build_track_simplify(n: int, out_dir: str = None) -> str:
    """DP oracle via the textbook recursive implementation.

    Determinism story (differs from the clearance-margin protocol the
    threshold queries use): the integer-grid layout is full of
    symmetric triples, so exact AND one-ulp top-2 ratio ties are
    structural — margins cannot be planted away.  Instead the
    guarantee is bit-level: numpy's elementwise ops and trig are
    shape/offset-invariant (verified on this numpy: identical bits
    scalar vs SIMD vs strided), both implementations consume the same
    doubles and share the first-index tie rule — and this builder
    ASSERTS dp_batch == dp_recursive on every registered track, so
    the committed fixture is provably what the Spark operator
    computes, while remaining the product of an independent control
    flow."""
    from geographiclib_go_spark.operators import simplify as sy
    lat, lon = simplify_track_points(n)
    npts = Q._SIMPLIFY_NPTS
    thr = np.sin(Q._SIMPLIFY_EPS_M / 6371000.0)
    u = sy.unit_vectors(lat, lon)
    n_kept = np.empty(n, dtype=np.int64)
    mask = np.empty(n, dtype=np.int64)
    worst_split, worst_gap, total_ties = np.inf, np.inf, 0
    keeps = np.zeros((n, npts), dtype=bool)
    for c in range(n):
        keep, ms, mg, ties = _dp_recursive_instrumented(u[c], thr)
        worst_split = min(worst_split, ms)
        worst_gap = min(worst_gap, mg)
        total_ties += ties
        keeps[c] = keep
        n_kept[c] = keep.sum()
        mask[c] = (1 << np.flatnonzero(keep).astype(np.int64)).sum()
    # the bit-level gate: the operator's batch kernel must agree with
    # the oracle recursion on EVERY registered track
    got = sy.dp_batch(lat, lon, np.full(n, npts), Q._SIMPLIFY_EPS_M)
    bad = np.flatnonzero((got != keeps).any(axis=1))
    assert bad.size == 0, f"batch != recursive on tracks {bad[:10]}"
    print(f"track_simplify margins: split {worst_split:.3e} "
          f"gap {worst_gap:.3e} exact-ties {total_ties} "
          f"kept {n_kept.sum()}/{n * npts}")
    tbl = pa.table({
        "c_custkey": np.arange(n, dtype=np.int64),
        "n_kept": n_kept,
        "kept_mask": mask,
    })
    path = os.path.join(out_dir or FIXTURE_DIR,
                        "track_simplify.parquet")
    pq.write_table(tbl, path)
    return path


def mm_ping_points(n: int):
    """The track_map_match ping layout (queries._mm_ping_points) in
    numpy: exact integer hundredths / 100.0."""
    npts = Q._MM_NPTS
    c = np.repeat(np.arange(n, dtype=np.int64), npts)
    i = np.tile(np.arange(npts, dtype=np.int64), n)
    wp = np.asarray(Q._MM_ROUTE_LAT_H, dtype=np.int64)
    k = i // 2
    kp1 = np.minimum(k + 1, len(wp) - 1)   # even rows ignore this arm
    base = np.where(i % 2 == 0, wp[k], (wp[k] + wp[kp1]) // 2)
    lat_h = base + ((c * 31 + i * i * 17) % 900) - 450
    lon_h = i * 200 + ((c * 7) % 41) - 20
    return ((lat_h / 100.0).reshape(n, npts),
            (lon_h / 100.0).reshape(n, npts))


def build_map_match(n: int, out_dir: str = None) -> str:
    """Viterbi oracle via the per-track python DP (viterbi_loop);
    asserts the batch kernel agrees on every registered track (the
    same bit-level gate as build_track_simplify — shared doubles +
    first-index argmin tie rule)."""
    from geographiclib_go_spark.operators import mapmatch as mmo
    lat, lon = mm_ping_points(n)
    npts = Q._MM_NPTS
    frames = mmo.seg_frames(
        np.asarray(Q._MM_ROUTE_LAT_H, dtype=np.float64) / 100.0,
        np.asarray(Q._MM_ROUTE_LON_H, dtype=np.float64) / 100.0)
    segs = np.empty((n, npts), dtype=np.int64)
    for c in range(n):
        segs[c] = mmo.viterbi_loop(lat[c], lon[c], frames, Q._MM_LAM)
    got = mmo.viterbi_batch(lat, lon, np.full(n, npts), frames,
                            Q._MM_LAM)
    bad = np.flatnonzero((got != segs).any(axis=1))
    assert bad.size == 0, f"batch != loop on tracks {bad[:10]}"
    # smoothing must be genuinely exercised: vs lam=0 (pure nearest)
    near = mmo.viterbi_batch(lat, lon, np.full(n, npts), frames, 0.0)
    frac = (near != segs).mean()
    assert frac > 0.02, f"lam too weak: only {frac:.3f} flipped"
    w = np.arange(1, npts + 1, dtype=np.int64)
    tbl = pa.table({
        "c_custkey": np.arange(n, dtype=np.int64),
        "final_seg": segs[:, -1],
        "n_switches": (segs[:, 1:] != segs[:, :-1]).sum(axis=1)
                      .astype(np.int64),
        "path_ck": (segs * w[None, :]).sum(axis=1),
    })
    print(f"map_match: {frac:.3f} of assignments smoothed vs nearest,"
          f" mean switches {tbl['n_switches'].to_numpy().mean():.2f}")
    path = os.path.join(out_dir or FIXTURE_DIR, "track_map_match.parquet")
    pq.write_table(tbl, path)
    return path


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 15000
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    p1 = build_landmark_dist(n)
    print("wrote", p1)
    p2 = build_route_nearest(n)
    print("wrote", p2)
    p3 = build_route_crossings(n)
    print("wrote", p3)
    p4 = build_images_phash()
    print("wrote", p4)
    p5 = build_images_invariants()
    print("wrote", p5)
    p5t = build_images_tiles()
    print("wrote", p5t)
    p5e = build_images_embed()
    print("wrote", p5e)
    p5z = build_images_zones()
    print("wrote", p5z)
    p5r = build_images_resized()
    print("wrote", p5r)
    p5p = build_images_placements()
    print("wrote", p5p)
    p5f = build_images_flipped()
    print("wrote", p5f)
    p5q = build_pq256_topk()
    print("wrote", p5q)
    p5rr = build_pq256_rerank()
    print("wrote", p5rr)
    p6 = build_track_simplify(n)
    print("wrote", p6)
    p7 = build_map_match(n)
    print("wrote", p7)


if __name__ == "__main__":
    main()
