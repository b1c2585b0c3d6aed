"""HMM-Viterbi map matching (reference J3).

The reference delegates matching to Valhalla's ``trace_attributes`` with
``costing=auto, shape_match=map_snap, use_timestamps=true``
(/root/reference/conflation/map_matching/valhalla.py:141-165); the HMM lives
outside the repo. This module is our native stand-in, a Newson-Krumm-style
HMM (emission ~ Gaussian GPS noise on point-to-edge distance; transition ~
agreement between route distance and great-circle distance), with parameters
fixed and documented here so the pure-Python test oracle can share them.

Execution shape (single-shuffle): the matcher consumes ONLY the candidate
rows (which already carry each point's time/lon/lat) — one repartition by
doc_id + sortWithinPartitions + mapInPandas. Points with no candidate
within the search radius never appear in the candidate set; the kernels
detect them as GAPS in ``gps_idx`` (the dense per-doc point index the
trace filter emits for free from its ordered window). That removes the
round-1 left join of the full points table back onto candidates — i.e. a
second full shuffle plus a sort-merge join of the pipeline's largest
intermediate. Per-doc stats (t0, n_points) come from a map-side-combined
aggregation of the points table (tiny shuffle) joined onto the traversal
rows (small) after matching.

Output: one row per matched edge traversal —
  (doc_id, edge_seq, edge_id, elapsed_time, n_pts, n_points, n_unmatched, t0)
where ``elapsed_time`` is the doc-elapsed seconds at the LAST point matched
to the traversal (our analog of Valhalla's ``end_node.elapsed_time``,
consumed at valhalla.py:180), and n_points/n_unmatched feed the M1
unmatched-ratio filter (valhalla.py:303-309: a point with no candidate
within the search radius is 'unmatched').
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIGMA_M = 4.5  # GPS noise std-dev for the emission model
BETA_M = 10.0  # route-vs-geodesic disagreement scale for transitions
SWITCH_LOGP = -2.5  # fixed cost for changing edges (suppresses junction flicker)
JUMP_LOGP = -15.0  # fallback transition for non-adjacent candidate pairs
EARTH_RADIUS_M = 6378160.0  # parity with the reference haversine

MATCH_SCHEMA = (
    "doc_id string, edge_seq int, edge_id long, elapsed_time double, "
    "n_pts int, n_points int, n_unmatched int, t0 double"
)
# kernel-internal schema: absolute end times + present-point counts; the
# doc-level (t0, n_points) join in match_traces converts to MATCH_SCHEMA
RUN_SCHEMA = (
    "doc_id string, edge_seq int, edge_id long, end_time double, "
    "n_pts int, n_present int"
)


def _haversine_np(lon1, lat1, lon2, lat2):
    lon1, lat1, lon2, lat2 = map(math.radians, (lon1, lat1, lon2, lat2))
    a = (
        math.sin((lat2 - lat1) / 2) ** 2
        + math.cos(lat1) * math.cos(lat2) * math.sin((lon2 - lon1) / 2) ** 2
    )
    return 2 * math.asin(math.sqrt(a)) * EARTH_RADIUS_M


def viterbi_one_doc(pdf: pd.DataFrame, k: int = 4) -> pd.DataFrame:
    """Pure function (shared with the test oracle): candidate rows of one doc
    -> traversal runs (RUN_SCHEMA columns). Takes top-k candidates per point
    here (numpy) so the upstream join needs no per-point window shuffle.
    Deterministic: ties broken by (dist_m, edge_id); first-wins argmax.

    Input carries ONLY points that have >=1 candidate; an unmatched point
    shows up as a gps_idx gap, which breaks the Viterbi chain exactly like
    the explicit candidate-less row used to."""
    cols0 = ["doc_id", "edge_seq", "edge_id", "end_time", "n_pts", "n_present"]
    if not len(pdf):  # a doc whose every point is unmatched has no rows
        return pd.DataFrame(columns=cols0)
    doc_id = pdf["doc_id"].iloc[0]
    pdf = pdf.sort_values(["gps_idx", "dist_m", "edge_id"], kind="mergesort")

    gidxs = pdf["gps_idx"].to_numpy()
    times = pdf["time"].to_numpy()
    lons = pdf["lon"].to_numpy()
    lats = pdf["lat"].to_numpy()
    e_id = pdf["edge_id"].to_numpy(dtype="float64", na_value=np.nan)
    e_src = pdf["src"].to_numpy(dtype="float64", na_value=np.nan)
    e_dst = pdf["dst"].to_numpy(dtype="float64", na_value=np.nan)
    e_dist = pdf["dist_m"].to_numpy(dtype="float64", na_value=np.nan)
    e_t = pdf["t_param"].to_numpy(dtype="float64", na_value=np.nan)
    e_len = pdf["len_m"].to_numpy(dtype="float64", na_value=np.nan)

    # split row range into per-point slices (gps_idx values are sorted)
    uniq_g, starts = np.unique(gidxs, return_index=True)
    bounds = np.append(starts, len(gidxs))
    pts = []  # (gps_idx, time, lon, lat, candidate row indices [top-k])
    for i in range(len(uniq_g)):
        s, e = bounds[i], bounds[i + 1]
        pts.append((int(gidxs[s]), times[s], lons[s], lats[s], list(range(s, e))[:k]))

    n_present = len(pts)
    cols = ["doc_id", "edge_seq", "edge_id", "end_time", "n_pts", "n_present"]
    if n_present == 0:
        return pd.DataFrame(columns=cols)

    matched = [None] * n_present  # per point: candidate row index
    chain: list[int] = []
    prev_scores = None
    prev_back: list[np.ndarray] = []

    def flush(chain_pts, scores, backs):
        if not chain_pts:
            return
        best = int(np.argmax(scores))
        sel = [best]
        for b in reversed(backs):
            sel.append(int(b[sel[-1]]))
        sel.reverse()
        for p_i, c_i in zip(chain_pts, sel):
            matched[p_i] = pts[p_i][4][c_i]

    for p_i, (g, t, lon, lat, cands) in enumerate(pts):
        # a gps_idx gap = one or more unmatched points -> chain break
        if chain and g != pts[chain[-1]][0] + 1:
            flush(chain, prev_scores, prev_back)
            chain, prev_scores, prev_back = [], None, []
        ci = np.asarray(cands)
        emis = -0.5 * (e_dist[ci] / SIGMA_M) ** 2
        if prev_scores is None:
            chain = [p_i]
            prev_scores = emis
            prev_back = []
            continue
        q_i = chain[-1]
        gc = _haversine_np(pts[q_i][2], pts[q_i][3], lon, lat)
        pc = np.asarray(pts[q_i][4])
        # vectorized route-distance matrix over (prev cands x cur cands)
        ida, sa, da = e_id[pc, None], e_src[pc, None], e_dst[pc, None]
        ta, la = e_t[pc, None], e_len[pc, None]
        idb, sb, db = e_id[None, ci], e_src[None, ci], e_dst[None, ci]
        tb, lb = e_t[None, ci], e_len[None, ci]
        along_a_fwd, along_a_bwd = (1 - ta) * la, ta * la
        along_b_fwd, along_b_bwd = tb * lb, (1 - tb) * lb
        route = np.select(
            [ida == idb, da == sb, da == db, sa == sb, sa == db],
            [
                np.abs(tb - ta) * la,
                along_a_fwd + along_b_fwd,
                along_a_fwd + along_b_bwd,
                along_a_bwd + along_b_fwd,
                along_a_bwd + along_b_bwd,
            ],
            default=np.nan,
        )
        trans = np.where(
            np.isnan(route),
            JUMP_LOGP - gc / BETA_M,
            -np.abs(route - gc) / BETA_M + np.where(ida == idb, 0.0, SWITCH_LOGP),
        )
        cand_scores = prev_scores[:, None] + trans
        back = np.argmax(cand_scores, axis=0)
        prev_scores = cand_scores[back, np.arange(len(ci))] + emis
        prev_back.append(back)
        chain.append(p_i)
    flush(chain, prev_scores, prev_back)

    # collapse consecutive matched edges into traversals. Edge-end elapsed
    # time: node-crossing interpolation between the last point on edge k and
    # the first point on edge k+1 (distance-weighted toward the shared node
    # using the matched t_params — Valhalla-style). Fallbacks: samples'
    # midpoint when no shared node; last sample at chain ends / gaps.
    def boundary_time(c_last, p_last, c_next, p_next):
        if pts[p_next][0] != pts[p_last][0] + 1:  # gps_idx adjacency
            return pts[p_last][1]
        tau_a, tau_b = pts[p_last][1], pts[p_next][1]
        ta, la = e_t[c_last], e_len[c_last]
        tb, lb = e_t[c_next], e_len[c_next]
        if e_dst[c_last] == e_src[c_next]:
            rem, into = (1 - ta) * la, tb * lb
        elif e_dst[c_last] == e_dst[c_next]:
            rem, into = (1 - ta) * la, (1 - tb) * lb
        elif e_src[c_last] == e_src[c_next]:
            rem, into = ta * la, tb * lb
        elif e_src[c_last] == e_dst[c_next]:
            rem, into = ta * la, (1 - tb) * lb
        else:
            return (tau_a + tau_b) / 2.0
        denom = rem + into
        frac = rem / denom if denom > 0 else 0.5
        return tau_a + (tau_b - tau_a) * frac

    out = []
    cur_edge, cur_n, cur_last_t, cur_last_pi, cur_last_c = None, 0, None, None, None
    seq = 0
    for p_i in range(n_present):
        c = matched[p_i]
        eid = None if c is None else int(e_id[c])
        if eid is None:
            continue
        if cur_edge is None or eid != cur_edge:
            if cur_edge is not None:
                end_t = boundary_time(cur_last_c, cur_last_pi, c, p_i)
                out.append((doc_id, seq, cur_edge, end_t, cur_n, n_present))
                seq += 1
            cur_edge, cur_n = eid, 0
        cur_n += 1
        cur_last_t = pts[p_i][1]
        cur_last_pi = p_i
        cur_last_c = c
    if cur_edge is not None:
        out.append((doc_id, seq, cur_edge, cur_last_t, cur_n, n_present))

    return pd.DataFrame(out, columns=cols)


K_SLOTS = 4  # top-k candidates per point (padded width of the DP tensors)


def viterbi_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch-vectorized Viterbi over MANY docs at once.

    Input rows sorted by (doc_id, offset, dist_m, edge_id). Emission and
    transition tensors for the entire batch are built in single vectorized
    shots — (P, k) and (P-1, k, k) ndarrays over all P points of all docs —
    leaving only the inherently-sequential DP recurrence as a Python loop of
    tiny (k,)/(k,k) ops. Produces EXACTLY the same traversals as
    ``viterbi_one_doc`` (same candidate order, same first-wins argmax,
    same chain-break semantics); equality is asserted in tests.
    """
    cols = ["doc_id", "edge_seq", "edge_id", "end_time", "n_pts", "n_present"]
    if not len(pdf):
        return pd.DataFrame(columns=cols)

    doc_codes, doc_uniques = pd.factorize(pdf["doc_id"], sort=False)
    offsets = pdf["gps_idx"].to_numpy()
    times = pdf["time"].to_numpy(dtype="float64")
    lons = pdf["lon"].to_numpy(dtype="float64")
    lats = pdf["lat"].to_numpy(dtype="float64")
    has_cand = pdf["edge_id"].notna().to_numpy()
    e_id = pdf["edge_id"].to_numpy(dtype="float64", na_value=np.nan)
    e_src = pdf["src"].to_numpy(dtype="float64", na_value=np.nan)
    e_dst = pdf["dst"].to_numpy(dtype="float64", na_value=np.nan)
    e_dist = pdf["dist_m"].to_numpy(dtype="float64", na_value=np.nan)
    e_t = pdf["t_param"].to_numpy(dtype="float64", na_value=np.nan)
    e_len = pdf["len_m"].to_numpy(dtype="float64", na_value=np.nan)

    n_rows = len(pdf)
    # point index: one per distinct (doc, offset), in row order
    new_point = np.empty(n_rows, dtype=bool)
    new_point[0] = True
    new_point[1:] = (doc_codes[1:] != doc_codes[:-1]) | (offsets[1:] != offsets[:-1])
    point_idx = np.cumsum(new_point) - 1
    P = int(point_idx[-1]) + 1
    point_start = np.flatnonzero(new_point)
    slot = np.arange(n_rows) - point_start[point_idx]

    # per-point arrays (from each point's first row)
    p_doc = doc_codes[point_start]
    p_gidx = offsets[point_start]  # gps_idx per present point
    p_time = times[point_start]
    p_lon = lons[point_start]
    p_lat = lats[point_start]

    # scatter candidate rows into (P, K) padded tensors
    ok = has_cand & (slot < K_SLOTS)
    pi, si = point_idx[ok], slot[ok]

    def scat(src, fill):
        out = np.full((P, K_SLOTS), fill, dtype="float64")
        out[pi, si] = src[ok]
        return out

    c_id = scat(e_id, np.nan)
    c_src = scat(e_src, np.nan)
    c_dst = scat(e_dst, np.nan)
    c_dist = scat(e_dist, np.inf)
    c_t = scat(e_t, 0.0)
    c_len = scat(e_len, 0.0)
    valid = np.zeros((P, K_SLOTS), dtype=bool)
    valid[pi, si] = True
    p_has = valid.any(axis=1)

    NEG = -1e30
    emis = np.where(valid, -0.5 * (c_dist / SIGMA_M) ** 2, NEG)

    # pairwise tensors between consecutive points (within the batch; pairs
    # crossing doc boundaries are masked off in the DP loop)
    if P > 1:
        lon1, lat1 = np.radians(p_lon[:-1]), np.radians(p_lat[:-1])
        lon2, lat2 = np.radians(p_lon[1:]), np.radians(p_lat[1:])
        aa = (
            np.sin((lat2 - lat1) / 2) ** 2
            + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
        )
        gc = 2 * np.arcsin(np.sqrt(aa)) * EARTH_RADIUS_M  # (P-1,)

        ida, idb = c_id[:-1, :, None], c_id[1:, None, :]
        sa, sb = c_src[:-1, :, None], c_src[1:, None, :]
        da, db = c_dst[:-1, :, None], c_dst[1:, None, :]
        ta, tb = c_t[:-1, :, None], c_t[1:, None, :]
        la, lb = c_len[:-1, :, None], c_len[1:, None, :]
        a_fwd, a_bwd = (1 - ta) * la, ta * la
        b_fwd, b_bwd = tb * lb, (1 - tb) * lb
        same = ida == idb
        route = np.select(
            [same, da == sb, da == db, sa == sb, sa == db],
            [np.abs(tb - ta) * la, a_fwd + b_fwd, a_fwd + b_bwd, a_bwd + b_fwd, a_bwd + b_bwd],
            default=np.nan,
        )
        g3 = gc[:, None, None]
        trans = np.where(
            np.isnan(route),
            JUMP_LOGP - g3 / BETA_M,
            -np.abs(route - g3) / BETA_M + np.where(same, 0.0, SWITCH_LOGP),
        )
    else:
        trans = np.zeros((0, K_SLOTS, K_SLOTS))

    # sequential DP with chain breaks at doc boundaries / candidate-less pts
    matched_slot = np.full(P, -1, dtype=np.int64)
    back = np.empty((P, K_SLOTS), dtype=np.int64)
    arangek = np.arange(K_SLOTS)

    chain_start = -1
    scores = None

    def flush(end_p):
        # backtrack chain [chain_start, end_p]
        if chain_start < 0:
            return
        best = int(np.argmax(scores))
        p = end_p
        while p > chain_start:
            matched_slot[p] = best
            best = int(back[p, best])
            p -= 1
        matched_slot[chain_start] = best

    for p in range(P):
        # break on doc change, a gps_idx gap (unmatched points in between),
        # or a degenerate candidate-less point (can't occur in the
        # candidates-only input, kept for robustness)
        broke = (
            p == 0
            or p_doc[p] != p_doc[p - 1]
            or p_gidx[p] != p_gidx[p - 1] + 1
            or not p_has[p]
            or not p_has[p - 1]
        )
        if not p_has[p]:
            flush(p - 1)
            chain_start, scores = -1, None
            continue
        if broke or scores is None:
            flush(p - 1)
            chain_start = p
            scores = emis[p].copy()
            continue
        cand_scores = scores[:, None] + trans[p - 1]
        b = np.argmax(cand_scores, axis=0)
        back[p] = b
        scores = cand_scores[b, arangek] + emis[p]
    flush(P - 1)

    # vectorized collapse of consecutive same-edge points into traversals
    sel = matched_slot >= 0
    m_edge = np.where(sel, c_id[np.arange(P), np.clip(matched_slot, 0, None)], np.nan)
    n_present_per_doc = np.bincount(p_doc, minlength=len(doc_uniques))

    mp = np.flatnonzero(sel)  # matched points in order
    if not len(mp):
        return pd.DataFrame(columns=cols)
    md = p_doc[mp]
    me = m_edge[mp]
    new_run = np.empty(len(mp), dtype=bool)
    new_run[0] = True
    new_run[1:] = (md[1:] != md[:-1]) | (me[1:] != me[:-1])
    run_idx = np.cumsum(new_run) - 1
    R = int(run_idx[-1]) + 1
    run_start = np.flatnonzero(new_run)
    run_doc = md[run_start]
    run_edge = me[run_start].astype(np.int64)
    run_npts = np.bincount(run_idx, minlength=R)
    # last point of each run = element before next run start (or last)
    run_end = np.append(run_start[1:], len(mp)) - 1
    run_last_time = p_time[mp[run_end]]
    # node-crossing interpolation (Valhalla-style): between the last point
    # on edge k (along-position from its matched t_param) and the first
    # point on edge k+1, the boundary is crossed at the distance-weighted
    # fraction toward the shared node. Falls back to the samples' midpoint
    # (no shared node) or the last sample (non-adjacent points / doc break).
    if R > 1:
        np_first = mp[run_start[1:]]
        tp_last = mp[run_end[:-1]]
        # adjacency = consecutive gps_idx within the same doc (an absent
        # index in between means an unmatched point separated the samples)
        contiguous = (p_gidx[np_first] == p_gidx[tp_last] + 1) & (
            p_doc[np_first] == p_doc[tp_last]
        )
        sa_ = matched_slot[tp_last]
        sb_ = matched_slot[np_first]
        ta = c_t[tp_last, sa_]
        la = c_len[tp_last, sa_]
        tb = c_t[np_first, sb_]
        lb = c_len[np_first, sb_]
        srca, dsta = c_src[tp_last, sa_], c_dst[tp_last, sa_]
        srcb, dstb = c_src[np_first, sb_], c_dst[np_first, sb_]
        # remaining distance on edge k to the shared node / into edge k+1
        rem = np.select(
            [dsta == srcb, dsta == dstb, srca == srcb, srca == dstb],
            [(1 - ta) * la, (1 - ta) * la, ta * la, ta * la],
            default=np.nan,
        )
        into = np.select(
            [dsta == srcb, dsta == dstb, srca == srcb, srca == dstb],
            [tb * lb, (1 - tb) * lb, tb * lb, (1 - tb) * lb],
            default=np.nan,
        )
        tau_a, tau_b = p_time[tp_last], p_time[np_first]
        denom = rem + into
        frac = np.where(denom > 0, rem / np.where(denom > 0, denom, 1.0), 0.5)
        boundary = np.where(
            np.isnan(rem), (tau_a + tau_b) / 2.0, tau_a + (tau_b - tau_a) * frac
        )
        run_last_time = run_last_time.copy()
        run_last_time[:-1] = np.where(contiguous, boundary, run_last_time[:-1])
    # edge_seq: position of run within its doc
    new_doc_run = np.empty(R, dtype=bool)
    new_doc_run[0] = True
    new_doc_run[1:] = run_doc[1:] != run_doc[:-1]
    doc_run_start = np.maximum.accumulate(np.where(new_doc_run, np.arange(R), 0))
    edge_seq = np.arange(R) - doc_run_start

    return pd.DataFrame(
        {
            "doc_id": doc_uniques[run_doc],
            "edge_seq": edge_seq.astype("int32"),
            "edge_id": run_edge,
            "end_time": run_last_time,
            "n_pts": run_npts.astype("int32"),
            "n_present": n_present_per_doc[run_doc].astype("int32"),
        }
    )


def _viterbi_partition(batches):
    """mapInPandas kernel: rows arrive repartitioned by doc_id and sorted by
    (doc_id, gps_idx, dist_m, edge_id); the batch-vectorized Viterbi runs
    over each ~10k-row Arrow batch (one call per batch, not per doc).

    A doc can straddle two Arrow batches of the same partition, so the last
    (possibly incomplete) doc of each batch is buffered into the next.
    """
    buf = None
    for pdf in batches:
        if buf is not None and len(buf):
            pdf = pd.concat([buf, pdf], ignore_index=True)
        if not len(pdf):
            continue
        last_doc = pdf["doc_id"].iloc[-1]
        mask = (pdf["doc_id"] == last_doc).to_numpy()
        buf = pdf.iloc[mask.nonzero()[0]]
        main = pdf.iloc[(~mask).nonzero()[0]]
        if len(main):
            out = viterbi_batch(main)
            if len(out):
                yield out
    if buf is not None and len(buf):
        out = viterbi_batch(buf)
        if len(out):
            yield out


def with_gps_index(points: DataFrame) -> DataFrame:
    """Dense 0-based per-doc point index, ordered by offset. filter_traces
    emits this for free inside its existing window pass; use this helper
    only when feeding the matcher from raw (unfiltered) points."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("offset")
    return points.withColumn("gps_idx", (F.row_number().over(w) - 1).cast("int"))


def match_traces(
    points: DataFrame, candidates: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """points + candidate rows -> traversal rows (MATCH_SCHEMA).

    SINGLE-shuffle physical shape: only the candidate rows (which already
    carry each point's time/lon/lat and gps_idx) are repartitioned by
    doc_id, sorted in-partition, and streamed through the Viterbi
    mapInPandas. A point with no candidate within the search radius is a
    gps_idx GAP — it breaks the Viterbi chain and counts toward the M1
    unmatched ratio exactly like Valhalla's unmatched matched_points — so
    the full points table never has to be joined back onto the candidates
    (the round-1 form paid a second full shuffle + a sort-merge join of the
    pipeline's largest intermediate for that).

    ``points`` is consumed only for per-doc stats (t0 = first point time,
    n_points): a map-side-combined aggregation whose shuffle is one row per
    doc, joined onto the (small) traversal output — broadcast at bench
    scale, an ordinary small join beyond ``autoBroadcastJoinThreshold``.
    Doc sizes are bounded (~10^2 points), so hash partitioning by doc_id is
    skew-safe even with hot urban cells.
    """
    if "gps_idx" not in candidates.columns:
        raise ValueError(
            "candidates must carry gps_idx — build them from filter_traces "
            "output or matching.with_gps_index(points)"
        )
    spark = points.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    cand = candidates.select(
        "doc_id", "gps_idx", "time", "lon", "lat",
        "edge_id", "src", "dst", "dist_m", "t_param", "len_m",
    ).repartition(p, "doc_id")
    arranged = cand.sortWithinPartitions("doc_id", "gps_idx", "dist_m", "edge_id")
    runs = arranged.mapInPandas(_viterbi_partition, schema=RUN_SCHEMA)
    meta = points.groupBy("doc_id").agg(
        F.min_by("time", "offset").alias("t0"),
        F.count(F.lit(1)).cast("int").alias("n_points"),
    )
    out = runs.join(meta, "doc_id")  # AQE broadcasts the per-doc side
    return out.select(
        "doc_id",
        "edge_seq",
        "edge_id",
        (F.col("end_time") - F.col("t0")).alias("elapsed_time"),
        "n_pts",
        "n_points",
        (F.col("n_points") - F.col("n_present")).cast("int").alias("n_unmatched"),
        "t0",
    )
