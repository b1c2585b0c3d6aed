"""HMM-Viterbi map matching (reference J3).

The reference delegates matching to Valhalla's ``trace_attributes`` with
``costing=auto, shape_match=map_snap, use_timestamps=true``
(/root/reference/conflation/map_matching/valhalla.py:141-165); the HMM lives
outside the repo. This module is our native stand-in, a Newson-Krumm-style
HMM (emission ~ Gaussian GPS noise on point-to-edge distance; transition ~
agreement between route distance and great-circle distance), with parameters
fixed and documented here so the pure-Python test oracle can share them.

Execution shape: one ``applyInPandas`` group per ``doc_id`` over the
candidate rows from ``operators.candidates`` (Arrow-batched; numpy Viterbi
inside — never per-row Python). Docs are bounded (~10^2 points x <=k
candidates), so doc-level grouping is skew-safe even when urban cells are
hot: the skew lives in the *candidate join* (handled by AQE/broadcast),
not here.

Output: one row per matched edge traversal —
  (doc_id, edge_seq, edge_id, elapsed_time, n_pts, n_points, n_unmatched)
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


def _haversine_np(lon1, lat1, lon2, lat2):
    lon1, lat1, lon2, lat2 = map(math.radians, (lon1, lat1, lon2, lat2))
    a = (
        math.sin((lat2 - lat1) / 2) ** 2
        + math.cos(lat1) * math.cos(lat2) * math.sin((lon2 - lon1) / 2) ** 2
    )
    return 2 * math.asin(math.sqrt(a)) * EARTH_RADIUS_M


def viterbi_one_doc(pdf: pd.DataFrame, k: int = 4) -> pd.DataFrame:
    """Pure function (shared with the test oracle): candidate rows of one doc
    -> traversal rows. Takes top-k candidates per point here (numpy) so the
    upstream join needs no per-point window shuffle. Deterministic: ties
    broken by (dist_m, edge_id); first-wins argmax."""
    doc_id = pdf["doc_id"].iloc[0]
    pdf = pdf.sort_values(["offset", "dist_m", "edge_id"], kind="mergesort")

    offsets = pdf["offset"].to_numpy()
    times = pdf["time"].to_numpy()
    lons = pdf["lon"].to_numpy()
    lats = pdf["lat"].to_numpy()
    has_cand = pdf["edge_id"].notna().to_numpy()
    e_id = pdf["edge_id"].to_numpy(dtype="float64", na_value=np.nan)
    e_src = pdf["src"].to_numpy(dtype="float64", na_value=np.nan)
    e_dst = pdf["dst"].to_numpy(dtype="float64", na_value=np.nan)
    e_dist = pdf["dist_m"].to_numpy(dtype="float64", na_value=np.nan)
    e_t = pdf["t_param"].to_numpy(dtype="float64", na_value=np.nan)
    e_len = pdf["len_m"].to_numpy(dtype="float64", na_value=np.nan)

    # split row range into per-point slices (offsets are sorted)
    uniq_off, starts = np.unique(offsets, return_index=True)
    bounds = np.append(starts, len(offsets))
    pts = []  # (time, lon, lat, candidate row indices [top-k])
    for i in range(len(uniq_off)):
        s, e = bounds[i], bounds[i + 1]
        rows = [j for j in range(s, e) if has_cand[j]][:k]
        pts.append((times[s], lons[s], lats[s], rows))

    n_unmatched = sum(1 for p in pts if not p[3])
    n_points = len(pts)
    # t0 (doc start epoch) rides along so measurement derivation can place
    # each traversal in absolute time (per-hour dimension)
    cols = [
        "doc_id", "edge_seq", "edge_id", "elapsed_time",
        "n_pts", "n_points", "n_unmatched", "t0",
    ]
    if n_points == 0:
        return pd.DataFrame(columns=cols)
    t0 = pts[0][0]

    matched = [None] * n_points  # per point: candidate row index or None
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
            matched[p_i] = pts[p_i][3][c_i]

    for p_i, (t, lon, lat, cands) in enumerate(pts):
        if not cands:
            flush(chain, prev_scores, prev_back)
            chain, prev_scores, prev_back = [], None, []
            continue
        ci = np.asarray(cands)
        emis = -0.5 * (e_dist[ci] / SIGMA_M) ** 2
        if prev_scores is None:
            chain = [p_i]
            prev_scores = emis
            prev_back = []
            continue
        q_i = chain[-1]
        gc = _haversine_np(pts[q_i][1], pts[q_i][2], lon, lat)
        pc = np.asarray(pts[q_i][3])
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
        if p_next != p_last + 1:
            return pts[p_last][0]
        tau_a, tau_b = pts[p_last][0], pts[p_next][0]
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
    for p_i in range(n_points):
        c = matched[p_i]
        eid = None if c is None else int(e_id[c])
        if eid is None:
            continue
        if cur_edge is None or eid != cur_edge:
            if cur_edge is not None:
                end_t = boundary_time(cur_last_c, cur_last_pi, c, p_i)
                out.append((doc_id, seq, cur_edge, end_t - t0, cur_n, n_points, n_unmatched, t0))
                seq += 1
            cur_edge, cur_n = eid, 0
        cur_n += 1
        cur_last_t = pts[p_i][0]
        cur_last_pi = p_i
        cur_last_c = c
    if cur_edge is not None:
        out.append((doc_id, seq, cur_edge, cur_last_t - t0, cur_n, n_points, n_unmatched, t0))

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
    cols = [
        "doc_id", "edge_seq", "edge_id", "elapsed_time",
        "n_pts", "n_points", "n_unmatched", "t0",
    ]
    if not len(pdf):
        return pd.DataFrame(columns=cols)

    doc_codes, doc_uniques = pd.factorize(pdf["doc_id"], sort=False)
    offsets = pdf["offset"].to_numpy()
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
        broke = p == 0 or p_doc[p] != p_doc[p - 1] or not p_has[p] or not p_has[p - 1]
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
    # per-doc stats
    n_points_per_doc = np.bincount(p_doc, minlength=len(doc_uniques))
    n_unmatched_per_doc = np.bincount(p_doc[~p_has], minlength=len(doc_uniques))
    doc_first_time = np.full(len(doc_uniques), np.nan)
    first_point_of_doc = np.empty(0, dtype=np.int64)
    newd = np.empty(P, dtype=bool)
    newd[0] = True
    newd[1:] = p_doc[1:] != p_doc[:-1]
    first_point_of_doc = np.flatnonzero(newd)
    doc_first_time[p_doc[first_point_of_doc]] = p_time[first_point_of_doc]

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
        contiguous = (np_first == tp_last + 1) & (p_doc[np_first] == p_doc[tp_last])
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
            "elapsed_time": run_last_time - doc_first_time[run_doc],
            "n_pts": run_npts.astype("int32"),
            "n_points": n_points_per_doc[run_doc].astype("int32"),
            "n_unmatched": n_unmatched_per_doc[run_doc].astype("int32"),
            "t0": doc_first_time[run_doc],
        }
    )


def _viterbi_partition(batches):
    """mapInPandas kernel: rows arrive repartitioned by doc_id and sorted by
    (doc_id, offset, dist_m, edge_id); the batch-vectorized Viterbi runs
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


def match_traces(
    points: DataFrame, candidates: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """points + candidate rows -> traversal rows (MATCH_SCHEMA).

    Points with no candidate row are re-attached (left join) so the matcher
    sees them as 'unmatched' — they count toward the M1 ratio and break the
    Viterbi chain, exactly like Valhalla's unmatched matched_points.

    Physical shape: one shuffle (repartition by doc_id, co-locating each
    doc), sortWithinPartitions (no extra shuffle), then a single
    mapInPandas pass. Doc sizes are bounded (~10^2 points), so hash
    partitioning by doc_id is skew-safe even with hot urban cells.
    """
    base = points.select("doc_id", "offset", "time", "lon", "lat")
    cand = candidates.select(
        "doc_id", "offset", "edge_id", "src", "dst", "dist_m", "t_param", "len_m"
    )
    full = base.join(cand, ["doc_id", "offset"], "left")
    spark = points.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    arranged = full.repartition(p, "doc_id").sortWithinPartitions(
        "doc_id", "offset", "dist_m", "edge_id"
    )
    return arranged.mapInPandas(_viterbi_partition, schema=MATCH_SCHEMA)
