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
    "n_pts int, n_points int, n_unmatched int"
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
    cols = ["doc_id", "edge_seq", "edge_id", "elapsed_time", "n_pts", "n_points", "n_unmatched"]
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

    # collapse consecutive matched edges into traversals
    out = []
    cur_edge, cur_n, cur_last_t = None, 0, None
    seq = 0
    for p_i in range(n_points):
        c = matched[p_i]
        eid = None if c is None else int(e_id[c])
        if eid is None:
            continue
        if cur_edge is None or eid != cur_edge:
            if cur_edge is not None:
                out.append((doc_id, seq, cur_edge, cur_last_t - t0, cur_n, n_points, n_unmatched))
                seq += 1
            cur_edge, cur_n = eid, 0
        cur_n += 1
        cur_last_t = pts[p_i][0]
    if cur_edge is not None:
        out.append((doc_id, seq, cur_edge, cur_last_t - t0, cur_n, n_points, n_unmatched))

    return pd.DataFrame(out, columns=cols)


def match_traces(points: DataFrame, candidates: DataFrame) -> DataFrame:
    """points + candidate rows -> traversal rows (MATCH_SCHEMA).

    Points with no candidate row are re-attached (left join) so the matcher
    sees them as 'unmatched' — they count toward the M1 ratio and break the
    Viterbi chain, exactly like Valhalla's unmatched matched_points.
    """
    base = points.select("doc_id", "offset", "time", "lon", "lat")
    cand = candidates.select(
        "doc_id", "offset", "edge_id", "src", "dst", "dist_m", "t_param", "len_m"
    )
    full = base.join(cand, ["doc_id", "offset"], "left")
    # NB: applyInPandas treats a 2-arg function as (key, pdf) — keep 1-arg
    return full.groupBy("doc_id").applyInPandas(
        lambda pdf: viterbi_one_doc(pdf), schema=MATCH_SCHEMA
    )
