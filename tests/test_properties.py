"""Property-based fuzzing (hypothesis) of the pure kernels — no Spark.

1. config interp/extrap: structural invariants on arbitrary speed arrays
   (idempotence, clamps, interior fill, guard behavior).
2. Viterbi: the batch-vectorized kernel equals the per-doc reference on
   randomized candidate frames (random geometry, gaps, shared/unshared
   nodes, duplicate timestamps).
"""

import copy

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from conflation_spark.functions.config_build import perform_interp_extrap
from conflation_spark.operators.matching import viterbi_batch, viterbi_one_doc

speeds8 = st.lists(st.one_of(st.none(), st.integers(5, 140)), min_size=8, max_size=8)
speeds5 = st.lists(st.one_of(st.none(), st.integers(5, 140)), min_size=5, max_size=5)


def _cfg(way, lex, ltu, rab):
    base = {
        "way": list(way), "link_exiting": list(lex), "link_turning": list(ltu),
        "roundabout": list(rab), "driveway": None, "alley": None,
        "parking_aisle": None, "drive-through": None,
    }
    return {"iso3166-1": "XX", "rural": copy.deepcopy(base),
            "suburban": copy.deepcopy(base), "urban": copy.deepcopy(base)}


@settings(max_examples=150, deadline=None)
@given(way=speeds8, lex=speeds5, ltu=speeds5, rab=speeds8)
def test_interp_extrap_invariants(way, lex, ltu, rab):
    cfg = perform_interp_extrap(_cfg(way, lex, ltu, rab))
    for dens in ("rural", "suburban", "urban"):
        for typ, orig in (("way", way), ("link_exiting", lex),
                          ("link_turning", ltu), ("roundabout", rab)):
            out = cfg[dens][typ]
            known = [v for v in orig if v is not None]
            increasing = any(
                known[i - 1] < known[i] for i in range(1, len(known))
            )
            if len(known) < 2 or increasing:
                assert out == list(orig)  # guards: untouched
                continue
            # filled everywhere, original values preserved, clamps respected
            assert all(v is not None for v in out)
            for i, v in enumerate(orig):
                if v is not None:
                    assert out[i] == v
            idxs = [i for i, v in enumerate(orig) if v is not None]
            lo, hi = min(idxs), max(idxs)
            assert all(out[i] <= 140 for i in range(lo))  # head clamp
            assert all(out[i] >= 10 for i in range(hi + 1, len(out)))  # tail clamp
    # idempotence
    assert perform_interp_extrap(copy.deepcopy(cfg)) == cfg


@st.composite
def candidate_frames(draw):
    """Random multi-doc candidate frames shaped like the matcher input:
    candidates-only rows with gps_idx gaps standing in for unmatched
    points (the single-shuffle contract)."""
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    n_docs = draw(st.integers(1, 4))
    rows = []
    for d in range(n_docs):
        n_pts = draw(st.integers(1, 15))
        t = 0.0
        for gidx in range(n_pts):
            t += float(rng.uniform(0.5, 4.0))
            # gc_prev: great-circle meters to the previous point (0 at the
            # doc start) — the matcher consumes the precomputed column
            gc_prev = 0.0 if gidx == 0 else float(rng.uniform(0.0, 120.0))
            n_cand = int(rng.integers(0, 4))  # 0 => unmatched => idx gap
            for c in range(n_cand):
                eid = int(rng.integers(0, 6))
                rows.append((
                    f"d{d}", gidx, t, gc_prev,
                    float(eid), float(eid), float(eid + 1),
                    float(rng.uniform(0, 30)), float(rng.uniform(0, 1)),
                    float(rng.uniform(50, 300)),
                ))
    pdf = pd.DataFrame(
        rows,
        columns=["doc_id", "gps_idx", "time", "gc_prev",
                 "edge_id", "src", "dst", "dist_m", "t_param", "len_m"],
    )
    return pdf.sort_values(
        ["doc_id", "gps_idx", "dist_m", "edge_id"], kind="mergesort"
    ).reset_index(drop=True)


@settings(max_examples=60, deadline=None)
@given(pdf=candidate_frames())
def test_viterbi_batch_equals_per_doc_fuzz(pdf):
    got = viterbi_batch(pdf).sort_values(["doc_id", "edge_seq"]).reset_index(drop=True)
    want = pd.concat(
        [viterbi_one_doc(g) for _, g in pdf.groupby("doc_id", sort=True)]
        or [viterbi_one_doc(pdf.iloc[:0])],
        ignore_index=True,
    ).sort_values(["doc_id", "edge_seq"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["doc_id", "edge_seq", "edge_id", "n_pts", "n_present"]:
        assert list(got[c]) == list(want[c]), c
    assert np.allclose(
        got["end_time"].to_numpy(dtype=float),
        want["end_time"].to_numpy(dtype=float),
        atol=1e-9,
    )
