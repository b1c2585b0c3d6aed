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


# --- round-5 pure-kernel properties: BPE trainer/encoder, integer pagerank ---

words_strategy = st.lists(
    st.tuples(st.text(alphabet="abcdef", min_size=1, max_size=8), st.integers(1, 50)),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@settings(max_examples=120, deadline=None)
@given(wc=words_strategy, n_merges=st.integers(0, 24))
def test_bpe_trainer_encoder_invariants(wc, n_merges):
    """For ANY word table and merge budget: learning is prefix-stable,
    every training word's encoding round-trips (concat of pieces ==
    word + marker), and more merges never lengthen an encoding."""
    from conflation_spark.operators.bpe import EOW, _encode_word, train_bpe

    merges = train_bpe(wc, n_merges)
    assert train_bpe(wc, max(0, n_merges - 1)) == merges[: max(0, n_merges - 1)]
    ranks = {p: i for i, p in enumerate(merges)}
    ranks_half = {p: i for i, p in enumerate(merges[: len(merges) // 2])}
    for w, _ in wc:
        pieces = _encode_word(w, ranks)
        assert "".join(pieces) == w + EOW  # lossless segmentation
        assert len(pieces) <= len(_encode_word(w, ranks_half))
        assert all(p for p in pieces)


@settings(max_examples=100, deadline=None)
@given(
    n=st.integers(2, 12),
    edges=st.lists(st.tuples(st.integers(0, 11), st.integers(0, 11)), max_size=30),
    iters=st.integers(1, 6),
)
def test_integer_pagerank_mass_and_bounds(n, edges, iters):
    """Python-side replay of the pagerank arithmetic (the pytest oracle's
    own loop): total mass never exceeds the initial corpus mass (floors
    only leak, never create), every rank >= teleport, and dangling-free
    graphs conserve mass to within one unit per edge per iteration."""
    from conflation_spark.operators.graph import (
        PR_DAMPING_DEN,
        PR_DAMPING_NUM,
        PR_SCALE,
    )

    nodes = list(range(n))
    edges = [(a % n, b % n) for a, b in edges]
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    teleport = (PR_SCALE * (PR_DAMPING_DEN - PR_DAMPING_NUM)) // PR_DAMPING_DEN
    rank = {v: PR_SCALE for v in nodes}
    for _ in range(iters):
        mass = {v: 0 for v in nodes}
        for s, d in edges:
            mass[d] += (rank[s] * PR_DAMPING_NUM) // (PR_DAMPING_DEN * outdeg[s])
        rank = {v: teleport + mass[v] for v in nodes}
        assert all(r >= teleport for r in rank.values())
        assert sum(rank.values()) <= n * PR_SCALE  # mass only leaks


@settings(max_examples=120, deadline=None)
@given(
    counts=st.lists(st.integers(1, 1000), min_size=1, max_size=40),
    vocab_k=st.integers(1, 40),
)
def test_lm_logprobs_are_proper(counts, vocab_k):
    """The smoothed unigram LM is a proper distribution: retained-type
    probabilities plus the OOV pseudo-type sum to EXACTLY 1
    ((sum_ret + c_oov + alpha*(v+1)) / (n + alpha*(v+1)) with
    c_oov = n - sum_ret), and every logprob is negative."""
    import math

    alpha = 0.5
    vocab = sorted(counts, reverse=True)[:vocab_k]
    n, v = sum(counts), len(vocab)
    denom = n + alpha * (v + 1)
    c_oov = n - sum(vocab)
    probs = [(c + alpha) / denom for c in vocab] + [(c_oov + alpha) / denom]
    assert all(p > 0 for p in probs)
    assert abs(sum(probs) - 1.0) < 1e-9
    assert all(math.log(p) < 0 for p in probs)


# ----------------------------------------------------------- FLAC fuzz

from conflation_spark.functions.flac import decode_flac, encode_flac  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    data=st.lists(st.integers(-4000, 4000), min_size=3, max_size=600),
    ch=st.integers(1, 2),
    lpc=st.sampled_from([0, 2, 5]),
    rice2=st.booleans(),
    po=st.integers(0, 2),
    esc=st.booleans(),
)
def test_flac_roundtrip_arbitrary_signals(data, ch, lpc, rice2, po, esc):
    """Any int16-range signal round-trips losslessly under any knob
    combination — the property that makes the codec a codec."""
    n = len(data) // ch * ch
    if n == 0:
        return
    s = np.array(data[:n], dtype=np.int16).reshape(-1, ch)
    blob = encode_flac(
        s if ch == 2 else s[:, 0], 16000,
        block_size=192, lpc_order=lpc, rice2=rice2,
        partition_order=po, force_escape=esc,
    )
    dec, sr = decode_flac(blob)
    assert sr == 16000
    assert np.array_equal(dec, s)


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    pos_frac=st.floats(0.0, 1.0),
    mode=st.sampled_from(["flip", "truncate", "insert"]),
)
def test_flac_corruption_never_crashes(seed, pos_frac, mode):
    """Arbitrary corruption (bit flip / truncation / byte insertion) must
    either decode to the ORIGINAL samples (corruption hit dead bytes —
    impossible here since every byte is load-bearing, but allowed) or
    raise ValueError — never an unguarded IndexError/KeyError/hang."""
    rng = np.random.default_rng(seed)
    s = rng.integers(-3000, 3000, 400).astype(np.int16)
    blob = bytearray(encode_flac(s, 16000, block_size=192))
    pos = min(int(pos_frac * len(blob)), len(blob) - 1)
    if mode == "flip":
        blob[pos] ^= 1 << int(rng.integers(0, 8))
    elif mode == "truncate":
        blob = blob[:pos]
    else:
        blob = blob[:pos] + bytes([int(rng.integers(0, 256))]) + blob[pos:]
    try:
        dec, _ = decode_flac(bytes(blob))
    except ValueError:
        return  # the contract: corruption -> ValueError
    assert np.array_equal(dec[:, 0], s), "corrupt stream decoded to wrong samples"
