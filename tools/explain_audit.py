"""Plan audit: assert the Catalyst properties the engine's scale story
depends on, by inspecting `.explain("formatted")` output.

Checks:
1. span decode prunes the parquet scan to the referenced columns
2. trace filter = ONE Exchange (single doc_id shuffle, windows share it)
3. candidate join is a BroadcastHashJoin (no shuffle of the points side)
4. rollup is a single-Exchange grouping-sets aggregate with partial
   aggregation (map-side combine)
5. whole-stage codegen covers the decode+filter hot path

Run: python tools/explain_audit.py  (exits non-zero on violation)
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    from conflation_spark.datagen import ensure_fixture
    from conflation_spark.operators.candidates import candidate_edges
    from conflation_spark.operators.rollup import rollup_medians
    from conflation_spark.operators.trace_filter import filter_traces
    from conflation_spark.session import get_spark
    from conflation_spark.sources.spans import decode_points, load_documents

    spark = get_spark("explain_audit", master="local[4]", shuffle_partitions=4)
    d = ensure_fixture("sf0.001")
    docs = load_documents(spark, d)
    edges = spark.read.parquet(f"{d}/edges.parquet")

    failures = []

    # 1. decode scan: ReadSchema restricted to doc_id + spans
    p1 = plan_of(decode_points(docs))
    m = re.search(r"ReadSchema: (\S+)", p1)
    if not m or "doc_id" not in m.group(1) or "spans" not in m.group(1):
        failures.append("decode: ReadSchema missing expected columns")
    print("[1] decode ReadSchema:", m.group(1)[:120] if m else "??")

    # 2. trace filter: exactly one Exchange
    p2 = plan_of(filter_traces(decode_points(docs)))
    n_exch = len(re.findall(r"\(\d+\) Exchange\b", p2))
    print(f"[2] trace filter Exchange count: {n_exch}")
    if n_exch != 1:
        failures.append(f"trace filter should have 1 Exchange, found {n_exch}")
    if "Window" not in p2:
        failures.append("trace filter lost its Window operators")

    # 3. candidate join: broadcast, no points-side Exchange
    p3 = plan_of(candidate_edges(decode_points(docs), edges))
    if "BroadcastHashJoin" not in p3:
        failures.append("candidate join is not a BroadcastHashJoin")
    n_exch3 = len(re.findall(r"\(\d+\) Exchange\b", p3))
    print(f"[3] candidate join: BroadcastHashJoin={'BroadcastHashJoin' in p3}, "
          f"hash exchanges={n_exch3}")
    if n_exch3 != 0:
        failures.append("candidate join shuffles the probe side")

    # 4. rollup: partial aggregation (partial_percentile) + one Exchange
    meas = spark.read.parquet(f"{d}/measurements.parquet")
    p4 = plan_of(rollup_medians(meas))
    has_partial = "partial_percentile" in p4 or re.search(r"HashAggregate.*partial", p4, re.S)
    n_exch4 = len(re.findall(r"\(\d+\) Exchange\b", p4))
    print(f"[4] rollup: partial agg={bool(has_partial)}, exchanges={n_exch4}")
    if not has_partial:
        failures.append("rollup lacks map-side partial aggregation")
    if n_exch4 != 1:
        failures.append(f"rollup should have 1 Exchange, found {n_exch4}")

    # 5. whole-stage codegen spans the filter hot path (from_json itself is
    # CodegenFallback in Spark — the scan stays vectorized/batched either way)
    # (WindowExec is not whole-stage-codegen'd in Spark, and AQE hides
    # codegen ids pre-execution — assert only the vectorized scan here)
    if "Batched: true" not in p1:
        failures.append("decode scan not vectorized")
    print(f"[5] decode scan batched: {'Batched: true' in p1}")

    # 6. matcher: single-shuffle shape — the candidate stream (the
    # pipeline's largest intermediate) passes through exactly ONE
    # repartition exchange into the Viterbi MapInPandas; the per-doc stats
    # join touches only the small traversal output
    from conflation_spark.operators.matching import match_traces

    pts = filter_traces(decode_points(docs))
    p6 = plan_of(match_traces(pts, candidate_edges(pts, edges)))
    n_repart = len(re.findall(r"REPARTITION_BY_COL", p6))
    has_kernel = ("MapInArrow" in p6) or ("MapInPandas" in p6)
    # the per-point aggregation must REUSE the doc_id partitioning (subset
    # co-partitioning) — an ENSURE_REQUIREMENTS exchange on (doc_id,
    # gps_idx) would mean the collapse pays its own shuffle
    agg_exch = len(re.findall(r"Exchange hashpartitioning\(doc_id#\d+, gps_idx#\d+", p6))
    print(
        f"[6] matcher: arrow kernel={has_kernel}, candidate repartitions={n_repart}, "
        f"per-point agg exchanges={agg_exch}"
    )
    if not has_kernel:
        failures.append("matcher lost its MapInArrow/MapInPandas stage")
    # 0 = fed straight from filter_traces, whose window exchange already
    # partitions by doc_id and the explicit repartition is elided;
    # 1 = fed from a checkpoint. >1 would mean the candidate stream is
    # shuffled more than once.
    if n_repart > 1:
        failures.append(
            f"matcher shuffles the candidate stream more than once ({n_repart})"
        )
    if agg_exch:
        failures.append(
            "per-point candidate aggregation added its own exchange "
            "(subset co-partitioning not honored)"
        )

    # 7. as-of / interval joins: the union+window formulation must contain
    # NO join node (a Join here means Catalyst planned the quadratic
    # range join this operator exists to avoid)
    import __spark_entry__ as em

    p7 = plan_of(em.queries()["asof_signup_lag"](spark, "/root/testdata/sf0.001"))
    asof_joins = len(re.findall(r"Join|BroadcastNestedLoop", p7))
    print(f"[7] as-of join: join nodes={asof_joins}")
    if asof_joins:
        failures.append("as-of join plan contains a Join node")

    # 8. bm25 top-k must plan as TakeOrdered (distributed partial top-k),
    # never a global Sort + Limit
    p8 = plan_of(em.queries()["bm25_topk"](spark, "/root/testdata/sf0.001"))
    has_tako = "TakeOrdered" in p8
    print(f"[8] bm25 top-k: TakeOrdered={has_tako}")
    if not has_tako:
        failures.append("bm25 top-k does not plan as TakeOrdered")

    # 9. incremental dedup: the delta-vs-corpus band join must read the
    # corpus from the BUCKETED checkpoint (no corpus text rescan) and the
    # bucketed scan must reach its join with no re-shuffle (broadcast
    # disabled so the check exercises the SMJ contract that matters at
    # scale)
    from pyspark.sql import functions as F

    from conflation_spark.datagen_text import ensure_text_fixture
    from conflation_spark.operators.incremental import (
        checkpoint_band_table,
        incremental_minhash_pairs,
    )

    tdir = ensure_text_fixture("sf0.001")
    td = spark.read.parquet(f"{tdir}/textdocs.parquet")
    checkpoint_band_table(td.where(F.col("text_id") < "t000200"), "audit_corpus_bands", "text_id", "text")
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        inc = incremental_minhash_pairs(
            spark, "audit_corpus_bands", td.where(F.col("text_id") >= "t000200"), "text_id", "text"
        )
        p9 = inc._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    bucketed = "Bucketed: true" in p9
    corpus_rescan = any(
        "textdocs" in ln and "FileScan" in ln and "t000200" not in ln
        for ln in p9.splitlines()
    )
    shuffle_above_bucketed = False
    lines = p9.splitlines()
    for i, ln in enumerate(lines):
        if "Bucketed: true" not in ln:
            continue
        depth = len(re.match(r"[\s:+\-*]*", ln).group(0))
        j = i - 1
        while j >= 0:
            d2 = len(re.match(r"[\s:+\-*]*", lines[j]).group(0))
            if d2 < depth:
                if "Exchange hashpartitioning" in lines[j]:
                    shuffle_above_bucketed = True
                if "Join" in lines[j]:
                    break
                depth = d2
            j -= 1
    print(
        f"[9] incremental dedup: bucketed corpus scan={bucketed}, "
        f"corpus text rescan={corpus_rescan}, corpus-side shuffle={shuffle_above_bucketed}"
    )
    if not bucketed:
        failures.append("incremental dedup does not read the bucketed checkpoint")
    if corpus_rescan:
        failures.append("incremental dedup rescans the corpus text")
    if shuffle_above_bucketed:
        failures.append("incremental dedup re-shuffles the bucketed corpus scan")

    # 10. global KMV sketch bottom-k must plan as TakeOrdered (distributed
    # partial top-k), never a global sort
    from conflation_spark.operators.sketch import kmv_sketch

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p10 = kmv_sketch(ev, "user_id", k=64)._jdf.queryExecution().executedPlan().toString()
    has_tako10 = "TakeOrdered" in p10
    print(f"[10] kmv sketch bottom-k: TakeOrdered={has_tako10}")
    if not has_tako10:
        failures.append("kmv global bottom-k does not plan as TakeOrdered")

    # 11. incremental IVF search must bucket-prune: the stored index is
    # bucketed on list_id and the probe filter selects a strict subset
    # of buckets (the index-once/search-many contract — only probed
    # lists are READ)
    from conflation_spark.datagen_text import ensure_text_fixture
    from conflation_spark.operators.incremental import (
        checkpoint_ivf_index,
        incremental_ivf_topk,
    )
    from conflation_spark.operators.similarity import train_ivf_centroids

    d = ensure_text_fixture("sf0.001")
    v = spark.read.parquet(f"{d}/vectors.parquet").select("vec_id", "vec")
    cents = train_ivf_centroids(v, n_lists=16, id_col="vec_id", vec_col="vec")
    checkpoint_ivf_index(v, "audit_ivf_idx", cents, "vec_id", "vec")
    q = v.orderBy("vec_id").limit(5).selectExpr("vec_id as query_id", "vec")
    p11 = (
        incremental_ivf_topk(spark, "audit_ivf_idx", q, k=5, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", p11)
    pruned = bool(m) and int(m.group(1)) < int(m.group(2))
    print(
        f"[11] incremental IVF search: bucket pruning={m.group(0) if m else 'ABSENT'}"
    )
    if not pruned:
        failures.append("incremental IVF search does not bucket-prune the index scan")

    # 12. decontamination: the benchmark gram set must BROADCAST (eval
    # sets are tiny against the corpus) and the corpus side must shuffle
    # exactly once (its groupBy(doc id)); the only other shuffle allowed
    # is the tiny bench-side distinct feeding the broadcast
    from pyspark.sql import functions as FN

    from conflation_spark.operators.decontam import decontaminate

    tdx = spark.read.parquet(f"{d}/textdocs.parquet")
    p12 = (
        decontaminate(
            tdx.where(~FN.col("text_id").endswith("0")),
            tdx.where(FN.col("text_id").endswith("0")),
            "text_id",
            "text",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_bhj = p12.count("BroadcastHashJoin")
    n_shuf = p12.count("Exchange hashpartitioning")
    print(f"[12] decontaminate: BroadcastHashJoin={n_bhj}, shuffles={n_shuf}")
    if n_bhj != 1 or n_shuf > 2:
        failures.append(
            f"decontaminate: want 1 broadcast join + <=2 shuffles, got {n_bhj}/{n_shuf}"
        )

    # 13. PII scrub is a pure map: zero Exchange, fused with the scan
    from conflation_spark.operators.text import scrub_pii

    p13 = (
        scrub_pii(spark.read.parquet(f"{d}/pii_docs.parquet"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    print(f"[13] scrub_pii: Exchange count={p13.count('Exchange')}")
    if "Exchange" in p13:
        failures.append("scrub_pii plan contains an Exchange (should be a pure map)")

    # 14. quality classifier: explode -> broadcast weight join -> ONE
    # hash aggregation on the doc id; a SortMergeJoin or a second
    # shuffle here means the B-row weight table stopped broadcasting
    from conflation_spark.operators.lm import quality_classifier

    p14 = (
        quality_classifier(tdx, "text_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_bhj14 = p14.count("BroadcastHashJoin")
    n_shuf14 = p14.count("Exchange hashpartitioning")
    print(f"[14] quality_classifier: BroadcastHashJoin={n_bhj14}, shuffles={n_shuf14}")
    if n_bhj14 != 1 or n_shuf14 != 1:
        failures.append(
            f"quality_classifier: want 1 broadcast join + 1 shuffle, got {n_bhj14}/{n_shuf14}"
        )

    # 15. LM scoring pass: the logprob table is built in its own bounded
    # job (unigram_lm_table), so the returned plan must be explode ->
    # broadcast lp-table join -> ONE hash aggregation — and contain no
    # nested-loop join and no log() (the naive formulation cross-joined
    # 1-row stats and re-scanned the ref corpus three times)
    from conflation_spark.operators.lm import lm_cross_entropy

    p15 = (
        lm_cross_entropy(tdx, None, "text_id", "text", vocab_k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_bhj15 = p15.count("BroadcastHashJoin")
    n_shuf15 = p15.count("Exchange hashpartitioning")
    n_nlj15 = p15.count("NestedLoopJoin")
    n_scans15 = p15.count("FileScan parquet")
    print(
        f"[15] lm_cross_entropy scoring: BroadcastHashJoin={n_bhj15}, "
        f"shuffles={n_shuf15}, nested-loop={n_nlj15}, corpus scans={n_scans15}"
    )
    if n_bhj15 != 1 or n_shuf15 != 1 or n_nlj15 != 0 or n_scans15 != 1:
        failures.append(
            "lm_cross_entropy scoring plan regressed (want 1 BHJ, 1 shuffle, "
            f"0 NLJ, 1 scan; got {n_bhj15}/{n_shuf15}/{n_nlj15}/{n_scans15})"
        )

    # 16. per-source cap: a window partitioned on (source, _salt) exists
    # (phase 1 — no task sorts a whole hot domain) AND Spark 4's
    # WindowGroupLimit prunes map-side before each exchange
    from conflation_spark.operators.corpus import per_source_cap

    docs16 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p16 = (
        per_source_cap(docs16, 5)._jdf.queryExecution().executedPlan().toString()
    )
    salted_window = any(
        "_salt" in seg.split(")")[0]
        for seg in p16.split("windowspecdefinition(")[1:]
    )
    partial_limit = "WindowGroupLimit" in p16 and "Partial" in p16
    print(
        f"[16] per_source_cap: salted phase-1 window={salted_window}, "
        f"map-side WindowGroupLimit={partial_limit}"
    )
    if not salted_window or not partial_limit:
        failures.append("per_source_cap lost its skew-safe two-phase plan shape")

    # 17) url_features must stay window-free: the per-host doc count is a
    # partial-agg + join (AQE-splittable under skew), never a window count
    # that drags a hot domain into one task
    from conflation_spark.operators.corpus import url_features

    urls17 = spark.createDataFrame(
        [(f"https://h{i % 7}.example.com/p/{i}",) for i in range(64)], "url string"
    )
    p17 = url_features(urls17)._jdf.queryExecution().executedPlan().toString()
    no_window = "Window" not in p17
    partial17 = "partial_count" in p17 or ("HashAggregate" in p17 and "Partial" in p17)
    print(f"[17] url_features: window-free={no_window}, partial agg={partial17}")
    if not no_window or not partial17:
        failures.append("url_features host count lost its window-free partial-agg shape")

    # 18) the WARC scan parallelizes by shard: the only exchange feeding the
    # record-producing MapInPandas is a repartition of the tiny PATH LIST
    # (one row per shard), never of the decoded records
    from conflation_spark.datagen_warc import ensure_warc_fixture
    from conflation_spark.sources.warc import read_warc

    wd18 = ensure_warc_fixture("sf0.001")
    df18 = read_warc(spark, f"{wd18}/*.warc.gz")
    p18 = df18._jdf.queryExecution().executedPlan().toString()
    has_map = "MapInPandas" in p18 or "MapInArrow" in p18
    # the scan below the exchange must read only `path` (content pruned)
    content_pruned = "content" not in p18.lower().split("readschema")[-1][:200] if "ReadSchema" in p18 else ("content#" not in p18)
    print(f"[18] warc scan: kernel stage={has_map}, binaryFile content pruned={content_pruned}")
    if not has_map or not content_pruned:
        failures.append("warc scan materializes shard bytes or lost its kernel stage")

    # 19) the H.264 decode stage keeps its EXPLICIT-count hash spread: a
    # tiny blob file fits one scan split, and without the explicit count
    # AQE coalesces the few-MB shuffle back into one decode task (both
    # failure modes measured; BENCH_NOTES r5 new-operator costs)
    from conflation_spark.datagen_text import ensure_h264_fixture
    from conflation_spark.operators.multimodal import extract_compressed_video_frames

    hd19 = ensure_h264_fixture("sf0.001")
    blobs19 = spark.read.parquet(f"{hd19}/h264_blobs.parquet")
    df19 = extract_compressed_video_frames(blobs19)
    p19 = df19._jdf.queryExecution().executedPlan().toString()
    has_kernel = "MapInPandas" in p19
    has_spread = "hashpartitioning(media_ref" in p19
    # explicit numPartitions shows in the exchange as REPARTITION_BY_NUM
    explicit_n = "REPARTITION_BY_NUM" in p19
    print(
        f"[19] h264 decode: kernel stage={has_kernel}, hash spread={has_spread}, "
        f"explicit count (AQE-proof)={explicit_n}"
    )
    if not has_kernel or not has_spread or not explicit_n:
        failures.append("h264 decode stage lost its explicit-count hash spread")

    # 20) PCA moments: the corpus scan must feed the per-partition moment
    # kernel DIRECTLY (no Exchange below the MapInPandas — vectors are
    # never shuffled), the tiny partial rows tree-reduce through a
    # map-side partial_sum, and the scan reads ONLY the vector column
    from conflation_spark.operators.pca import embedding_moments

    emb20 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df20 = embedding_moments(emb20, "embedding", 64)
    p20 = df20._jdf.queryExecution().executedPlan().toString()
    has_kernel20 = "MapInPandas" in p20
    below = p20.split("MapInPandas", 1)[1] if has_kernel20 else ""
    no_vec_shuffle = "Exchange" not in below
    partial20 = "partial_sum" in p20
    pruned20 = "ReadSchema" not in p20 or (
        "embedding" in p20.split("ReadSchema")[-1][:200]
        and "vec_id" not in p20.split("ReadSchema")[-1][:200]
    )
    print(
        f"[20] pca moments: kernel={has_kernel20}, vectors unshuffled={no_vec_shuffle}, "
        f"map-side partial agg={partial20}, vec-only scan={pruned20}"
    )
    if not (has_kernel20 and no_vec_shuffle and partial20 and pruned20):
        failures.append("pca moment reduction lost its scan-local kernel shape")

    # 21) text embedder: ONE shuffle total — the explicit repartition on
    # the doc id; both downstream groupBys (token counts, per-doc
    # collapse) must reuse hash(id) via rule-10 subset co-partitioning
    from conflation_spark.operators.embed import embed_documents, embedding_entries

    docs21 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df21 = embedding_entries(embed_documents(docs21, "doc_id", "text"), "doc_id")
    p21 = df21._jdf.queryExecution().executedPlan().toString()
    n_exch21 = p21.count("Exchange")
    # r6: the kernel moved from mapInPandas to mapInArrow (vectorized
    # segmented matmul) — accept either Python-eval node name
    has_kernel21 = ("MapInPandas" in p21) or ("MapInArrow" in p21)
    print(f"[21] embedder: exchanges={n_exch21} (want 1), kernel={has_kernel21}")
    if n_exch21 != 1 or not has_kernel21:
        failures.append("embedder lost its single-shuffle co-partitioned shape")

    # 22) triangle counting: every join must be an equi-join (the
    # degree-ordered wedge join hashes on src; the closing join hashes
    # on the (y, z) pair) — a nested-loop/cartesian here is the O(n^2)
    # trap the orientation exists to avoid
    from conflation_spark.operators.graph import triangle_count

    pairs22 = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d")], "id_a string, id_b string"
    )
    nodes22 = spark.createDataFrame([(v,) for v in "abcd"], "id string")
    p22 = (
        triangle_count(pairs22, nodes22)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    no_nlj = "BroadcastNestedLoopJoin" not in p22 and "CartesianProduct" not in p22
    print(f"[22] triangles: equi-joins only={no_nlj}")
    if not no_nlj:
        failures.append("triangle counting plans a nested-loop/cartesian join")

    if failures:
        print("\nFAILURES:")
        for f in failures:
            print(" -", f)
        sys.exit(1)
    print("\nAll plan properties hold.")


if __name__ == "__main__":
    main()
