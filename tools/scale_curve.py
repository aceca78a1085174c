"""Measured scaling curves: does each operator family actually scale?

SCALE.md argues posture; this tool MEASURES it.  Each representative
operator runs at 1x / 4x / 16x of sf0.1 input (copies are key-shifted so
join/group cardinalities scale linearly, and document text is per-copy
salted so near-dup structure stays per-copy instead of exploding across
copies), and the table reports wall seconds plus the fitted scaling
exponent e ~ log(t16/t1)/log(16) — e near 1.0 is linear, well under 1
means fixed overhead still dominates, well over 1 flags super-linear
cost that would bite at 100 TB.

Inputs are materialized to parquet under /tmp first so every run scans
real files (pushdown, split sizing) rather than in-memory unions.

Usage: python tools/scale_curve.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = (1, 4, 16)
WORK = "/tmp/scale_curve"


def _shifted(df, tbl: str, i: int):
    from pyspark.sql import functions as F

    if i == 0 and tbl != "documents":
        return df
    if tbl == "lineitem":
        # part/supp keys shift too: the co-occurrence / bipartite graphs
        # must grow as 16 DISJOINT copies (node count scales with rows,
        # like fresh data) — shifting only the basket key would densify
        # a fixed node set and fake a super-linear triangle curve
        return (
            df.withColumn("l_orderkey", F.col("l_orderkey") + i * 100_000_000)
            .withColumn("l_partkey", F.col("l_partkey") + i * 10_000_000)
            .withColumn("l_suppkey", F.col("l_suppkey") + i * 10_000_000)
        )
    if tbl == "orders":
        return df.withColumn(
            "o_orderkey", F.col("o_orderkey") + i * 100_000_000
        ).withColumn("o_custkey", F.col("o_custkey") + i * 10_000_000)
    if tbl == "customer":
        return df.withColumn(
            "c_custkey", F.col("c_custkey") + i * 10_000_000
        )
    if tbl == "events":
        return df.withColumn(
            "event_id", F.col("event_id") + i * 10_000_000_000
        ).withColumn("user_id", F.col("user_id") + i * 10_000_000)
    if tbl == "documents":
        # uniform per-copy word salt: preserves within-copy near-dup
        # structure, breaks cross-copy shingle overlap (so dup pairs
        # scale linearly with copies, as fresh data would)
        return df.withColumn(
            "doc_id", F.col("doc_id") + i * 10_000_000
        ).withColumn(
            "text", F.regexp_replace("text", " ", f" zq{i} ")
        )
    if tbl == "embeddings":
        # deterministic DIRECTIONAL perturbation per copy (a scalar
        # multiply would leave cosine identical and explode cross-copy
        # dup pairs): each component shifts by a hash-derived bump
        return df.withColumn(
            "vec_id", F.col("vec_id") + i * 10_000_000
        ).withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, j: (
                    x
                    + (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), F.lit(i), j), 200
                        ).cast("double")
                        - 100.0
                    )
                    / 40.0
                ).cast("float"),
            ),
        )
    raise ValueError(tbl)


def materialize(spark, sf_dir: str, tbl: str, copies: int) -> str:
    path = f"{WORK}/{tbl}_x{copies}"
    if os.path.exists(path):
        return path
    base = spark.read.parquet(f"{sf_dir}/{tbl}.parquet")
    out = _shifted(base, tbl, 0)
    for i in range(1, copies):
        out = out.unionByName(_shifted(base, tbl, i))
    out.write.mode("overwrite").parquet(path)
    return path


def ops(spark, sf_dir: str, copies: int):
    """name -> (n_input_rows, thunk building+running the op)."""
    from pyspark.sql import functions as F

    from netflix_data_ingestion_spark.operators.bursts import (
        cooldown_throttle,
    )
    from netflix_data_ingestion_spark.operators.dedup import (
        minhash_lsh_candidate_pairs,
    )
    from netflix_data_ingestion_spark.operators.keys import ntile_ranged

    from netflix_data_ingestion_spark.operators.curate import curate_corpus
    from netflix_data_ingestion_spark.operators.dedup import (
        cosine_near_dup_pairs_at_scale,
        exact_dedup,
    )

    li = spark.read.parquet(materialize(spark, sf_dir, "lineitem", copies))
    orders = spark.read.parquet(materialize(spark, sf_dir, "orders", copies))
    cust = spark.read.parquet(materialize(spark, sf_dir, "customer", copies))
    events = spark.read.parquet(materialize(spark, sf_dir, "events", copies))
    docs = spark.read.parquet(materialize(spark, sf_dir, "documents", copies))
    embs = spark.read.parquet(
        materialize(spark, sf_dir, "embeddings", copies)
    )

    def scan_agg():
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity"),
                F.sum("l_extendedprice"),
                F.avg("l_discount"),
                F.count("*"),
            )
            .collect()
        )

    def join_agg():
        return (
            orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*"), F.sum("o_totalprice"), F.max("o_orderdate"))
            .collect()
        )

    def sessionize():
        return (
            events.groupBy(
                F.session_window("ts", "30 minutes"), F.col("user_id")
            )
            .agg(F.count("*"), F.round(F.sum("value"), 2))
            .count()
        )

    def lsh_candidates():
        return minhash_lsh_candidate_pairs(
            docs, "doc_id", "text"
        ).count()

    def ntile():
        return ntile_ranged(
            cust.select("c_custkey", "c_acctbal"),
            [F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
            10,
            "decile",
        ).count()

    def cooldown():
        return cooldown_throttle(
            events, ["user_id", "event_type"], "ts", "event_id", 600
        ).count()

    def exact_dd():
        return exact_dedup(docs, "doc_id", "text").count()

    def dsir():
        # dsir_llr_weights shape (r10): one count pass (feature explode
        # partial-aggregated to <=256 bucket rows pre-exchange) + one
        # narrow map-literal score fold — expected ~linear in token
        # volume, parallelism-absorbed
        from netflix_data_ingestion_spark.operators.sample import (
            dsir_llr_weights,
        )
        from pyspark.sql import functions as F

        return dsir_llr_weights(
            docs, "doc_id", "text", F.col("lang") == F.lit("en")
        ).count()

    def cosine_dd():
        # the documented corpus-size knob: planes grows with log4(n) so
        # expected bucket occupancy stays constant — without it the
        # candidate join is quadratic in occupancy (measured: 16x at
        # fixed planes=6 runs 2x this, trending quadratic); threshold
        # 0.9 keeps the OUTPUT near-dup-sized (the clustered testdata
        # has quadratically many pairs at loose thresholds, which no
        # algorithm can emit in linear time)
        import math

        planes = 6 + int(math.log(copies, 4))
        return cosine_near_dup_pairs_at_scale(
            embs, "vec_id", "embedding", threshold=0.9, planes=planes
        ).count()

    def curate():
        # min_quality=0: the per-copy word salt shifts quality features
        # uniformly below the default gate, which would empty the
        # pipeline after stage 1 — the curve measures the FULL ladder
        # (gates -> LSH dedup -> CC -> quota -> packing), not gate
        # calibration on synthetic text
        return curate_corpus(docs, min_quality=0.0).count()

    def bpe():
        # tokenizer training: cost should be bounded by the VOCAB curve
        # (distinct pretokens saturate as copies grow — the per-copy
        # word salt adds some new types, but far fewer than 16x), so
        # the fitted exponent should sit well below 1.  num_merges=50:
        # since the r7 in-process merge loop, rounds cost zero Spark
        # jobs — the curve measures the one corpus pass + local loop,
        # which is the real-trainer workload shape
        from netflix_data_ingestion_spark.operators.bpetrain import (
            bpe_train,
        )

        return len(bpe_train(docs, "text", num_merges=50))

    def bpe_seg():
        # the r8 broadcast-model Arrow apply: train once, then ONE
        # mapInPandas over the corpus with the merge table in the
        # closure (memoized per distinct pretoken) — should be linear
        # in docs and flat in num_merges
        from netflix_data_ingestion_spark.operators.bpetrain import (
            bpe_segment,
            bpe_train,
        )

        merges = bpe_train(docs, "text", num_merges=50, min_pair_count=1)
        return (
            bpe_segment(docs, merges)
            .agg(F.sum("n_bpe_tokens"))
            .collect()
        )

    def gif_codec():
        # the r8 real-codec chain (multimodal_gif_frames shape):
        # synthesize an animated GIF per doc, LZW-decode + composite +
        # per-frame stats — two narrow Arrow stages, no shuffle;
        # should be linear in docs
        import numpy as np
        import pandas as pd

        from netflix_data_ingestion_spark.operators.gif import encode_gif
        from netflix_data_ingestion_spark.operators.multimodal import (
            gif_frame_stats,
        )

        gray = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)

        def synth(it):
            for pdf in it:
                ids, payloads = [], []
                for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                    t = text or ""
                    n = len(t)
                    did = int(doc_id)
                    frames = []
                    for f in range(1 + did % 3):
                        if n:
                            idx = [
                                ord(t[(f * 64 + i) % n]) % 256
                                for i in range(64)
                            ]
                        else:
                            idx = [0] * 64
                        frames.append(
                            np.array(idx, dtype=np.uint8).reshape(8, 8)
                        )
                    ids.append(doc_id)
                    payloads.append(bytes(encode_gif(frames, gray)))
                yield pd.DataFrame({"media_id": ids, "payload": payloads})

        media = docs.select("doc_id", "text").mapInPandas(
            synth, "media_id long, payload binary"
        )
        return gif_frame_stats(media).count()

    def _cooccur_edges():
        from netflix_data_ingestion_spark.operators.cooccur import (
            cooccurrence_pairs,
        )

        return cooccurrence_pairs(
            li, "l_orderkey", "l_partkey", min_support=2
        ).select("item_a", "item_b")

    def triangles():
        # part_triangle_counts shape: wedge enumeration via degree
        # orientation — the shuffle-heavy family; cost is wedge-bound,
        # so the exponent is the number that matters at 100x
        from netflix_data_ingestion_spark.operators.graph import (
            triangle_counts,
        )

        return triangle_counts(_cooccur_edges(), "item_a", "item_b").count()

    def kcore_peel():
        # part_kcore shape: 3 fixed peel rounds, each a degree groupBy
        # + semi-join back onto the shrinking edge set
        from netflix_data_ingestion_spark.operators.graph import kcore

        return kcore(
            _cooccur_edges(), "item_a", "item_b", k=3, rounds=3
        ).count()

    def pr():
        # customer_supplier_pagerank shape: 2 power-iteration rounds
        # over the bipartite order graph — per-round shuffle on edges
        from netflix_data_ingestion_spark.operators.graph import pagerank

        edges = orders.join(
            li, orders.o_orderkey == li.l_orderkey
        ).select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        return pagerank(edges, "src", "dst", iters=2).count()

    def mp4_codec():
        # the r9 ISO BMFF chain (multimodal_mp4_frames shape):
        # synthesize an MP4 per doc ('raw '-24 samples), demux through
        # the real stsd/stsz/stsc/stco tables + per-frame stats — two
        # narrow Arrow stages, no shuffle; should be linear in docs
        import numpy as np
        import pandas as pd

        from netflix_data_ingestion_spark.operators.mp4 import encode_mp4
        from netflix_data_ingestion_spark.operators.multimodal import (
            mp4_frame_stats,
        )

        def synth(it):
            for pdf in it:
                ids, payloads = [], []
                for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                    t = text or ""
                    n = len(t)
                    did = int(doc_id)
                    frames = []
                    for f in range(1 + did % 3):
                        if n:
                            cp = np.array(
                                [
                                    ord(t[(f * 64 + i) % n]) % 256
                                    for i in range(64)
                                ],
                                dtype=np.uint8,
                            )
                        else:
                            cp = np.zeros(64, dtype=np.uint8)
                        frames.append(
                            np.stack([cp.reshape(8, 8)] * 3, axis=2)
                        )
                    ids.append(doc_id)
                    payloads.append(bytes(encode_mp4(frames)))
                yield pd.DataFrame({"media_id": ids, "payload": payloads})

        media = docs.select("doc_id", "text").mapInPandas(
            synth, "media_id long, payload binary"
        )
        return mp4_frame_stats(media).count()

    def prefix_jaccard():
        # dedup_prefix_jaccard shape (the r9 bench swinger): exact
        # Jaccard >= 4/5 via rarest-first prefix filtering — cost is
        # token-volume-bound (prefix length grows with doc shingle
        # count), the production exact-dedup path a 100 TB corpus run
        # lives in; the per-copy word salt keeps cross-copy shingles
        # disjoint so candidate pairs scale linearly like fresh data
        from netflix_data_ingestion_spark.operators.dedup import (
            prefix_jaccard_pairs,
        )

        return prefix_jaccard_pairs(
            docs, "doc_id", "text", n=3, t_num=4, t_den=5
        ).count()

    def containment():
        # dedup_containment shape (the other r9 swinger): rare-shingle
        # blocking (df in [2,5]) + exact containment verify — blocking
        # cost tracks the df-band population, which the word salt keeps
        # per-copy
        from netflix_data_ingestion_spark.operators.dedup import (
            containment_pairs,
        )

        return containment_pairs(
            docs, "doc_id", "text", n=3, threshold=0.9, max_df=5
        ).count()

    def pack_chunks_op():
        # doc_pack_chunks shape: token sizing (narrow) + per-source
        # running prefix sum via prefix_sum_ranged — range-partitioned
        # partial sums + broadcast bases, never a single-task window;
        # should be linear in docs
        from netflix_data_ingestion_spark.operators.sample import (
            pack_chunks,
        )
        from netflix_data_ingestion_spark.operators.textstats import (
            tokens,
        )

        sized = docs.select(
            "doc_id",
            "source",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
        return pack_chunks(
            sized, "source", "doc_id", "n_tokens", budget=512
        ).count()

    def pack_windows_op():
        # doc_pack_windows shape: GPT-style cross-doc fixed-window
        # layout — global exclusive prefix sum (prefix_sum_ranged) +
        # integer span arithmetic + a window-id explode whose output is
        # token-volume-bound; should be linear in token volume
        from netflix_data_ingestion_spark.operators.packing import (
            pack_windows,
        )

        return pack_windows(docs, "doc_id", "text", window=16).count()

    def length_batches_op():
        # doc_length_batches shape: 64-wide length buckets, md5-shuffled
        # in-bucket rank via the DISTRIBUTED prefix_sum_ranged (broadcast
        # bucket bases) — a hot bucket cannot concentrate a sort
        from netflix_data_ingestion_spark.operators.context import (
            length_bucket_batches,
        )

        return length_bucket_batches(docs).count()

    def training_export_op():
        # the capstone chain a real pretraining run lives in: curate
        # ladder -> re-attach text -> length-sorted balanced shards +
        # JSONL + order-invariant digest.  min_quality=0.0 for the same
        # reason as curate_corpus above; rows_per_file scales with
        # copies so shard COUNT (a layout choice) stays fixed while
        # shard size grows — the 100 TB posture is fixed shard size /
        # growing count, but here a fixed count isolates the chain's
        # compute from tiny-file listing overhead
        import shutil as _sh

        from netflix_data_ingestion_spark.training_export import (
            export_training_data,
        )

        sf_link = f"{WORK}/export_sf_x{copies}"
        os.makedirs(sf_link, exist_ok=True)
        link = os.path.join(sf_link, "documents.parquet")
        if not os.path.exists(link):
            os.symlink(
                os.path.abspath(f"{WORK}/documents_x{copies}"), link
            )
        out = f"{WORK}/export_out_x{copies}"
        _sh.rmtree(out, ignore_errors=True)
        m = export_training_data(
            spark,
            sf_link,
            out,
            target_rows_per_file=200 * copies,
            min_quality=0.0,
        )
        return m["n_curated"]

    def skew():
        # the r6 rewrite: top-k via global_rank over the per-key counts
        # frame — one keyed groupBy over the fact plus rank machinery
        # over |distinct keys| rows; should stay linear
        from netflix_data_ingestion_spark.operators.profile import (
            skew_report,
        )

        return skew_report(li, ["l_orderkey"], top=10).count()

    def _stream_sf() -> str:
        # the streaming contract rows take an sf_dir and read
        # {sf_dir}/events.parquet — hand them a dir whose events.parquet
        # symlinks the scaled copy (training_export's trick)
        sf_link = f"{WORK}/stream_sf_x{copies}"
        os.makedirs(sf_link, exist_ok=True)
        link = os.path.join(sf_link, "events.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.abspath(f"{WORK}/events_x{copies}"), link)
        return sf_link

    # The r12 rotation family: the streaming rows' cost model is
    # ASSERTED to be fixed machinery (query startup, Python state
    # workers, memory-sink drain) + a linear data term — these cases
    # measure it.  Expected: exponent well under 1 at these sizes
    # (startup dominates); any super-linear STATE growth (the throttle
    # row keys state per (user, day), which scales with copies) is a
    # real finding.

    def stream_tumbling():
        from netflix_data_ingestion_spark.plans.contract_llm import (
            q_events_tumbling_window_stream,
        )

        return q_events_tumbling_window_stream(spark, _stream_sf()).count()

    def stream_sliding():
        from netflix_data_ingestion_spark.plans.contract_llm import (
            q_events_sliding_window_stream,
        )

        return q_events_sliding_window_stream(spark, _stream_sf()).count()

    def stream_throttle():
        from netflix_data_ingestion_spark.plans.contract_llm import (
            q_events_throttled_daily_stream,
        )

        return q_events_throttled_daily_stream(spark, _stream_sf()).count()

    def unigram_tr():
        # expected: the corpus word-count pass is the only data-sized
        # term (linear, parallelism-absorbed); candidates/E-step run on
        # the DISTINCT-word frame, which the per-copy salt grows only
        # by one zq{i} token per copy — near-flat
        from netflix_data_ingestion_spark.operators.unigram import (
            unigram_train,
        )

        return unigram_train(docs).count()

    def unigram_seg():
        # expected: ~linear — one corpus Arrow pass; the DP memo keys
        # on distinct words, so per-row cost is a dict hit
        from netflix_data_ingestion_spark.operators.unigram import (
            unigram_seed_scores,
            unigram_segment,
        )

        score = unigram_seed_scores(docs)
        return unigram_segment(docs, score).count()

    return {
        "scan_agg(lineitem)": (copies * 600_000, scan_agg),
        "join_agg(orders*cust)": (copies * 150_000, join_agg),
        "session_window(events)": (copies * 100_000, sessionize),
        "minhash_lsh(documents)": (copies * 5_000, lsh_candidates),
        "ntile_ranged(customer)": (copies * 15_000, ntile),
        "cooldown_throttle(events)": (copies * 100_000, cooldown),
        "exact_dedup(documents)": (copies * 5_000, exact_dd),
        "dsir_llr(documents)": (copies * 5_000, dsir),
        "prefix_jaccard(documents)": (copies * 5_000, prefix_jaccard),
        "containment(documents)": (copies * 5_000, containment),
        "cosine_lsh_dedup(embeddings)": (copies * 2_000, cosine_dd),
        "curate_corpus(documents)": (copies * 5_000, curate),
        "pack_chunks(documents)": (copies * 5_000, pack_chunks_op),
        "pack_windows(documents)": (copies * 5_000, pack_windows_op),
        "length_batches(documents)": (copies * 5_000, length_batches_op),
        "training_export(documents)": (copies * 5_000, training_export_op),
        "bpe_train(documents)": (copies * 5_000, bpe),
        "bpe_segment(documents)": (copies * 5_000, bpe_seg),
        "unigram_train(documents)": (copies * 5_000, unigram_tr),
        "unigram_segment(documents)": (copies * 5_000, unigram_seg),
        "gif_codec(documents)": (copies * 5_000, gif_codec),
        "mp4_codec(documents)": (copies * 5_000, mp4_codec),
        "skew_report(lineitem)": (copies * 600_000, skew),
        "stream_tumbling(events)": (copies * 100_000, stream_tumbling),
        "stream_sliding(events)": (copies * 100_000, stream_sliding),
        "stream_throttle(events)": (copies * 100_000, stream_throttle),
        "triangle_counts(lineitem)": (copies * 600_000, triangles),
        "kcore(lineitem)": (copies * 600_000, kcore_peel),
        "pagerank(orders*lineitem)": (copies * 600_000, pr),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_curve.json"

    from netflix_data_ingestion_spark.session import build_session

    spark = build_session(app_name="scale-curve")
    shutil.rmtree(WORK, ignore_errors=True)

    only = [
        s for s in os.environ.get("SCALE_FAMILIES", "").split(",") if s
    ]
    results: dict[str, dict] = {}
    for copies in SCALES:
        for name, (n, thunk) in ops(spark, sf_dir, copies).items():
            if only and not any(s in name for s in only):
                continue
            # warm-up once at the smallest scale so JIT/codegen cold cost
            # doesn't masquerade as the 1x time
            if copies == SCALES[0]:
                thunk()
            t0 = time.time()
            thunk()
            dt = time.time() - t0
            results.setdefault(name, {"rows": {}, "sec": {}})
            results[name]["rows"][copies] = n
            results[name]["sec"][copies] = round(dt, 2)
            spark.catalog.clearCache()
        print(f"--- {copies}x done", flush=True)

    lo, hi = SCALES[0], SCALES[-1]
    print(f"\n{'operator':28s} " + " ".join(f"{c:>7}x" for c in SCALES) + "   exp")
    for name, r in results.items():
        t1, tn = r["sec"][lo], r["sec"][hi]
        e = math.log(max(tn, 1e-3) / max(t1, 1e-3)) / math.log(hi / lo)
        r["exponent"] = round(e, 2)
        print(
            f"{name:28s} "
            + " ".join(f"{r['sec'][c]:7.2f}" for c in SCALES)
            + f"  {e:5.2f}"
        )
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"\nwrote {out_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
