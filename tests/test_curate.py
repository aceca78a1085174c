"""End-to-end corpus curation (operators/curate.py)."""

from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators.curate import curate_corpus


BASE = (
    "the quick brown fox jumps over the lazy dog and the cat sat on "
    "the mat while the sun was up and the day was long "
)


def _docs(spark):
    rows = []
    # 12 high-quality English docs in one source (cap will bite at 10)
    for i in range(12):
        rows.append((i, BASE + f"unique tail number {i} closes it", "en", "srcA"))
    # a near-duplicate of doc 0 — must be dropped by the cluster keep
    rows.append((100, BASE + "unique tail number 0 closes it", "en", "srcB"))
    # wrong language — dropped by the metadata gate
    rows.append((101, BASE + "mais en francais cette fois", "fr", "srcB"))
    # low quality (symbol soup) — dropped by the quality gate
    rows.append((102, "@@@@ #### $$$$ %%%% ^^^^ &&&& " * 10, "en", "srcB"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_curate_all_stages_bind(spark):
    out = curate_corpus(
        _docs(spark),
        min_quality=0.3,
        dedup_threshold=0.8,
        cap=10,
        budget=64,
    )
    rows = out.collect()
    ids = {r["doc_id"] for r in rows}
    assert 101 not in ids  # lang gate
    assert 102 not in ids  # quality gate
    # dedup keep: doc 100 duplicates doc 0; exactly one of the pair survives
    assert (0 in ids) != (100 in ids)
    # quota: at most 10 docs from srcA
    assert sum(1 for r in rows if r["source"] == "srcA") <= 10
    # packing invariants: offsets inside the budget, chunk ids start at 0
    assert all(0 <= r["chunk_offset"] < 64 for r in rows)
    assert min(r["chunk_id"] for r in rows) == 0
    # chunks are filled in doc order per source: ids nondecreasing
    per_src = {}
    for r in sorted(rows, key=lambda r: (r["source"], r["doc_id"])):
        per_src.setdefault(r["source"], []).append(r["chunk_id"])
    for chunks in per_src.values():
        assert chunks == sorted(chunks)


def test_curate_dedup_knobs_plumb_through(spark):
    """Non-default LSH settings (more hashes, finer bands) must still
    catch the near-dup pair and preserve the ladder's other gates."""
    out = curate_corpus(
        _docs(spark),
        min_quality=0.3,
        dedup_threshold=0.7,
        cap=10,
        budget=64,
        ngram=2,
        num_hashes=24,
        bands=8,
    )
    rows = out.collect()
    ids = {r["doc_id"] for r in rows}
    assert 101 not in ids and 102 not in ids
    # 3-hash bands at threshold 0.7 still bucket the 0/100 near-dup pair
    assert (0 in ids) != (100 in ids)
    assert sum(1 for r in rows if r["source"] == "srcA") <= 10
