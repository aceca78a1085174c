"""Driver-contract queries: beyond-reference LLM-pipeline operators.

Dedup, similarity search, text analysis, multimodal metadata, and
event-time windowing over the testdata ``documents`` / ``embeddings`` /
``events`` tables (BASELINE.json north star).  Same parity discipline as
plans/contract.py; every hash both engines compute is md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.functions import vectors
from netflix_data_ingestion_spark.operators import (
    curate,
    dedup,
    graph,
    kmeans,
    redact,
    similarity,
    textstats,
)
from netflix_data_ingestion_spark.operators.util import ensure_parallelism
from netflix_data_ingestion_spark.operators.multimodal import (
    attach_binary_payload,
    media_metadata,
)
from netflix_data_ingestion_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _stream_partitions(spark: SparkSession, src_path: str) -> int:
    """Size-derived state/shuffle partition count for a stateful
    streaming row (streaming.ingest.sized_stream_shuffle_partitions):
    state-store open+commit cost is paid per partition per micro-batch
    and is NOT AQE-coalescible, so the count follows the decoded input
    volume (64 MB advisory target), clamped to [1, 3x session
    parallelism] — small at bench scale, cluster-saturating at 100 TB."""
    from netflix_data_ingestion_spark.streaming.ingest import (
        path_bytes,
        sized_stream_shuffle_partitions,
    )

    return sized_stream_shuffle_partitions(spark, path_bytes(src_path))


# shared DuckDB CTE: tokenized + shingled documents (n=3)
_DUCK_TOKS = """
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS tk
  FROM documents
)
"""

_DUCK_SHINGLES = (
    _DUCK_TOKS
    + """,
sh AS (
  SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS shingle
  FROM toks, unnest(range(1, len(tk) - 1)) AS u(i)
)
"""
)


# ---------------------------------------------------------------------------
# Dedup: exact
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "doc_id", "text").orderBy("doc_id")


ORACLE_DEDUP_EXACT = """
WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
g AS (SELECT content_hash, MIN(doc_id) AS canonical_id,
             COUNT(*) AS group_size
      FROM h GROUP BY 1)
SELECT h.doc_id, h.content_hash, g.canonical_id, g.group_size
FROM h JOIN g USING (content_hash)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Dedup: exact pairwise n-gram Jaccard (threshold 0.8)
# ---------------------------------------------------------------------------


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8
    ).orderBy("id_a", "id_b")


ORACLE_DEDUP_NGRAM = f"""
WITH {_DUCK_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS intersection
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, intersection,
       intersection::DOUBLE /
       (sa.n_shingles + sb.n_shingles - intersection)::DOUBLE AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE intersection::DOUBLE /
      (sa.n_shingles + sb.n_shingles - intersection) >= 0.8
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# Dedup: MinHash + LSH candidate pairs (16 hashes, 4 bands)
# ---------------------------------------------------------------------------


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_candidate_pairs(
        docs, "doc_id", "text", n=3, num_hashes=16, bands=4
    ).orderBy("id_a", "id_b")


ORACLE_DEDUP_MINHASH = f"""
WITH {_DUCK_SHINGLES},
hashed AS (
  SELECT doc_id, seed,
         md5(seed::VARCHAR || '|' || shingle) AS h
  FROM sh, unnest(range(0, 4)) AS s(seed)
),
bandt AS (
  SELECT doc_id, seed AS band,
         md5(concat_ws('|', MIN(substr(h, 1, 8)), MIN(substr(h, 9, 8)),
                       MIN(substr(h, 17, 8)), MIN(substr(h, 25, 8))))
           AS band_key
  FROM hashed GROUP BY 1, 2
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bandt a JOIN bandt b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
"""


def q_doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/textstats.dup_spans: maximal token runs (5-grams,
    md5-keyed) appearing verbatim in >= 2 distinct documents — the
    exact-substring dedup signal; overlapping/abutting runs fold into
    spans via the gaps-and-islands interval union."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.dup_spans(
        docs, "doc_id", "text", n=5, min_docs=2
    ).orderBy("doc_id", "span_start")


ORACLE_DUP_SPANS = f"""
WITH {_DUCK_TOKS},
grams AS (
  SELECT doc_id, (i - 1)::BIGINT AS pos,
         md5(array_to_string(tk[i:i+4], ' ')) AS g
  FROM toks, unnest(range(1, len(tk) - 3)) AS u(i)
),
dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, pos, pos + 5 AS e FROM grams JOIN dup USING (g)),
flagged AS (
  SELECT doc_id, pos, e,
         CASE WHEN MAX(e) OVER (PARTITION BY doc_id ORDER BY pos, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) IS NULL
                   OR pos > MAX(e) OVER (PARTITION BY doc_id ORDER BY pos, e
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS brk
  FROM hits
),
isl AS (
  SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos, e
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT doc_id, MIN(pos)::BIGINT AS span_start,
       (MAX(e) - 1)::BIGINT AS span_end,
       (MAX(e) - MIN(pos))::BIGINT AS span_tokens
FROM isl GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""


def q_doc_span_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/textstats.remove_dup_spans: the span-CUT curation
    action — cross-doc duplicated 5-gram runs removed, survivors
    rejoined in the canonical token form; docs cut to nothing emit ''
    with their full token count removed."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.remove_dup_spans(
        docs, "doc_id", "text", n=5, min_docs=2
    ).orderBy("doc_id")


ORACLE_SPAN_CUT = f"""
WITH {_DUCK_TOKS},
grams AS (
  SELECT doc_id, (i - 1)::BIGINT AS pos,
         md5(array_to_string(tk[i:i+4], ' ')) AS g
  FROM toks, unnest(range(1, len(tk) - 3)) AS u(i)
),
dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, pos, pos + 5 AS e FROM grams JOIN dup USING (g)),
flagged AS (
  SELECT doc_id, pos, e,
         CASE WHEN MAX(e) OVER (PARTITION BY doc_id ORDER BY pos, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) IS NULL
                   OR pos > MAX(e) OVER (PARTITION BY doc_id ORDER BY pos, e
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS brk
  FROM hits
),
isl AS (
  SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos, e
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(e) - 1 AS e2
  FROM isl GROUP BY doc_id, island
),
cover AS (
  SELECT DISTINCT doc_id, u.p AS pos
  FROM spans, unnest(range(s, e2 + 1)) AS u(p)
),
tpos AS (
  SELECT doc_id, (i - 1)::BIGINT AS pos, tk[i] AS tok
  FROM toks, unnest(range(1, len(tk) + 1)) AS u(i)
),
kept AS (
  SELECT t.doc_id, t.pos, t.tok FROM tpos t
  WHERE NOT EXISTS (SELECT 1 FROM cover c
                    WHERE c.doc_id = t.doc_id AND c.pos = t.pos)
),
clean AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         COUNT(*) AS kept_n
  FROM kept GROUP BY doc_id
),
base AS (SELECT doc_id, len(tk)::BIGINT AS orig_n FROM toks)
SELECT b.doc_id, coalesce(c.clean_text, '') AS clean_text,
       (b.orig_n - coalesce(c.kept_n, 0))::BIGINT AS n_tokens_removed
FROM base b LEFT JOIN clean c USING (doc_id)
ORDER BY doc_id
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.incremental_near_dup_candidates: the daily-ingest
    dedup — every 10th document plays the NEW batch, the rest the
    persisted band snapshot; only the batch is shingled/banded, then
    probed against the snapshot.  md5 minhash determinism means the
    result must equal the FULL-corpus LSH pair set restricted to pairs
    touching the batch — which is exactly what the oracle computes, so
    the O(batch) path is held to the O(corpus) path's answer."""
    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    snapshot = dedup.minhash_band_table(
        old, "doc_id", "text", n=3, num_hashes=16, bands=4
    )
    pairs, _ = dedup.incremental_near_dup_candidates(
        new, snapshot, "doc_id", "text", n=3, num_hashes=16, bands=4
    )
    return pairs.orderBy("id_a", "id_b")


ORACLE_DEDUP_INCREMENTAL = f"""
WITH {_DUCK_SHINGLES},
hashed AS (
  SELECT doc_id, seed,
         md5(seed::VARCHAR || '|' || shingle) AS h
  FROM sh, unnest(range(0, 4)) AS s(seed)
),
bandt AS (
  SELECT doc_id, seed AS band,
         md5(concat_ws('|', MIN(substr(h, 1, 8)), MIN(substr(h, 9, 8)),
                       MIN(substr(h, 17, 8)), MIN(substr(h, 25, 8))))
           AS band_key
  FROM hashed GROUP BY 1, 2
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bandt a JOIN bandt b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# Dedup: composed scale path — LSH candidates -> exact Jaccard verify
# ---------------------------------------------------------------------------


def q_dedup_near_dup_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production 100 TB dedup path (operators/dedup.py
    near_dup_pairs_at_scale): MinHash-LSH candidate generation followed by
    exact Jaccard verification on candidates only — O(candidates) verify
    work instead of the all-pairs quadratic audit form."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.near_dup_pairs_at_scale(
        docs, "doc_id", "text", n=3, threshold=0.8, num_hashes=16, bands=4
    ).orderBy("id_a", "id_b")


# candidates = the dedup_minhash_lsh banding CTE; verify = list_intersect
# over per-doc DISTINCT shingle lists (mirrors Spark's array_intersect on
# array_distinct shingle arrays — both sides deduplicate before counting)
ORACLE_DEDUP_NEAR_DUP_SCALE = f"""
WITH {_DUCK_SHINGLES},
hashed AS (
  SELECT doc_id, seed,
         md5(seed::VARCHAR || '|' || shingle) AS h
  FROM sh, unnest(range(0, 4)) AS s(seed)
),
bandt AS (
  SELECT doc_id, seed AS band,
         md5(concat_ws('|', MIN(substr(h, 1, 8)), MIN(substr(h, 9, 8)),
                       MIN(substr(h, 17, 8)), MIN(substr(h, 25, 8))))
           AS band_key
  FROM hashed GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandt a JOIN bandt b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
arrs AS (
  SELECT doc_id, list(shingle) AS arr, COUNT(*) AS n_shingles
  FROM sh GROUP BY 1
),
verified AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(sa.arr, sb.arr))::BIGINT AS intersection,
         sa.n_shingles + sb.n_shingles AS size_sum
  FROM cand c
  JOIN arrs sa ON sa.doc_id = c.id_a
  JOIN arrs sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, intersection,
       intersection::DOUBLE / (size_sum - intersection)::DOUBLE AS jaccard
FROM verified
WHERE intersection::DOUBLE / (size_sum - intersection) >= 0.8
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# Dedup: cluster assembly (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup clustering (operators/graph.dedup_clusters): LSH near-dup
    pairs -> iterative min-label connected components (pointer jumping) ->
    one canonical doc per cluster.  The oracle reproduces the iterative
    algorithm's fixpoint with a recursive-CTE reachability flood — both
    converge to component = MIN doc_id, so the hash check covers a
    genuinely iterative Spark algorithm."""
    docs = _t(spark, sf_dir, "documents")
    return graph.dedup_clusters(
        docs, "doc_id", "text", n=3, threshold=0.8, num_hashes=16, bands=4
    ).orderBy("doc_id")


# pairs = the dedup_near_dup_scale CTE chain verbatim; components via
# recursive min-label reachability (reach(u) = labels of every node that
# can reach u; MIN over that set = component minimum = Spark's fixpoint)
ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_DUCK_SHINGLES},
hashed AS (
  SELECT doc_id, seed,
         md5(seed::VARCHAR || '|' || shingle) AS h
  FROM sh, unnest(range(0, 4)) AS s(seed)
),
bandt AS (
  SELECT doc_id, seed AS band,
         md5(concat_ws('|', MIN(substr(h, 1, 8)), MIN(substr(h, 9, 8)),
                       MIN(substr(h, 17, 8)), MIN(substr(h, 25, 8))))
           AS band_key
  FROM hashed GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandt a JOIN bandt b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
arrs AS (
  SELECT doc_id, list(shingle) AS arr, COUNT(*) AS n_shingles
  FROM sh GROUP BY 1
),
verified AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(sa.arr, sb.arr))::BIGINT AS intersection,
         sa.n_shingles + sb.n_shingles AS size_sum
  FROM cand c
  JOIN arrs sa ON sa.doc_id = c.id_a
  JOIN arrs sb ON sb.doc_id = c.id_b
),
pairs AS (
  SELECT id_a, id_b FROM verified
  WHERE intersection::DOUBLE / (size_sum - intersection) >= 0.8
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.node = e.v
),
comp AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
),
sizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1
)
SELECT c.doc_id, c.cluster_id, s.cluster_size,
       c.doc_id = c.cluster_id AS keep
FROM comp c JOIN sizes s USING (cluster_id)
ORDER BY c.doc_id
"""


# ---------------------------------------------------------------------------
# Dedup: SimHash 64-bit fingerprints
# ---------------------------------------------------------------------------


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id", "text").orderBy("doc_id")


ORACLE_DEDUP_SIMHASH = f"""
WITH {_DUCK_TOKS},
tok AS (SELECT doc_id, unnest(tk) AS token FROM toks),
counted AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
hashed AS (SELECT doc_id, cnt, substr(md5(token), 1, 16) AS h FROM counted),
pos AS (
  SELECT doc_id, cnt, i,
         strpos('0123456789abcdef', substr(h, i, 1)) - 1 AS d
  FROM hashed, unnest(range(1, 17)) AS u(i)
),
sums AS (
  SELECT doc_id, i,
         SUM(cnt * (2 * ((d // 1) % 2) - 1)) AS s0,
         SUM(cnt * (2 * ((d // 2) % 2) - 1)) AS s1,
         SUM(cnt * (2 * ((d // 4) % 2) - 1)) AS s2,
         SUM(cnt * (2 * ((d // 8) % 2) - 1)) AS s3
  FROM pos GROUP BY 1, 2
),
digits AS (
  SELECT doc_id, i,
         (s3 > 0)::INT * 8 + (s2 > 0)::INT * 4 +
         (s1 > 0)::INT * 2 + (s0 > 0)::INT AS v
  FROM sums
)
SELECT doc_id,
       string_agg(substr('0123456789abcdef', v + 1, 1), '' ORDER BY i)
         AS simhash64
FROM digits GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Similarity: brute-force cosine top-10 for query vectors (vec_id < 5)
# ---------------------------------------------------------------------------

_DUCK_DOT = (
    "list_sum(list_transform(range(1, len({a}.embedding) + 1), "
    "i -> {a}.embedding[i]::DOUBLE * {b}.embedding[i]::DOUBLE))"
)

_DUCK_COSINE_SCORED = f"""
q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND({_DUCK_DOT.format(a='q', b='e')} /
               (sqrt({_DUCK_DOT.format(a='q', b='q')}) *
                sqrt({_DUCK_DOT.format(a='e', b='e')})), 6) AS cosine_sim
  FROM q, embeddings e
  WHERE q.vec_id <> e.vec_id
)
"""


def q_embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding")
    return similarity.brute_force_topk(
        emb.select("vec_id", "embedding"), queries, k=10
    ).orderBy("query_id", "neighbor_id")


ORACLE_COSINE_TOPK = f"""
WITH {_DUCK_COSINE_SCORED},
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM pairs
)
SELECT query_id, neighbor_id, cosine_sim
FROM ranked WHERE rn <= 10
ORDER BY query_id, neighbor_id
"""


# ---------------------------------------------------------------------------
# Similarity: LSH-bucketed approximate top-10 (scale path)
# ---------------------------------------------------------------------------


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)
    # dim=64 (the testdata embedding width) precomputes the hyperplane
    # components driver-side, so the runtime plan has no md5 at all —
    # just a literal-array fold per plane.
    return similarity.lsh_topk(emb, queries, k=10, planes=8, dim=64).orderBy(
        "query_id", "neighbor_id"
    )


ORACLE_ANN_LSH = f"""
WITH pos AS (
  SELECT vec_id, i::VARCHAR AS dim, embedding[i]::DOUBLE AS x,
         p::VARCHAR AS plane, p AS plane0
  FROM embeddings,
       unnest(range(1, len(embedding) + 1)) AS r(i),
       unnest(range(1, 9)) AS pr(p)
),
proj AS (
  SELECT vec_id, plane0,
         SUM(x * (strpos('0123456789abcdef',
                         substr(md5(plane || ':' || dim), 1, 1)) - 1 - 7.5))
           AS s
  FROM pos GROUP BY 1, 2
),
buckets AS (
  SELECT vec_id,
         string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
                    ORDER BY plane0) AS bucket
  FROM proj GROUP BY 1
),
q AS (SELECT e.vec_id, e.embedding, b.bucket
      FROM embeddings e JOIN buckets b USING (vec_id) WHERE e.vec_id < 5),
c AS (SELECT e.vec_id, e.embedding, b.bucket
      FROM embeddings e JOIN buckets b USING (vec_id)),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({_DUCK_DOT.format(a='q', b='c')} /
               (sqrt({_DUCK_DOT.format(a='q', b='q')}) *
                sqrt({_DUCK_DOT.format(a='c', b='c')})), 6) AS cosine_sim
  FROM q JOIN c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM pairs
)
SELECT query_id, neighbor_id, cosine_sim
FROM ranked WHERE rn <= 10
ORDER BY query_id, neighbor_id
"""


# ---------------------------------------------------------------------------
# Dedup: embedding-cosine near-dup pairs (semantic dedup)
# ---------------------------------------------------------------------------


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return dedup.cosine_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4
    ).orderBy("id_a", "id_b")


ORACLE_DEDUP_COSINE = f"""
WITH sides AS (
  SELECT vec_id, embedding,
         sqrt({_DUCK_DOT.format(a='embeddings', b='embeddings')}) AS nrm
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND({_DUCK_DOT.format(a='a', b='b')} / (a.nrm * b.nrm), 6)
           AS cosine_sim
  FROM sides a JOIN sides b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine_sim FROM pairs
WHERE cosine_sim >= 0.4
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# Dedup: embedding-cosine scale path (multi-table LSH -> verify)
# ---------------------------------------------------------------------------


def q_dedup_cosine_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production semantic-dedup path (operators/dedup.py
    cosine_near_dup_pairs_at_scale): OR-amplified multi-table hyperplane
    LSH candidates, exact JVM-side cosine verify — no driver collect,
    unlike the all-pairs audit twin `dedup_embedding_cosine`."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = dedup.cosine_near_dup_pairs_at_scale(
        emb, "vec_id", "embedding", threshold=0.4, planes=6, tables=8, dim=64
    )
    # deterministic order WITHOUT a global orderBy: the range-partitioner's
    # sampling pass would re-run the post-shuffle tail (the Arrow scorer
    # over ~250k candidate pairs — measured +2.3s at sf0.1); the result is
    # a few hundred rows, so shuffle them to one partition and sort there.
    return out.repartition(1).sortWithinPartitions("id_a", "id_b")


# buckets mirror similarity.bucket_expr with plane ids t*6+1..t*6+6 per
# table t in 0..7: component(plane, d) = first-hex-digit(md5(plane:d)) - 7.5
ORACLE_DEDUP_COSINE_SCALE = f"""
WITH pos AS (
  SELECT vec_id, i::VARCHAR AS dim, embedding[i]::DOUBLE AS x, p AS plane0
  FROM embeddings,
       unnest(range(1, len(embedding) + 1)) AS r(i),
       unnest(range(1, 49)) AS pr(p)
),
proj AS (
  SELECT vec_id, (plane0 - 1) // 6 AS tbl, plane0,
         SUM(x * (strpos('0123456789abcdef',
                         substr(md5(plane0::VARCHAR || ':' || dim), 1, 1))
                  - 1 - 7.5)) AS s
  FROM pos GROUP BY 1, 2, 3
),
buckets AS (
  SELECT vec_id, tbl,
         string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
                    ORDER BY plane0) AS bucket
  FROM proj GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
sides AS (
  SELECT vec_id, embedding,
         sqrt({_DUCK_DOT.format(a='embeddings', b='embeddings')}) AS nrm
  FROM embeddings
),
scored AS (
  SELECT c.id_a, c.id_b,
         ROUND({_DUCK_DOT.format(a='a', b='b')} / (a.nrm * b.nrm), 6)
           AS cosine_sim
  FROM cand c
  JOIN sides a ON a.vec_id = c.id_a
  JOIN sides b ON b.vec_id = c.id_b
)
SELECT id_a, id_b, cosine_sim FROM scored
WHERE cosine_sim >= 0.4
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# Similarity: IVF approximate top-10 (coarse-quantizer scale path)
# ---------------------------------------------------------------------------


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/similarity.ivf_topk with the TRAINED coarse quantizer
    (the default): fixed-point Lloyd's k-means (2 rounds, nlist=16) over
    a deterministic 1/4 md5 training sample trains the centroids,
    per-cluster fixed-point means become the centroid vectors, then the
    standard probe/assign/score machinery over the FULL corpus.  The
    oracle unrolls the identical sample + training loop in SQL
    (_ivf_trained_oracle), so the whole sample->train->quantize->probe
    chain is hash-checked end-to-end."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.ivf_topk(
        emb, queries, k=10, nlist=16, nprobe=4, train_sample=0.25
    ).orderBy("query_id", "neighbor_id")


_DUCK_DOT_EC = (
    "list_sum(list_transform(range(1, len({e}.embedding) + 1), "
    "i -> {e}.embedding[i]::DOUBLE * {c}.centroid[i]::DOUBLE))"
)
_DUCK_DOT_CC = (
    "list_sum(list_transform(range(1, len({c}.centroid) + 1), "
    "i -> {c}.centroid[i]::DOUBLE * {c}.centroid[i]::DOUBLE))"
)

# ORACLE_ANN_IVF is built by _ivf_trained_oracle() below (after the shared
# k-means CTE-chain helper it composes with is defined).


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return textstats.token_stats(docs, "doc_id", "text").orderBy("doc_id")


ORACLE_TOKEN_STATS = f"""
WITH {_DUCK_TOKS}
SELECT d.doc_id,
       len(t.tk)::BIGINT AS n_tokens,
       length(d.text)::BIGINT AS n_chars,
       list_sum(list_transform(t.tk, x -> length(x)))::DOUBLE
             / len(t.tk)::DOUBLE AS avg_token_len
FROM documents d JOIN toks t USING (doc_id)
ORDER BY doc_id
"""


def q_doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return textstats.quality_score(docs, "doc_id", "text").orderBy("doc_id")


_STOP_LIST_SQL = ", ".join(f"'{s}'" for s in textstats.STOPWORDS_EN)

ORACLE_QUALITY = f"""
WITH {_DUCK_TOKS},
base AS (
  SELECT d.doc_id,
         length(d.text)::BIGINT AS n,
         length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))::BIGINT AS alpha,
         length(regexp_replace(d.text, '[^0-9]', '', 'g'))::BIGINT AS digit,
         length(regexp_replace(d.text, '[^ ]', '', 'g'))::BIGINT AS space,
         len(t.tk)::BIGINT AS n_tokens,
         len(list_filter(t.tk, x -> x IN ({_STOP_LIST_SQL})))::BIGINT AS n_stop
  FROM documents d JOIN toks t USING (doc_id)
)
SELECT doc_id,
       alpha::DOUBLE / n::DOUBLE AS alpha_ratio,
       (n - alpha - digit - space)::DOUBLE / n::DOUBLE AS special_ratio,
       n_stop::DOUBLE / n_tokens::DOUBLE AS stopword_ratio,
       (4 * alpha * n_tokens + 3 * n_stop * n +
        3 * n_tokens * (n - (n - alpha - digit - space)))::DOUBLE
         / (10 * n * n_tokens)::DOUBLE AS quality_score
FROM base
ORDER BY doc_id
"""


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return textstats.lang_id(docs, "doc_id", "text").orderBy("doc_id")


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in textstats.LEXICON[lang])
    return f"len(list_filter(tk, x -> x IN ({words})))"


_LANG_CASES = " ".join(
    # argmax with lang-asc tie-break, mirroring array_min over (-hits, lang)
    f"WHEN {_lang_hits_sql(lang)} >= GREATEST("
    + ", ".join(_lang_hits_sql(o) for o in sorted(textstats.LEXICON))
    + f") THEN '{lang}'"
    for lang in sorted(textstats.LEXICON)
)

ORACLE_LANG_ID = f"""
WITH {_DUCK_TOKS}
SELECT doc_id,
       CASE WHEN GREATEST({", ".join(_lang_hits_sql(o) for o in sorted(textstats.LEXICON))}) = 0
            THEN 'und'
            {_LANG_CASES}
       END AS predicted_lang
FROM toks
ORDER BY doc_id
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return textstats.winnow_fingerprint(
        docs, "doc_id", "text", n=3, window=4
    ).orderBy("doc_id")


ORACLE_FINGERPRINT = f"""
WITH {_DUCK_TOKS},
grams AS (
  SELECT doc_id, i AS pos, md5(array_to_string(tk[i:i+2], ' ')) AS h
  FROM toks, unnest(range(1, len(tk) - 1)) AS u(i)
),
wins AS (
  SELECT doc_id, pos,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS win_min,
         MAX(pos) OVER (PARTITION BY doc_id) AS max_pos
  FROM grams
),
mins AS (
  SELECT DISTINCT doc_id, win_min FROM wins WHERE pos <= max_pos - 3
)
SELECT doc_id, COUNT(*) AS n_fingerprints,
       md5(string_agg(win_min, '|' ORDER BY win_min)) AS fp_digest
FROM mins GROUP BY doc_id
ORDER BY doc_id
"""


def q_doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return textstats.tfidf_top_terms(docs, "doc_id", "text", k=3).orderBy(
        "doc_id", "rank"
    )


ORACLE_TFIDF = f"""
WITH {_DUCK_TOKS},
tok AS (SELECT doc_id, unnest(tk) AS term FROM toks),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         (tf.tf * n.n_docs)::DOUBLE / dfreq.df::DOUBLE AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
r AS (
  SELECT doc_id, term, tf, df, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS "rank"
  FROM scored
)
SELECT doc_id, term, tf, df, score, "rank"
FROM r WHERE "rank" <= 3
ORDER BY doc_id, "rank"
"""


def q_doc_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return textstats.repetition_ratio(docs, "doc_id", "text", n=3).orderBy(
        "doc_id"
    )


ORACLE_REPETITION = f"""
WITH {_DUCK_SHINGLES},
tot AS (
  SELECT doc_id, (len(tk) - 2)::BIGINT AS n_grams
  FROM toks WHERE len(tk) >= 3
),
dst AS (SELECT doc_id, COUNT(*)::BIGINT AS n_distinct_grams FROM sh GROUP BY 1)
SELECT t.doc_id, t.n_grams, d.n_distinct_grams,
       (t.n_grams - d.n_distinct_grams)::DOUBLE / t.n_grams::DOUBLE
         AS dup_ratio
FROM tot t JOIN dst d USING (doc_id)
ORDER BY doc_id
"""


def q_doc_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from netflix_data_ingestion_spark.operators.sample import quota_sample

    docs = _t(spark, sf_dir, "documents")
    return (
        quota_sample(docs, "source", "doc_id", cap=15, salt="v1")
        .select(
            "doc_id", "source", F.col("sample_rank").cast("long").alias("sample_rank")
        )
        .orderBy("doc_id")
    )


ORACLE_QUOTA_SAMPLE = """
WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('v1|' || doc_id::VARCHAR) ASC, doc_id ASC
         ) AS sample_rank
  FROM documents
)
SELECT doc_id, source, sample_rank
FROM r WHERE sample_rank <= 15
ORDER BY doc_id
"""


def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sample.stratified_sample: 30% of every source stratum,
    md5-ordered — proportional counterpart of the fixed-cap quota."""
    from netflix_data_ingestion_spark.operators.sample import (
        stratified_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, "source", "doc_id", 0.3, salt="v1")
        .select(
            "doc_id",
            "source",
            F.col("sample_rank").cast("long").alias("sample_rank"),
        )
        .orderBy("doc_id")
    )


ORACLE_STRATIFIED_SAMPLE = """
WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('v1|' || doc_id::VARCHAR) ASC, doc_id ASC
         ) AS sample_rank,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT doc_id, source, sample_rank
FROM r WHERE sample_rank <= CEIL(0.3 * n)
ORDER BY doc_id
"""


def q_user_event_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sketch.cms_build + cms_estimate: 64x4 deterministic
    count-min sketch of events.user_id, probed for every distinct user.
    The oracle rebuilds the identical md5 sketch in SQL — estimate
    parity proves both the build and the probe, including collision
    behavior."""
    from netflix_data_ingestion_spark.operators import sketch

    events = _t(spark, sf_dir, "events")
    sk = sketch.cms_build(events, "user_id", width=64, depth=4)
    users = events.select("user_id").distinct()
    return sketch.cms_estimate(sk, users, "user_id", width=64, depth=4).orderBy(
        "user_id"
    )


ORACLE_USER_CMS = """
WITH rb AS (
  SELECT user_id, r.row_id AS row,
         (('0x' || substring(md5(r.row_id::VARCHAR || '|' || user_id::VARCHAR),
                             1, 8))::BIGINT % 64)::INT AS bucket
  FROM events, (SELECT unnest(range(0, 4)) AS row_id) r
),
sk AS (
  SELECT row, bucket, COUNT(*)::BIGINT AS cnt
  FROM rb GROUP BY 1, 2
),
probes AS (
  SELECT DISTINCT user_id FROM events
),
pb AS (
  SELECT p.user_id, r.row_id AS row,
         (('0x' || substring(md5(r.row_id::VARCHAR || '|' || p.user_id::VARCHAR),
                             1, 8))::BIGINT % 64)::INT AS bucket
  FROM probes p, (SELECT unnest(range(0, 4)) AS row_id) r
)
SELECT pb.user_id, MIN(COALESCE(sk.cnt, 0))::BIGINT AS est
FROM pb LEFT JOIN sk USING (row, bucket)
GROUP BY 1 ORDER BY 1
"""


def q_doc_bernoulli_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sample.bernoulli_mix with a per-source mixing policy:
    'src1*' sources kept at 80%, everything else at 30% — the
    deterministic weighted corpus-mixing primitive."""
    from netflix_data_ingestion_spark.operators.sample import bernoulli_mix

    docs = _t(spark, sf_dir, "documents")
    rate = F.when(F.col("source").startswith("src1"), F.lit(0.8)).otherwise(
        F.lit(0.3)
    )
    return (
        bernoulli_mix(docs, "doc_id", rate)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


ORACLE_BERNOULLI_MIX = """
SELECT doc_id, source
FROM documents
WHERE (('0x' || substr(md5('v1|' || doc_id::VARCHAR), 1, 8))::BIGINT)::DOUBLE
      < (CASE WHEN source LIKE 'src1%' THEN 0.8 ELSE 0.3 END) * 4294967296.0
ORDER BY doc_id
"""


def q_doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 50 == 0 stand in for
    an evaluation benchmark; 5-gram overlap against them is counted for
    every corpus document."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return textstats.contamination(docs, bench, "doc_id", "text", n=5).orderBy(
        "doc_id"
    )


ORACLE_CONTAMINATION = f"""
WITH {_DUCK_TOKS},
sh5 AS (
  SELECT DISTINCT doc_id, array_to_string(tk[i:i+4], ' ') AS gram
  FROM toks, unnest(range(1, len(tk) - 3)) AS u(i)
),
bg AS (SELECT DISTINCT gram FROM sh5 WHERE doc_id % 50 = 0),
ov AS (
  SELECT s.doc_id, COUNT(*) AS n FROM sh5 s JOIN bg USING (gram) GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(ov.n, 0)::BIGINT AS n_overlap_grams,
       COALESCE(ov.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN ov USING (doc_id)
ORDER BY doc_id
"""


def q_doc_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: per-source token-budget chunk assignment (budget
    512 tokens) over docs in id order."""
    from netflix_data_ingestion_spark.operators.sample import pack_chunks

    docs = _t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        F.size(textstats.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return (
        pack_chunks(sized, "source", "doc_id", "n_tokens", budget=512)
        .select("doc_id", "source", "n_tokens", "chunk_id", "chunk_offset")
        .orderBy("doc_id")
    )


ORACLE_PACK_CHUNKS = f"""
WITH {_DUCK_TOKS},
s AS (
  SELECT d.doc_id, d.source, len(t.tk)::BIGINT AS n_tokens
  FROM documents d JOIN toks t USING (doc_id)
),
c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING
         ) - n_tokens AS chunk_start
  FROM s
)
SELECT doc_id, source, n_tokens,
       (chunk_start // 512)::BIGINT AS chunk_id,
       (chunk_start % 512)::BIGINT AS chunk_offset
FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Distributed k-means (fixed-point Lloyd's — iterative ML, hash-checked)
# ---------------------------------------------------------------------------


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/kmeans.kmeans_train: 2 Lloyd rounds, k=8, everything on
    the 1e-6 fixed-point grid — integer distances and integer-mean
    centroid updates make a genuinely iterative training loop bit-exact
    against the unrolled recursive SQL below."""
    emb = _t(spark, sf_dir, "embeddings")
    return kmeans.kmeans_train(
        emb, "vec_id", "embedding", k=8, iters=2
    ).orderBy("vec_id")


def _kmeans_cte_chain(
    k: int, iters: int, scale: int, source: str = "embeddings",
    pre_cte: str = "",
) -> str:
    """Shared WITH-chain prefix for the k-means oracles: quantized vectors
    (qv/pos), lowest-id seeds, then `iters` unrolled Lloyd rounds ending
    at centroid CTE ``c{iters}``.  Used by both the k-means contract
    oracle and the trained-IVF oracle (which trains its coarse quantizer
    with the identical loop over a `source` CTE — optionally declared in
    ``pre_cte`` — holding the training sample)."""
    lead = f"WITH {pre_cte},\nqv AS (" if pre_cte else "WITH qv AS ("
    parts = [
        f"""
{lead}
  SELECT vec_id,
         list_transform(embedding,
                        x -> round(x::DOUBLE * {scale})::BIGINT) AS qv
  FROM {source}
),
pos AS (
  SELECT vec_id, i - 1 AS pos, qv[i] AS q
  FROM qv, unnest(range(1, len(qv) + 1)) AS r(i)
),
seeds AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
  FROM (SELECT vec_id FROM {source} ORDER BY vec_id LIMIT {k})
),
c0 AS (
  SELECT s.cid, p.pos, p.q AS qc FROM seeds s JOIN pos p USING (vec_id)
)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
d{i} AS (
  SELECT p.vec_id, c.cid,
         SUM((p.q - c.qc) * (p.q - c.qc))::BIGINT AS dist
  FROM pos p JOIN c{i - 1} c USING (pos) GROUP BY 1, 2
),
a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d{i}) WHERE rn = 1
),
c{i} AS (
  SELECT a.cid, p.pos, round(SUM(p.q)::DOUBLE / COUNT(*))::BIGINT AS qc
  FROM a{i} a JOIN pos p USING (vec_id) GROUP BY 1, 2
)"""
        )
    return "".join(parts)


def _kmeans_oracle(k: int = 8, iters: int = 2, scale: int = 1_000_000) -> str:
    """Unrolled Lloyd iterations as a CTE chain (c0 -> a1/c1 -> ... ->
    final assignment) — mechanically mirrors the driver loop."""
    parts = [_kmeans_cte_chain(k, iters, scale)]
    fin = iters + 1
    parts.append(
        f""",
d{fin} AS (
  SELECT p.vec_id, c.cid,
         SUM((p.q - c.qc) * (p.q - c.qc))::BIGINT AS dist
  FROM pos p JOIN c{iters} c USING (pos) GROUP BY 1, 2
)
SELECT vec_id, cid::INT AS cluster_id, dist AS qdist FROM (
  SELECT vec_id, cid, dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM d{fin}) WHERE rn = 1
ORDER BY vec_id"""
    )
    return "".join(parts)


ORACLE_KMEANS = _kmeans_oracle()


def q_kmeans_inertia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster within-cluster sum of squares — THE k-selection
    metric (elbow method): composes kmeans_train's exact fixed-point
    qdist into (cluster_id, n_members, inertia) with one grouped sum;
    bit-exact because the distances already are."""
    emb = _t(spark, sf_dir, "embeddings")
    assigned = kmeans.kmeans_train(emb, "vec_id", "embedding", k=8, iters=2)
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum(F.col("qdist").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("inertia"),
        )
        .orderBy("cluster_id")
    )


def _kmeans_inertia_oracle(
    k: int = 8, iters: int = 2, scale: int = 1_000_000
) -> str:
    parts = [_kmeans_cte_chain(k, iters, scale)]
    fin = iters + 1
    parts.append(
        f""",
d{fin} AS (
  SELECT p.vec_id, c.cid,
         SUM((p.q - c.qc) * (p.q - c.qc))::BIGINT AS dist
  FROM pos p JOIN c{iters} c USING (pos) GROUP BY 1, 2
),
fin AS (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d{fin}) WHERE rn = 1
)
SELECT cid::INT AS cluster_id, COUNT(*)::BIGINT AS n_members,
       SUM(dist::HUGEINT)::VARCHAR AS inertia
FROM fin GROUP BY 1 ORDER BY cluster_id"""
    )
    return "".join(parts)


ORACLE_KMEANS_INERTIA = _kmeans_inertia_oracle()


def _ivf_trained_oracle(
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    scale: int = 1_000_000,
    train_hexmax: int = 4,
) -> str:
    """Trained-quantizer IVF oracle: the shared unrolled Lloyd chain
    (k=nlist) over the md5-picked training sample (mirroring
    similarity.train_subset at train_sample = train_hexmax/16) produces
    the final assignment, per-cluster fixed-point means (mirroring
    functions/vectors.group_centroids, incl. the cast to float) become
    the centroids, then the probe/assign/score stages identical to the
    sampled-quantizer oracle run on top."""
    fin = iters + 1
    tr = (
        "tr AS (SELECT * FROM embeddings "
        f"WHERE substring(md5(vec_id::VARCHAR), 1, 1) < '{train_hexmax:x}')"
    )
    return f"""{_kmeans_cte_chain(nlist, iters, scale, source="tr", pre_cte=tr)},
d{fin} AS (
  SELECT p.vec_id, c.cid,
         SUM((p.q - c.qc) * (p.q - c.qc))::BIGINT AS dist
  FROM pos p JOIN c{iters} c USING (pos) GROUP BY 1, 2
),
asgf AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d{fin}) WHERE rn = 1
),
centp AS (
  SELECT a.cid, p.pos,
         (SUM(p.q)::DOUBLE / (COUNT(*) * {scale}.0))::FLOAT AS c
  FROM asgf a JOIN pos p USING (vec_id) GROUP BY 1, 2
),
cent AS (
  SELECT cid AS list_id, list(c ORDER BY pos) AS centroid
  FROM centp GROUP BY cid
),
asg0 AS (
  SELECT e.vec_id, c.list_id,
         ROUND({_DUCK_DOT_EC.format(e='e', c='c')} /
               (sqrt({_DUCK_DOT.format(a='e', b='e')}) *
                sqrt({_DUCK_DOT_CC.format(c='c')})), 6) AS sim
  FROM embeddings e, cent c
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, list_id ASC) AS rn
    FROM asg0) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT vec_id, list_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, list_id ASC) AS rn
    FROM asg0 WHERE vec_id < 5) WHERE rn <= {nprobe}
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a USING (list_id)
  WHERE p.query_id <> a.vec_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         ROUND({_DUCK_DOT.format(a='q', b='c')} /
               (sqrt({_DUCK_DOT.format(a='q', b='q')}) *
                sqrt({_DUCK_DOT.format(a='c', b='c')})), 6) AS cosine_sim
  FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim FROM (
  SELECT scored.*,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM scored) WHERE rn <= {k}
ORDER BY query_id, neighbor_id
"""


ORACLE_ANN_IVF = _ivf_trained_oracle()


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/similarity.pq_topk: product-quantization ANN — per-
    subspace fixed-point k-means codebooks (4 subspaces x 16 dims,
    8 codewords, 1 Lloyd round), corpus encoded to 4 small ints, ADC
    candidate scoring in the compressed domain, exact cosine re-rank of
    the top 50.  The oracle unrolls the whole thing (training included)
    in SQL — integer distances make an iterative compression codec
    hash-checkable."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.pq_topk(
        emb, queries, dim=64, k=10, m=4, ksub=8, iters=1, candidates=50
    ).orderBy("query_id", "neighbor_id")


def _pq_oracle(
    dim: int = 64,
    m: int = 4,
    ksub: int = 8,
    scale: int = 1_000_000,
    candidates: int = 50,
    k: int = 10,
) -> str:
    """Unrolled PQ oracle (1 Lloyd round): quantize -> per-subspace
    seeds/assign/update -> encode -> ADC -> exact re-rank, mirroring
    operators/similarity.pq_* stage by stage."""
    dsub = dim // m
    return f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> round(x::DOUBLE * {scale})::BIGINT) AS qv
  FROM embeddings WHERE len(embedding) = {dim}
),
pos AS (
  SELECT vec_id, (i - 1) // {dsub} AS sub, (i - 1) % {dsub} AS spos, qv[i] AS q
  FROM qv, unnest(range(1, len(qv) + 1)) AS r(i)
),
seeds AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
  FROM (SELECT vec_id FROM qv ORDER BY vec_id LIMIT {ksub})
),
c0 AS (
  SELECT s.cid, p.sub, p.spos, p.q AS qc
  FROM seeds s JOIN pos p USING (vec_id)
),
d1 AS (
  SELECT p.vec_id, p.sub, c.cid,
         SUM((p.q - c.qc) * (p.q - c.qc))::BIGINT AS dist
  FROM pos p JOIN c0 c ON c.sub = p.sub AND c.spos = p.spos
  GROUP BY 1, 2, 3
),
a1 AS (
  SELECT vec_id, sub, cid FROM (
    SELECT vec_id, sub, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist, cid) AS rn
    FROM d1) WHERE rn = 1
),
c1 AS (
  SELECT a.cid, p.sub, p.spos,
         round(SUM(p.q)::DOUBLE / COUNT(*))::BIGINT AS qc
  FROM a1 a JOIN pos p USING (vec_id, sub)
  GROUP BY 1, 2, 3
),
d2 AS (
  SELECT p.vec_id, p.sub, c.cid,
         SUM((p.q - c.qc) * (p.q - c.qc))::BIGINT AS dist
  FROM pos p JOIN c1 c ON c.sub = p.sub AND c.spos = p.spos
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, sub, cid::INT AS code FROM (
    SELECT vec_id, sub, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist, cid) AS rn
    FROM d2) WHERE rn = 1
),
adc AS (
  SELECT p.vec_id AS query_id, p.sub, c.cid::INT AS code,
         SUM((p.q - c.qc) * (p.q - c.qc))::BIGINT AS pd
  FROM pos p JOIN c1 c ON c.sub = p.sub AND c.spos = p.spos
  WHERE p.vec_id < 5
  GROUP BY 1, 2, 3
),
ap AS (
  SELECT a.query_id, cd.vec_id AS neighbor_id, SUM(a.pd)::BIGINT AS adist
  FROM codes cd JOIN adc a ON a.sub = cd.sub AND a.code = cd.code
  WHERE a.query_id <> cd.vec_id
  GROUP BY 1, 2
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adist, neighbor_id) AS rn
    FROM ap) WHERE rn <= {candidates}
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         ROUND({_DUCK_DOT.format(a='q', b='c')} /
               (sqrt({_DUCK_DOT.format(a='q', b='q')}) *
                sqrt({_DUCK_DOT.format(a='c', b='c')})), 6) AS cosine_sim
  FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim FROM (
  SELECT scored.*,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM scored) WHERE rn <= {k}
ORDER BY query_id, neighbor_id
"""


ORACLE_ANN_PQ = _pq_oracle()


# ---------------------------------------------------------------------------
# ANN recall: the production IVF / PQ paths measured against the exact
# brute-force ground truth (the dedup_lsh_recall discipline for the
# vector side — every shipped ANN variant's recall is a driver-verified
# 1-row artifact at every SF, not a docstring claim)
# ---------------------------------------------------------------------------


# One brute-force ground-truth pass shared by the four ann_*_recall
# queries.  All four measure against the SAME exact top-10 (k=10, the 5
# query vectors vec_id < 5), so re-running the exhaustive corpus scan
# per query is 4x wasted work in a bench/oracle sweep.  The truth set is
# model-sized (5 queries x 10 = 50 id pairs), so it is computed once per
# (sf_dir, nq, k), collected, and replayed as a local frame — the
# recall queries stay independently runnable (any order, any subset)
# while a full sweep pays for exactly one exhaustive scan.  Keyed by the
# resolved sf_dir PLUS a fingerprint of the embeddings parquet files
# (names, sizes, mtimes): if testdata under the same path is regenerated
# within one process (the old key assumed immutability by comment only),
# the fingerprint changes and the stale truth set is never reused
# (ADVICE r9).
_BRUTE_TRUTH_CACHE: dict[tuple, list[tuple[int, int]]] = {}


def _embeddings_fingerprint(sf_dir: str) -> tuple:
    """(name, size, mtime_ns) per file under embeddings.parquet —
    cheap (one listdir + stats), changes on any rewrite."""
    import os

    path = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    if os.path.isdir(path):
        names = sorted(os.listdir(path))
        root = path
    elif os.path.exists(path):
        names, root = [os.path.basename(path)], os.path.dirname(path)
    else:
        return ()
    out = []
    for name in names:
        st = os.stat(os.path.join(root, name))
        out.append((name, st.st_size, st.st_mtime_ns))
    return tuple(out)


def _shared_brute_truth(
    spark: SparkSession, sf_dir: str, nq: int = 5, k: int = 10
) -> DataFrame:
    import os

    key = (os.path.abspath(sf_dir), _embeddings_fingerprint(sf_dir), nq, k)
    rows = _BRUTE_TRUTH_CACHE.get(key)
    if rows is None:
        emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        queries = emb.filter(F.col("vec_id") < nq)
        rows = [
            (r.query_id, r.neighbor_id)
            for r in similarity.brute_force_topk(emb, queries, k=k)
            .select("query_id", "neighbor_id")
            .collect()
        ]
        _BRUTE_TRUTH_CACHE[key] = rows
    return spark.createDataFrame(
        rows, schema="query_id bigint, neighbor_id bigint"
    )


def _ann_recall(truth: DataFrame, found: DataFrame) -> DataFrame:
    """1-row (n_true, n_found, recall) over (query_id, neighbor_id)
    pair sets.  Both inputs are k x |queries|-sized (model-sized); the
    crossJoin is two 1-row frames.  Guarded division: an empty truth
    set yields NULL recall, never a divide-by-zero."""
    n_true = truth.agg(F.count("*").cast("long").alias("n_true"))
    n_found = found.join(truth, ["query_id", "neighbor_id"]).agg(
        F.count("*").cast("long").alias("n_found")
    )
    return n_true.crossJoin(n_found).select(
        "n_true",
        "n_found",
        F.when(
            F.col("n_true") > 0,
            F.round(F.col("n_found").cast("double") / F.col("n_true"), 6),
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Staged (train-once) quantizer models.  The in-plan ann_ivf_topk /
# ann_pq_topk rows deliberately pay their quantizer training per run —
# they are the training-cost record.  At 100 TB a quantizer is a
# PERSISTED model (trained once per corpus snapshot, written as a tiny
# parquet table, read back by every query batch), so the *_staged twins
# bench the production search path alone: same parameters, same
# deterministic training, byte-identical results (shared oracle), but
# the model comes from parquet.  Cache keyed like _BRUTE_TRUTH_CACHE
# (path + embeddings fingerprint) so regeneration never reuses a stale
# model within one process.
# ---------------------------------------------------------------------------
_STAGED_MODEL_CACHE: dict[tuple, str] = {}


def _staged_model_dir(spark: SparkSession, sf_dir: str, kind: str,
                      build) -> str:
    import os
    import tempfile

    key = (kind, os.path.abspath(sf_dir), _embeddings_fingerprint(sf_dir))
    path = _STAGED_MODEL_CACHE.get(key)
    if path is None:
        path = os.path.join(
            tempfile.mkdtemp(prefix=f"staged_{kind}_"), "model"
        )
        build(path)
        _STAGED_MODEL_CACHE[key] = path
    return path


def _staged_ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(list_id, centroid) from parquet — ann_ivf_topk's exact quantizer
    (nlist=16, 2 Lloyd rounds, 1/4 md5 train sample), trained once per
    (process, corpus) and persisted."""

    def build(path: str) -> None:
        emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        similarity.ivf_centroids_trained(
            emb, nlist=16, iters=2, train_sample=0.25
        ).write.mode("overwrite").parquet(path)

    return spark.read.parquet(
        _staged_model_dir(spark, sf_dir, "ivf", build)
    )


def _staged_pq_codebooks(spark: SparkSession, sf_dir: str) -> dict:
    """{(sub, cid): [int64]} from parquet — ann_pq_topk's exact
    codebooks (m=4, ksub=8, 1 Lloyd round), trained once per
    (process, corpus) and persisted as (sub, code, codeword) rows."""

    def build(path: str) -> None:
        emb = _t(spark, sf_dir, "embeddings")
        cents = similarity.pq_train_codebooks(
            emb, dim=64, m=4, ksub=8, iters=1
        )
        spark.createDataFrame(
            [(s, c, v) for (s, c), v in sorted(cents.items())],
            schema="sub int, code int, codeword array<bigint>",
        ).write.mode("overwrite").parquet(path)

    rows = spark.read.parquet(
        _staged_model_dir(spark, sf_dir, "pq", build)
    ).collect()  # model-sized: m x ksub rows
    return {(r["sub"], r["code"]): list(r["codeword"]) for r in rows}


def warm_staged_models(spark: SparkSession, sf_dir: str) -> None:
    """Train-and-persist the staged quantizer models ahead of time.

    At 100 TB these models are trained once per corpus snapshot and
    persisted; within one process the first `*_staged` invocation pays
    the build.  Benchmarks call this during session warm-up so the
    staged rows measure what they claim to measure (the search path
    alone) in BOTH reps — the training cost itself stays on the
    deliberate in-plan twins (ann_ivf_topk / ann_pq_topk)."""
    _staged_ivf_centroids(spark, sf_dir)
    _staged_pq_codebooks(spark, sf_dir)


def q_ann_ivf_topk_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_ivf_topk against a PRE-STAGED coarse quantizer: the persisted
    16-row centroid parquet (trained once per process by
    `_staged_ivf_centroids`, exactly ann_ivf_topk's configuration) feeds
    `similarity.ivf_topk(centroids=...)`, so the plan contains ONLY the
    production search path — broadcast assignment over the corpus, probe
    selection, exact in-list rank.  Shares ann_ivf_topk's oracle:
    deterministic fixed-point training makes the staged and in-plan
    results byte-identical."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)
    cent = _staged_ivf_centroids(spark, sf_dir)
    return similarity.ivf_topk(
        emb, queries, k=10, nlist=16, nprobe=4, centroids=cent
    ).orderBy("query_id", "neighbor_id")


def q_ann_pq_topk_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_pq_topk against PRE-STAGED codebooks: the persisted
    (sub, code, codeword) parquet (trained once per process by
    `_staged_pq_codebooks`, exactly ann_pq_topk's configuration) feeds
    `similarity.pq_topk(cents=...)`, so the plan is encode -> broadcast
    ADC -> combinable candidate sum -> bounded exact re-rank, with zero
    training stages.  Shares ann_pq_topk's oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cents = _staged_pq_codebooks(spark, sf_dir)
    return similarity.pq_topk(
        emb, queries, dim=64, k=10, m=4, ksub=8, candidates=50, cents=cents
    ).orderBy("query_id", "neighbor_id")


def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall of the trained-quantizer IVF path
    (ann_ivf_topk's exact configuration: nlist=16, nprobe=4,
    train_sample=0.25) against the exhaustive brute-force cosine
    top-10 (embedding_cosine_topk's exact configuration) on the same
    5 query vectors.  The oracle recomputes BOTH paths in SQL, so the
    recall number itself is hash-checked — the probe-breadth knob's
    measured operating point at every shipped SF."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)
    truth = _shared_brute_truth(spark, sf_dir)
    found = similarity.ivf_topk(
        emb, queries, k=10, nlist=16, nprobe=4, train_sample=0.25
    ).select("query_id", "neighbor_id")
    return _ann_recall(truth, found)


def q_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall of the product-quantization path (ann_pq_topk's
    exact configuration: m=4, ksub=8, 1 Lloyd round, ADC candidates=50,
    exact re-rank) against the brute-force cosine top-10 — the
    compression-loss operating point as a driver-verified artifact."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    truth = _shared_brute_truth(spark, sf_dir)
    found = similarity.pq_topk(
        emb, queries, dim=64, k=10, m=4, ksub=8, iters=1, candidates=50
    ).select("query_id", "neighbor_id")
    return _ann_recall(truth, found)


def q_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall of the single-table hyperplane-LSH path
    (ann_lsh_topk's exact configuration: 8 planes, one bucket probe)
    against the brute-force cosine top-10 — the cheapest ANN variant's
    operating point, the floor the multi-probe/IVF variants must
    beat."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)
    truth = _shared_brute_truth(spark, sf_dir)
    found = similarity.lsh_topk(
        emb, queries, k=10, planes=8, dim=64
    ).select("query_id", "neighbor_id")
    return _ann_recall(truth, found)


def q_ann_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall of the multi-probe LSH path
    (ann_multiprobe_topk's exact configuration) against the
    brute-force cosine top-10 — quantifies exactly what the extra
    Hamming-1 probes buy over the single-bucket floor
    (ann_lsh_recall), completing the measured-recall family across
    all four shipped ANN variants."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)
    truth = _shared_brute_truth(spark, sf_dir)
    found = similarity.lsh_multiprobe_topk(
        emb, queries, k=10, planes=8, dim=64
    ).select("query_id", "neighbor_id")
    return _ann_recall(truth, found)


def _ann_recall_oracle(found_sql: str) -> str:
    """Compose an existing ANN oracle blob (a full WITH...SELECT) with
    the brute-force oracle into the 1-row recall metric — the found
    path and the truth path each run verbatim as subqueries, so the
    recall oracle can never drift from the per-path oracles."""
    return f"""
WITH truth AS (
  SELECT query_id, neighbor_id FROM ({ORACLE_COSINE_TOPK}) t
),
found AS (
  SELECT query_id, neighbor_id FROM ({found_sql}) f
),
m AS (
  SELECT (SELECT COUNT(*) FROM truth)::BIGINT AS n_true,
         (SELECT COUNT(*) FROM found fo
          JOIN truth tr ON tr.query_id = fo.query_id
                       AND tr.neighbor_id = fo.neighbor_id)::BIGINT AS n_found
)
SELECT n_true, n_found,
       CASE WHEN n_true > 0
            THEN ROUND(n_found::DOUBLE / n_true, 6) END AS recall
FROM m
"""


ORACLE_ANN_IVF_RECALL = _ann_recall_oracle(ORACLE_ANN_IVF)
ORACLE_ANN_PQ_RECALL = _ann_recall_oracle(ORACLE_ANN_PQ)
ORACLE_ANN_LSH_RECALL = _ann_recall_oracle(ORACLE_ANN_LSH)
# ORACLE_ANN_MULTIPROBE is defined later in the file (after the
# multiprobe query); its recall twin is composed there.


# ---------------------------------------------------------------------------
# End-to-end corpus curation (the full ladder in one oracle-checked plan)
# ---------------------------------------------------------------------------


def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline (operators/curate.py): lang +
    quality gates -> near-dup cluster keep (iterative CC) -> per-source
    quota -> token-budget chunk packing.  One oracle verifies the whole
    ladder end-to-end, including the stage boundaries the unit queries
    can't see (each stage consumes the previous stage's survivors)."""
    docs = _t(spark, sf_dir, "documents")
    return curate.curate_corpus(docs).orderBy("doc_id")


ORACLE_CURATE = f"""
WITH RECURSIVE {_DUCK_TOKS},
qbase AS (
  SELECT d.doc_id,
         length(d.text)::BIGINT AS n,
         length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))::BIGINT AS alpha,
         length(regexp_replace(d.text, '[^0-9]', '', 'g'))::BIGINT AS digit,
         length(regexp_replace(d.text, '[^ ]', '', 'g'))::BIGINT AS space,
         len(t.tk)::BIGINT AS n_tokens,
         len(list_filter(t.tk, x -> x IN ({_STOP_LIST_SQL})))::BIGINT AS n_stop
  FROM documents d JOIN toks t USING (doc_id)
),
quality AS (
  SELECT doc_id,
         (4 * alpha * n_tokens + 3 * n_stop * n +
          3 * n_tokens * (alpha + digit + space))::DOUBLE
           / (10 * n * n_tokens)::DOUBLE AS quality_score
  FROM qbase
),
base AS (
  SELECT d.doc_id, d.source, q.quality_score
  FROM documents d JOIN quality q USING (doc_id)
  WHERE d.lang = 'en' AND q.quality_score >= 0.64
),
sh AS (
  SELECT DISTINCT t.doc_id, array_to_string(t.tk[i:i+2], ' ') AS shingle
  FROM toks t JOIN base USING (doc_id),
       unnest(range(1, len(t.tk) - 1)) AS u(i)
),
hashed AS (
  SELECT doc_id, seed,
         md5(seed::VARCHAR || '|' || shingle) AS h
  FROM sh, unnest(range(0, 4)) AS s(seed)
),
bandt AS (
  SELECT doc_id, seed AS band,
         md5(concat_ws('|', MIN(substr(h, 1, 8)), MIN(substr(h, 9, 8)),
                       MIN(substr(h, 17, 8)), MIN(substr(h, 25, 8))))
           AS band_key
  FROM hashed GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandt a JOIN bandt b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
arrs AS (
  SELECT doc_id, list(shingle) AS arr, COUNT(*) AS n_shingles
  FROM sh GROUP BY 1
),
verified AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(sa.arr, sb.arr))::BIGINT AS intersection,
         sa.n_shingles + sb.n_shingles AS size_sum
  FROM cand c
  JOIN arrs sa ON sa.doc_id = c.id_a
  JOIN arrs sb ON sb.doc_id = c.id_b
),
pairs AS (
  SELECT id_a, id_b FROM verified
  WHERE intersection::DOUBLE / (size_sum - intersection) >= 0.8
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM base
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.node = e.v
),
comp AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
),
dd AS (
  SELECT b.doc_id, b.source, b.quality_score
  FROM base b JOIN comp c USING (doc_id)
  WHERE c.doc_id = c.cluster_id
),
qs AS (
  SELECT doc_id, source, quality_score,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('v1|' || doc_id::VARCHAR) ASC, doc_id ASC
         ) AS sample_rank
  FROM dd
),
samp AS (SELECT * FROM qs WHERE sample_rank <= 15),
cum AS (
  SELECT s.doc_id, s.source, s.quality_score,
         len(t.tk)::BIGINT AS n_tokens,
         SUM(len(t.tk)::BIGINT) OVER (
           PARTITION BY s.source ORDER BY s.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )::BIGINT AS running
  FROM samp s JOIN toks t USING (doc_id)
)
SELECT doc_id, source, quality_score, n_tokens,
       (running - n_tokens) // 512 AS chunk_id,
       (running - n_tokens) % 512 AS chunk_offset
FROM cum
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Grouped embedding centroids (fixed-point deterministic mean)
# ---------------------------------------------------------------------------


def q_embedding_group_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (functions/vectors.group_centroids) in
    long format — the fixed-point int64 summation makes the float mean
    order-free, so the hash check is exact, not approximate."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = vectors.group_centroids(emb, "label", "embedding")
    return (
        cent.select(
            "label", "n_vecs", F.posexplode("centroid").alias("pos", "component")
        )
        .withColumn("pos", F.col("pos").cast("int"))
        .orderBy("label", "pos")
    )


ORACLE_GROUP_CENTROID = """
WITH pos AS (
  SELECT label, i - 1 AS pos,
         ROUND(embedding[i]::DOUBLE * 1000000.0)::BIGINT AS q
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
),
agg AS (
  SELECT label, pos, SUM(q)::BIGINT AS sq, COUNT(*)::BIGINT AS n
  FROM pos GROUP BY 1, 2
)
SELECT label, n AS n_vecs, pos::INT AS pos,
       sq::DOUBLE / (n * 1000000.0) AS component
FROM agg
ORDER BY label, pos
"""


# ---------------------------------------------------------------------------
# PII redaction (planted synthetic PII — the corpus itself is clean, so the
# query plants deterministic doc_id-derived PII on both engines, then the
# operator must find and mask exactly that)
# ---------------------------------------------------------------------------


def q_doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit(" call 555-867-5309 or 555.123.4567 today"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" ssn 123-45-6789 leaked")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact.redact_pii(planted, "doc_id", "text").orderBy("doc_id")


ORACLE_PII_REDACT = f"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || doc_id::VARCHAR || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call 555-867-5309 or 555.123.4567 today'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' ssn 123-45-6789 leaked'
                 ELSE '' END AS text
  FROM documents
),
red AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(text,
           '{redact.SSN_RE}', '[SSN]', 'g'),
           '{redact.PHONE_RE}', '[PHONE]', 'g'),
           '{redact.EMAIL_RE}', '[EMAIL]', 'g') AS redacted_text,
         len(regexp_extract_all(text, '{redact.SSN_RE}'))::BIGINT AS n_ssns,
         len(regexp_extract_all(text, '{redact.PHONE_RE}'))::BIGINT
           AS n_phones,
         len(regexp_extract_all(text, '{redact.EMAIL_RE}'))::BIGINT
           AS n_emails
  FROM planted
)
SELECT doc_id, redacted_text, n_ssns, n_phones, n_emails,
       (n_ssns + n_phones + n_emails) > 0 AS has_pii
FROM red
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Event-time tumbling window (batch twin of the streaming ingest path)
# ---------------------------------------------------------------------------


def q_events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("event_count"),
            (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_count",
            "avg_value",
            "unique_users",
        )
        .orderBy("window_start")
    )


def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming sliding window (streaming/ingest.
    sliding_type_counts): 2-hour windows every 1 hour — each event lands
    in exactly two windows.  Spark's F.window handles the fan-out; the
    oracle reproduces it as an explicit 2-window explode per event, so
    the overlap semantics (not just the bucket math) are hash-checked."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("event_count"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_count",
            "unique_users",
        )
        .orderBy("window_start")
    )


ORACLE_SLIDING = """
WITH contrib AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts)
           - (r.k * INTERVAL 1 HOUR) AS window_start,
         user_id
  FROM events, (SELECT unnest(range(0, 2)) AS k) r
)
SELECT window_start,
       COUNT(*) AS event_count,
       COUNT(DISTINCT user_id) AS unique_users
FROM contrib
GROUP BY 1 ORDER BY 1
"""


ORACLE_TUMBLING = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       COUNT(*) AS event_count,
       ROUND(SUM(value), 2) / COUNT(*) AS avg_value,
       COUNT(DISTINCT user_id) AS unique_users
FROM events
GROUP BY 1
ORDER BY window_start
"""


# ---------------------------------------------------------------------------
# Multimodal binary-column metadata
# ---------------------------------------------------------------------------


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "doc_id", "text", "image")
    return media_metadata(media).orderBy("media_id")


ORACLE_MULTIMODAL = """
SELECT doc_id::BIGINT AS media_id,
       'image' AS media_type,
       octet_length(encode(text))::BIGINT AS n_bytes,
       sha256(text) AS sha256
FROM documents
ORDER BY media_id
"""


def q_multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec end-to-end, hash-checked: synthesize a PCM WAV
    payload per document (samples = the text's code points re-centered,
    bit depth cycling 8/16/24/32 and sample rate 8/16/24 kHz by doc_id
    — every decode path exercised), run operators/audio.encode_wav ->
    decode_wav -> exact integer stats, and compare against a pure-SQL
    oracle computing the same statistics from the text directly.  The
    container round-trip (RIFF walk, fmt parse, sample extraction,
    sign handling at every depth) sits INSIDE the checked chain — if
    any byte of the codec is wrong, the hash breaks.

    Plan (r12, guide §4.1/§4.2): ONE narrow Arrow stage — synth and
    decode fused in a single ``mapInPandas`` (the shared
    ``wav_feature_frame`` body), so the WAV payload never crosses the
    JVM boundary; only the text goes in and the 9 stat columns come
    out.  The code-point extraction is vectorized (utf-32 view of the
    string instead of a per-char ``ord`` loop).  No shuffle until the
    final display orderBy."""
    import numpy as np

    from netflix_data_ingestion_spark.operators.audio import (
        AUDIO_FEATURES_SCHEMA,
        encode_wav,
        wav_feature_frame,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def synth_decode(it):
        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text or ""
                # code points == utf-32 words; "surrogatepass" keeps the
                # vectorized path total on lone surrogates too (a
                # surrogate's code unit equals ord(c), so output is
                # identical to the per-char ord loop)
                base = (
                    np.frombuffer(
                        t.encode("utf-32-le", "surrogatepass"), dtype="<u4"
                    ).astype(np.int64)
                    % 256
                ) - 128
                bits = (8, 16, 24, 32)[int(doc_id) % 4]
                rate = 8000 * (1 + int(doc_id) % 3)
                samples = base << (bits - 8)
                ids.append(doc_id)
                payloads.append(bytes(encode_wav(samples, 1, rate, bits)))
            yield wav_feature_frame(ids, payloads)

    # sf0.1 documents is ONE parquet split; without this the whole
    # synth+decode chain serializes on a single task (measured: the
    # gif row ran 1-task 9-12s isolated).  One cheap narrow-input
    # shuffle before the Arrow stage; a no-op at real scale where
    # the scan has thousands of splits (ensure_parallelism contract).
    return (
        ensure_parallelism(docs)
        .mapInPandas(synth_decode, AUDIO_FEATURES_SCHEMA)
        .orderBy("media_id")
    )


ORACLE_AUDIO_STATS = """
WITH base AS (
  SELECT doc_id,
         [8, 16, 24, 32][(doc_id % 4) + 1]::INT AS bits,
         (8000 * (1 + doc_id % 3))::INT AS rate,
         list_transform(range(1, length(coalesce(text, '')) + 1),
                        i -> (unicode(text[i]) % 256) - 128) AS b
  FROM documents
),
m AS (
  SELECT doc_id, bits, rate,
         len(b)::BIGINT AS n,
         list_sum(list_transform(b, x -> abs(x)))::BIGINT AS abs_sum,
         list_max(list_transform(b, x -> abs(x)))::BIGINT AS peak
  FROM base
)
SELECT doc_id::BIGINT AS media_id,
       'wav' AS codec,
       1::INT AS channels,
       rate AS sample_rate,
       bits AS bit_depth,
       n AS num_frames,
       (n * 1000 // rate)::BIGINT AS duration_ms,
       CASE WHEN n > 0
            THEN ((1000 * abs_sum * (1 << (bits - 8)))
                  // (n * (1::BIGINT << (bits - 1))))::BIGINT
       END AS mean_abs_milli,
       CASE WHEN n > 0
            THEN ((1000 * peak * (1 << (bits - 8)))
                  // (1::BIGINT << (bits - 1)))::BIGINT
       END AS peak_milli
FROM m
ORDER BY media_id
"""


def q_multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio codec exercised THREE times in one checked chain:
    synthesize a WAV per document (multimodal_audio_stats' exact
    recipe: code-point samples, bit depth cycling 8/16/24/32, source
    rate 8/16/24 kHz), resample every payload to 8 kHz
    (operators/audio.resample_audio — nearest-neighbor integer frame
    mapping, decode -> re-encode), then decode the RESAMPLED payload
    and emit its exact integer stats.  The oracle replays the index
    arithmetic ((j * src_rate) // 8000) on the text directly, so the
    resampler's frame math and both codec directions are hash-checked.

    Plan (r12, guide §4.1/§4.2): ONE narrow Arrow stage — the former
    three chained ``mapInPandas`` stages (synth, resample, decode)
    shipped the WAV payload across the JVM boundary four times just to
    hand it to the next Python stage; fused, the payload never crosses
    at all (text in, 9 stat columns out) and the per-stage Arrow
    serialization setup is paid once.  The same ``encode_wav`` ->
    ``resample_wav`` -> ``wav_feature_frame`` calls run per row, so
    both codec directions and the frame math stay inside the checked
    chain.  No shuffle before the display orderBy."""
    import numpy as np

    from netflix_data_ingestion_spark.operators.audio import (
        AUDIO_FEATURES_SCHEMA,
        encode_wav,
        resample_wav,
        wav_feature_frame,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def synth_resample_decode(it):
        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text or ""
                # code points == utf-32 words; "surrogatepass" keeps the
                # vectorized path total on lone surrogates too (a
                # surrogate's code unit equals ord(c), so output is
                # identical to the per-char ord loop)
                base = (
                    np.frombuffer(
                        t.encode("utf-32-le", "surrogatepass"), dtype="<u4"
                    ).astype(np.int64)
                    % 256
                ) - 128
                bits = (8, 16, 24, 32)[int(doc_id) % 4]
                rate = 8000 * (1 + int(doc_id) % 3)
                p = bytes(encode_wav(base << (bits - 8), 1, rate, bits))
                r = resample_wav(p, 8000)
                ids.append(doc_id)
                # undecodable payloads pass through unchanged — the
                # resample_audio quarantine contract, inlined
                payloads.append(p if r is None else r)
            yield wav_feature_frame(ids, payloads)

    # sf0.1 documents is ONE parquet split; without this the whole
    # synth+decode chain serializes on a single task (measured: the
    # gif row ran 1-task 9-12s isolated).  One cheap narrow-input
    # shuffle before the Arrow stage; a no-op at real scale where
    # the scan has thousands of splits (ensure_parallelism contract).
    return (
        ensure_parallelism(docs)
        .mapInPandas(synth_resample_decode, AUDIO_FEATURES_SCHEMA)
        .orderBy("media_id")
    )


ORACLE_AUDIO_RESAMPLE = """
WITH base AS (
  SELECT doc_id,
         [8, 16, 24, 32][(doc_id % 4) + 1]::INT AS bits,
         (8000 * (1 + doc_id % 3))::INT AS src_rate,
         list_transform(range(1, length(coalesce(text, '')) + 1),
                        i -> (unicode(text[i]) % 256) - 128) AS b
  FROM documents
),
rs AS (
  SELECT doc_id, bits,
         list_transform(range(0, (len(b) * 8000 // src_rate)::BIGINT),
                        j -> b[((j * src_rate) // 8000)::BIGINT + 1]) AS r
  FROM base
),
m AS (
  SELECT doc_id, bits,
         len(r)::BIGINT AS n,
         list_sum(list_transform(r, x -> abs(x)))::BIGINT AS abs_sum,
         list_max(list_transform(r, x -> abs(x)))::BIGINT AS peak
  FROM rs
)
SELECT doc_id::BIGINT AS media_id,
       'wav' AS codec,
       1::INT AS channels,
       8000::INT AS sample_rate,
       bits AS bit_depth,
       n AS num_frames,
       (n * 1000 // 8000)::BIGINT AS duration_ms,
       CASE WHEN n > 0
            THEN ((1000 * abs_sum * (1 << (bits - 8)))
                  // (n * (1::BIGINT << (bits - 1))))::BIGINT
       END AS mean_abs_milli,
       CASE WHEN n > 0
            THEN ((1000 * peak * (1 << (bits - 8)))
                  // (1::BIGINT << (bits - 1)))::BIGINT
       END AS peak_milli
FROM m
ORDER BY media_id
"""


def q_multimodal_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multi-frame codec end-to-end, hash-checked: synthesize an
    animated GIF per document (1 + doc_id%3 full-screen 8x8 grayscale
    frames whose pixel indices cycle the text's code points, per-frame
    delays varying by doc and frame), run operators/gif.encode_gif ->
    decode_gif -> per-frame composited stats (gif_frame_stats), and
    compare against a pure-SQL oracle computing the same integers from
    the text directly.  The LZW codec (both directions), the
    sub-block framing, the GCE delay parse and the compositing loop
    all sit INSIDE the checked chain.

    Plan (r12, guide §4.1): ONE narrow Arrow stage — synth and
    decode+fan-out fused in a single ``mapInPandas`` (iterator
    composition over ``gif_frame_batches``), so the GIF payload never
    crosses the JVM boundary.  No shuffle until the display orderBy."""
    import numpy as np

    from netflix_data_ingestion_spark.operators.gif import encode_gif
    from netflix_data_ingestion_spark.operators.multimodal import (
        GIF_FRAME_SCHEMA,
        gif_frame_batches,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    gray = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)

    def synth(it):
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text or ""
                n = len(t)
                did = int(doc_id)
                n_frames = 1 + did % 3
                frames = []
                for f in range(n_frames):
                    if n:
                        idx = [
                            ord(t[(f * 64 + i) % n]) % 256 for i in range(64)
                        ]
                    else:
                        idx = [0] * 64
                    frames.append(
                        np.array(idx, dtype=np.uint8).reshape(8, 8)
                    )
                delays = [4 * f + did % 5 for f in range(n_frames)]
                ids.append(doc_id)
                payloads.append(bytes(encode_gif(frames, gray, delays)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    # sf0.1 documents is ONE parquet split; without this the whole
    # synth+decode chain serializes on a single task (measured: the
    # gif row ran 1-task 9-12s isolated).  One cheap narrow-input
    # shuffle before the Arrow stage; a no-op at real scale where
    # the scan has thousands of splits (ensure_parallelism contract).
    dec = gif_frame_batches()
    fused = ensure_parallelism(docs).mapInPandas(
        lambda it: dec(synth(it)), GIF_FRAME_SCHEMA
    )
    return (
        fused
        .select(
            "media_id",
            "n_frames",
            "frame_idx",
            "width",
            "height",
            "delay_cs",
            "mean_luma_milli",
        )
        .orderBy("media_id", "frame_idx")
    )


ORACLE_GIF_FRAMES = """
WITH base AS (
  SELECT doc_id,
         (1 + doc_id % 3)::INT AS n_frames,
         coalesce(text, '') AS t,
         length(coalesce(text, '')) AS n
  FROM documents
),
fr AS (
  SELECT doc_id, n_frames, t, n, f.f::INT AS frame_idx
  FROM base, unnest(range(0, n_frames)) AS f(f)
),
px AS (
  SELECT doc_id, n_frames, frame_idx,
         list_sum(list_transform(range(0, 64),
           i -> CASE WHEN n > 0
                     THEN unicode(t[((frame_idx * 64 + i) % n) + 1]) % 256
                     ELSE 0 END))::BIGINT AS s
  FROM fr
)
SELECT doc_id::BIGINT AS media_id,
       n_frames,
       frame_idx,
       8::INT AS width,
       8::INT AS height,
       (4 * frame_idx + doc_id % 5)::INT AS delay_cs,
       ((1000 * s) // 64)::BIGINT AS mean_luma_milli
FROM px
ORDER BY media_id, frame_idx
"""


def q_multimodal_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video codec end-to-end, hash-checked: synthesize an AVI
    per document (1 + doc_id%3 full-screen 8x8 BI_RGB frames whose
    R/G/B channels are three distinct affine functions of the text's
    code points — so a BGR-order or row-flip bug CANNOT cancel out),
    run operators/avi.encode_avi -> decode_avi -> per-frame stats
    (avi_frame_stats), and compare against a pure-SQL oracle computing
    the same Rec.601 integers from the text directly.  The RIFF walk,
    the DIB stride/bottom-up/BGR handling and the frame fan-out all
    sit INSIDE the checked chain; the lossy MJPG profile is proven
    separately by unit tests against the spec-compliant test encoder.

    Plan (r12, guide §4.1): ONE narrow Arrow stage — synth and decode
    fused in a single ``mapInPandas`` (iterator composition), so the
    payload never crosses the JVM boundary.  No shuffle before the
    display orderBy."""
    import numpy as np

    from netflix_data_ingestion_spark.operators.avi import decode_avi, encode_avi
    from netflix_data_ingestion_spark.operators.multimodal import (
        AVI_FRAME_SCHEMA,
        video_frame_batches,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(it):
        import pandas as pd

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
                            dtype=np.int64,
                        )
                    else:
                        cp = np.zeros(64, dtype=np.int64)
                    px = np.empty((8, 8, 3), dtype=np.uint8)
                    px[:, :, 0] = cp.reshape(8, 8)
                    px[:, :, 1] = ((cp + 85) % 256).reshape(8, 8)
                    px[:, :, 2] = ((cp + 170) % 256).reshape(8, 8)
                    frames.append(px)
                ids.append(doc_id)
                payloads.append(bytes(encode_avi(frames)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    # sf0.1 documents is ONE parquet split; without this the whole
    # synth+decode chain serializes on a single task (measured: the
    # gif row ran 1-task 9-12s isolated).  One cheap narrow-input
    # shuffle before the Arrow stages; a no-op at real scale where
    # the scan has thousands of splits (ensure_parallelism contract).
    dec = video_frame_batches(decode_avi, "media_id", "payload")
    fused = ensure_parallelism(docs).mapInPandas(
        lambda it: dec(synth(it)), AVI_FRAME_SCHEMA
    )
    return (
        fused
        .select(
            "media_id",
            "n_frames",
            "frame_idx",
            "width",
            "height",
            "mean_luma_milli",
        )
        .orderBy("media_id", "frame_idx")
    )


ORACLE_AVI_FRAMES = """
WITH base AS (
  SELECT doc_id,
         (1 + doc_id % 3)::INT AS n_frames,
         coalesce(text, '') AS t,
         length(coalesce(text, '')) AS n
  FROM documents
),
fr AS (
  SELECT doc_id, n_frames, t, n, f.f::INT AS frame_idx
  FROM base, unnest(range(0, n_frames)) AS f(f)
),
px AS (
  SELECT doc_id, n_frames, frame_idx,
         list_sum(list_transform(range(0, 64),
           i -> CASE WHEN n > 0
                     THEN 299 * (unicode(t[((frame_idx * 64 + i) % n) + 1]) % 256)
                        + 587 * ((unicode(t[((frame_idx * 64 + i) % n) + 1]) % 256 + 85) % 256)
                        + 114 * ((unicode(t[((frame_idx * 64 + i) % n) + 1]) % 256 + 170) % 256)
                     ELSE 299 * 0 + 587 * 85 + 114 * 170 END))::BIGINT AS s
  FROM fr
)
SELECT doc_id::BIGINT AS media_id,
       n_frames,
       frame_idx,
       8::INT AS width,
       8::INT AS height,
       (s // 64)::BIGINT AS mean_luma_milli
FROM px
ORDER BY media_id, frame_idx
"""


def q_multimodal_mp4_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ISO BMFF container end-to-end, hash-checked: synthesize an
    MP4 per document (1 + doc_id%4 full-screen 8x8 QuickTime-'raw '
    depth-24 frames; R/G/B are three distinct affine functions of the
    text's code points, with offsets DIFFERENT from the AVI row so the
    two container walks can't mask each other), run
    operators/mp4.encode_mp4 -> decode_mp4 -> per-frame stats
    (mp4_frame_stats: the demux goes through the real
    stsd/stsz/stsc/stco sample tables), and compare against a pure-SQL
    oracle computing the same Rec.601 integers from the text directly.
    The lossy MJPEG profile is proven separately by unit tests against
    the spec-compliant test encoder (tests/test_mp4_decode.py).

    Plan (r12, guide §4.1): ONE narrow Arrow stage — synth and decode
    fused in a single ``mapInPandas`` (iterator composition), so the
    payload never crosses the JVM boundary.  No shuffle before the
    display orderBy."""
    import numpy as np

    from netflix_data_ingestion_spark.operators.mp4 import decode_mp4, encode_mp4
    from netflix_data_ingestion_spark.operators.multimodal import (
        AVI_FRAME_SCHEMA,
        video_frame_batches,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(it):
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text or ""
                n = len(t)
                did = int(doc_id)
                frames = []
                for f in range(1 + did % 4):
                    if n:
                        cp = np.array(
                            [
                                ord(t[(f * 64 + i) % n]) % 256
                                for i in range(64)
                            ],
                            dtype=np.int64,
                        )
                    else:
                        cp = np.zeros(64, dtype=np.int64)
                    px = np.empty((8, 8, 3), dtype=np.uint8)
                    px[:, :, 0] = cp.reshape(8, 8)
                    px[:, :, 1] = ((cp + 47) % 256).reshape(8, 8)
                    px[:, :, 2] = ((cp + 193) % 256).reshape(8, 8)
                    frames.append(px)
                ids.append(doc_id)
                payloads.append(bytes(encode_mp4(frames)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    # sf0.1 documents is ONE parquet split; without this the whole
    # synth+decode chain serializes on a single task (measured: the
    # gif row ran 1-task 9-12s isolated).  One cheap narrow-input
    # shuffle before the Arrow stages; a no-op at real scale where
    # the scan has thousands of splits (ensure_parallelism contract).
    dec = video_frame_batches(decode_mp4, "media_id", "payload")
    fused = ensure_parallelism(docs).mapInPandas(
        lambda it: dec(synth(it)), AVI_FRAME_SCHEMA
    )
    return (
        fused
        .select(
            "media_id",
            "n_frames",
            "frame_idx",
            "width",
            "height",
            "mean_luma_milli",
        )
        .orderBy("media_id", "frame_idx")
    )


ORACLE_MP4_FRAMES = """
WITH base AS (
  SELECT doc_id,
         (1 + doc_id % 4)::INT AS n_frames,
         coalesce(text, '') AS t,
         length(coalesce(text, '')) AS n
  FROM documents
),
fr AS (
  SELECT doc_id, n_frames, t, n, f.f::INT AS frame_idx
  FROM base, unnest(range(0, n_frames)) AS f(f)
),
px AS (
  SELECT doc_id, n_frames, frame_idx,
         list_sum(list_transform(range(0, 64),
           i -> CASE WHEN n > 0
                     THEN 299 * (unicode(t[((frame_idx * 64 + i) % n) + 1]) % 256)
                        + 587 * ((unicode(t[((frame_idx * 64 + i) % n) + 1]) % 256 + 47) % 256)
                        + 114 * ((unicode(t[((frame_idx * 64 + i) % n) + 1]) % 256 + 193) % 256)
                     ELSE 299 * 0 + 587 * 47 + 114 * 193 END))::BIGINT AS s
  FROM fr
)
SELECT doc_id::BIGINT AS media_id,
       n_frames,
       frame_idx,
       8::INT AS width,
       8::INT AS height,
       (s // 64)::BIGINT AS mean_luma_milli
FROM px
ORDER BY media_id, frame_idx
"""


def q_multimodal_jpeg_progressive(spark: SparkSession, sf_dir: str
                                  ) -> DataFrame:
    """REAL progressive (SOF2) JPEG end-to-end, hash-checked: per
    document a 16x16 grayscale mosaic of four 8x8-CONSTANT tiles
    (tile values are affine functions of the text's code points with
    offsets distinct from the AVI/MP4/GIF rows), encoded through
    operators/jpeg.encode_jpeg_progressive — the full multi-scan
    script: DC successive approximation, spectral selection, AC
    refinement — then decoded by the SAME decode_real_features stage
    every other image codec rides.  Constant tiles have DC-only DCT
    coefficients that survive all-ones quantization EXACTLY, so the
    lossy codec's output is SQL-predictable: mean_luma_milli ==
    250 * (v0+v1+v2+v3).  The general-content profile (nonzero ACs,
    EOB runs, correction bits) is pinned bit-identical to the baseline
    decoder by tests/test_jpeg_decode.py.

    Plan (r12, guide §4.1): ONE narrow Arrow stage — synth and decode
    fused in a single ``mapInPandas`` (iterator composition), so the
    payload never crosses the JVM boundary.  No shuffle before the
    display orderBy (ensure_parallelism guards the one-split scan).
    """
    import numpy as np

    from netflix_data_ingestion_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )
    from netflix_data_ingestion_spark.operators.multimodal import (
        REAL_DECODE_SCHEMA,
        real_decode_batches,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    offsets = (0, 59, 131, 199)

    def synth(it):
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text or ""
                n = len(t)
                tiles = [
                    ((ord(t[j % n]) if n else 0) % 256 + off) % 256
                    for j, off in enumerate(offsets)
                ]
                vals = np.array(tiles, dtype=np.int64).reshape(2, 2)
                px = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
                ids.append(doc_id)
                payloads.append(bytes(encode_jpeg_progressive(px)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    dec = real_decode_batches()
    fused = ensure_parallelism(docs).mapInPandas(
        lambda it: dec(synth(it)), REAL_DECODE_SCHEMA
    )
    return (
        fused
        .select("media_id", "codec", "width", "height", "mean_luma_milli")
        .orderBy("media_id")
    )


ORACLE_JPEG_PROGRESSIVE = """
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t,
         length(coalesce(text, '')) AS n
  FROM documents
),
tiles AS (
  SELECT doc_id,
         list_sum(list_transform([0, 1, 2, 3],
           j -> ((CASE WHEN n > 0
                       THEN unicode(t[(j % n) + 1]) % 256
                       ELSE 0 END)
                 + [0, 59, 131, 199][j + 1]) % 256)) AS vsum
  FROM base
)
SELECT doc_id::BIGINT AS media_id,
       'jpeg' AS codec,
       16::INT AS width,
       16::INT AS height,
       (250 * vsum)::BIGINT AS mean_luma_milli
FROM tiles
ORDER BY media_id
"""


def q_multimodal_jpeg_12bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 12-bit extended-sequential (SOF1) JPEG end-to-end,
    hash-checked — the medical/scientific-corpus precision T.81 allows
    outside baseline.  Per document a 16x16 grayscale mosaic of four
    8x8-CONSTANT tiles whose values span the FULL 12-bit range
    (code-point * 16 + a distinct offset, mod 4096), encoded through
    operators/jpeg.encode_jpeg_12bit (16-bit DQT, SOF1, magnitude
    categories to 15/14) and decoded by the SAME decode_real_features
    stage every other image codec rides.  Constant tiles are DC-only
    and all-ones quantization preserves them exactly, so the codec's
    output is SQL-predictable: mean_luma_milli == 250*(v0+v1+v2+v3).
    The general-content profile (nonzero ACs, wide magnitudes) is
    pinned by tests/test_jpeg_decode.py round-trip bounds.

    Plan (r12, guide §4.1): ONE narrow Arrow stage — synth and decode
    fused in a single ``mapInPandas`` (iterator composition), so the
    payload never crosses the JVM boundary.  No shuffle before the
    display orderBy (ensure_parallelism guards the one-split scan).
    """
    import numpy as np

    from netflix_data_ingestion_spark.operators.jpeg import (
        encode_jpeg_12bit,
    )
    from netflix_data_ingestion_spark.operators.multimodal import (
        REAL_DECODE_SCHEMA,
        real_decode_batches,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    offsets = (7, 1031, 2063, 3089)

    def synth(it):
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text or ""
                n = len(t)
                tiles = [
                    ((ord(t[j % n]) if n else 0) % 256 * 16 + off) % 4096
                    for j, off in enumerate(offsets)
                ]
                vals = np.array(tiles, dtype=np.int64).reshape(2, 2)
                px = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
                ids.append(doc_id)
                payloads.append(bytes(encode_jpeg_12bit(px)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    dec = real_decode_batches()
    fused = ensure_parallelism(docs).mapInPandas(
        lambda it: dec(synth(it)), REAL_DECODE_SCHEMA
    )
    return (
        fused
        .select("media_id", "codec", "width", "height", "mean_luma_milli")
        .orderBy("media_id")
    )


ORACLE_JPEG_12BIT = """
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t,
         length(coalesce(text, '')) AS n
  FROM documents
),
tiles AS (
  SELECT doc_id,
         list_sum(list_transform([0, 1, 2, 3],
           j -> ((CASE WHEN n > 0
                       THEN unicode(t[(j % n) + 1]) % 256
                       ELSE 0 END) * 16
                 + [7, 1031, 2063, 3089][j + 1]) % 4096)) AS vsum
  FROM base
)
SELECT doc_id::BIGINT AS media_id,
       'jpeg' AS codec,
       16::INT AS width,
       16::INT AS height,
       (250 * vsum)::BIGINT AS mean_luma_milli
FROM tiles
ORDER BY media_id
"""


def q_multimodal_jpeg_lossless(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """REAL lossless (SOF3) JPEG end-to-end, hash-checked on ARBITRARY
    content — no constant-tile crutch needed because the profile is
    bit-exact by construction.  Per document a 16x16 grayscale image
    whose 256 pixels are the text's code points mod 256 (position-
    varying, full-range), encoded through operators/jpeg.
    encode_jpeg_lossless with the Paeth-like predictor 4 (a+b-c) and
    decoded by the SAME decode_real_features stage as every other
    codec; the oracle recomputes the exact integer mean luma straight
    from the text.  Pins the whole DPCM chain: predictor arithmetic,
    modulo-65536 reconstruction, per-sample Huffman magnitudes.

    Plan (r12, guide §4.1): ONE narrow Arrow stage — synth and decode
    fused in a single ``mapInPandas`` (iterator composition), so the
    payload never crosses the JVM boundary.  No shuffle before the
    display orderBy."""
    import numpy as np

    from netflix_data_ingestion_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )
    from netflix_data_ingestion_spark.operators.multimodal import (
        REAL_DECODE_SCHEMA,
        real_decode_batches,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(it):
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text or ""
                n = len(t)
                px = np.array(
                    [(ord(t[j % n]) if n else 0) % 256 for j in range(256)],
                    dtype=np.int64,
                ).reshape(16, 16)
                ids.append(doc_id)
                payloads.append(bytes(encode_jpeg_lossless(px, predictor=4)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    dec = real_decode_batches()
    fused = ensure_parallelism(docs).mapInPandas(
        lambda it: dec(synth(it)), REAL_DECODE_SCHEMA
    )
    return (
        fused
        .select("media_id", "codec", "width", "height", "mean_luma_milli")
        .orderBy("media_id")
    )


ORACLE_JPEG_LOSSLESS = """
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t,
         length(coalesce(text, '')) AS n
  FROM documents
),
px AS (
  SELECT doc_id,
         list_sum(list_transform(range(256),
           j -> CASE WHEN n > 0
                     THEN unicode(t[(j % n) + 1]) % 256
                     ELSE 0 END)) AS psum
  FROM base
)
SELECT doc_id::BIGINT AS media_id,
       'jpeg' AS codec,
       16::INT AS width,
       16::INT AS height,
       ((1000 * psum) // 256)::BIGINT AS mean_luma_milli
FROM px
ORDER BY media_id
"""


def q_multimodal_jpeg_prog12(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """12-bit PROGRESSIVE (SOF2 at precision 12) decoded real: the
    multi-scan machinery (DC successive approximation, spectral
    selection, AC refinement) running over 12-bit magnitudes (DC
    categories to 15, the full EOBn grid at size<=14).  Constant-tile
    mosaic spanning the full 12-bit range with offsets distinct from
    the sequential 12-bit row; the twin-identity test additionally
    pins prog-12 decode bit-identical to sequential-12 on general
    content.  Plan (r12): ONE fused Arrow stage (jpeg_progressive shape).
    """
    import numpy as np

    from netflix_data_ingestion_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )
    from netflix_data_ingestion_spark.operators.multimodal import (
        REAL_DECODE_SCHEMA,
        real_decode_batches,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    offsets = (13, 977, 2111, 3203)

    def synth(it):
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text or ""
                n = len(t)
                tiles = [
                    ((ord(t[j % n]) if n else 0) % 256 * 16 + off) % 4096
                    for j, off in enumerate(offsets)
                ]
                vals = np.array(tiles, dtype=np.int64).reshape(2, 2)
                px = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
                ids.append(doc_id)
                payloads.append(
                    bytes(encode_jpeg_progressive(px, prec=12))
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    dec = real_decode_batches()
    fused = ensure_parallelism(docs).mapInPandas(
        lambda it: dec(synth(it)), REAL_DECODE_SCHEMA
    )
    return (
        fused
        .select("media_id", "codec", "width", "height", "mean_luma_milli")
        .orderBy("media_id")
    )


ORACLE_JPEG_PROG12 = """
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t,
         length(coalesce(text, '')) AS n
  FROM documents
),
tiles AS (
  SELECT doc_id,
         list_sum(list_transform([0, 1, 2, 3],
           j -> ((CASE WHEN n > 0
                       THEN unicode(t[(j % n) + 1]) % 256
                       ELSE 0 END) * 16
                 + [13, 977, 2111, 3203][j + 1]) % 4096)) AS vsum
  FROM base
)
SELECT doc_id::BIGINT AS media_id,
       'jpeg' AS codec,
       16::INT AS width,
       16::INT AS height,
       (250 * vsum)::BIGINT AS mean_luma_milli
FROM tiles
ORDER BY media_id
"""


def q_doc_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sample.source_mixture_plan: the temperature-scaled
    (alpha=0.5 via IEEE sqrt — bit-exact in any engine) data-mixture
    table an LLM training run samples from — per source: exact token
    count, normalized draw weight in ppm, and the epochs-per-source a
    one-pass token budget implies, all frozen to integer units and
    computed with DECIMAL(38,0) integral division (overflow-safe at
    100 TB token counts).  Small high-quality sources upsample, huge
    crawls downsample — the standard mixture shape."""
    from netflix_data_ingestion_spark.operators.sample import (
        source_mixture_plan,
    )

    docs = _t(spark, sf_dir, "documents")
    return source_mixture_plan(docs, max_epochs=10)


ORACLE_SOURCE_MIXTURE = f"""
WITH {_DUCK_TOKS},
per AS (
  SELECT d.source,
         COUNT(*)::BIGINT AS n_docs,
         SUM(len(t.tk))::BIGINT AS tokens
  FROM documents d JOIN toks t USING (doc_id)
  GROUP BY 1
),
w AS (
  SELECT *,
         CAST(round(sqrt(tokens::DOUBLE) * 1e6) AS HUGEINT) AS w_micro
  FROM per
),
tot AS (
  SELECT SUM(w_micro)::HUGEINT AS w_total,
         SUM(tokens)::HUGEINT AS budget
  FROM w
)
SELECT source, n_docs, tokens,
       ((w_micro * 1000000::HUGEINT) // w_total)::BIGINT AS weight_ppm,
       CASE WHEN tokens > 0 THEN
         least(10::BIGINT,
               ((w_micro * budget + w_total * tokens::HUGEINT
                 - 1::HUGEINT)
                // (w_total * tokens::HUGEINT))::BIGINT)
       ELSE 0::BIGINT END AS n_epochs
FROM w CROSS JOIN tot
ORDER BY source
"""


def q_doc_mixture_realized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sample.apply_mixture: realize the source-mixture plan
    — each doc appears once per epoch 1..n_epochs(source), the
    replicated corpus a mixture-weighted run actually reads.  The plan
    side is source-cardinality (broadcast); the fan-out is an in-task
    explode — no shuffle of the corpus."""
    from netflix_data_ingestion_spark.operators.sample import (
        apply_mixture,
        source_mixture_plan,
    )

    docs = _t(spark, sf_dir, "documents")
    plan = source_mixture_plan(docs, max_epochs=10)
    return apply_mixture(docs, plan).orderBy("doc_id", "epoch")


ORACLE_MIXTURE_REALIZED = f"""
WITH plan AS ({ORACLE_SOURCE_MIXTURE.replace("ORDER BY source", "")})
SELECT d.doc_id, d.source, e.epoch::BIGINT AS epoch
FROM documents d
JOIN plan p USING (source),
     unnest(generate_series(1, p.n_epochs)) AS e(epoch)
WHERE p.n_epochs > 0
ORDER BY d.doc_id, epoch
"""


def q_doc_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/augment.fim_transform: deterministic fill-in-the-middle
    (PSM) rearrangement of a hash-gated ~50% of documents —
    <PRE>prefix<SUF>suffix<MID>middle — the infilling training
    transform, as a pure narrow codegen projection whose output the
    oracle reproduces byte-for-byte from the same md5 coins."""
    from netflix_data_ingestion_spark.operators.augment import fim_transform

    docs = _t(spark, sf_dir, "documents")
    return fim_transform(docs).orderBy("doc_id")


ORACLE_FIM = """
WITH c AS (
  SELECT doc_id, text, length(text) AS n,
         ('0x' || substr(md5('fim-v1|gate|' || doc_id::VARCHAR), 1, 8))::BIGINT
           % 2 AS g,
         ('0x' || substr(md5('fim-v1|a|' || doc_id::VARCHAR), 1, 8))::BIGINT
           % (length(text) + 1) + 1 AS a,
         ('0x' || substr(md5('fim-v1|b|' || doc_id::VARCHAR), 1, 8))::BIGINT
           % (length(text) + 1) + 1 AS b
  FROM documents
),
cut AS (
  SELECT doc_id, text, n, g,
         least(a, b) AS lo, greatest(a, b) AS hi
  FROM c
)
SELECT doc_id,
       (text IS NOT NULL AND n >= 2 AND g = 0) AS is_fim,
       CASE WHEN text IS NOT NULL AND n >= 2 AND g = 0
            THEN '<PRE>' || substr(text, 1, lo - 1)
              || '<SUF>' || substr(text, hi, n - hi + 1)
              || '<MID>' || substr(text, lo, hi - lo)
            ELSE text END AS out_text
FROM cut
ORDER BY doc_id
"""


def q_doc_span_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/augment.span_corrupt: T5-style span corruption —
    15%-coin token masking with consecutive masked tokens collapsed
    into numbered sentinels, emitting the (inputs, targets) denoising
    pair.  The Spark side walks each doc's spans in ONE F.aggregate
    fold inside codegen (no explode, no shuffle, no Python); the
    oracle replays the same coins through ordinary window SQL."""
    from netflix_data_ingestion_spark.operators.augment import span_corrupt

    docs = _t(spark, sf_dir, "documents")
    return span_corrupt(docs).orderBy("doc_id")


ORACLE_SPAN_CORRUPT = f"""
WITH {_DUCK_TOKS},
tok AS (
  SELECT doc_id, tk[u.i + 1] AS tok, u.i::BIGINT AS i
  FROM toks, unnest(range(0, len(tk))) AS u(i)
),
c AS (
  SELECT doc_id, tok, i,
         (('0x' || substr(md5('t5-v1|' || doc_id::VARCHAR || '|' || i::VARCHAR),
                          1, 8))::BIGINT % 100) < 15 AS m
  FROM tok
),
s AS (
  SELECT *, m AND NOT coalesce(lag(m) OVER w, false) AS is_start
  FROM c WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
k AS (
  SELECT *,
         SUM(CASE WHEN is_start THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i) - 1 AS kk
  FROM s
),
agg AS (
  SELECT doc_id,
         string_agg(CASE WHEN NOT m THEN tok
                         WHEN is_start THEN '<extra_id_' || kk || '>'
                    END, ' ' ORDER BY i) AS inputs,
         string_agg(CASE WHEN m AND is_start
                           THEN '<extra_id_' || kk || '> ' || tok
                         WHEN m THEN tok
                    END, ' ' ORDER BY i) AS targets,
         COALESCE(MAX(CASE WHEN is_start THEN kk + 1 ELSE 0 END), 0) AS n_spans
  FROM k GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d.text IS NOT NULL
            THEN coalesce(a.n_spans, 0)::INT END AS n_spans,
       CASE WHEN d.text IS NOT NULL
            THEN coalesce(a.inputs, '') END AS inputs,
       CASE WHEN d.text IS NOT NULL
            THEN coalesce(a.targets, '') END AS targets
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


def q_doc_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/context.length_bucket_batches: the padding-efficient
    batch plan — 64-token-wide length buckets, md5-shuffled docs packed
    into 8-row batches, per-doc padding waste bounded by the bucket
    width.  The in-bucket rank is DISTRIBUTED (prefix_sum_ranged over
    the global order minus broadcast bucket bases), never a per-bucket
    window — a hot bucket cannot concentrate a sort in one task."""
    from netflix_data_ingestion_spark.operators.context import (
        length_bucket_batches,
    )

    docs = _t(spark, sf_dir, "documents")
    return length_bucket_batches(docs).orderBy("doc_id")


ORACLE_LENGTH_BATCHES = f"""
WITH {_DUCK_TOKS},
n AS (
  SELECT d.doc_id,
         coalesce(len(t.tk), 0)::BIGINT AS n_tokens
  FROM documents d JOIN toks t USING (doc_id)
),
b AS (
  SELECT doc_id, n_tokens,
         (n_tokens // 64)::INT AS bucket,
         md5('v1|' || doc_id::VARCHAR) AS h
  FROM n
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) - 1
           AS rk
  FROM b
)
SELECT doc_id, n_tokens, bucket,
       ((bucket + 1) * 64)::INT AS pad_to,
       (rk // 8)::INT AS batch_id,
       (rk % 8)::INT AS seq_in_batch
FROM r
ORDER BY doc_id
"""


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from netflix_data_ingestion_spark.operators.multimodal import (
        frame_sample_stub,
    )
    from netflix_data_ingestion_spark.operators.util import ensure_parallelism

    docs = _t(spark, sf_dir, "documents")
    media = attach_binary_payload(docs, "doc_id", "text", "video")
    return frame_sample_stub(ensure_parallelism(media)).orderBy(
        "media_id", "frame_idx"
    )


# documents are pure ASCII, so VARCHAR substring == byte slice and
# octet_length == length; frame windows mirror multimodal._FRAME_STRIDE/_MAX_FRAMES
ORACLE_FRAME_SAMPLE = """
WITH m AS (
  SELECT doc_id::BIGINT AS media_id, text,
         octet_length(encode(text))::BIGINT AS n_bytes
  FROM documents
),
f AS (
  SELECT media_id, text, n_bytes, i::INT AS frame_idx,
         (i * 256)::BIGINT AS frame_offset
  FROM m, unnest(range(0, LEAST(8, GREATEST(1, n_bytes // 256)))) AS r(i)
)
SELECT media_id, frame_idx, frame_offset,
       LEAST(256, n_bytes - frame_offset)::BIGINT AS frame_len,
       md5(substring(text, (frame_offset + 1)::INT,
                     LEAST(256, n_bytes - frame_offset)::INT)) AS frame_md5
FROM f
ORDER BY media_id, frame_idx
"""


# ---------------------------------------------------------------------------
# Semi-structured: JSON property extraction + aggregation
# ---------------------------------------------------------------------------


def q_event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
            "value",
        )
        .groupBy("prop_k")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("prop_k")
    )


ORACLE_PROPS_JSON = """
SELECT json_extract_string(props, '$.k')::INT AS prop_k,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# UNNEST/explode aggregation: global top-20 tokens across the corpus
# ---------------------------------------------------------------------------


def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from netflix_data_ingestion_spark.operators.util import ensure_parallelism

    docs = _t(spark, sf_dir, "documents")
    tok = ensure_parallelism(docs).select(
        F.explode(textstats.tokens(F.col("text"))).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


ORACLE_TOP_TOKENS = f"""
WITH {_DUCK_TOKS},
tok AS (SELECT unnest(tk) AS token FROM toks)
SELECT token, COUNT(*) AS n
FROM tok GROUP BY 1
ORDER BY n DESC, token ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Deterministic hash split: stable train/val/test assignment
# ---------------------------------------------------------------------------


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from netflix_data_ingestion_spark.operators.split import hash_split

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    out = hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="v1"
    )
    return (
        out.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("split")
    )


ORACLE_TRAIN_TEST_SPLIT = """
WITH f AS (
  SELECT doc_id,
         ('0x' || substr(md5('v1|' || doc_id::VARCHAR), 1, 8))::UBIGINT::DOUBLE
           / 4294967296.0 AS frac
  FROM documents
),
s AS (
  SELECT doc_id,
         CASE WHEN frac < 0.8 THEN 'train'
              WHEN frac < 0.9 THEN 'val'
              ELSE 'test' END AS split
  FROM f
)
SELECT split, COUNT(*) AS n_docs,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM s GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Overlapping token-window chunking (the RAG/context-window chunker)
# ---------------------------------------------------------------------------


def q_doc_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/textstats.chunk_text: 64-token windows every 48 tokens
    (16-token overlap).  Exercises the explode-of-start-sequence plan
    including the zero-token short-circuit (empty docs emit no rows)."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.chunk_text(
        docs, "doc_id", "text", chunk_tokens=64, overlap=16
    ).orderBy("doc_id", "chunk_idx")


ORACLE_CHUNK_TEXT = f"""
WITH {_DUCK_TOKS},
starts AS (
  SELECT doc_id, tk, unnest(range(1, len(tk) + 1, 48)) AS s
  FROM toks WHERE len(tk) > 0
)
SELECT doc_id,
       ((s - 1) // 48)::BIGINT AS chunk_idx,
       len(list_slice(tk, s, least(s + 63, len(tk))))::BIGINT
         AS n_chunk_tokens,
       array_to_string(list_slice(tk, s, least(s + 63, len(tk))), ' ')
         AS chunk_text
FROM starts
ORDER BY doc_id, chunk_idx
"""


def q_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/linededup.remove_common_segments: corpus-level
    boilerplate stripping (RefinedWeb-style line dedup).  The synthetic
    corpus is single-line, so the contract exercises the mechanism at
    token granularity (delim=' ', doc-frequency >= 390 of 500 docs);
    real web corpora run it with delim='\\n'."""
    from netflix_data_ingestion_spark.operators.linededup import (
        remove_common_segments,
    )

    docs = _t(spark, sf_dir, "documents")
    return remove_common_segments(
        docs, "doc_id", "text", delim=" ", min_docs=390
    ).orderBy("doc_id")


ORACLE_LINE_DEDUP = """
WITH segs AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS segment,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
common AS (
  SELECT segment FROM segs
  GROUP BY segment HAVING count(DISTINCT doc_id) >= 390
),
kept AS (
  SELECT * FROM segs WHERE segment NOT IN (SELECT segment FROM common)
),
rebuilt AS (
  SELECT doc_id,
         string_agg(segment, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
totals AS (SELECT doc_id, count(*) AS n_segments FROM segs GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       t.n_segments::BIGINT AS n_segments,
       (t.n_segments - coalesce(r.n_kept, 0))::BIGINT AS n_removed
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
ORDER BY doc_id
"""


def q_doc_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/textstats.inverted_index: term -> (doc_freq, sorted
    posting list) with the stopword cut at 79% corpus frequency (the synthetic vocabulary's doc-frequency knee)."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.inverted_index(
        docs, "doc_id", "text", min_df=2, max_df_ratio=0.79
    ).orderBy("term")


ORACLE_INVERTED_INDEX = f"""
WITH {_DUCK_TOKS},
pairs AS (
  SELECT DISTINCT doc_id, unnest(tk) AS term FROM toks
),
grouped AS (
  SELECT term, count(*)::BIGINT AS doc_freq,
         string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
  FROM pairs GROUP BY term
)
SELECT term, doc_freq, postings FROM grouped
WHERE doc_freq >= 2
  AND doc_freq::DOUBLE <= (SELECT count(DISTINCT doc_id) FROM documents)::DOUBLE * 0.79
ORDER BY term
"""


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.semantic_dedup_pairs: SemDeDup — k-means cluster
    candidates (k=16, 1 Lloyd round — clusters are CANDIDATE buckets, not a
    model, so extra refinement rounds buy driver-coordinated jobs, not
    recall; the oracle-proven kmeans_train;
    SemDeDup's k must grow with corpus size — 16 keeps within-cluster
    all-pairs ~ (n/16)^2 affordable at the bench scale)
    then the shared exact cosine verify within clusters only."""
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.semantic_dedup_pairs(
        emb, "vec_id", "embedding", k=16, iters=1, threshold=0.4
    ).orderBy("id_a", "id_b")


def _semantic_dedup_oracle(
    k: int = 16, iters: int = 1, scale: int = 1_000_000,
    threshold: float = 0.4,
) -> str:
    fin = iters + 1
    return f"""{_kmeans_cte_chain(k, iters, scale)},
d{fin} AS (
  SELECT p.vec_id, c.cid,
         SUM((p.q - c.qc) * (p.q - c.qc))::BIGINT AS dist
  FROM pos p JOIN c{iters} c USING (pos) GROUP BY 1, 2
),
asgf AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM d{fin}) WHERE rn = 1
),
cand AS (
  SELECT x.vec_id AS ida, y.vec_id AS idb
  FROM asgf x JOIN asgf y USING (cid)
  WHERE x.vec_id < y.vec_id
)
SELECT p.ida AS id_a, p.idb AS id_b,
       ROUND({_DUCK_DOT.format(a='ea', b='eb')} /
             (sqrt({_DUCK_DOT.format(a='ea', b='ea')}) *
              sqrt({_DUCK_DOT.format(a='eb', b='eb')})), 6) AS cosine_sim
FROM cand p
JOIN embeddings ea ON ea.vec_id = p.ida
JOIN embeddings eb ON eb.vec_id = p.idb
WHERE ROUND({_DUCK_DOT.format(a='ea', b='eb')} /
            (sqrt({_DUCK_DOT.format(a='ea', b='ea')}) *
             sqrt({_DUCK_DOT.format(a='eb', b='eb')})), 6) >= {threshold}
ORDER BY id_a, id_b
"""


ORACLE_SEMANTIC_DEDUP = _semantic_dedup_oracle()


def q_user_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sketch.hll_registers: deterministic HLL register table
    over event user_ids — the mergeable distinct-count sketch, register
    math reproduced exactly by the oracle (md5 split + bin-length rho)."""
    from netflix_data_ingestion_spark.operators.sketch import hll_registers

    events = _t(spark, sf_dir, "events")
    return hll_registers(events, "user_id", buckets=64).orderBy("bucket")


ORACLE_HLL = """
WITH h AS (
  SELECT md5('hll|' || user_id::VARCHAR) AS hx
  FROM events WHERE user_id IS NOT NULL
),
rb AS (
  SELECT (('0x' || substring(hx, 1, 8))::BIGINT % 64) AS bucket,
         ('0x' || substring(hx, 9, 8))::BIGINT AS w
  FROM h
)
SELECT bucket,
       max(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END)::INT
         AS register
FROM rb GROUP BY bucket ORDER BY bucket
"""


def q_events_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/split.time_split: leakage-safe temporal routing —
    train < Jan 20, val < Jan 26, test = the rest; per-band counts
    (hash_split's uniform routing would leak future events of a user
    into training)."""
    from netflix_data_ingestion_spark.operators.split import time_split

    events = _t(spark, sf_dir, "events")
    return (
        time_split(
            events,
            "ts",
            {
                "train": "2024-01-20",
                "val": "2024-01-26",
                "test": "9999-01-01",
            },
        )
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("split")
    )


ORACLE_TIME_SPLIT = """
SELECT CASE WHEN ts < TIMESTAMP '2024-01-20' THEN 'train'
            WHEN ts < TIMESTAMP '2024-01-26' THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*)::BIGINT AS n_events,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events
WHERE ts IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def q_doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/textstats.bm25_scores for the query {hash, join,
    vector}: per-term contributions quantized to int64 micro-units
    before the per-doc sum (FP-order-immune), log-free portable idf."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.bm25_scores(
        docs, "doc_id", "text", ["hash", "join", "vector"]
    ).orderBy("doc_id")


ORACLE_BM25 = f"""
WITH {_DUCK_TOKS},
stats AS (
  SELECT COUNT(*)::BIGINT AS n_docs, SUM(len(tk))::BIGINT AS total_tok
  FROM toks
),
lengths AS (SELECT doc_id, len(tk)::BIGINT AS dl FROM toks),
hits AS (
  SELECT doc_id, u.t AS term, COUNT(*)::BIGINT AS tf
  FROM toks, unnest(tk) AS u(t)
  WHERE u.t IN ('hash', 'join', 'vector')
  GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*)::BIGINT AS dfn FROM hits GROUP BY 1),
scored AS (
  SELECT h.doc_id,
         round(
           ((s.n_docs::DOUBLE - d.dfn + 0.5) / (d.dfn::DOUBLE + 0.5))
           * ((h.tf::DOUBLE * (1.2 + 1.0))
              / (h.tf::DOUBLE
                 + 1.2 * (1.0 - 0.75
                          + 0.75 * (l.dl::DOUBLE
                                    / (s.total_tok::DOUBLE / s.n_docs)))))
           * 1000000
         )::BIGINT AS p
  FROM hits h
  JOIN dfreq d USING (term)
  JOIN lengths l USING (doc_id), stats s
)
SELECT doc_id, SUM(p)::BIGINT AS score_micro
FROM scored GROUP BY 1 ORDER BY doc_id
"""


def q_order_price_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/outliers.winsorize: per-status p5/p95 percentile
    clipping of order totals — the tail-taming feature transform
    (clipped values are exact nearest-rank SELECTIONS, no
    interpolation arithmetic)."""
    from netflix_data_ingestion_spark.operators.outliers import winsorize

    orders = _t(spark, sf_dir, "orders")
    return (
        winsorize(
            orders, ["o_orderstatus"], "o_totalprice", lo_q=0.05, hi_q=0.95
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            "o_totalprice_winsorized",
        )
        .orderBy("o_orderkey")
    )


ORACLE_WINSORIZED = """
WITH r AS (
  SELECT o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice ASC) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
),
b AS (
  SELECT o_orderstatus,
         MAX(CASE WHEN rn = CEIL(0.05 * n) THEN o_totalprice END) AS lo,
         MAX(CASE WHEN rn = CEIL(0.95 * n) THEN o_totalprice END) AS hi
  FROM r GROUP BY 1
)
SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
       least(greatest(o.o_totalprice, b.lo), b.hi)
         AS o_totalprice_winsorized
FROM orders o JOIN b USING (o_orderstatus)
ORDER BY o_orderkey
"""


def q_dedup_exact_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.exact_dedup_canonical: exact dedup on the
    canonicalized text (case/punct/whitespace-insensitive digests) —
    groups variants plain exact_dedup keeps apart."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup_canonical(docs, "doc_id", "text").orderBy(
        "doc_id"
    )


ORACLE_DEDUP_CANONICAL = """
WITH c AS (
  SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
           ' +', ' ', 'g')) AS canon
  FROM documents
),
h AS (SELECT doc_id, md5(canon) AS content_hash FROM c),
g AS (SELECT content_hash, MIN(doc_id) AS canonical_id,
             COUNT(*) AS group_size
      FROM h GROUP BY 1)
SELECT h.doc_id, h.content_hash, g.canonical_id, g.group_size
FROM h JOIN g USING (content_hash)
ORDER BY doc_id
"""


def q_user_hll_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sketch.hll_registers with key_cols: one register table
    PER EVENT TYPE (|types| x buckets rows) — the per-domain
    distinct-user sketch table a metrics store maintains by MAX-merge
    of daily deltas."""
    from netflix_data_ingestion_spark.operators.sketch import hll_registers

    events = _t(spark, sf_dir, "events")
    return hll_registers(
        events, "user_id", buckets=32, key_cols=("event_type",)
    ).orderBy("event_type", "bucket")


ORACLE_HLL_BY_TYPE = """
WITH h AS (
  SELECT event_type, md5('hll|' || user_id::VARCHAR) AS hx
  FROM events WHERE user_id IS NOT NULL
),
rb AS (
  SELECT event_type,
         (('0x' || substring(hx, 1, 8))::BIGINT % 32) AS bucket,
         ('0x' || substring(hx, 9, 8))::BIGINT AS w
  FROM h
)
SELECT event_type, bucket,
       max(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END)::INT
         AS register
FROM rb GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_embedding_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """functions/vectors.l2_normalize in long format (the
    group-centroid contract's comparison discipline): one double
    division per component by the fold-ordered norm, rounded once to
    6dp for the cross-engine value hash."""
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    unit = emb.select(
        "vec_id", vectors.l2_normalize(F.col("embedding")).alias("u")
    )
    return (
        unit.select("vec_id", F.posexplode("u").alias("pos", "component"))
        .select(
            "vec_id",
            F.col("pos").cast("int").alias("pos"),
            F.round(F.col("component"), 6).alias("component"),
        )
        .orderBy("vec_id", "pos")
    )


ORACLE_L2_NORMALIZE = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
n AS (
  SELECT vec_id, sqrt({_DUCK_DOT.format(a='e', b='e')}) AS nrm
  FROM e
)
SELECT e.vec_id, (i - 1)::INT AS pos,
       ROUND(e.embedding[i]::DOUBLE / n.nrm, 6) AS component
FROM e JOIN n USING (vec_id),
     unnest(range(1, len(e.embedding) + 1)) AS r(i)
ORDER BY vec_id, pos
"""


def q_doc_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sample.pps_systematic_sample: ~20 docs per source with
    inclusion probability proportional to n_chars — integer systematic
    PPS over the md5 order."""
    from netflix_data_ingestion_spark.operators.sample import (
        pps_systematic_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        pps_systematic_sample(docs, "source", "doc_id", "n_chars", k=20)
        .select("doc_id", "source", "n_hits")
        .orderBy("doc_id")
    )


ORACLE_PPS_SAMPLE = """
WITH base AS (
  SELECT doc_id, source,
         md5('v1|' || doc_id::VARCHAR) AS h,
         greatest(n_chars::BIGINT, 0) AS w
  FROM documents
),
c AS (
  SELECT doc_id, source, w,
         sum(w) OVER (PARTITION BY source ORDER BY h, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(w) OVER (PARTITION BY source) AS total
  FROM base
),
s AS (
  SELECT *, (total + 19) // 20 AS step FROM c
)
SELECT doc_id, source,
       ((cw // step) - ((cw - w) // step))::BIGINT AS n_hits
FROM s
WHERE (cw // step) - ((cw - w) // step) > 0
ORDER BY doc_id
"""


def q_user_context_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/textstats-adjacent featurization: the trailing-5-event
    context string per event (model-input assembly; bounded window
    frame, one keyed shuffle)."""
    from netflix_data_ingestion_spark.operators.context import (
        trailing_context,
    )

    events = _t(spark, sf_dir, "events")
    return (
        trailing_context(
            events, ["user_id"], ["ts", "event_id"], "event_type", n=5
        )
        .select("event_id", "user_id", "context")
        .orderBy("event_id")
    )


ORACLE_CONTEXT = """
SELECT event_id, user_id,
       array_to_string(
         list(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), ' ') AS context
FROM events
ORDER BY event_id
"""


def q_doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/textstats.bpe_token_stats: BPE-style pretokenizer
    counts (the token-budget estimator) — regex restricted to
    Java==RE2-portable ASCII constructs."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.bpe_token_stats(docs, "doc_id", "text").orderBy(
        "doc_id"
    )


ORACLE_BPE_STATS = r"""
WITH tk AS (
  SELECT doc_id,
         regexp_extract_all(text,
           '''[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       len(list_filter(toks, t -> regexp_matches(t, '^''?[A-Za-z]')))::BIGINT
         AS n_word,
       len(list_filter(toks, t -> regexp_matches(t, '^[0-9]')))::BIGINT
         AS n_number,
       (len(toks)
        - len(list_filter(toks, t -> regexp_matches(t, '^''?[A-Za-z]')))
        - len(list_filter(toks, t -> regexp_matches(t, '^[0-9]'))))::BIGINT
         AS n_symbol
FROM tk
ORDER BY doc_id
"""


def q_doc_quality_source_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: per-SOURCE adaptive quality gate — keep documents at
    or above their own source's p25 quality (textstats.quality_score ->
    profile.exact_quantiles -> broadcast threshold join).  A fixed
    global cutoff over-prunes clean sources and under-prunes noisy
    ones; the per-source percentile is the standard corpus-mix-
    preserving form.  NULL-score (empty/token-free) docs are excluded
    before ranking — engines disagree on NULL sort position."""
    from netflix_data_ingestion_spark.operators.profile import (
        exact_quantiles,
    )

    docs = _t(spark, sf_dir, "documents")
    q = textstats.quality_score(docs, "doc_id", "text").select(
        "doc_id", "quality_score"
    )
    scored = (
        docs.select("doc_id", "source")
        .join(q, "doc_id")
        .filter(F.col("quality_score").isNotNull())
    )
    p25 = exact_quantiles(
        scored, ["source"], "quality_score", qs=(0.25,)
    ).select("source", "p25")
    return (
        scored.join(F.broadcast(p25), "source")
        .filter(F.col("quality_score") >= F.col("p25"))
        .select("doc_id", "source", "quality_score", "p25")
        .orderBy("doc_id")
    )


ORACLE_QUALITY_SOURCE_CUT = f"""
WITH {_DUCK_TOKS},
qbase AS (
  SELECT d.doc_id, d.source,
         length(d.text)::BIGINT AS n,
         length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))::BIGINT AS alpha,
         length(regexp_replace(d.text, '[^0-9]', '', 'g'))::BIGINT AS digit,
         length(regexp_replace(d.text, '[^ ]', '', 'g'))::BIGINT AS space,
         len(t.tk)::BIGINT AS n_tokens,
         len(list_filter(t.tk, x -> x IN ({_STOP_LIST_SQL})))::BIGINT AS n_stop
  FROM documents d JOIN toks t USING (doc_id)
  WHERE length(d.text) > 0 AND len(t.tk) > 0
),
scored AS (
  SELECT doc_id, source,
         (4 * alpha * n_tokens + 3 * n_stop * n +
          3 * n_tokens * (alpha + digit + space))::DOUBLE
           / (10 * n * n_tokens)::DOUBLE AS quality_score
  FROM qbase
),
rk AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY quality_score ASC) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM scored
),
p AS (
  SELECT source,
         MAX(CASE WHEN rn = CEIL(0.25 * n) THEN quality_score END) AS p25
  FROM rk GROUP BY 1
)
SELECT s.doc_id, s.source, s.quality_score, p.p25
FROM scored s JOIN p USING (source)
WHERE s.quality_score >= p.p25
ORDER BY s.doc_id
"""


def q_corpus_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/textstats.bigram_lm_counts: the corpus bigram count
    table with Kneser-Ney ingredients (context mass + continuation
    breadth) — one corpus pass, two unordered window exchanges over the
    count table."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.bigram_lm_counts(docs, "doc_id", "text").orderBy(
        "w1", "w2"
    )


ORACLE_BIGRAM_LM = f"""
WITH {_DUCK_TOKS},
bg AS (
  SELECT tk[i] AS w1, tk[i + 1] AS w2
  FROM toks, unnest(range(1, len(tk))) AS u(i)
),
counts AS (
  SELECT w1, w2, COUNT(*)::BIGINT AS cnt FROM bg GROUP BY 1, 2
)
SELECT w1, w2, cnt,
       SUM(cnt) OVER (PARTITION BY w1)::BIGINT AS ctx_total,
       COUNT(*) OVER (PARTITION BY w2)::BIGINT AS cont_w2
FROM counts
ORDER BY w1, w2
"""


def q_doc_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/inference.score_documents: the batched model-scoring
    stage (Arrow mapInPandas, per-task model load, bounded batches) —
    the deterministic stand-in model makes even this stage value-hash
    checkable (n_batches is task-layout-dependent and excluded)."""
    from netflix_data_ingestion_spark.operators.inference import (
        score_documents,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        score_documents(docs, "doc_id", "text")
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy("doc_id")
    )


ORACLE_MODEL_SCORES = """
SELECT doc_id,
       ROUND((('0x' || substring(md5('m1|' || text), 1, 8))::BIGINT)
             / 4294967296.0, 6) AS score
FROM documents
ORDER BY doc_id
"""


def q_doc_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/packing.pack_windows: GPT-style cross-document
    fixed-16-token window layout — docs straddle windows, zero padding
    waste; offsets from the distributed exclusive prefix sum
    (keys.prefix_sum_ranged), spans by integer arithmetic."""
    from netflix_data_ingestion_spark.operators.packing import pack_windows

    docs = _t(spark, sf_dir, "documents")
    return pack_windows(docs, "doc_id", "text", window=16).orderBy(
        "window_id", "doc_id"
    )


ORACLE_PACK_WINDOWS = f"""
WITH {_DUCK_TOKS},
d AS (
  SELECT doc_id, len(tk)::BIGINT AS n_tok FROM toks WHERE len(tk) > 0
),
o AS (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS strt
  FROM d
),
s AS (
  SELECT doc_id, n_tok, strt, strt + n_tok AS fin,
         strt // 16 AS w0, (strt + n_tok - 1) // 16 AS w1
  FROM o
)
SELECT u.w AS window_id, doc_id,
       (greatest(strt, u.w * 16) - strt)::BIGINT AS doc_start_tok,
       (least(fin, (u.w + 1) * 16) - greatest(strt, u.w * 16))::BIGINT
         AS n_toks
FROM s, unnest(range(w0, w1 + 1)) AS u(w)
ORDER BY window_id, doc_id
"""


def q_doc_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/context.build_vocab + tokens_to_ids: the text-to-tensor
    hop — top-15 vocabulary (ids 1..15, 0 = OOV), docs < 100 truncated
    to 12 tokens, mapped through the broadcast vocab in long format."""
    from netflix_data_ingestion_spark.operators.context import (
        build_vocab,
        tokens_to_ids,
    )

    docs = _t(spark, sf_dir, "documents")
    vocab = build_vocab(docs, "text", vocab_size=16)
    return tokens_to_ids(
        docs.where(F.col("doc_id") < 100), "doc_id", "text", vocab,
        max_len=12,
    ).orderBy("doc_id", "pos")


ORACLE_TOKEN_IDS = f"""
WITH {_DUCK_TOKS},
counts AS (
  SELECT u.t AS token, COUNT(*) AS cnt
  FROM toks, unnest(tk) AS u(t)
  GROUP BY 1
),
vocab AS (
  SELECT token,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC)::INT AS token_id
  FROM counts
  QUALIFY token_id <= 15
),
long AS (
  SELECT doc_id, (i - 1)::INT AS pos, tk[i] AS token
  FROM toks, unnest(range(1, least(len(tk), 12) + 1)) AS r(i)
  WHERE doc_id < 100
)
SELECT l.doc_id, l.pos, COALESCE(v.token_id, 0)::INT AS token_id
FROM long l LEFT JOIN vocab v USING (token)
ORDER BY doc_id, pos
"""


def q_doc_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/split.kfold_assign: stable 5-fold CV assignment —
    pmod(md5, k), growth- and partitioning-stable like hash_split."""
    from netflix_data_ingestion_spark.operators.split import kfold_assign

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return kfold_assign(docs, "doc_id", k=5).orderBy("doc_id")


ORACLE_KFOLD = """
SELECT doc_id, source,
       ((('0x' || substring(md5('v1|' || doc_id::VARCHAR), 1, 8))::BIGINT
         % 5))::INT AS fold
FROM documents
ORDER BY doc_id
"""


def q_doc_padded_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/context.pad_tokens: fixed-length (12) model inputs —
    truncate, right-pad, attention mask; long-format explode for the
    cross-engine value hash."""
    from netflix_data_ingestion_spark.operators.context import pad_tokens

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    padded = pad_tokens(docs, "doc_id", "text", max_len=12)
    return (
        padded.select(
            "doc_id",
            "n_tokens",
            F.posexplode(F.arrays_zip("tokens", "attention_mask")).alias(
                "pos", "z"
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.col("pos").cast("int").alias("pos"),
            F.col("z.tokens").alias("token"),
            F.col("z.attention_mask").alias("mask"),
        )
        .orderBy("doc_id", "pos")
    )


ORACLE_PADDED_TOKENS = f"""
WITH {_DUCK_TOKS},
t AS (
  SELECT doc_id, tk[1:12] AS tk FROM toks WHERE doc_id < 100
),
p AS (
  SELECT doc_id, len(tk)::BIGINT AS n_tokens,
         list_concat(tk, list_transform(range(1, 12 - len(tk) + 1),
                                        x -> '<pad>')) AS tokens,
         list_concat(list_transform(range(1, len(tk) + 1), x -> 1),
                     list_transform(range(1, 12 - len(tk) + 1), x -> 0))
           AS mask
  FROM t
)
SELECT doc_id, n_tokens, (i - 1)::INT AS pos,
       tokens[i] AS token, mask[i]::INT AS mask
FROM p, unnest(range(1, 13)) AS r(i)
ORDER BY doc_id, pos
"""


def q_embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """functions/vectors.quantize_int8: symmetric per-vector int8
    codes + the exact (selected, arithmetic-free) scale — long format."""
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    s, codes = vectors.quantize_int8(F.col("embedding"))
    q = emb.select("vec_id", s.alias("scale"), codes.alias("codes"))
    return (
        q.select(
            "vec_id",
            "scale",
            F.posexplode("codes").alias("pos", "code"),
        )
        .select(
            "vec_id", "scale", F.col("pos").cast("int").alias("pos"), "code"
        )
        .orderBy("vec_id", "pos")
    )


ORACLE_INT8_QUANTIZE = """
WITH e AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale
  FROM embeddings WHERE vec_id < 200
)
SELECT vec_id, scale, (i - 1)::INT AS pos,
       round(embedding[i]::DOUBLE * 127.0 / scale)::INT AS code
FROM e, unnest(range(1, len(embedding) + 1)) AS r(i)
WHERE scale > 0
ORDER BY vec_id, pos
"""


def q_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-path mining: gaps-and-islands sessionization (30-min
    gap), per-session ordered event-type path, global top-20 paths —
    the journey-mining composition.  Path assembly is
    collect_list(struct) + array_sort (struct ordering on (ts,
    event_id) makes the concat deterministic without an ordered-window
    collect)."""
    events = _t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            lag_ts.isNull()
            | (F.col("ts") >= lag_ts + F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    islands = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    paths = islands.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(20)
    )


ORACLE_SESSION_PATHS = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
              OR ts >= LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)
                       + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS session_id
  FROM flagged
),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM islands GROUP BY 1, 2
)
SELECT path, COUNT(*)::BIGINT AS n_sessions
FROM paths GROUP BY 1
ORDER BY n_sessions DESC, path ASC
LIMIT 20
"""


def q_orders_lineitem_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sketch.cms_join_size_estimate: quote |orders ⋈
    lineitem| from two KB-sized CMS sketches without running the join —
    the optimizer's cardinality estimate made explicit, one-sided
    (never an underestimate), oracle-rebuilt exactly in SQL."""
    from netflix_data_ingestion_spark.operators.sketch import (
        cms_join_size_estimate,
    )

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return cms_join_size_estimate(orders, "o_orderkey", li, "l_orderkey")


ORACLE_JOIN_SIZE_EST = """
WITH ra AS (
  SELECT o_orderkey AS item, r.row_id AS row,
         (('0x' || substring(md5(r.row_id::VARCHAR || '|' ||
                                 o_orderkey::VARCHAR), 1, 8))::BIGINT
          % 64)::INT AS bucket
  FROM orders, (SELECT unnest(range(0, 4)) AS row_id) r
),
rb AS (
  SELECT l_orderkey AS item, r.row_id AS row,
         (('0x' || substring(md5(r.row_id::VARCHAR || '|' ||
                                 l_orderkey::VARCHAR), 1, 8))::BIGINT
          % 64)::INT AS bucket
  FROM lineitem, (SELECT unnest(range(0, 4)) AS row_id) r
),
sa AS (SELECT row, bucket, COUNT(*)::BIGINT AS cnt_a FROM ra GROUP BY 1, 2),
sb AS (SELECT row, bucket, COUNT(*)::BIGINT AS cnt_b FROM rb GROUP BY 1, 2),
per_row AS (
  SELECT sa.row, SUM(sa.cnt_a * sb.cnt_b) AS s
  FROM sa JOIN sb USING (row, bucket)
  GROUP BY 1
)
SELECT MIN(s)::BIGINT AS est_join_rows FROM per_row
"""


def q_user_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation lift table: users ranked into activity deciles
    (the "score"), purchase rate per decile — the calibration/lift
    shape every ranking-model eval produces.  Deciles are exact
    distributed ntiles over the USER aggregate
    (operators/keys.ntile_ranged — identical tie-splitting semantics
    to the global window, no single-task sort); the rate is one
    int/int division."""
    from netflix_data_ingestion_spark.operators.keys import ntile_ranged

    events = _t(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("purchased"),
    )
    scored = ntile_ranged(
        per_user,
        [F.col("n_events").desc(), F.col("user_id").asc()],
        10,
        "decile",
    )
    return (
        scored.groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("purchased").cast("long").alias("n_purchasers"),
            F.round(
                F.sum("purchased")
                / F.count("*").cast("double"),
                6,
            ).alias("purchase_rate"),
        )
        .orderBy("decile")
    )


ORACLE_DECILE_LIFT = """
WITH per_user AS (
  SELECT user_id, COUNT(*)::BIGINT AS n_events,
         MAX((event_type = 'purchase')::INT) AS purchased
  FROM events GROUP BY 1
),
scored AS (
  SELECT *, NTILE(10) OVER (ORDER BY n_events DESC, user_id ASC) AS decile
  FROM per_user
)
SELECT decile, COUNT(*)::BIGINT AS n_users,
       SUM(purchased)::BIGINT AS n_purchasers,
       ROUND(SUM(purchased) / COUNT(*)::DOUBLE, 6) AS purchase_rate
FROM scored GROUP BY 1 ORDER BY 1
"""


def q_time_to_purchase_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival/time-to-event label assembly: for every event, the time
    until the SAME user's next purchase (censored = 1 when none
    follows) — the supervised target for conversion-latency models.
    One keyed window with a strictly-FOLLOWING frame (min over later
    purchase timestamps); the latency is the exact MICROSECOND integer
    difference (whole-second truncation orders differ across engines;
    micros are the lossless unit both agree on)."""
    events = _t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(1, W.unboundedFollowing)
    )
    nxt = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            nxt.alias("__next"),
        )
        .withColumn(
            "micros_to_purchase",
            F.expr("timestampdiff(MICROSECOND, ts, __next)").cast("long"),
        )
        .withColumn("censored", F.col("__next").isNull().cast("int"))
        .drop("__next")
        .orderBy("event_id")
    )


ORACLE_TIME_TO_PURCHASE = """
WITH lab AS (
  SELECT event_id, user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_purchase_ts
  FROM events
)
SELECT event_id, user_id, ts, event_type,
       date_diff('microsecond', ts, next_purchase_ts)::BIGINT
         AS micros_to_purchase,
       (next_purchase_ts IS NULL)::INT AS censored
FROM lab
ORDER BY event_id
"""


def q_user_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-training label assembly: per-user activity features +
    a churn label (no event in the corpus's final 7 days).  One
    combinable user aggregate; the label horizon rides a broadcast
    1-row max — the labeling pass a training pipeline runs before
    hash_split routes examples."""
    events = _t(spark, sf_dir, "events")
    horizon = events.agg(F.max("ts").alias("__max_ts"))
    per_user = events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count_distinct("event_type").cast("long").alias("n_types"),
        F.count_distinct(F.to_date("ts")).cast("long").alias("days_active"),
        F.max("ts").alias("last_ts"),
    )
    return (
        per_user.crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            "n_events",
            "n_types",
            "days_active",
            "last_ts",
            (
                F.col("last_ts")
                < F.col("__max_ts") - F.expr("INTERVAL 7 DAYS")
            )
            .cast("int")
            .alias("churned"),
        )
        .orderBy("user_id")
    )


ORACLE_CHURN_LABELS = """
WITH h AS (SELECT MAX(ts) AS max_ts FROM events)
SELECT user_id,
       COUNT(*)::BIGINT AS n_events,
       COUNT(DISTINCT event_type)::BIGINT AS n_types,
       COUNT(DISTINCT ts::DATE)::BIGINT AS days_active,
       MAX(ts) AS last_ts,
       (MAX(ts) < (SELECT max_ts FROM h) - INTERVAL 7 DAY)::INT AS churned
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def q_part_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.triangle_counts over the part co-occurrence graph
    (cooccur edges at support >= 2): per-node triangle membership via
    degree-ordered wedge orientation — the oracle brute-force-enumerates
    triangles, proving the orientation trick semantically invisible."""
    from netflix_data_ingestion_spark.operators.cooccur import (
        cooccurrence_pairs,
    )

    li = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_pairs(
        li, "l_orderkey", "l_partkey", min_support=2
    ).select("item_a", "item_b")
    return graph.triangle_counts(edges, "item_a", "item_b").orderBy("node")


ORACLE_TRIANGLES = """
WITH bi AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
),
e AS (
  SELECT a.i AS u, b.i AS v
  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT node, COUNT(*)::BIGINT AS triangles
FROM corners GROUP BY 1 ORDER BY 1
"""


def q_part_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/graph.kcore: 3 fixed rounds of 3-core peeling over the
    part co-occurrence graph — surviving nodes with their current
    degree.  Fixed rounds make the iterative peel bit-exact against
    the unrolled oracle (kmeans discipline); convergence is asserted
    separately in tests."""
    from netflix_data_ingestion_spark.operators.cooccur import (
        cooccurrence_pairs,
    )

    li = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_pairs(
        li, "l_orderkey", "l_partkey", min_support=2
    ).select("item_a", "item_b")
    return graph.kcore(edges, "item_a", "item_b", k=3, rounds=3).orderBy(
        "node"
    )


def _kcore_oracle(k: int = 3, rounds: int = 3) -> str:
    parts = [
        """
WITH bi AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
),
e0 AS (
  SELECT a.i AS u, b.i AS v
  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
d{r} AS (
  SELECT node, COUNT(*) AS c FROM (
    SELECT u AS node FROM e{r - 1}
    UNION ALL SELECT v FROM e{r - 1}
  ) GROUP BY 1
),
n{r} AS (SELECT node FROM d{r} WHERE c >= {k}),
e{r} AS (
  SELECT e.u, e.v FROM e{r - 1} e
  JOIN n{r} a ON a.node = e.u
  JOIN n{r} b ON b.node = e.v
)"""
        )
    parts.append(
        f"""
SELECT node, COUNT(*)::BIGINT AS degree FROM (
  SELECT u AS node FROM e{rounds}
  UNION ALL SELECT v FROM e{rounds}
) GROUP BY 1 ORDER BY 1"""
    )
    return "".join(parts)


ORACLE_KCORE = _kcore_oracle()


def q_embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/similarity.random_projection: JL reduction 64 -> 6 dims
    via the md5 hyperplane family (literal components, one JVM fold per
    output dim, zero shuffle).  Long format + round-6, the
    l2_normalize comparison discipline; the oracle's list_sum fold
    replays the identical IEEE op sequence."""
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    proj = similarity.random_projection(
        emb, "vec_id", "embedding", out_dim=6, dim=64
    )
    return (
        proj.select("vec_id", F.posexplode("proj").alias("pos", "component"))
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("int").alias("plane"),
            F.round(F.col("component"), 6).alias("component"),
        )
        .orderBy("vec_id", "plane")
    )


ORACLE_RANDOM_PROJECTION = """
WITH e AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id < 200 AND len(embedding) = 64)
SELECT vec_id, p::INT AS plane,
       ROUND(list_sum(list_transform(range(1, len(embedding) + 1),
         i -> embedding[i]::DOUBLE *
              (strpos('0123456789abcdef',
                      substr(md5(p::VARCHAR || ':' || i::VARCHAR), 1, 1))
               - 1 - 7.5))), 6) AS component
FROM e, unnest(range(1, 7)) AS pr(p)
ORDER BY vec_id, plane
"""


def q_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/cooccur.cooccurrence_pairs: parts bought together
    (order = basket, set semantics, support >= 2) with the exact-integer
    PMI marginals."""
    from netflix_data_ingestion_spark.operators.cooccur import (
        cooccurrence_pairs,
    )

    li = _t(spark, sf_dir, "lineitem")
    return cooccurrence_pairs(
        li, "l_orderkey", "l_partkey", min_support=2
    ).orderBy("item_a", "item_b")


def q_part_item_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/cooccur.item_similarity_topk: item-item collaborative
    filter — top-5 co-purchase neighbors per part by marginal-
    normalized cosine, rounded to 6 places BEFORE the rank so the
    top-k cut is engine-exact."""
    from netflix_data_ingestion_spark.operators.cooccur import (
        item_similarity_topk,
    )

    li = _t(spark, sf_dir, "lineitem")
    return item_similarity_topk(
        li, "l_orderkey", "l_partkey", k=5, min_support=2
    ).orderBy("item", "neighbor")


ORACLE_ITEM_NEIGHBORS = """
WITH bi AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
),
pairs AS (
  SELECT a.i AS item_a, b.i AS item_b, COUNT(*)::BIGINT AS pair_count
  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
),
ic AS (SELECT i, COUNT(*)::BIGINT AS c FROM bi GROUP BY 1),
sym AS (
  SELECT p.item_a AS item, p.item_b AS neighbor, p.pair_count,
         ca.c AS ci, cb.c AS cn
  FROM pairs p JOIN ic ca ON ca.i = p.item_a JOIN ic cb ON cb.i = p.item_b
  UNION ALL
  SELECT p.item_b, p.item_a, p.pair_count, cb.c, ca.c
  FROM pairs p JOIN ic ca ON ca.i = p.item_a JOIN ic cb ON cb.i = p.item_b
),
scored AS (
  SELECT item, neighbor, pair_count,
         ROUND(pair_count / sqrt((ci * cn)::DOUBLE), 6) AS cosine_sim
  FROM sym
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY item
                               ORDER BY cosine_sim DESC, neighbor ASC) AS rn
  FROM scored
)
SELECT item, neighbor, pair_count, cosine_sim
FROM ranked WHERE rn <= 5
ORDER BY item, neighbor
"""


ORACLE_COOCCURRENCE = """
WITH bi AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
),
pairs AS (
  SELECT a.i AS item_a, b.i AS item_b, COUNT(*)::BIGINT AS pair_count
  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
),
ic AS (SELECT i, COUNT(*)::BIGINT AS c FROM bi GROUP BY 1),
t AS (SELECT COUNT(DISTINCT b)::BIGINT AS n_baskets FROM bi)
SELECT p.item_a, p.item_b, p.pair_count,
       ca.c AS count_a, cb.c AS count_b, t.n_baskets
FROM pairs p
JOIN ic ca ON ca.i = p.item_a
JOIN ic cb ON cb.i = p.item_b, t
ORDER BY item_a, item_b
"""


def q_purchase_view_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/attribution.linear_attribution: each purchase's credit
    split 1/n over the same user's views in the preceding day —
    one user-keyed join + one unordered window; the 1/n weight is a
    single int division (bit-identical across engines)."""
    from netflix_data_ingestion_spark.operators.attribution import (
        linear_attribution,
    )

    events = _t(spark, sf_dir, "events")
    return linear_attribution(events).orderBy(
        "conversion_id", "touch_id"
    )


ORACLE_ATTRIBUTION = """
WITH conv AS (
  SELECT event_id AS conversion_id, user_id, ts AS cts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT event_id AS touch_id, user_id, ts AS tts
  FROM events WHERE event_type = 'view'
),
j AS (
  SELECT c.conversion_id, t.touch_id, c.user_id
  FROM conv c JOIN touch t
    ON c.user_id = t.user_id
   AND t.tts < c.cts
   AND t.tts >= c.cts - INTERVAL 1 DAY
)
SELECT conversion_id, touch_id, user_id,
       1::DOUBLE / COUNT(*) OVER (PARTITION BY conversion_id) AS weight
FROM j
ORDER BY conversion_id, touch_id
"""


def q_corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/textstats.vocab_growth: Heaps-law curve at 2-doc
    blocks — distributed running-distinct via per-term first-doc (one
    combinable shuffle); the only unpartitioned window runs over the
    bucket frame, never over documents.  (The synthetic corpus has a
    ~31-word vocabulary that saturates within the first handful of
    docs, so the contract samples finely to get a real curve.)"""
    docs = _t(spark, sf_dir, "documents")
    return textstats.vocab_growth(
        docs, "doc_id", "text", bucket_size=2
    ).orderBy("bucket")


ORACLE_VOCAB_GROWTH = f"""
WITH {_DUCK_TOKS},
terms AS (
  SELECT doc_id, t.term
  FROM toks, unnest(list_distinct(tk)) AS t(term)
),
firstd AS (
  SELECT term, MIN(doc_id) AS fd FROM terms GROUP BY 1
),
per_bucket AS (
  SELECT fd - (fd % 2) AS bucket, COUNT(*)::BIGINT AS new_terms
  FROM firstd GROUP BY 1
)
SELECT bucket, new_terms,
       SUM(new_terms) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         AS vocab_size
FROM per_bucket
ORDER BY bucket
"""


def q_events_throttled_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming/ingest.throttle_events_batch: per-(user, day) rate cap
    at 2 events, admitted in (ts, event_id) order — the oracle-pinned
    batch twin of the applyInPandasWithState streaming rate limiter."""
    from netflix_data_ingestion_spark.streaming.ingest import (
        throttle_events_batch,
    )

    events = _t(spark, sf_dir, "events")
    return throttle_events_batch(
        events, key_col="user_id", bucket="day", limit=2
    ).orderBy("event_id")


ORACLE_THROTTLED = """
SELECT event_id, ts, user_id, event_type, value FROM (
  SELECT event_id, ts, user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn <= 2
ORDER BY event_id
"""


# monotonically named memory-sink tables: bench runs every query twice
# and a re-used queryName would collide with the first run's table
_STREAM_RUN_SEQ = [0]


def q_events_throttled_daily_stream(spark: SparkSession, sf_dir: str
                                    ) -> DataFrame:
    """The STREAMING rate limiter driven through the driver gate: read
    the static events parquet as a file-source stream, run
    streaming/ingest.throttle_events (applyInPandasWithState, per-
    (user, day) cap of 2) under an availableNow trigger into a memory
    sink, then aggregate the kept set to per-(user, day) counts.

    The aggregate — not the kept rows — is the contract, because it is
    BATCHING-INVARIANT: which 2 events the online throttle admits
    depends on micro-batch arrival order, but how many it admits per
    (user, day) is min(2, n) under any split (state is never revoked;
    the effectively-infinite watermark passed here removes the only
    other row-loss path, late-data filtering between micro-batches).
    That makes this the one streaming row with a FULL hash-checked
    DuckDB oracle, not a weaker rows-only check — the batch twin
    events_throttled_daily pins the admission ORDER separately.

    Plan: the streamed stateful pass is one (user, day)-keyed shuffle;
    the post-hoc aggregate runs on the (already small) kept set."""
    import os

    from netflix_data_ingestion_spark.streaming.ingest import (
        run_to_memory,
        throttle_events,
    )

    # the file-stream source needs a DIRECTORY; testdata stores events
    # as a single parquet file, so stream the sf_dir with a glob filter
    # (a directory-shaped events.parquet streams directly)
    ev_path = os.path.join(sf_dir, "events.parquet")
    reader = (
        spark.readStream.format("parquet")
        .schema(_t(spark, sf_dir, "events").schema)
    )
    if os.path.isdir(ev_path):
        reader = reader.option("path", ev_path)
    else:
        reader = reader.option("path", sf_dir).option(
            "pathGlobFilter", "events.parquet"
        )
    src = (
        reader.load()
        # watermarks require TIMESTAMP; the stored column is NTZ.  The
        # session timezone is pinned UTC (session.py), so the cast is a
        # lossless relabel and the NTZ cast-back below restores the
        # exact wall times the DuckDB oracle sees.
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    kept = throttle_events(
        src, key_col="user_id", bucket="day", limit=2,
        watermark="175200 hours",  # ~20y: nothing is ever "late"
        timeout_ms=0,  # finite replay: NoTimeout, or availableNow spins
        # r12 optimization: per-KEY state (bucket->kept map vectorized
        # inside one group call) instead of per-(key, bucket) state —
        # the admitted set per bucket is identical (see throttle_events
        # docstring), but applyInPandasWithState's ~5 ms/group-call
        # Python-boundary cost is paid 1,500x instead of 40,083x here
        state_scope="key",
    )
    _STREAM_RUN_SEQ[0] += 1
    name = f"__throttled_daily_stream_{os.getpid()}_{_STREAM_RUN_SEQ[0]}"
    # deliberately NOT size-derived (_stream_partitions) like the
    # windowed/join rows: this query's wall clock is the per-KEY Python
    # group calls inside applyInPandasWithState (~1,500 numpy admission
    # passes), which want every core — measured 10.7 s at the
    # size-derived 1 partition vs 5.2 s at the session default.  The
    # state-commit-per-partition overhead the other rows shed is noise
    # here next to the Python work.
    run_to_memory(kept, name)
    return (
        spark.table(name)
        .groupBy(
            F.col("user_id"),
            F.date_trunc(
                "day", F.col("ts").cast("timestamp_ntz")
            ).alias("day"),
        )
        .agg(F.count("*").alias("kept"))
        .orderBy("user_id", "day")
    )


ORACLE_THROTTLED_DAILY_STREAM = """
SELECT user_id,
       date_trunc('day', ts) AS day,
       least(count(*), 2)::BIGINT AS kept
FROM events
GROUP BY user_id, date_trunc('day', ts)
ORDER BY user_id, day
"""


def q_events_tumbling_window_stream(spark: SparkSession, sf_dir: str
                                    ) -> DataFrame:
    """The watermark/event-time-window surface driven through the
    driver gate: read the static events parquet as a file-source
    stream, run a WATERMARKED tumbling-window aggregate (1-hour
    windows, 2-hour watermark) in APPEND mode under an availableNow
    trigger into a memory sink.  Append mode emits exactly the CLOSED
    windows — those whose end <= final watermark = max(ts) - 2h
    (pinned empirically and by the stream==batch equality test) — so
    the oracle is the batch tumbling aggregate restricted to that
    boundary.  Unlike the throttle row (which neutralizes the
    watermark with a ~20y horizon), the watermark here is
    LOAD-BEARING: it is the append-mode emission gate.

    Batching-invariance of the contract: per-window counts and the
    int64 user_id sum accumulate in state (exact integer arithmetic,
    order-free), and the emission set depends only on the GLOBAL max
    event time; the single-file source makes availableNow one data
    micro-batch, so the between-batch late-drop path (the one
    batch-split-dependent behavior of a real watermark) cannot fire —
    and run_to_memory(max_data_batches=1) ENFORCES that from the
    query's own progress records instead of merely documenting it.
    The no-data flush batch that follows performs the final emission.

    Plan: one (window)-keyed shuffle with map-side partial aggregation
    (the streaming twin of q_events_tumbling_window's shape); the
    memory-sink drain is result-sized."""
    import os

    from netflix_data_ingestion_spark.streaming.ingest import (
        run_to_memory,
    )

    ev_path = os.path.join(sf_dir, "events.parquet")
    reader = (
        spark.readStream.format("parquet")
        .schema(_t(spark, sf_dir, "events").schema)
    )
    if os.path.isdir(ev_path):
        reader = reader.option("path", ev_path)
    else:
        reader = reader.option("path", sf_dir).option(
            "pathGlobFilter", "events.parquet"
        )
    src = reader.load().withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        src.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("event_count"),
            F.sum("user_id").cast("long").alias("user_id_sum"),
        )
        .select(
            # cast back to NTZ: the session is pinned UTC, so this
            # restores the exact wall times the DuckDB oracle sees
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_count",
            "user_id_sum",
        )
    )
    _STREAM_RUN_SEQ[0] += 1
    name = f"__tumbling_window_stream_{os.getpid()}_{_STREAM_RUN_SEQ[0]}"
    run_to_memory(
        agg,
        name,
        output_mode="append",
        max_data_batches=1,
        shuffle_partitions=_stream_partitions(spark, ev_path),
    )
    return spark.table(name).orderBy("window_start")


ORACLE_TUMBLING_STREAM = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       COUNT(*) AS event_count,
       SUM(user_id)::BIGINT AS user_id_sum
FROM events
GROUP BY 1
HAVING window_start + INTERVAL 1 HOUR
       <= (SELECT max(ts) - INTERVAL 2 HOUR FROM events)
ORDER BY window_start
"""


def q_events_sliding_window_stream(spark: SparkSession, sf_dir: str
                                   ) -> DataFrame:
    """The OVERLAPPING-window streaming surface driven through the
    driver gate: 2-hour windows sliding every 1 hour (each event lands
    in exactly two windows) with a 2-hour watermark, APPEND mode under
    availableNow.  Same closed-window emission contract as the
    tumbling row (end <= final watermark = max(ts) - 2h, inclusive
    boundary pinned by test_streaming) — the oracle replays the
    2-window fan-out explicitly and restricts to that boundary, so the
    overlap semantics AND the watermark gate are both hash-checked
    through the streaming path.  Batching-invariance: order-free int64
    state + single-file source = one data micro-batch, ENFORCED via
    run_to_memory(max_data_batches=1) (see the tumbling row's
    docstring).

    Plan: the window fan-out is an in-task 2x explode; one
    (window)-keyed shuffle with map-side partial aggregation."""
    import os

    from netflix_data_ingestion_spark.streaming.ingest import (
        run_to_memory,
    )

    ev_path = os.path.join(sf_dir, "events.parquet")
    reader = (
        spark.readStream.format("parquet")
        .schema(_t(spark, sf_dir, "events").schema)
    )
    if os.path.isdir(ev_path):
        reader = reader.option("path", ev_path)
    else:
        reader = reader.option("path", sf_dir).option(
            "pathGlobFilter", "events.parquet"
        )
    src = reader.load().withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        src.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("event_count"),
            F.sum("user_id").cast("long").alias("user_id_sum"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_count",
            "user_id_sum",
        )
    )
    _STREAM_RUN_SEQ[0] += 1
    name = f"__sliding_window_stream_{os.getpid()}_{_STREAM_RUN_SEQ[0]}"
    run_to_memory(
        agg,
        name,
        output_mode="append",
        max_data_batches=1,
        shuffle_partitions=_stream_partitions(spark, ev_path),
    )
    return spark.table(name).orderBy("window_start")


ORACLE_SLIDING_STREAM = """
WITH contrib AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts)
           - (r.k * INTERVAL 1 HOUR) AS window_start,
         user_id
  FROM events, (SELECT unnest(range(0, 2)) AS k) r
)
SELECT window_start,
       COUNT(*) AS event_count,
       SUM(user_id)::BIGINT AS user_id_sum
FROM contrib
GROUP BY 1
HAVING window_start + INTERVAL 2 HOUR
       <= (SELECT max(ts) - INTERVAL 2 HOUR FROM events)
ORDER BY window_start
"""


def q_events_session_window_stream(spark: SparkSession, sf_dir: str
                                   ) -> DataFrame:
    """The MERGING-state streaming surface driven through the driver
    gate: per-user session windows (30-minute gap) with a 2-hour
    watermark, APPEND mode under availableNow — the one windowed
    aggregate whose STATE MERGES (two sessions fuse when a bridging
    event arrives), unlike the fixed-bucket tumbling/sliding rows.
    Append mode emits exactly the CLOSED sessions: those whose end =
    last_event_ts + 30min <= final watermark = max(ts) - 2h (same
    inclusive boundary as the tumbling row, pinned by the
    stream==batch equality test).  The oracle replays gaps-and-islands
    sessionization (">=" split matching Spark's half-open merge rule,
    as pinned by the batch twin events_sessionization) restricted to
    that boundary — so session MERGE semantics and the watermark gate
    are both hash-checked through the real streaming path.

    Batching-invariance: exact-integer state (count + int64 event_id
    sum — deliberately NOT the float value sum, whose accumulation
    order would differ between the streaming state and the batch
    oracle), and the emission set depends only on the global max event
    time given one data micro-batch, ENFORCED via
    run_to_memory(max_data_batches=1).

    Plan: one (user, session)-keyed shuffle into the session-merging
    state store; the memory-sink drain is result-sized."""
    import os

    from netflix_data_ingestion_spark.streaming.ingest import (
        run_to_memory,
    )

    ev_path = os.path.join(sf_dir, "events.parquet")
    reader = (
        spark.readStream.format("parquet")
        .schema(_t(spark, sf_dir, "events").schema)
    )
    if os.path.isdir(ev_path):
        reader = reader.option("path", ev_path)
    else:
        reader = reader.option("path", sf_dir).option(
            "pathGlobFilter", "events.parquet"
        )
    src = reader.load().withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        src.withWatermark("ts", "2 hours")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count("*").alias("events_in_session"),
            F.sum("event_id").cast("long").alias("event_id_sum"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "events_in_session",
            "event_id_sum",
        )
    )
    _STREAM_RUN_SEQ[0] += 1
    name = f"__session_window_stream_{os.getpid()}_{_STREAM_RUN_SEQ[0]}"
    run_to_memory(
        agg,
        name,
        output_mode="append",
        max_data_batches=1,
        shuffle_partitions=_stream_partitions(spark, ev_path),
    )
    return spark.table(name).orderBy("user_id", "session_start")


def q_orders_cdc_snapshot_stream(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """The CDC-apply streaming path driven through the driver gate:
    replay orders as a change stream (key = o_custkey, change order =
    o_orderkey, tombstone when the change row's o_orderstatus = 'P')
    through streaming/ingest.apply_cdc_stream — the real
    foreachBatch + checkpoint + alternating-dir atomic-swap machinery —
    then aggregate the CONVERGED snapshot per status.  The snapshot is
    the batching-invariant contract surface: per key, the surviving row
    is the max-o_orderkey change (within-batch collapse by order_col),
    deleted if that change is a tombstone — exactly the batch MERGE
    twin the oracle replays with a window.  One data micro-batch is
    ENFORCED (assert_data_batches) because cross-batch convergence
    additionally requires change order to respect order_col, which an
    arbitrary file split would not guarantee — the enforced assumption
    is documented, not silent.

    Plan: the per-batch collapse is one (key)-keyed window inside
    foreachBatch; the merge is one full-outer join against the (empty,
    first-batch) snapshot; the returned aggregate runs on the
    result-sized snapshot parquet."""
    import os
    import shutil
    import tempfile

    from netflix_data_ingestion_spark.streaming.ingest import (
        apply_cdc_stream,
        assert_data_batches,
        read_cdc_snapshot,
    )

    ord_path = os.path.join(sf_dir, "orders.parquet")
    reader = (
        spark.readStream.format("parquet")
        .schema(_t(spark, sf_dir, "orders").schema)
    )
    if os.path.isdir(ord_path):
        reader = reader.option("path", ord_path)
    else:
        reader = reader.option("path", sf_dir).option(
            "pathGlobFilter", "orders.parquet"
        )
    changes = (
        reader.load()
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderstatus",
            (F.col("o_orderstatus") == "P").alias("is_delete"),
        )
    )
    _STREAM_RUN_SEQ[0] += 1
    work = os.path.join(
        tempfile.gettempdir(),
        f"cdc_snapshot_stream_{os.getpid()}_{_STREAM_RUN_SEQ[0]}",
    )
    shutil.rmtree(work, ignore_errors=True)
    snap_dir = os.path.join(work, "snapshot")
    os.makedirs(snap_dir, exist_ok=True)
    # size-derived state partitions (the run_to_memory discipline) —
    # set before start(), where the count freezes into the checkpoint,
    # restored after the synchronous availableNow drain
    spkey = "spark.sql.shuffle.partitions"
    old_sp = spark.conf.get(spkey, None)
    spark.conf.set(spkey, str(_stream_partitions(spark, ord_path)))
    try:
        q = (
            apply_cdc_stream(
                changes,
                snap_dir,
                os.path.join(work, "checkpoint"),
                key_cols=["o_custkey"],
                value_cols=["o_orderkey", "o_orderstatus"],
                tombstone_col="is_delete",
                order_col="o_orderkey",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if old_sp is None:
            spark.conf.unset(spkey)
        else:
            spark.conf.set(spkey, old_sp)
    assert_data_batches(q, "orders_cdc_snapshot_stream", 1)
    return (
        read_cdc_snapshot(spark, snap_dir)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("o_orderkey").cast("long").alias("orderkey_sum"),
        )
        .orderBy("status")
    )


def q_events_ohlc_hourly_stream(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """The ORDER-STATISTIC streaming state surface driven through the
    driver gate: streaming/ingest.ohlc_stream (watermarked hourly OHLC
    bars per event type — combinable min_by/max_by over a
    (ts, event_id) tiebreak struct) in APPEND mode under availableNow.
    Same closed-window emission contract as the tumbling row (window
    end <= final watermark = max(ts) - 2h, inclusive) — the oracle is
    the batch OHLC twin (events_ohlc_hourly's rank-based SQL)
    restricted to that boundary.

    Batching-invariance: open/high/low/close are SELECTED values, not
    accumulations — min_by/max_by over a total (ts, event_id) order is
    order-free state, so the DOUBLE column round-trips bit-exactly
    (same discipline as the batch row); one data micro-batch ENFORCED
    via run_to_memory(max_data_batches=1).

    Plan: one (window, key)-keyed shuffle with map-side partial
    aggregation; the memory-sink drain is bar-sized."""
    import os

    from netflix_data_ingestion_spark.streaming.ingest import (
        ohlc_stream,
        run_to_memory,
    )

    ev_path = os.path.join(sf_dir, "events.parquet")
    reader = (
        spark.readStream.format("parquet")
        .schema(_t(spark, sf_dir, "events").schema)
    )
    if os.path.isdir(ev_path):
        reader = reader.option("path", ev_path)
    else:
        reader = reader.option("path", sf_dir).option(
            "pathGlobFilter", "events.parquet"
        )
    src = reader.load().withColumn("ts", F.col("ts").cast("timestamp"))
    bars = ohlc_stream(src, key_col="event_type").select(
        F.col("bucket").cast("timestamp_ntz").alias("bucket"),
        "event_type",
        "open",
        "high",
        "low",
        "close",
        "n_events",
    )
    _STREAM_RUN_SEQ[0] += 1
    name = f"__ohlc_hourly_stream_{os.getpid()}_{_STREAM_RUN_SEQ[0]}"
    run_to_memory(
        bars,
        name,
        output_mode="append",
        max_data_batches=1,
        shuffle_partitions=_stream_partitions(spark, ev_path),
    )
    return spark.table(name).orderBy("event_type", "bucket")


ORACLE_OHLC_STREAM = """
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value
  FROM events WHERE ts IS NOT NULL
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM b
)
SELECT bucket, event_type,
       MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*)::BIGINT AS n_events
FROM r
GROUP BY 1, 2
HAVING bucket + INTERVAL 1 HOUR
       <= (SELECT max(ts) - INTERVAL 2 HOUR FROM events)
ORDER BY 2, 1
"""


ORACLE_CDC_SNAPSHOT_STREAM = """
WITH latest AS (
  SELECT o_custkey, o_orderkey, o_orderstatus,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
)
SELECT o_orderstatus AS status,
       count(*)::BIGINT AS n_keys,
       sum(o_orderkey)::BIGINT AS orderkey_sum
FROM latest
WHERE rn = 1 AND o_orderstatus <> 'P'
GROUP BY 1
ORDER BY 1
"""


ORACLE_SESSION_WINDOW_STREAM = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, ts, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       COUNT(*) AS events_in_session,
       SUM(event_id)::BIGINT AS event_id_sum
FROM islands
GROUP BY user_id, session_id
HAVING MAX(ts) + INTERVAL 30 MINUTE
       <= (SELECT max(ts) - INTERVAL 2 HOUR FROM events)
ORDER BY user_id, session_start
"""


def q_dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row (n_true, n_found, recall) — the production dedup path's
    MEASURED recall against the exhaustive all-pairs ground truth on a
    1000-doc audit slice: the docstring recall claim
    (1-(1-J^r)^b banding) as a driver-verified artifact instead of
    prose.  n_found counts the intersection (defensively — the scale
    path's exact-verify makes it a subset of truth by construction).
    The slice holds true pairs at every shipped SF (verified at
    sf0.001/0.01/0.1); a pair-free slice would make recall 0/0, so the
    division is additionally guarded to NULL."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 1000)
    audit = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8
    ).select("id_a", "id_b")
    scale = dedup.near_dup_pairs_at_scale(
        docs, "doc_id", "text", n=3, threshold=0.8, num_hashes=16, bands=4
    ).select("id_a", "id_b")
    n_true = audit.agg(F.count("*").cast("long").alias("n_true"))
    n_found = (
        scale.join(audit, ["id_a", "id_b"])
        .agg(F.count("*").cast("long").alias("n_found"))
    )
    return n_true.crossJoin(n_found).select(
        "n_true",
        "n_found",
        F.when(
            F.col("n_true") > 0,
            F.round(F.col("n_found").cast("double") / F.col("n_true"), 6),
        ).alias("recall"),
    )


ORACLE_LSH_RECALL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS tk
  FROM documents WHERE doc_id < 1000
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS shingle
  FROM toks, unnest(range(1, len(tk) - 1)) AS u(i)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
audit AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE i::DOUBLE / (sa.n_shingles + sb.n_shingles - i) >= 0.8
),
hashed AS (
  SELECT doc_id, seed, md5(seed::VARCHAR || '|' || shingle) AS h
  FROM sh, unnest(range(0, 4)) AS s(seed)
),
bandt AS (
  SELECT doc_id, seed AS band,
         md5(concat_ws('|', MIN(substr(h, 1, 8)), MIN(substr(h, 9, 8)),
                       MIN(substr(h, 17, 8)), MIN(substr(h, 25, 8))))
           AS band_key
  FROM hashed GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandt a JOIN bandt b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
arrs AS (
  SELECT doc_id, list(shingle) AS arr, COUNT(*) AS n_sh FROM sh GROUP BY 1
),
scale AS (
  SELECT c.id_a, c.id_b FROM cand c
  JOIN arrs sa ON sa.doc_id = c.id_a
  JOIN arrs sb ON sb.doc_id = c.id_b
  WHERE len(list_intersect(sa.arr, sb.arr))::DOUBLE
        / (sa.n_sh + sb.n_sh - len(list_intersect(sa.arr, sb.arr))) >= 0.8
),
m AS (
  SELECT (SELECT COUNT(*) FROM audit)::BIGINT AS n_true,
         (SELECT COUNT(*) FROM scale s
          JOIN audit a ON a.id_a = s.id_a AND a.id_b = s.id_b)::BIGINT
           AS n_found
)
SELECT n_true, n_found,
       CASE WHEN n_true > 0
            THEN ROUND(n_found::DOUBLE / n_true, 6) END AS recall
FROM m
"""


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.simhash_near_dup_pairs: pairs within Hamming
    distance 3 of each other's 64-bit SimHash via the 4-block
    pigeonhole join — the fingerprint-to-JOIN completion of the
    simhash query."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_dup_pairs(
        docs, "doc_id", "text", max_hamming=3
    ).orderBy("id_a", "id_b")


ORACLE_SIMHASH_PAIRS = f"""
WITH {_DUCK_TOKS},
tok AS (SELECT doc_id, unnest(tk) AS token FROM toks),
counted AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
hashed AS (SELECT doc_id, cnt, substr(md5(token), 1, 16) AS h FROM counted),
pos AS (
  SELECT doc_id, cnt, i,
         strpos('0123456789abcdef', substr(h, i, 1)) - 1 AS d
  FROM hashed, unnest(range(1, 17)) AS u(i)
),
sums AS (
  SELECT doc_id, i,
         SUM(cnt * (2 * ((d // 1) % 2) - 1)) AS s0,
         SUM(cnt * (2 * ((d // 2) % 2) - 1)) AS s1,
         SUM(cnt * (2 * ((d // 4) % 2) - 1)) AS s2,
         SUM(cnt * (2 * ((d // 8) % 2) - 1)) AS s3
  FROM pos GROUP BY 1, 2
),
digits AS (
  SELECT doc_id, i,
         (s3 > 0)::INT * 8 + (s2 > 0)::INT * 4 +
         (s1 > 0)::INT * 2 + (s0 > 0)::INT AS v
  FROM sums
),
sh64 AS (
  SELECT doc_id,
         string_agg(substr('0123456789abcdef', v + 1, 1), '' ORDER BY i)
           AS simhash64
  FROM digits GROUP BY doc_id
),
blocks AS (
  SELECT doc_id, simhash64, b.bidx,
         substr(simhash64, b.bidx * 4 + 1, 4) AS bval
  FROM sh64, unnest(range(0, 4)) AS b(bidx)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, a.simhash64 AS sh_a,
                  b.doc_id AS id_b, b.simhash64 AS sh_b
  FROM blocks a JOIN blocks b
    ON a.bidx = b.bidx AND a.bval = b.bval AND a.doc_id < b.doc_id
),
verified AS (
  SELECT id_a, id_b,
         (SELECT SUM(bit_count(
            xor(strpos('0123456789abcdef', substr(sh_a, j, 1)) - 1,
                strpos('0123456789abcdef', substr(sh_b, j, 1)) - 1)))
          FROM unnest(range(1, 17)) AS r(j))::INT AS hamming
  FROM cand
)
SELECT id_a, id_b, hamming FROM verified
WHERE hamming <= 3
ORDER BY id_a, id_b
"""


def q_multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/multimodal.phash_near_dup_pairs: image near-dup via
    64-bit perceptual fingerprints + the 4-block pigeonhole Hamming
    join (shared with SimHash); the fingerprint is the documented
    md5 stub, so exact-payload dups pair at Hamming 0 and the join
    path is oracle-proven end to end."""
    from netflix_data_ingestion_spark.operators.multimodal import (
        phash_near_dup_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    # re-upload scenario: every 10th document appears again under a new
    # media id — the exact-payload dups the fingerprint must pair
    reuploads = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    media = attach_binary_payload(
        docs.unionAll(reuploads), "doc_id", "text", "image"
    )
    return phash_near_dup_pairs(
        media, "media_id", "payload", max_hamming=3
    ).orderBy("id_a", "id_b")


ORACLE_PHASH_PAIRS = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
),
fp AS (
  SELECT doc_id AS media_id, substr(md5(text), 1, 16) AS phash64
  FROM corpus
),
blocks AS (
  SELECT media_id, phash64, b.bidx,
         substr(phash64, b.bidx * 4 + 1, 4) AS bval
  FROM fp, unnest(range(0, 4)) AS b(bidx)
),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, a.phash64 AS sh_a,
                  b.media_id AS id_b, b.phash64 AS sh_b
  FROM blocks a JOIN blocks b
    ON a.bidx = b.bidx AND a.bval = b.bval AND a.media_id < b.media_id
),
verified AS (
  SELECT id_a, id_b,
         (SELECT SUM(bit_count(
            xor(strpos('0123456789abcdef', substr(sh_a, j, 1)) - 1,
                strpos('0123456789abcdef', substr(sh_b, j, 1)) - 1)))
          FROM unnest(range(1, 17)) AS r(j))::INT AS hamming
  FROM cand
)
SELECT id_a, id_b, hamming FROM verified
WHERE hamming <= 3
ORDER BY id_a, id_b
"""


def q_ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/similarity.lsh_multiprobe_topk: each query probes its
    bucket plus all 8 Hamming-1 neighbors — near-miss recovery at
    query-side-only cost (the corpus buckets once)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.lsh_multiprobe_topk(
        emb, queries, k=10, planes=8, dim=64
    ).orderBy("query_id", "neighbor_id")


ORACLE_ANN_MULTIPROBE = f"""
WITH pos AS (
  SELECT vec_id, i::VARCHAR AS dim, embedding[i]::DOUBLE AS x,
         p::VARCHAR AS plane, p AS plane0
  FROM embeddings,
       unnest(range(1, len(embedding) + 1)) AS r(i),
       unnest(range(1, 9)) AS pr(p)
),
proj AS (
  SELECT vec_id, plane0,
         SUM(x * (strpos('0123456789abcdef',
                         substr(md5(plane || ':' || dim), 1, 1)) - 1 - 7.5))
           AS s
  FROM pos GROUP BY 1, 2
),
buckets AS (
  SELECT vec_id,
         string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
                    ORDER BY plane0) AS bucket
  FROM proj GROUP BY 1
),
probes AS (
  SELECT b.vec_id,
         CASE WHEN u.v = 0 THEN b.bucket
              ELSE substr(b.bucket, 1, u.v - 1)
                   || (CASE WHEN substr(b.bucket, u.v, 1) = '1'
                            THEN '0' ELSE '1' END)
                   || substr(b.bucket, u.v + 1)
         END AS qb
  FROM buckets b, unnest(range(0, 9)) AS u(v)
  WHERE b.vec_id < 5
),
q AS (SELECT p.vec_id, e.embedding, p.qb
      FROM probes p JOIN embeddings e USING (vec_id)),
c AS (SELECT e.vec_id, e.embedding, b.bucket
      FROM embeddings e JOIN buckets b USING (vec_id)),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({_DUCK_DOT.format(a='q', b='c')} /
               (sqrt({_DUCK_DOT.format(a='q', b='q')}) *
                sqrt({_DUCK_DOT.format(a='c', b='c')})), 6) AS cosine_sim
  FROM q JOIN c ON q.qb = c.bucket AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM pairs
)
SELECT query_id, neighbor_id, cosine_sim
FROM ranked WHERE rn <= 10
ORDER BY query_id, neighbor_id
"""

ORACLE_ANN_MULTIPROBE_RECALL = _ann_recall_oracle(ORACLE_ANN_MULTIPROBE)


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.containment_pairs: asymmetric short-in-long
    near-dup via rare-shingle blocking (df in [2,5]) + exact
    containment verify |A∩B|/min(|A|,|B|) >= 0.9 — the subset-dup
    detector symmetric Jaccard structurally misses."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.9, max_df=5
    ).orderBy("id_a", "id_b")


ORACLE_CONTAINMENT = f"""
WITH {_DUCK_SHINGLES},
dfc AS (SELECT shingle, COUNT(*) AS dfn FROM sh GROUP BY 1),
rare AS (SELECT shingle FROM dfc WHERE dfn BETWEEN 2 AND 5),
blocked AS (SELECT s.doc_id, s.shingle FROM sh s JOIN rare USING (shingle)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM blocked a JOIN blocked b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
arrs AS (
  SELECT doc_id, list(shingle) AS arr, COUNT(*) AS n_sh
  FROM sh GROUP BY 1
),
verified AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(sa.arr, sb.arr))::BIGINT AS intersection,
         least(sa.n_sh, sb.n_sh)::BIGINT AS min_sh
  FROM cand c
  JOIN arrs sa ON sa.doc_id = c.id_a
  JOIN arrs sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, intersection,
       intersection::DOUBLE / min_sh::DOUBLE AS containment
FROM verified
WHERE intersection::DOUBLE / min_sh::DOUBLE >= 0.9
ORDER BY id_a, id_b
"""


def q_user_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sketch.heavy_hitters: exact frequent-item detection via
    a count-min screen — sketch pass (combinable, KB state), narrow
    CMS-estimate filter, exact count over survivors only.  The CMS
    never undercounts, so the screen is semantically invisible: the
    oracle is a plain GROUP BY ... HAVING, which is the proof that the
    sketch admits no false negatives on this corpus."""
    from netflix_data_ingestion_spark.operators import sketch

    events = _t(spark, sf_dir, "events")
    return sketch.heavy_hitters(events, "user_id", threshold=80).orderBy(
        "user_id"
    )


ORACLE_HEAVY_HITTERS = """
SELECT user_id, COUNT(*)::BIGINT AS cnt
FROM events
WHERE user_id IS NOT NULL
GROUP BY 1
HAVING COUNT(*) >= 80
ORDER BY user_id
"""


def q_customer_part_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sample.negative_sample: deterministic contrastive
    negatives — 4 md5-drawn candidate parts per ordering customer,
    anti-joined against the customer's actual purchases.  O(users x k)
    candidate rows, no catalog cross join; n_items rides a broadcast
    1-row aggregate."""
    from netflix_data_ingestion_spark.operators.sample import (
        negative_sample,
    )

    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    positives = (
        orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").cast("long").alias("item"),
        )
        .distinct()
    )
    return negative_sample(
        positives, part.select(F.col("p_partkey").alias("item")),
        "user_id", "item", k=4,
    ).orderBy("user_id", "item")


ORACLE_NEGATIVES = """
WITH pos AS (
  SELECT DISTINCT o_custkey AS user_id, l_partkey::BIGINT AS item
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
n AS (SELECT max(p_partkey)::BIGINT + 1 AS n_items FROM part),
cand AS (
  SELECT u.user_id, s.slot,
         (('0x' || substring(md5('neg|' || u.user_id::VARCHAR || '|'
                                 || s.slot::VARCHAR), 1, 8))::BIGINT
          % n.n_items)::BIGINT AS item
  FROM (SELECT DISTINCT user_id FROM pos) u,
       n,
       (SELECT unnest(range(0, 4)) AS slot) s
),
dd AS (
  SELECT user_id, item, MIN(slot)::INT AS slot
  FROM cand GROUP BY 1, 2
)
SELECT user_id, item, slot
FROM dd ANTI JOIN pos USING (user_id, item)
ORDER BY user_id, item
"""


def q_doc_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sample.balanced_oversample: every language class
    oversampled (with replacement, deterministic md5 extra-copy
    assignment) to exactly the size of the largest class."""
    from netflix_data_ingestion_spark.operators.sample import (
        balanced_oversample,
    )

    docs = _t(spark, sf_dir, "documents")
    return balanced_oversample(docs, "lang", "doc_id").orderBy(
        "doc_id", "copy_idx"
    )


ORACLE_CLASS_BALANCE = """
WITH c AS (SELECT lang, COUNT(*) AS n_c FROM documents GROUP BY 1),
t AS (SELECT MAX(n_c) AS target FROM c),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('bal|' || doc_id::VARCHAR), doc_id) AS rk
  FROM documents
),
w AS (
  SELECT r.lang, r.doc_id,
         ((t.target // c.n_c)
          + CASE WHEN r.rk <= t.target % c.n_c THEN 1 ELSE 0 END
         )::BIGINT AS n_copies
  FROM r JOIN c USING (lang), t
)
SELECT lang, doc_id, u.copy_idx::BIGINT AS copy_idx
FROM w, unnest(range(1, n_copies + 1)) AS u(copy_idx)
ORDER BY doc_id, copy_idx
"""


def q_dedup_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.prefix_jaccard_pairs: EXACT Jaccard >= 4/5 join
    via rarest-first prefix filtering (PPJoin family) — provably the
    same pair set as the quadratic all-pairs audit, at near-LSH cost.
    The oracle is the plain all-pairs join: equality IS the proof that
    the prefix filter is lossless on this corpus."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.prefix_jaccard_pairs(
        docs, "doc_id", "text", n=3, t_num=4, t_den=5
    ).orderBy("id_a", "id_b")


ORACLE_PREFIX_JACCARD = f"""
WITH {_DUCK_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS intersection
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, intersection::BIGINT AS intersection,
       intersection::DOUBLE /
       (sa.n_shingles + sb.n_shingles - intersection)::DOUBLE AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE 5 * intersection >= 4 * (sa.n_shingles + sb.n_shingles - intersection)
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# BPE merge training (operators/bpetrain.bpe_train): the tokenizer-
# training loop itself, driver-provable.  The oracle re-derives the
# same K greedy merge rounds in pure SQL: per round, weighted adjacent-
# pair counts over the word-frequency table, deterministic argmax
# (count DESC, pair ASC), and merge application via gaps-and-islands
# position parity — within a maximal run of consecutive matching
# positions, greedy left-to-right non-overlapping merging fires at even
# offsets from the run start, which is exactly the pend-fold semantics
# of operators/bpetrain._apply_merge.
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 5


def q_corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/bpetrain.bpe_train: learned merge table over the
    documents corpus — (merge_idx, lhs, rhs, merged, pair_count) in
    training order.  Corpus touched once (word-frequency table); each
    round is an explode+groupBy over the vocab-sized frame plus a
    1-row argmax collect (kmeans' model-sized parameter-server
    license)."""
    from netflix_data_ingestion_spark.operators.bpetrain import bpe_train

    docs = _t(spark, sf_dir, "documents")
    # min_pair_count=1: the SQL oracle unconditionally runs
    # _BPE_ROUNDS rounds (it will merge a count-1 pair); the only
    # shared stop condition is no adjacent pairs at all (empty b{r})
    merges = bpe_train(
        docs,
        "text",
        num_merges=_BPE_ROUNDS,
        min_pair_count=1,
        with_counts=True,
    )
    return spark.createDataFrame(
        [
            (i + 1, a, b, a + b, int(t))
            for i, (a, b, t) in enumerate(merges)
        ],
        "merge_idx int, lhs string, rhs string, merged string, "
        "pair_count long",
    ).orderBy("merge_idx")


def _bpe_oracle(rounds: int, mode: str = "merges") -> str:
    """The shared K-round SQL reconstruction of greedy BPE training.
    ``mode='merges'`` outputs the merge table; ``mode='segment'``
    applies the final vocabulary back to every document and outputs
    per-doc pretoken/BPE-token counts (the tokenizer APPLY side);
    ``mode='encode'`` is the full text-to-tensor hop — assign ids to
    the final symbol inventory (1-based, binary-collation order) and
    emit each document's ordered token-id stream (md5-hashed) plus its
    length."""
    ctes = [
        r"""w0 AS (
  SELECT w, COUNT(*)::BIGINT AS cnt
  FROM (SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
          '''[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS w
        FROM documents) u
  GROUP BY w
),
v1 AS (
  SELECT w, cnt,
         list_append(list_transform(range(1, len(w) + 1),
                                    i -> substr(w, i::INT, 1)),
                     '</w>') AS sym
  FROM w0
)"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""b{r} AS (
  SELECT sym[i] AS a, sym[i + 1] AS b, SUM(cnt)::BIGINT AS total
  FROM v{r}, unnest(range(1, len(sym))) AS t(i)
  GROUP BY 1, 2
  ORDER BY total DESC, a ASC, b ASC LIMIT 1
),
m{r} AS (
  SELECT w, list(i ORDER BY i) AS ms
  FROM (SELECT w, i, i - MIN(i) OVER (PARTITION BY w, grp) AS off
        FROM (SELECT v.w, t.i,
                     t.i - ROW_NUMBER() OVER (PARTITION BY v.w
                                              ORDER BY t.i) AS grp
              FROM v{r} v, b{r} bb,
                   unnest(range(1, len(v.sym))) AS t(i)
              WHERE v.sym[i] = bb.a AND v.sym[i + 1] = bb.b) pos) par
  WHERE off % 2 = 0
  GROUP BY w
),
v{r + 1} AS (
  SELECT v.w, v.cnt,
         list_filter(
           list_transform(range(1, len(v.sym) + 1),
             j -> CASE
                    WHEN list_contains(coalesce(m.ms, CAST([] AS BIGINT[])), j)
                      THEN v.sym[j] || v.sym[j + 1]
                    WHEN list_contains(coalesce(m.ms, CAST([] AS BIGINT[])), j - 1)
                      THEN NULL
                    ELSE v.sym[j]
                  END),
           x -> x IS NOT NULL) AS sym
  FROM v{r} v LEFT JOIN m{r} m USING (w)
)"""
        )
    if mode == "encode":
        tail = rf"""
,
vocab AS (
  SELECT sym_t, ROW_NUMBER() OVER (ORDER BY sym_t)::BIGINT AS tok_id
  FROM (SELECT DISTINCT u.s AS sym_t
        FROM v{rounds + 1}, unnest(sym) AS u(s))
),
docws AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')),
           '''[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+') AS ws
  FROM documents
),
seq AS (
  SELECT d.doc_id, t.i AS wpos, f.sym AS sym
  FROM docws d, unnest(range(1, len(d.ws) + 1)) AS t(i)
  JOIN v{rounds + 1} f ON f.w = d.ws[t.i]
),
tok AS (
  SELECT s.doc_id, s.wpos, u.j AS spos, vb.tok_id
  FROM seq s, unnest(range(1, len(s.sym) + 1)) AS u(j)
  JOIN vocab vb ON vb.sym_t = s.sym[u.j]
),
enc AS (
  SELECT doc_id,
         COUNT(*)::BIGINT AS n_tokens,
         string_agg(tok_id::VARCHAR, ' ' ORDER BY wpos, spos) AS ids
  FROM tok GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(e.n_tokens, 0)::BIGINT AS n_tokens,
       md5(COALESCE(e.ids, '')) AS ids_md5
FROM documents d LEFT JOIN enc e ON d.doc_id = e.doc_id
ORDER BY d.doc_id"""
        return "WITH " + ",\n".join(ctes) + tail
    if mode == "segment":
        tail = rf"""
SELECT d.doc_id,
       COALESCE(COUNT(t.w), 0)::BIGINT AS n_pretokens,
       COALESCE(SUM(f.n_sym), 0)::BIGINT AS n_bpe_tokens
FROM documents d
LEFT JOIN (SELECT doc_id,
                  unnest(regexp_extract_all(lower(coalesce(text, '')),
                    '''[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS w
           FROM documents) t ON d.doc_id = t.doc_id
LEFT JOIN (SELECT w, len(sym)::BIGINT AS n_sym
           FROM v{rounds + 1}) f ON t.w = f.w
GROUP BY d.doc_id
ORDER BY d.doc_id"""
        return "WITH " + ",\n".join(ctes) + tail
    unions = "\n  UNION ALL ".join(
        f"SELECT {r} AS merge_idx, a AS lhs, b AS rhs, a || b AS merged, "
        f"total AS pair_count FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT merge_idx::INT AS merge_idx, lhs, rhs, merged,"
        f" pair_count\nFROM ({unions}) out\nORDER BY merge_idx"
    )


ORACLE_BPE_MERGES = _bpe_oracle(_BPE_ROUNDS)
ORACLE_BPE_SEGMENTED = _bpe_oracle(_BPE_ROUNDS, mode="segment")


def q_doc_bpe_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/bpetrain.bpe_segment: the APPLY side of the tokenizer
    loop — train the _BPE_ROUNDS-merge table, then segment every
    document with it (broadcast-model Arrow apply: one mapInPandas
    stage over one corpus pass, memoized per distinct pretoken; the
    pure-JVM fold chain survives as the property-tested
    bpe_segment_folds twin).  Output is the per-doc token-budget
    contract: pretoken count and post-merge BPE token count (EOW
    markers included, one per word)."""
    from netflix_data_ingestion_spark.operators.bpetrain import (
        bpe_segment,
        bpe_train,
    )
    from netflix_data_ingestion_spark.operators.textstats import (
        bpe_pretokenize,
    )

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    # min_pair_count=1 for oracle parity (see q_corpus_bpe_merges)
    merges = bpe_train(
        docs, "text", num_merges=_BPE_ROUNDS, min_pair_count=1
    )
    seg = bpe_segment(docs, merges, "doc_id", "text")
    pre = docs.select(
        "doc_id",
        F.size(bpe_pretokenize(F.lower(F.col("text"))))
        .cast("long")
        .alias("n_pretokens"),
    )
    return (
        pre.join(seg.select("doc_id", "n_bpe_tokens"), "doc_id")
        .select("doc_id", "n_pretokens", "n_bpe_tokens")
        .orderBy("doc_id")
    )


ORACLE_BPE_ENCODE = _bpe_oracle(_BPE_ROUNDS, mode="encode")


def q_doc_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END tokenizer contract: train the merge table
    (bpe_train), segment every document with it (bpe_segment), assign
    token ids over the learned inventory, and emit each document's
    ordered id stream — the full text-to-tensor hop one operator chain,
    where r6 verified train and apply only independently.

    Id assignment: the final symbol inventory (union of post-merge
    word symbols — model-sized, the same parameter-server license as
    the merge table) sorted in binary order, ids 1..V.  The contract
    hashes the space-joined per-doc id sequence so the oracle proves
    EXACT stream equality without shipping token arrays.

    Plan shape: one corpus pass to train (in-process merge loop), one
    segmentation pass (broadcast-model Arrow apply — see bpe_segment;
    formerly chained narrow folds whose codegen dominated cold start),
    one posexplode + broadcast-join on the vocab frame, one per-doc
    groupBy; the struct(pos, tok_id) array_sort keys the stream order,
    so the result is partition-invariant."""
    from netflix_data_ingestion_spark.operators.bpetrain import (
        bpe_segment,
        bpe_train,
    )

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    merges = bpe_train(
        docs, "text", num_merges=_BPE_ROUNDS, min_pair_count=1
    )
    # pin: TWO consumers (vocab collect + the id explode) would each
    # recompute the chained merge-fold segmentation otherwise — the
    # multiply-referenced-derived-frame rule (halved prefix-Jaccard)
    seg = bpe_segment(docs, merges, "doc_id", "text").localCheckpoint(
        eager=True
    )
    toks = sorted(
        r["tok"]
        for r in seg.select(
            F.explode("bpe_tokens").alias("tok")
        )
        .distinct()
        .collect()
    )
    vocab_df = spark.createDataFrame(
        [(t, i + 1) for i, t in enumerate(toks)], "tok string, tok_id long"
    )
    ex = seg.select(
        "doc_id", F.posexplode("bpe_tokens").alias("pos", "tok")
    )
    enc = (
        ex.join(F.broadcast(vocab_df), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok_id"))
                    ),
                    lambda s: s["tok_id"].cast("string"),
                ),
                " ",
            ).alias("ids"),
        )
    )
    return (
        docs.select("doc_id")
        .join(enc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.md5(F.coalesce("ids", F.lit(""))).alias("ids_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training data prep): for every
# class label, the corpus vectors OUTSIDE the class that sit closest to
# the class centroid — the negatives a contrastive loss learns most
# from.  Composes group_centroids' order-free fixed-point mean with the
# brute-force-cosine ranking discipline (round(sim, 6) ranking key,
# id tie-break).
# ---------------------------------------------------------------------------


def q_label_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """functions/vectors.group_centroids + cosine: top-10 other-label
    vectors per label centroid.  Plan: |labels|-row centroid frame
    broadcast against the corpus (bNLJ on label <>), narrow cosine map,
    rank window PARTITIONED by label — no data-sized single-task
    stage; corpus side scales linearly."""
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings").where(
        F.col("label").isNotNull() & F.col("embedding").isNotNull()
    )
    cents = vectors.group_centroids(emb, "label", "embedding").select(
        "label", "centroid"
    )
    cand = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        "embedding",
    )
    scored = (
        F.broadcast(cents)
        .join(cand, F.col("label") != F.col("neighbor_label"))
        .withColumn(
            "cosine_sim",
            F.round(
                vectors.cosine(F.col("centroid"), F.col("embedding")), 6
            ),
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 10)
        .select("label", "neighbor_id", "neighbor_label", "cosine_sim", "rank")
        .orderBy("label", "rank")
    )


ORACLE_HARD_NEGATIVES = """
WITH comp AS (
  SELECT label, i AS pos,
         SUM(ROUND(embedding[i]::DOUBLE * 1000000.0)::BIGINT)::BIGINT AS sq,
         COUNT(*)::BIGINT AS n
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
  WHERE label IS NOT NULL AND embedding IS NOT NULL
  GROUP BY 1, 2
),
cent AS (
  SELECT label, list(sq::DOUBLE / (n * 1000000.0) ORDER BY pos) AS c
  FROM comp GROUP BY label
),
pairs AS (
  SELECT cent.label, e.vec_id AS neighbor_id, e.label AS neighbor_label,
         ROUND(
           list_sum(list_transform(range(1, len(e.embedding) + 1),
                                   i -> cent.c[i] * e.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(range(1, len(cent.c) + 1),
                                           i -> cent.c[i] * cent.c[i])))
              * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))),
           6) AS cosine_sim
  FROM cent, embeddings e
  WHERE e.label IS NOT NULL AND e.embedding IS NOT NULL
    AND e.label <> cent.label
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                               ORDER BY cosine_sim DESC,
                                        neighbor_id ASC)::INT AS rank
  FROM pairs
)
SELECT label, neighbor_id, neighbor_label, cosine_sim, rank
FROM ranked WHERE rank <= 10
ORDER BY label, rank
"""


# ---------------------------------------------------------------------------
# Distributed PCA (top principal component) by power iteration: exact
# int64 second moments from ONE combinable data pass (dim^2 rows out,
# corpus-size-free), covariance + 8 deterministic power steps on the
# driver (parameter-server license), every float op in explicit
# left-to-right index order so the SQL twin reproduces the iterate
# bit-for-bit.
# ---------------------------------------------------------------------------

_PCA_ITERS = 8


def q_embedding_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/pca.top_principal_component over the embeddings table:
    (pos, loading, eigval) for the unit-norm 8-step power iterate of
    the exact quantized covariance."""
    from netflix_data_ingestion_spark.operators.pca import (
        top_principal_component,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return top_principal_component(
        emb, "embedding", dim=64, iters=_PCA_ITERS
    )


def _pca_oracle(iters: int) -> str:
    ctes = [
        """q AS (
  SELECT list_transform(embedding,
                        x -> round(x::DOUBLE * 1000000.0)::BIGINT) AS qv
  FROM embeddings WHERE embedding IS NOT NULL
),
nn AS (SELECT COUNT(*)::BIGINT AS n FROM q),
s1 AS (
  SELECT i, SUM(qv[i])::BIGINT AS s
  FROM q, unnest(range(1, 65)) AS t(i) GROUP BY i
),
s2 AS (
  SELECT t.i, u.j, SUM(qv[t.i] * qv[u.j])::BIGINT AS s
  FROM q, unnest(range(1, 65)) AS t(i), unnest(range(1, 65)) AS u(j)
  GROUP BY t.i, u.j
),
covr AS (
  SELECT s2.i,
         list(s2.s::DOUBLE / (nn.n * 1000000.0 * 1000000.0)
              - (a.s::DOUBLE / (nn.n * 1000000.0))
                * (b.s::DOUBLE / (nn.n * 1000000.0))
              ORDER BY s2.j) AS cl
  FROM s2
  JOIN s1 a ON a.i = s2.i
  JOIN s1 b ON b.i = s2.j
  CROSS JOIN nn
  GROUP BY s2.i
),
cm0 AS (SELECT list(cl ORDER BY i) AS cm FROM covr),
v0 AS (SELECT cm, list_transform(range(1, 65), i -> 1.0) AS v FROM cm0)"""
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""w{k} AS (
  SELECT cm, list_transform(range(1, 65), i ->
    list_sum(list_transform(range(1, 65), j -> cm[i][j] * v[j]))) AS w
  FROM v{k - 1}
),
v{k} AS (
  SELECT cm, list_transform(w, x ->
    x / sqrt(list_sum(list_transform(w, y -> y * y)))) AS v
  FROM w{k}
)"""
        )
    ctes.append(
        f"""uu AS (
  SELECT v, list_transform(range(1, 65), i ->
    list_sum(list_transform(range(1, 65), j -> cm[i][j] * v[j]))) AS u
  FROM v{iters}
),
ee AS (
  SELECT v, list_sum(list_transform(range(1, 65), i -> v[i] * u[i])) AS eig
  FROM uu
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT i::INT AS pos, ROUND(v[i], 6) AS loading, ROUND(eig, 6) AS eigval
FROM ee, unnest(range(1, 65)) AS t(i)
ORDER BY pos"""
    )


ORACLE_TOP_PC = _pca_oracle(_PCA_ITERS)


_PCA_COMPONENTS = 3


def q_embedding_top_pcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/pca.top_principal_components over the embeddings
    table: the top-3 principal directions by Hotelling deflation —
    (component, pos, loading, eigval), same single-pass exact moments,
    k * 8 driver-side power steps, bit-exact against the SQL twin."""
    from netflix_data_ingestion_spark.operators.pca import (
        top_principal_components,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return top_principal_components(
        emb, "embedding", dim=64, k=_PCA_COMPONENTS, iters=_PCA_ITERS
    )


def _pca_multi_oracle(k: int, iters: int) -> str:
    """K-component deflation twin: the c=1 chain is _pca_oracle's; each
    d{c+1} deflates cm by the found (v, eig) with the same
    left-to-right float sequencing as the Python loop
    (cm[i][j] - eig * v[i] * v[j])."""
    ctes = [
        """q AS (
  SELECT list_transform(embedding,
                        x -> round(x::DOUBLE * 1000000.0)::BIGINT) AS qv
  FROM embeddings WHERE embedding IS NOT NULL
),
nn AS (SELECT COUNT(*)::BIGINT AS n FROM q),
s1 AS (
  SELECT i, SUM(qv[i])::BIGINT AS s
  FROM q, unnest(range(1, 65)) AS t(i) GROUP BY i
),
s2 AS (
  SELECT t.i, u.j, SUM(qv[t.i] * qv[u.j])::BIGINT AS s
  FROM q, unnest(range(1, 65)) AS t(i), unnest(range(1, 65)) AS u(j)
  GROUP BY t.i, u.j
),
covr AS (
  SELECT s2.i,
         list(s2.s::DOUBLE / (nn.n * 1000000.0 * 1000000.0)
              - (a.s::DOUBLE / (nn.n * 1000000.0))
                * (b.s::DOUBLE / (nn.n * 1000000.0))
              ORDER BY s2.j) AS cl
  FROM s2
  JOIN s1 a ON a.i = s2.i
  JOIN s1 b ON b.i = s2.j
  CROSS JOIN nn
  GROUP BY s2.i
),
d1 AS (SELECT list(cl ORDER BY i) AS cm FROM covr)"""
    ]
    for c in range(1, k + 1):
        ctes.append(
            f"""c{c}v0 AS (
  SELECT cm, list_transform(range(1, 65), i -> 1.0) AS v FROM d{c}
)"""
        )
        for s in range(1, iters + 1):
            ctes.append(
                f"""c{c}w{s} AS (
  SELECT cm, list_transform(range(1, 65), i ->
    list_sum(list_transform(range(1, 65), j -> cm[i][j] * v[j]))) AS w
  FROM c{c}v{s - 1}
),
c{c}v{s} AS (
  SELECT cm, list_transform(w, x ->
    x / sqrt(list_sum(list_transform(w, y -> y * y)))) AS v
  FROM c{c}w{s}
)"""
            )
        ctes.append(
            f"""c{c}u AS (
  SELECT cm, v, list_transform(range(1, 65), i ->
    list_sum(list_transform(range(1, 65), j -> cm[i][j] * v[j]))) AS u
  FROM c{c}v{iters}
),
c{c}e AS (
  SELECT cm, v,
         list_sum(list_transform(range(1, 65), i -> v[i] * u[i])) AS eig
  FROM c{c}u
)"""
        )
        if c < k:
            ctes.append(
                f"""d{c + 1} AS (
  SELECT list_transform(range(1, 65), i ->
    list_transform(range(1, 65), j ->
      cm[i][j] - eig * v[i] * v[j])) AS cm
  FROM c{c}e
)"""
            )
    unions = "\n  UNION ALL ".join(
        f"SELECT {c} AS component, i::INT AS pos, ROUND(v[i], 6) AS loading,"
        f" ROUND(eig, 6) AS eigval FROM c{c}e, unnest(range(1, 65)) AS t(i)"
        for c in range(1, k + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT component::INT AS component, pos, loading, eigval
FROM ({unions}) out
ORDER BY component, pos"""
    )


ORACLE_TOP_PCS = _pca_multi_oracle(_PCA_COMPONENTS, _PCA_ITERS)


_PCA_PROJECT_K = 2


def q_embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/pca.project_principal_components: every embedding
    projected onto the top-2 deflation components — the dimensionality
    reduction / whitening-prep hop.  Model side (mean + loadings) is
    LITERAL arrays from the exact-moment pass; the projection is a pure
    narrow JVM map (no join, no shuffle), left-to-right folds matching
    the SQL twin bit-for-bit."""
    from netflix_data_ingestion_spark.operators.pca import (
        project_principal_components,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return project_principal_components(
        emb, "embedding", "vec_id", dim=64, k=_PCA_PROJECT_K,
        iters=_PCA_ITERS,
    ).orderBy("vec_id")


def _pca_project_oracle(k: int, iters: int) -> str:
    """Projection twin: the k-component deflation chain of
    _pca_multi_oracle (with the operator's full validity filter in the
    moment pass), then one row per vector with the centered dot
    product against each component, round(6)."""
    filt = (
        "embedding IS NOT NULL AND len(embedding) = 64 "
        "AND len(list_filter(embedding, x -> x IS NULL)) = 0"
    )
    ctes = [
        f"""q AS (
  SELECT list_transform(embedding,
                        x -> round(x::DOUBLE * 1000000.0)::BIGINT) AS qv
  FROM embeddings WHERE {filt}
),
nn AS (SELECT COUNT(*)::BIGINT AS n FROM q),
s1 AS (
  SELECT i, SUM(qv[i])::BIGINT AS s
  FROM q, unnest(range(1, 65)) AS t(i) GROUP BY i
),
s2 AS (
  SELECT t.i, u.j, SUM(qv[t.i] * qv[u.j])::BIGINT AS s
  FROM q, unnest(range(1, 65)) AS t(i), unnest(range(1, 65)) AS u(j)
  GROUP BY t.i, u.j
),
covr AS (
  SELECT s2.i,
         list(s2.s::DOUBLE / (nn.n * 1000000.0 * 1000000.0)
              - (a.s::DOUBLE / (nn.n * 1000000.0))
                * (b.s::DOUBLE / (nn.n * 1000000.0))
              ORDER BY s2.j) AS cl
  FROM s2
  JOIN s1 a ON a.i = s2.i
  JOIN s1 b ON b.i = s2.j
  CROSS JOIN nn
  GROUP BY s2.i
),
d1 AS (SELECT list(cl ORDER BY i) AS cm FROM covr),
mn AS (
  SELECT list(s::DOUBLE / (nn.n * 1000000.0) ORDER BY i) AS mean
  FROM s1 CROSS JOIN nn
)"""
    ]
    for c in range(1, k + 1):
        ctes.append(
            f"""c{c}v0 AS (
  SELECT cm, list_transform(range(1, 65), i -> 1.0) AS v FROM d{c}
)"""
        )
        for s in range(1, iters + 1):
            ctes.append(
                f"""c{c}w{s} AS (
  SELECT cm, list_transform(range(1, 65), i ->
    list_sum(list_transform(range(1, 65), j -> cm[i][j] * v[j]))) AS w
  FROM c{c}v{s - 1}
),
c{c}v{s} AS (
  SELECT cm, list_transform(w, x ->
    x / sqrt(list_sum(list_transform(w, y -> y * y)))) AS v
  FROM c{c}w{s}
)"""
            )
        ctes.append(
            f"""c{c}u AS (
  SELECT cm, v, list_transform(range(1, 65), i ->
    list_sum(list_transform(range(1, 65), j -> cm[i][j] * v[j]))) AS u
  FROM c{c}v{iters}
),
c{c}e AS (
  SELECT cm, v,
         list_sum(list_transform(range(1, 65), i -> v[i] * u[i])) AS eig
  FROM c{c}u
)"""
        )
        if c < k:
            ctes.append(
                f"""d{c + 1} AS (
  SELECT list_transform(range(1, 65), i ->
    list_transform(range(1, 65), j ->
      cm[i][j] - eig * v[i] * v[j])) AS cm
  FROM c{c}e
)"""
            )
    proj_cols = ",\n       ".join(
        f"""ROUND(list_sum(list_transform(range(1, 65), i ->
         (e.embedding[i]::DOUBLE - mn.mean[i]) * c{c}.v[i])), 6)
         AS pc{c}"""
        for c in range(1, k + 1)
    )
    froms = " ".join(f"CROSS JOIN c{c}e c{c}" for c in range(1, k + 1))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT e.vec_id::BIGINT AS vec_id,
       {proj_cols}
FROM (SELECT vec_id, embedding FROM embeddings WHERE {filt}) e
CROSS JOIN mn {froms}
ORDER BY vec_id"""
    )


ORACLE_PCA_PROJECT = _pca_project_oracle(_PCA_PROJECT_K, _PCA_ITERS)


# ---------------------------------------------------------------------------
# Per-document perplexity under the corpus bigram LM (the CCNet
# quality-filter recipe, Wenzek et al. 2020): absolute-discount bigram
# probabilities, per-bigram log rounded to exact integer micro-nats so
# partition order can never flip a score, one exp at the end.
# ---------------------------------------------------------------------------


def q_doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/lm.doc_perplexity over the documents corpus, self-
    trained (the CCNet shape scores a target corpus under a reference
    LM; the contract uses the corpus's own bigram table so the whole
    chain is driver-provable)."""
    from netflix_data_ingestion_spark.operators.lm import doc_perplexity

    docs = _t(spark, sf_dir, "documents")
    return doc_perplexity(docs, "doc_id", "text").orderBy("doc_id")


ORACLE_LM_PERPLEXITY = f"""
WITH {_DUCK_TOKS},
bg AS (
  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
  FROM toks, unnest(range(1, len(tk))) AS u(i)
),
counts AS (
  SELECT w1, w2, COUNT(*)::BIGINT AS cnt FROM bg GROUP BY 1, 2
),
succ AS (
  SELECT w1, COUNT(*)::BIGINT AS n_succ, SUM(cnt)::BIGINT AS ctx_total
  FROM counts GROUP BY 1
),
cont AS (SELECT w2, COUNT(*)::BIGINT AS cont_w2 FROM counts GROUP BY 1),
stats AS (
  SELECT COUNT(*)::BIGINT AS n_types,
         COUNT(DISTINCT w2)::BIGINT AS v_size
  FROM counts
),
scored AS (
  SELECT b.doc_id,
    round(ln(
      CASE WHEN s.ctx_total IS NOT NULL THEN
        GREATEST(COALESCE(c.cnt, 0) * 100 - 75, 0)::DOUBLE
          / (s.ctx_total::DOUBLE * 100.0)
        + (75.0 * s.n_succ::DOUBLE) / (s.ctx_total::DOUBLE * 100.0)
          * (CASE WHEN COALESCE(k.cont_w2, 0) > 0
                  THEN ((k.cont_w2 * 1000000000) / t.n_types) / 1e9
                  ELSE 1.0 / (t.v_size::DOUBLE + 1.0) END)
      ELSE
        CASE WHEN COALESCE(k.cont_w2, 0) > 0
             THEN ((k.cont_w2 * 1000000000) / t.n_types) / 1e9
             ELSE 1.0 / (t.v_size::DOUBLE + 1.0) END
      END
    ) * 1e6)::BIGINT AS log_micro
  FROM bg b
  LEFT JOIN counts c ON c.w1 = b.w1 AND c.w2 = b.w2
  LEFT JOIN succ s ON s.w1 = b.w1
  LEFT JOIN cont k ON k.w2 = b.w2
  CROSS JOIN stats t
),
per_doc AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
         SUM(log_micro)::BIGINT AS sum_logprob_micro
  FROM scored GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(p.n_bigrams, 0)::BIGINT AS n_bigrams,
       p.sum_logprob_micro,
       CASE WHEN p.n_bigrams > 0
            THEN ROUND(EXP(-(p.sum_logprob_micro::DOUBLE / 1e6)
                           / p.n_bigrams::DOUBLE), 6)
       END AS perplexity
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic augmentation (operators/augment.py): char dropout and
# BERT-style token masking with md5-positional coins — reproducible on
# any partitioning/engine/retry.  Contracts hash the augmented payloads
# so the oracle proves EXACT string equality without shipping text.
# ---------------------------------------------------------------------------


def q_doc_char_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/augment.char_dropout: ~1/13 of characters removed by
    the (salt, id, position) md5 coin; contract output is the before/
    after lengths and the md5 of the augmented text."""
    from netflix_data_ingestion_spark.operators import augment

    docs = _t(spark, sf_dir, "documents")
    aug = augment.char_dropout(docs, "doc_id", "text")
    return aug.select(
        "doc_id",
        F.length(F.coalesce(F.col("text"), F.lit("")))
        .cast("long")
        .alias("orig_len"),
        F.length("aug_text").cast("long").alias("aug_len"),
        F.md5("aug_text").alias("aug_md5"),
    ).orderBy("doc_id")


ORACLE_CHAR_AUGMENT = """
WITH t AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
a AS (
  SELECT doc_id, t,
    array_to_string(
      list_filter(
        list_transform(range(1, len(t) + 1),
          p -> CASE WHEN ('0x' || substr(md5('aug1|' || doc_id::VARCHAR
                              || '|' || p::VARCHAR), 1, 8))::BIGINT % 13
                         <> 0
                    THEN substr(t, p::INT, 1) END),
        x -> x IS NOT NULL),
      '') AS aug
  FROM t
)
SELECT doc_id, len(t)::BIGINT AS orig_len, len(aug)::BIGINT AS aug_len,
       md5(aug) AS aug_md5
FROM a ORDER BY doc_id
"""


def q_doc_token_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/augment.token_mask: ~1/8 of BPE pretokens replaced by
    <mask> (position-keyed md5 coin); contract hashes the
    space-joined masked stream."""
    from netflix_data_ingestion_spark.operators import augment

    docs = _t(spark, sf_dir, "documents")
    masked = augment.token_mask(docs, "doc_id", "text")
    return masked.select(
        "doc_id",
        F.size("masked_tokens").cast("long").alias("n_tokens"),
        "n_masked",
        F.md5(F.array_join("masked_tokens", " ")).alias("masked_md5"),
    ).orderBy("doc_id")


ORACLE_TOKEN_MASK = r"""
WITH tk AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')),
           '''[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, toks,
         list_transform(range(1, len(toks) + 1),
           p -> CASE WHEN ('0x' || substr(md5('mask1|' || doc_id::VARCHAR
                               || '|' || p::VARCHAR), 1, 8))::BIGINT % 8 = 0
                     THEN '<mask>' ELSE toks[p] END) AS mt
  FROM tk
)
SELECT doc_id, len(mt)::BIGINT AS n_tokens,
       len(list_filter(mt, x -> x = '<mask>'))::BIGINT AS n_masked,
       md5(array_to_string(mt, ' ')) AS masked_md5
FROM m ORDER BY doc_id
"""


def q_doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sample.dsir_llr_weights: Data Selection via Importance
    Resampling (Xie et al. 2023) over hashed n-gram features — each
    document scored by how much it resembles a target reference corpus
    (here the English slice), as the exact int64 sum of per-bucket
    log-likelihood-ratio micro-nats (unigram+bigram features, 256
    md5-prefix buckets, +1 smoothing).  The selection primitive behind
    quality-targeted pretraining mixes: resample the raw corpus with
    probability proportional to exp(llr) — the ranking this row pins is
    the entire model.

    Plan: one count pass (feature explode partial-aggregated to <= 256
    bucket rows before its exchange) + one narrow score pass folding
    each doc's feature array against the broadcast 256-entry LLR map in
    codegen — NO corpus-sized shuffle; the model is two model-sized
    collects.  ensure_parallelism guards the one-split documents scan.
    """
    from netflix_data_ingestion_spark.operators.sample import (
        dsir_llr_weights,
    )
    from netflix_data_ingestion_spark.operators.util import (
        ensure_parallelism,
    )

    docs = ensure_parallelism(
        _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    )
    return dsir_llr_weights(
        docs, "doc_id", "text", F.col("lang") == F.lit("en")
    ).orderBy("doc_id")


ORACLE_DSIR_WEIGHTS = """
WITH toks AS (
  SELECT doc_id, lang = 'en' AS is_target,
         list_filter(string_split_regex(lower(coalesce(text, '')),
                                        '[^a-z0-9]+'), x -> x <> '') AS tk
  FROM documents
),
feats AS (
  SELECT doc_id, is_target, f FROM toks, unnest(tk) AS u(f)
  UNION ALL
  SELECT doc_id, is_target, array_to_string(tk[i:i+1], ' ')
  FROM toks, unnest(range(1, len(tk))) AS r(i)
),
bk AS (SELECT doc_id, is_target, substr(md5(f), 1, 2) AS bk FROM feats),
counts AS (
  SELECT bk,
         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(count(*) AS BIGINT) AS cr
  FROM bk GROUP BY 1
),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt,
               CAST(sum(cr) AS BIGINT) AS tr FROM counts),
llr AS (
  SELECT bk,
         CAST(round((ln((ct + 1) / (tt + 256))
                     - ln((cr + 1) / (tr + 256))) * 1e6) AS BIGINT) AS w
  FROM counts, tot
),
doc AS (
  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS nf,
         CAST(sum(w) AS BIGINT) AS s
  FROM bk b JOIN llr USING (bk) GROUP BY 1
)
SELECT t.doc_id, t.is_target,
       coalesce(d.nf, 0) AS n_features,
       coalesce(d.s, 0) AS dsir_llr_micro
FROM toks t LEFT JOIN doc d USING (doc_id)
ORDER BY doc_id
"""


def q_doc_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sample.dsir_gumbel_topk: the DSIR resample itself —
    the 100 documents a quality-targeted mix keeps, drawn without
    replacement with probability proportional to exp(llr) via
    Gumbel-top-k (argtop-n of llr + Gumbel noise samples the softmax
    exactly), with the noise in integer micro-nats from the md5
    uniform so the draw is bit-reproducible across engines.  Completes
    the selection story doc_dsir_weights starts: weights -> actual
    kept set.

    Plan: dsir's two narrow passes + one TakeOrderedAndProject
    (per-partition top-n, no full sort)."""
    from netflix_data_ingestion_spark.operators.sample import (
        dsir_gumbel_topk,
    )
    from netflix_data_ingestion_spark.operators.util import (
        ensure_parallelism,
    )

    docs = ensure_parallelism(
        _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    )
    return dsir_gumbel_topk(
        docs, "doc_id", "text", F.col("lang") == F.lit("en"), n=100
    ).orderBy(F.col("gumbel_key_micro").desc(), F.col("doc_id"))


ORACLE_DSIR_RESAMPLE = """
WITH toks AS (
  SELECT doc_id, lang = 'en' AS is_target,
         list_filter(string_split_regex(lower(coalesce(text, '')),
                                        '[^a-z0-9]+'), x -> x <> '') AS tk
  FROM documents
),
feats AS (
  SELECT doc_id, is_target, f FROM toks, unnest(tk) AS u(f)
  UNION ALL
  SELECT doc_id, is_target, array_to_string(tk[i:i+1], ' ')
  FROM toks, unnest(range(1, len(tk))) AS r(i)
),
bk AS (SELECT doc_id, is_target, substr(md5(f), 1, 2) AS bk FROM feats),
counts AS (
  SELECT bk,
         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(count(*) AS BIGINT) AS cr
  FROM bk GROUP BY 1
),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt,
               CAST(sum(cr) AS BIGINT) AS tr FROM counts),
llr AS (
  SELECT bk,
         CAST(round((ln((ct + 1) / (tt + 256))
                     - ln((cr + 1) / (tr + 256))) * 1e6) AS BIGINT) AS w
  FROM counts, tot
),
doc AS (
  SELECT b.doc_id, CAST(sum(w) AS BIGINT) AS s
  FROM bk b JOIN llr USING (bk) GROUP BY 1
),
keyed AS (
  SELECT t.doc_id, t.is_target,
         coalesce(d.s, 0) AS dsir_llr_micro,
         coalesce(d.s, 0)
         + CAST(round(-ln(-ln(
             ((('0x' || substr(md5('dsir-v1|' || t.doc_id::VARCHAR), 1, 8)
               )::BIGINT)::DOUBLE + 0.5) / 4294967296.0
           )) * 1e6) AS BIGINT) AS gumbel_key_micro
  FROM toks t LEFT JOIN doc d USING (doc_id)
)
SELECT doc_id, is_target, dsir_llr_micro, gumbel_key_micro
FROM keyed
ORDER BY gumbel_key_micro DESC, doc_id
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (operators/unigram.py — SentencePiece-style
# hard-EM, Kudo ACL 2018).  The determinism contract that makes both
# oracles hash-exact: integer micro-nat piece scores (the lm.py/DSIR
# round-6 ln pin) and Viterbi keyed on (score, boundary-bitmask) —
# the oracle enumerates every segmentation path of each modeled word
# (bounded: words are capped at _UNI_MAX_WORD chars) and takes the
# same lexicographic argmax the linear-time DP computes.
# ---------------------------------------------------------------------------

_UNI_MAX_WORD = 20
_UNI_MAX_PIECE = 6
_UNI_SEED_MULTIS = 64
_UNI_VOCAB_SIZE = 40


def _unigram_oracle(mode: str) -> str:
    """DuckDB twin of the unigram trainer/segmenter: shared CTEs build
    the word table, the seed vocabulary with micro-nat scores, the
    per-word path enumeration, and the (score DESC, mask DESC) argmax
    with mask-decoded pieces; the tail is either the pruned-vocabulary
    M-step (``mode='vocab'``) or the per-doc segmentation stats
    (``mode='segment'``)."""
    regex = r"'''[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'"
    w, l, k, v = (
        _UNI_MAX_WORD,
        _UNI_MAX_PIECE,
        _UNI_SEED_MULTIS,
        _UNI_VOCAB_SIZE,
    )
    ctes = f"""
w0 AS (
  SELECT w, COUNT(*)::BIGINT AS cnt
  FROM (SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
          {regex})) AS w
        FROM documents) u
  WHERE len(w) <= {w}
  GROUP BY w
),
sub AS (
  SELECT substr(w, i::INT, pl::INT) AS piece, SUM(cnt)::BIGINT AS cnt
  FROM w0,
       unnest(range(1, len(w) + 1)) AS t(i),
       unnest(range(1, least({l}, len(w) - i + 1) + 1)) AS t2(pl)
  GROUP BY 1
),
multis AS (
  SELECT piece, cnt FROM sub WHERE len(piece) >= 2
  ORDER BY cnt DESC, piece ASC LIMIT {k}
),
seed AS (
  SELECT piece, cnt FROM sub WHERE len(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM multis
),
stot AS (SELECT SUM(cnt)::DOUBLE AS t FROM seed),
vocab AS (
  SELECT piece,
         CAST(ROUND(LN(cnt::DOUBLE / stot.t) * 1000000) AS BIGINT) AS s
  FROM seed, stot
),
paths AS (
  SELECT w, 0::BIGINT AS pos, 0::BIGINT AS score, 0::BIGINT AS mask
  FROM w0
  UNION ALL
  SELECT p.w, p.pos + len(v.piece), p.score + v.s,
         p.mask | (CASE WHEN p.pos > 0
                        THEN (1::BIGINT << p.pos::INT)
                        ELSE 0::BIGINT END)
  FROM paths p JOIN vocab v
    ON p.pos < len(p.w)
   AND len(v.piece) <= len(p.w) - p.pos
   AND substr(p.w, (p.pos + 1)::INT, len(v.piece)::INT) = v.piece
),
best AS (
  SELECT w, score, mask FROM (
    SELECT w, score, mask,
           ROW_NUMBER() OVER (PARTITION BY w
                              ORDER BY score DESC, mask DESC) AS rn
    FROM paths WHERE pos = len(w)) r
  WHERE rn = 1
),
wp AS (
  SELECT w, score,
         list_transform(range(1, len(bs)),
           kk -> substr(w, (bs[kk] + 1)::INT, (bs[kk + 1] - bs[kk])::INT))
           AS pieces
  FROM (SELECT w, score,
               list_sort(list_concat([0::BIGINT, len(w)::BIGINT],
                 list_filter(range(1, len(w)),
                   b -> ((mask >> b::INT) & 1) = 1))) AS bs
        FROM best) b
)"""
    if mode == "vocab":
        return (
            "WITH RECURSIVE "
            + ctes
            + f""",
used AS (
  SELECT up.piece AS piece, SUM(w0.cnt)::BIGINT AS used
  FROM wp JOIN w0 USING (w), unnest(wp.pieces) AS up(piece)
  GROUP BY 1
),
nch AS (SELECT COUNT(*)::BIGINT AS n FROM seed WHERE len(piece) = 1),
ranked AS (
  SELECT s.piece, COALESCE(u.used, 0)::BIGINT AS used,
         ROW_NUMBER() OVER (ORDER BY COALESCE(u.used, 0) DESC,
                            s.piece ASC) AS rn
  FROM seed s LEFT JOIN used u ON s.piece = u.piece
  WHERE len(s.piece) >= 2
),
kept AS (
  SELECT s.piece, COALESCE(u.used, 0)::BIGINT AS used
  FROM seed s LEFT JOIN used u ON s.piece = u.piece
  WHERE len(s.piece) = 1
  UNION ALL
  SELECT piece, used FROM ranked, nch WHERE rn <= {v} - nch.n
),
ktot AS (SELECT SUM(used)::BIGINT AS t, COUNT(*)::BIGINT AS k FROM kept)
SELECT piece, len(piece)::BIGINT AS piece_len, used AS used_cnt,
       CAST(ROUND(LN((used + 1)::DOUBLE / (t + k)::DOUBLE) * 1000000)
            AS BIGINT) AS score_mnat
FROM kept, ktot
ORDER BY score_mnat DESC, piece ASC"""
        )
    if mode == "encode":
        # the vocab-mode prune (kept/ktot) feeds a SECOND enumeration
        # under the re-scored pruned vocabulary, whose per-word argmax
        # becomes the doc token-id sequence (the doc_bpe_encode tail:
        # word position x piece position orders the string_agg)
        return (
            "WITH RECURSIVE "
            + ctes
            + f""",
used AS (
  SELECT up.piece AS piece, SUM(w0.cnt)::BIGINT AS used
  FROM wp JOIN w0 USING (w), unnest(wp.pieces) AS up(piece)
  GROUP BY 1
),
nch AS (SELECT COUNT(*)::BIGINT AS n FROM seed WHERE len(piece) = 1),
ranked AS (
  SELECT s.piece, COALESCE(u.used, 0)::BIGINT AS used,
         ROW_NUMBER() OVER (ORDER BY COALESCE(u.used, 0) DESC,
                            s.piece ASC) AS rn
  FROM seed s LEFT JOIN used u ON s.piece = u.piece
  WHERE len(s.piece) >= 2
),
kept AS (
  SELECT s.piece, COALESCE(u.used, 0)::BIGINT AS used
  FROM seed s LEFT JOIN used u ON s.piece = u.piece
  WHERE len(s.piece) = 1
  UNION ALL
  SELECT piece, used FROM ranked, nch WHERE rn <= {v} - nch.n
),
ktot AS (SELECT SUM(used)::BIGINT AS t, COUNT(*)::BIGINT AS k FROM kept),
vocab2 AS (
  SELECT piece,
         CAST(ROUND(LN((used + 1)::DOUBLE / (t + k)::DOUBLE) * 1000000)
              AS BIGINT) AS s2,
         ROW_NUMBER() OVER (
           ORDER BY CAST(ROUND(LN((used + 1)::DOUBLE / (t + k)::DOUBLE)
                               * 1000000) AS BIGINT) DESC,
                    piece ASC) - 1 AS tok_id
  FROM kept, ktot
),
paths2 AS (
  SELECT w, 0::BIGINT AS pos, 0::BIGINT AS score, 0::BIGINT AS mask
  FROM w0
  UNION ALL
  SELECT p.w, p.pos + len(v.piece), p.score + v.s2,
         p.mask | (CASE WHEN p.pos > 0
                        THEN (1::BIGINT << p.pos::INT)
                        ELSE 0::BIGINT END)
  FROM paths2 p JOIN vocab2 v
    ON p.pos < len(p.w)
   AND len(v.piece) <= len(p.w) - p.pos
   AND substr(p.w, (p.pos + 1)::INT, len(v.piece)::INT) = v.piece
),
best2 AS (
  SELECT w, mask FROM (
    SELECT w, mask,
           ROW_NUMBER() OVER (PARTITION BY w
                              ORDER BY score DESC, mask DESC) AS rn
    FROM paths2 WHERE pos = len(w)) r
  WHERE rn = 1
),
wp2 AS (
  SELECT w,
         list_transform(range(1, len(bs)),
           kk -> substr(w, (bs[kk] + 1)::INT, (bs[kk + 1] - bs[kk])::INT))
           AS pieces
  FROM (SELECT w,
               list_sort(list_concat([0::BIGINT, len(w)::BIGINT],
                 list_filter(range(1, len(w)),
                   b -> ((mask >> b::INT) & 1) = 1))) AS bs
        FROM best2) b
),
docws AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')),
           {regex}) AS ws
  FROM documents
),
seq AS (
  SELECT d.doc_id, t.i AS wpos, f.pieces AS pieces
  FROM docws d, unnest(range(1, len(d.ws) + 1)) AS t(i)
  JOIN wp2 f ON f.w = d.ws[t.i]
),
tok AS (
  SELECT s.doc_id, s.wpos, u.j AS spos, vb.tok_id
  FROM seq s, unnest(range(1, len(s.pieces) + 1)) AS u(j)
  JOIN vocab2 vb ON vb.piece = s.pieces[u.j]
),
enc AS (
  SELECT doc_id,
         COUNT(*)::BIGINT AS n_tokens,
         string_agg(tok_id::VARCHAR, ' ' ORDER BY wpos, spos) AS ids
  FROM tok GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(e.n_tokens, 0)::BIGINT AS n_tokens,
       md5(COALESCE(e.ids, '')) AS ids_md5
FROM documents d LEFT JOIN enc e ON d.doc_id = e.doc_id
ORDER BY d.doc_id"""
        )
    return (
        "WITH RECURSIVE "
        + ctes
        + f""",
docw AS (
  SELECT doc_id, w, COUNT(*)::BIGINT AS occ
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(coalesce(text, '')),
                 {regex})) AS w
        FROM documents) u
  WHERE len(w) <= {w}
  GROUP BY 1, 2
),
agg AS (
  SELECT d.doc_id,
         SUM(d.occ)::BIGINT AS n_words,
         SUM(d.occ * len(wp.pieces))::BIGINT AS n_pieces,
         SUM(d.occ * wp.score)::BIGINT AS score_mnat
  FROM docw d JOIN wp USING (w)
  GROUP BY 1
),
dd AS (
  SELECT d.doc_id, COUNT(DISTINCT up.piece)::BIGINT AS ndp
  FROM docw d JOIN wp USING (w), unnest(wp.pieces) AS up(piece)
  GROUP BY 1
)
SELECT doc.doc_id,
       COALESCE(a.n_words, 0)::BIGINT AS n_words,
       COALESCE(a.n_pieces, 0)::BIGINT AS n_pieces,
       COALESCE(dd.ndp, 0)::BIGINT AS n_distinct_pieces,
       COALESCE(a.score_mnat, 0)::BIGINT AS score_mnat
FROM documents doc
LEFT JOIN agg a ON doc.doc_id = a.doc_id
LEFT JOIN dd ON doc.doc_id = dd.doc_id
ORDER BY doc.doc_id"""
    )


ORACLE_UNIGRAM_VOCAB = _unigram_oracle("vocab")
ORACLE_UNIGRAM_SEGMENTED = _unigram_oracle("segment")
ORACLE_UNIGRAM_ENCODE = _unigram_oracle("encode")


def q_corpus_unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/unigram.unigram_train: one hard-EM round of the
    SentencePiece-style unigram tokenizer — seed vocabulary (every
    character + top substrings), Viterbi E-step over the distinct-word
    frame (one Arrow stage, broadcast integer-score model), prune to
    _UNI_VOCAB_SIZE by realized usage, re-score with add-one smoothing.
    Output is the final vocabulary with exact usage counts and integer
    micro-nat scores."""
    from netflix_data_ingestion_spark.operators.unigram import (
        unigram_train,
    )

    docs = _t(spark, sf_dir, "documents")
    return unigram_train(
        docs,
        "text",
        vocab_size=_UNI_VOCAB_SIZE,
        seed_multis=_UNI_SEED_MULTIS,
        max_piece_len=_UNI_MAX_PIECE,
        max_word_len=_UNI_MAX_WORD,
    ).orderBy(F.desc("score_mnat"), "piece")


def q_doc_unigram_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/unigram.unigram_segment: tokenizer-apply under the
    seed unigram model (the E-step segmentation contract) — per-doc
    modeled-word count, Viterbi piece count, distinct pieces, and the
    document's total segmentation score in exact integer micro-nats
    (the unigram-LM log-likelihood, the domain-fit signal).  One Arrow
    stage over one corpus pass, memoized per distinct word."""
    from netflix_data_ingestion_spark.operators.unigram import (
        unigram_seed_scores,
        unigram_segment,
    )

    docs = _t(spark, sf_dir, "documents")
    score = unigram_seed_scores(
        docs,
        "text",
        seed_multis=_UNI_SEED_MULTIS,
        max_piece_len=_UNI_MAX_PIECE,
        max_word_len=_UNI_MAX_WORD,
    )
    return unigram_segment(
        docs,
        score,
        id_col="doc_id",
        text_col="text",
        max_piece_len=_UNI_MAX_PIECE,
        max_word_len=_UNI_MAX_WORD,
    ).orderBy("doc_id")


def q_doc_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/unigram.unigram_encode: the id-sequence contract under
    the PRUNED vocabulary — train to _UNI_VOCAB_SIZE pieces, assign ids
    by (score DESC, piece ASC) rank, Viterbi-encode every document, and
    hash the space-joined id sequence (the doc_bpe_encode shape: the
    md5 pins piece order within words and word order within docs, so
    any segmentation or ranking drift fails the row)."""
    from netflix_data_ingestion_spark.operators.unigram import (
        unigram_encode,
        unigram_train,
    )

    docs = _t(spark, sf_dir, "documents")
    vocab = (
        unigram_train(
            docs,
            "text",
            vocab_size=_UNI_VOCAB_SIZE,
            seed_multis=_UNI_SEED_MULTIS,
            max_piece_len=_UNI_MAX_PIECE,
            max_word_len=_UNI_MAX_WORD,
        )
        .orderBy(F.desc("score_mnat"), "piece")
        .collect()
    )
    score = {r["piece"]: int(r["score_mnat"]) for r in vocab}
    ids = {r["piece"]: i for i, r in enumerate(vocab)}
    return (
        unigram_encode(
            docs,
            score,
            ids,
            id_col="doc_id",
            text_col="text",
            max_piece_len=_UNI_MAX_PIECE,
            max_word_len=_UNI_MAX_WORD,
        )
        .select(
            "doc_id",
            "n_tokens",
            F.md5(F.coalesce("ids", F.lit(""))).alias("ids_md5"),
        )
        .orderBy("doc_id")
    )


def q_events_error_clicks_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The STREAM-STREAM JOIN surface driven through the driver gate
    (streaming/ingest.join_clicks_to_errors): read the static events
    parquet as a file-source stream TWICE (click leg + error leg, both
    watermarked), inner-join each error to the same user's clicks in
    the preceding 60 minutes, availableNow into a memory sink.

    Batching-invariance of the contract: an INNER stream-stream join
    emits a pair the moment both sides are buffered — the watermark
    only EXPIRES state between micro-batches (that is what bounds the
    join buffer at 100 TB/day; the time-bound join condition is what
    makes the expiry sound) — so with the single-file source's one
    data micro-batch (ENFORCED via run_to_memory(max_data_batches=1))
    the emitted set is exactly the batch join, and the oracle is the
    plain time-bounded self-join.  The fifth stateful streaming family
    under the hash-checked oracle (windows, sessions, CDC, OHLC, and
    now join state); tests/test_streaming.py pins stream == batch on a
    multi-batch rate source independently.

    r12 (guide §1.2 — don't compute what you throw away): the trailing
    no-data micro-batch is disabled FOR THIS QUERY ONLY.  An INNER
    stream-stream join emits every pair during the data batch; the
    no-data flush batch exists to advance the watermark and evict
    buffered state before shutdown — it produces zero output rows for
    an inner join (unlike append-mode windowed aggregates, where the
    flush batch EMITS the closed windows and stays on).  Measured: the
    flush batch re-ran the full state machinery (~4 s, 0 input rows) on
    a replay that discards the checkpoint immediately after.  The
    conf is set+restored around the one start() so the session default
    (and every windowed streaming row) is untouched; output equality
    is still hash-checked by the oracle at both SFs."""
    import os

    from netflix_data_ingestion_spark.streaming.ingest import (
        join_clicks_to_errors,
        run_to_memory,
    )

    ev_path = os.path.join(sf_dir, "events.parquet")
    reader = (
        spark.readStream.format("parquet")
        .schema(_t(spark, sf_dir, "events").schema)
    )
    if os.path.isdir(ev_path):
        reader = reader.option("path", ev_path)
    else:
        reader = reader.option("path", sf_dir).option(
            "pathGlobFilter", "events.parquet"
        )
    src = reader.load().withColumn("ts", F.col("ts").cast("timestamp"))
    joined = join_clicks_to_errors(
        src, lookback="60 minutes", watermark="2 hours"
    ).select(
        "error_id",
        "e_user",
        # cast back to NTZ: the session is pinned UTC, so this restores
        # the exact wall times the DuckDB oracle sees
        F.col("e_ts").cast("timestamp_ntz").alias("e_ts"),
        "click_id",
        F.col("c_ts").cast("timestamp_ntz").alias("c_ts"),
    )
    _STREAM_RUN_SEQ[0] += 1
    name = f"__error_clicks_stream_{os.getpid()}_{_STREAM_RUN_SEQ[0]}"
    ndkey = "spark.sql.streaming.noDataMicroBatches.enabled"
    old_nd = spark.conf.get(ndkey, None)
    spark.conf.set(ndkey, "false")
    try:
        run_to_memory(
            joined,
            name,
            output_mode="append",
            max_data_batches=1,
            shuffle_partitions=_stream_partitions(spark, ev_path),
        )
    finally:
        if old_nd is None:
            spark.conf.unset(ndkey)
        else:
            spark.conf.set(ndkey, old_nd)
    return spark.table(name).orderBy("error_id", "click_id")


ORACLE_ERROR_CLICKS_STREAM = """
SELECT e.event_id AS error_id,
       e.user_id AS e_user,
       e.ts AS e_ts,
       c.event_id AS click_id,
       c.ts AS c_ts
FROM events e
JOIN events c
  ON c.user_id = e.user_id
 AND e.event_type = 'error'
 AND c.event_type = 'click'
 AND c.ts BETWEEN e.ts - INTERVAL 60 MINUTE AND e.ts
ORDER BY error_id, click_id
"""


REGISTRY_LLM = {
    "corpus_bpe_merges": (q_corpus_bpe_merges, ORACLE_BPE_MERGES),
    "embedding_top_pc": (q_embedding_top_pc, ORACLE_TOP_PC),
    "doc_char_augment": (q_doc_char_augment, ORACLE_CHAR_AUGMENT),
    "doc_token_mask": (q_doc_token_mask, ORACLE_TOKEN_MASK),
    "doc_bpe_segmented": (q_doc_bpe_segmented, ORACLE_BPE_SEGMENTED),
    "label_hard_negatives": (q_label_hard_negatives, ORACLE_HARD_NEGATIVES),
    "user_heavy_hitters": (q_user_heavy_hitters, ORACLE_HEAVY_HITTERS),
    "dedup_prefix_jaccard": (q_dedup_prefix_jaccard, ORACLE_PREFIX_JACCARD),
    "events_throttled_daily": (q_events_throttled_daily, ORACLE_THROTTLED),
    "customer_part_negatives": (q_customer_part_negatives, ORACLE_NEGATIVES),
    "doc_class_balance": (q_doc_class_balance, ORACLE_CLASS_BALANCE),
    "doc_line_dedup": (q_doc_line_dedup, ORACLE_LINE_DEDUP),
    "doc_bpe_token_stats": (q_doc_bpe_token_stats, ORACLE_BPE_STATS),
    "corpus_bigram_lm": (q_corpus_bigram_lm, ORACLE_BIGRAM_LM),
    "doc_quality_source_cut": (
        q_doc_quality_source_cut,
        ORACLE_QUALITY_SOURCE_CUT,
    ),
    "corpus_vocab_growth": (q_corpus_vocab_growth, ORACLE_VOCAB_GROWTH),
    "part_cooccurrence": (q_part_cooccurrence, ORACLE_COOCCURRENCE),
    "part_item_neighbors": (q_part_item_neighbors, ORACLE_ITEM_NEIGHBORS),
    "embedding_random_projection": (
        q_embedding_random_projection,
        ORACLE_RANDOM_PROJECTION,
    ),
    "part_triangle_counts": (q_part_triangle_counts, ORACLE_TRIANGLES),
    "part_kcore": (q_part_kcore, ORACLE_KCORE),
    "user_churn_labels": (q_user_churn_labels, ORACLE_CHURN_LABELS),
    "time_to_purchase_labels": (
        q_time_to_purchase_labels,
        ORACLE_TIME_TO_PURCHASE,
    ),
    "user_decile_lift": (q_user_decile_lift, ORACLE_DECILE_LIFT),
    "top_session_paths": (q_top_session_paths, ORACLE_SESSION_PATHS),
    "doc_kfold": (q_doc_kfold, ORACLE_KFOLD),
    "doc_token_ids": (q_doc_token_ids, ORACLE_TOKEN_IDS),
    "doc_pack_windows": (q_doc_pack_windows, ORACLE_PACK_WINDOWS),
    "doc_model_scores": (q_doc_model_scores, ORACLE_MODEL_SCORES),
    "doc_padded_tokens": (q_doc_padded_tokens, ORACLE_PADDED_TOKENS),
    "embedding_int8_quantize": (
        q_embedding_int8_quantize,
        ORACLE_INT8_QUANTIZE,
    ),
    "orders_lineitem_join_size": (
        q_orders_lineitem_join_size,
        ORACLE_JOIN_SIZE_EST,
    ),
    "purchase_view_attribution": (
        q_purchase_view_attribution,
        ORACLE_ATTRIBUTION,
    ),
    "doc_pps_sample": (q_doc_pps_sample, ORACLE_PPS_SAMPLE),
    "user_context_window": (q_user_context_window, ORACLE_CONTEXT),
    "embedding_l2_normalize": (q_embedding_l2_normalize, ORACLE_L2_NORMALIZE),
    "user_hll_registers": (q_user_hll_registers, ORACLE_HLL),
    "user_hll_by_type": (q_user_hll_by_type, ORACLE_HLL_BY_TYPE),
    "order_price_winsorized": (
        q_order_price_winsorized,
        ORACLE_WINSORIZED,
    ),
    "doc_bm25_search": (q_doc_bm25_search, ORACLE_BM25),
    "events_time_split": (q_events_time_split, ORACLE_TIME_SPLIT),
    "dedup_exact_canonical": (
        q_dedup_exact_canonical,
        ORACLE_DEDUP_CANONICAL,
    ),
    "dedup_semantic": (q_dedup_semantic, ORACLE_SEMANTIC_DEDUP),
    "doc_inverted_index": (q_doc_inverted_index, ORACLE_INVERTED_INDEX),
    "event_props_json": (q_event_props_json, ORACLE_PROPS_JSON),
    "doc_chunk_text": (q_doc_chunk_text, ORACLE_CHUNK_TEXT),
    "top_tokens": (q_top_tokens, ORACLE_TOP_TOKENS),
    "train_test_split": (q_train_test_split, ORACLE_TRAIN_TEST_SPLIT),
    "dedup_exact": (q_dedup_exact, ORACLE_DEDUP_EXACT),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, ORACLE_DEDUP_NGRAM),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, ORACLE_DEDUP_MINHASH),
    "dedup_incremental": (q_dedup_incremental, ORACLE_DEDUP_INCREMENTAL),
    "doc_dup_spans": (q_doc_dup_spans, ORACLE_DUP_SPANS),
    "doc_span_cut": (q_doc_span_cut, ORACLE_SPAN_CUT),
    "dedup_clusters": (q_dedup_clusters, ORACLE_DEDUP_CLUSTERS),
    "dedup_near_dup_scale": (q_dedup_near_dup_scale, ORACLE_DEDUP_NEAR_DUP_SCALE),
    "dedup_lsh_recall": (q_dedup_lsh_recall, ORACLE_LSH_RECALL),
    "dedup_containment": (q_dedup_containment, ORACLE_CONTAINMENT),
    "dedup_simhash": (q_dedup_simhash, ORACLE_DEDUP_SIMHASH),
    "dedup_simhash_pairs": (q_dedup_simhash_pairs, ORACLE_SIMHASH_PAIRS),
    "dedup_embedding_cosine": (q_dedup_embedding_cosine, ORACLE_DEDUP_COSINE),
    "dedup_cosine_scale": (q_dedup_cosine_scale, ORACLE_DEDUP_COSINE_SCALE),
    "embedding_cosine_topk": (q_embedding_cosine_topk, ORACLE_COSINE_TOPK),
    "ann_lsh_topk": (q_ann_lsh_topk, ORACLE_ANN_LSH),
    "ann_ivf_topk": (q_ann_ivf_topk, ORACLE_ANN_IVF),
    "ann_pq_topk": (q_ann_pq_topk, ORACLE_ANN_PQ),
    "ann_multiprobe_topk": (q_ann_multiprobe_topk, ORACLE_ANN_MULTIPROBE),
    "doc_token_stats": (q_doc_token_stats, ORACLE_TOKEN_STATS),
    "doc_quality_score": (q_doc_quality_score, ORACLE_QUALITY),
    "doc_lang_id": (q_doc_lang_id, ORACLE_LANG_ID),
    "doc_fingerprint": (q_doc_fingerprint, ORACLE_FINGERPRINT),
    "doc_tfidf_top_terms": (q_doc_tfidf_top_terms, ORACLE_TFIDF),
    "doc_pii_redact": (q_doc_pii_redact, ORACLE_PII_REDACT),
    "embedding_group_centroid": (
        q_embedding_group_centroid,
        ORACLE_GROUP_CENTROID,
    ),
    "curate_corpus": (q_curate_corpus, ORACLE_CURATE),
    "kmeans_clusters": (q_kmeans_clusters, ORACLE_KMEANS),
    "kmeans_inertia": (q_kmeans_inertia, ORACLE_KMEANS_INERTIA),
    "doc_repetition_ratio": (q_doc_repetition_ratio, ORACLE_REPETITION),
    "doc_quota_sample": (q_doc_quota_sample, ORACLE_QUOTA_SAMPLE),
    "doc_stratified_sample": (q_doc_stratified_sample, ORACLE_STRATIFIED_SAMPLE),
    "user_event_cms": (q_user_event_cms, ORACLE_USER_CMS),
    "doc_bernoulli_mix": (q_doc_bernoulli_mix, ORACLE_BERNOULLI_MIX),
    "doc_contamination": (q_doc_contamination, ORACLE_CONTAMINATION),
    "doc_pack_chunks": (q_doc_pack_chunks, ORACLE_PACK_CHUNKS),
    "events_tumbling_window": (q_events_tumbling_window, ORACLE_TUMBLING),
    "events_sliding_window": (q_events_sliding_window, ORACLE_SLIDING),
    "multimodal_meta": (q_multimodal_meta, ORACLE_MULTIMODAL),
    "multimodal_frame_sample": (q_multimodal_frame_sample, ORACLE_FRAME_SAMPLE),
    "multimodal_phash_pairs": (q_multimodal_phash_pairs, ORACLE_PHASH_PAIRS),
    # round-7 additions (registry tail: the frozen r7 window stays
    # byte-identical to the drafted plan; these queue in _VERIFY_ROUND8)
    "embedding_top_pcs": (q_embedding_top_pcs, ORACLE_TOP_PCS),
    "doc_bpe_encode": (q_doc_bpe_encode, ORACLE_BPE_ENCODE),
    "embedding_pca_project": (q_embedding_pca_project, ORACLE_PCA_PROJECT),
    "doc_lm_perplexity": (q_doc_lm_perplexity, ORACLE_LM_PERPLEXITY),
    # round-8 tail additions (frozen r8 window unchanged; queue for the
    # r9 rotation): measured ANN recall rows + the WAV codec end-to-end
    "ann_ivf_recall": (q_ann_ivf_recall, ORACLE_ANN_IVF_RECALL),
    "ann_pq_recall": (q_ann_pq_recall, ORACLE_ANN_PQ_RECALL),
    "ann_lsh_recall": (q_ann_lsh_recall, ORACLE_ANN_LSH_RECALL),
    "ann_multiprobe_recall": (
        q_ann_multiprobe_recall,
        ORACLE_ANN_MULTIPROBE_RECALL,
    ),
    "multimodal_audio_stats": (q_multimodal_audio_stats, ORACLE_AUDIO_STATS),
    "multimodal_gif_frames": (q_multimodal_gif_frames, ORACLE_GIF_FRAMES),
    "multimodal_audio_resample": (
        q_multimodal_audio_resample,
        ORACLE_AUDIO_RESAMPLE,
    ),
    "multimodal_avi_frames": (q_multimodal_avi_frames, ORACLE_AVI_FRAMES),
    # round-9 tail additions (frozen r9 window unchanged; queue for the
    # r10 rotation): the ISO BMFF container walk completing the video
    # container family the AVI walk started, and the temperature-scaled
    # source-mixture table
    "multimodal_mp4_frames": (q_multimodal_mp4_frames, ORACLE_MP4_FRAMES),
    "doc_source_mixture": (q_doc_source_mixture, ORACLE_SOURCE_MIXTURE),
    "doc_mixture_realized": (q_doc_mixture_realized, ORACLE_MIXTURE_REALIZED),
    "doc_fim_transform": (q_doc_fim_transform, ORACLE_FIM),
    "doc_span_corrupt": (q_doc_span_corrupt, ORACLE_SPAN_CORRUPT),
    "doc_length_batches": (q_doc_length_batches, ORACLE_LENGTH_BATCHES),
    # round-10 tail additions (frozen r10 window unchanged; queue for the
    # r11 rotation): train-once ANN twins — the persisted-quantizer
    # production posture, sharing the in-plan rows' oracles because the
    # fixed-point training is deterministic
    "ann_ivf_topk_staged": (q_ann_ivf_topk_staged, ORACLE_ANN_IVF),
    "ann_pq_topk_staged": (q_ann_pq_topk_staged, ORACLE_ANN_PQ),
    # ...and the first driver row produced BY the streaming path (an
    # applyInPandasWithState rate limiter under availableNow), with a
    # full oracle on its batching-invariant aggregate
    "events_throttled_daily_stream": (
        q_events_throttled_daily_stream,
        ORACLE_THROTTLED_DAILY_STREAM,
    ),
    # ...and progressive-JPEG decode proven end-to-end (constant-tile
    # mosaics make the lossy codec SQL-exact; the general profile is
    # pinned bit-identical to baseline by unit tests)
    "multimodal_jpeg_progressive": (
        q_multimodal_jpeg_progressive,
        ORACLE_JPEG_PROGRESSIVE,
    ),
    # ...and DSIR importance weights — the quality-targeted data-
    # selection primitive (hashed-ngram LLR vs a reference slice) the
    # mixture/curation family was missing
    "doc_dsir_weights": (q_doc_dsir_weights, ORACLE_DSIR_WEIGHTS),
    "doc_dsir_resample": (q_doc_dsir_resample, ORACLE_DSIR_RESAMPLE),
    # ...and the second driver row produced BY the streaming path: a
    # watermarked event-time tumbling window in APPEND mode, where the
    # watermark is the load-bearing emission gate (closed windows only)
    # rather than neutralized — the oracle is the batch tumbling
    # aggregate restricted to the closed-window boundary
    "events_tumbling_window_stream": (
        q_events_tumbling_window_stream,
        ORACLE_TUMBLING_STREAM,
    ),
    # ...and 12-bit extended-sequential JPEG (SOF1) decoded real —
    # quarantine narrows to lossless/hierarchical/arithmetic/CMYK/
    # 12-bit-progressive
    "multimodal_jpeg_12bit": (
        q_multimodal_jpeg_12bit,
        ORACLE_JPEG_12BIT,
    ),
    # ...and the overlapping-window streaming surface (2h/1h sliding,
    # append mode, closed-window emission) — the third driver row
    # executed through the streaming path
    "events_sliding_window_stream": (
        q_events_sliding_window_stream,
        ORACLE_SLIDING_STREAM,
    ),
    # ...and lossless (SOF3) JPEG decoded real and bit-exact on
    # arbitrary content — quarantine narrows to differential-lossless/
    # hierarchical/arithmetic/CMYK/12-bit-progressive
    "multimodal_jpeg_lossless": (
        q_multimodal_jpeg_lossless,
        ORACLE_JPEG_LOSSLESS,
    ),
    # ...and 12-bit progressive — the last 12-bit profile; quarantine
    # narrows to differential-lossless/hierarchical/arithmetic/CMYK
    "multimodal_jpeg_prog12": (
        q_multimodal_jpeg_prog12,
        ORACLE_JPEG_PROG12,
    ),
    # r12: the MERGING-state streaming surface (per-user session
    # windows, append mode, closed-session emission) — the fourth
    # stateful streaming family under the hash-checked oracle
    "events_session_window_stream": (
        q_events_session_window_stream,
        ORACLE_SESSION_WINDOW_STREAM,
    ),
    # r12: the CDC-apply path (foreachBatch + checkpoint + atomic-swap
    # snapshot, within-batch latest-by-order collapse, tombstone
    # deletes) — the converged snapshot hash-checked against the batch
    # MERGE twin
    "orders_cdc_snapshot_stream": (
        q_orders_cdc_snapshot_stream,
        ORACLE_CDC_SNAPSHOT_STREAM,
    ),
    # r12: the ORDER-STATISTIC streaming state surface (watermarked
    # OHLC bars, append mode, closed-window emission) — min_by/max_by
    # picks round-trip the DOUBLE column bit-exactly
    "events_ohlc_hourly_stream": (
        q_events_ohlc_hourly_stream,
        ORACLE_OHLC_STREAM,
    ),
    # r12: the unigram-LM tokenizer family (operators/unigram.py) —
    # the second real subword tokenizer next to BPE, held to the same
    # fully-unrolled-oracle bar: the M-step pruned vocabulary and the
    # per-doc Viterbi segmentation stats, both hash-exact via integer
    # micro-nat scores + (score, boundary-mask) tie-breaks
    "corpus_unigram_vocab": (
        q_corpus_unigram_vocab,
        ORACLE_UNIGRAM_VOCAB,
    ),
    "doc_unigram_segmented": (
        q_doc_unigram_segmented,
        ORACLE_UNIGRAM_SEGMENTED,
    ),
    "doc_unigram_encode": (
        q_doc_unigram_encode,
        ORACLE_UNIGRAM_ENCODE,
    ),
    # r12: the STREAM-STREAM JOIN state surface — time-bounded inner
    # join with watermark-expired buffers, hash-checked against the
    # plain time-bounded self-join (batch == stream under the enforced
    # single data micro-batch)
    "events_error_clicks_stream": (
        q_events_error_clicks_stream,
        ORACLE_ERROR_CLICKS_STREAM,
    ),
}
