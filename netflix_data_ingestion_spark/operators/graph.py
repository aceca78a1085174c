"""Connected components + dedup clustering — beyond-reference
(BASELINE.json north star).

Near-dup pair lists (dedup.near_dup_pairs_at_scale) are only half a
dedup pipeline: pairs must be folded into CLUSTERS so exactly one
canonical document per group survives.  Pair-at-a-time "drop id_b"
breaks on chains (A~B, B~C but A!~C drops B and C against different
keepers); the correct semantics is connected components over the
similarity graph.

Spark has no built-in CC (GraphX is RDD/Scala-only and GraphFrames is an
external package), so this is the classic driver-coordinated iterative
min-label propagation with POINTER JUMPING:

    label(u)  <-  min(label(u), min_{(u,v) in E} label(v))   [hop]
    label(u)  <-  min(label(u), label(label(u)))             [jump]

Plain neighbor-min floods one hop per round → O(diameter) rounds; the
jump step additionally contracts label chains (label-of-label), giving
O(log diameter) convergence — the same doubling idea as the
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14).  Each round is two key-partitioned
shuffles (hop join+groupBy, jump self-join) over the EDGE LIST — never
materializing neighborhoods — so a round scales to any graph whose
edges fit the cluster, and the round count is logarithmic.  Lineage is
cut every round with an eager ``localCheckpoint`` (swap for
``checkpoint`` + a reliable checkpoint dir on a real cluster — noted,
not configured, since local[] has no HDFS).

Labels only ever decrease, and the component's minimum id is a fixed
point, so the algorithm converges to label(u) = min id of u's component
— deterministic regardless of execution order, which is what lets the
DuckDB oracle (a recursive-CTE reachability flood) reproduce the result
bit-for-bit.

Reference parity: the reference has no graph operators at all (its only
dedup is union+distinct, etl_pipeline_spark.py:988-994); this module is
pure beyond-reference scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from netflix_data_ingestion_spark.operators import dedup


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 35,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``.

    ``component`` is the MINIMUM node id of the connected component —
    a deterministic canonical label.  Nodes not present in ``pairs``
    are absent from the output (callers union singletons back; see
    ``dedup_clusters``).

    ``max_iter`` bounds the driver loop.  Pointer jumping halves the
    remaining pointer depth per round, but because the jump reads the
    PRE-round labels (see below) one fused round contracts slightly
    less than a sequential hop-then-jump round — the bound is still
    O(log2(diameter)) with a small constant, so 35 rounds cover any
    graph remotely plausible here (a sequential-compounding bound of
    25 covered diameter < 2^25; the extra 10 rounds absorb the weaker
    per-round constant with huge margin).  Raises RuntimeError if not
    converged (never observed — would mean a pathological diameter in
    the millions).

    r12 round shape (guide §2.4 — remove shuffles outright): the former
    hop joined the edge list against the labels on ``v`` every round
    (re-shuffling the EDGE data per round), and the jump was a
    self-join of the un-pinned hop output, re-executing the whole
    hop subtree once per join side.  Now the symmetrized adjacency is
    hash-partitioned on the join key (``nbr``) once at build — the
    label_propagation/bfs_hops discipline — so no round ever exchanges
    the edge data again, and hop-min and pointer-jump-min are computed
    from the SAME pre-round label frame (two node-sized joins folded
    into one ``least``), so nothing is executed twice.  Both minima
    folding into one least() is still monotone min-label propagation
    with pointer edges: identical fixpoint (label = component min),
    convergence still ~log2(diameter) rounds.
    """
    sym = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    adj = (
        sym.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(
            sym.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
        .distinct()
        .repartition("nbr")
        .localCheckpoint(eager=True)
    )
    labels = (
        adj.select("node")
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # hop: pull the min label across each node's neighbors — only
        # the node-sized label frame moves (adj is pre-partitioned)
        nbr_min = (
            adj.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("comp").alias("ncomp")
                ),
                "nbr",
            )
            .groupBy("node")
            .agg(F.min("ncomp").alias("nbr_comp"))
        )
        # jump: comp of comp, from the same pre-round labels (a comp
        # value is always a node id present in `labels`, so the left
        # join never actually misses; left + coalesce keeps the
        # degenerate empty-frame case total)
        ptr_min = labels.select(
            F.col("comp").alias("nbr"), F.col("node")
        ).join(
            labels.select(
                F.col("node").alias("nbr"), F.col("comp").alias("pcomp")
            ),
            "nbr",
            "left",
        ).select("node", "pcomp")
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .join(ptr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"),
                    F.coalesce("nbr_comp", F.col("comp")),
                    F.coalesce("pcomp", F.col("comp")),
                ).alias("comp"),
                F.col("comp").alias("prev"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("comp") != F.col("prev")).count()
        old = labels
        labels = new_labels.select("node", "comp")
        old.unpersist()
        if changed == 0:
            return labels.select(
                "node", F.col("comp").alias("component")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_clusters(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    tokens_col: str | None = None,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, keep) — full-corpus dedup
    clustering: near-dup pairs at scale -> connected components ->
    canonical pick.

    Every document gets a row; documents with no near-dup partner are
    singleton clusters of themselves.  ``cluster_id`` is the minimum
    doc id in the component, ``keep`` marks the one canonical survivor
    per cluster — ``filter(keep)`` is the dedup, ``filter(~keep)`` the
    removal manifest with full provenance.

    Plan shape: the pair generation is the LSH path (linear, bucketed);
    CC runs on the pair list (tiny relative to the corpus — only docs
    with a near-dup); the final joins are on doc_id/cluster_id keys.
    The component label table is near-dup docs only, so at 100 TB the
    ``left`` join back to the corpus broadcasts unless a large fraction
    of the corpus is duplicated.
    """
    pairs = dedup.near_dup_pairs_at_scale(
        docs,
        id_col,
        text_col,
        n=n,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        tokens_col=tokens_col,
    )
    comp = connected_components(pairs, "id_a", "id_b")
    clustered = docs.select(F.col(id_col).alias("doc_id")).join(
        comp.select(F.col("node").alias("doc_id"), "component"),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
    )
    # cluster_size via a window, not a groupBy+self-join: one shuffle on
    # cluster_id and a single execution of the corpus join (the lazy
    # self-join form re-runs the join per consumer)
    w = Window.partitionBy("cluster_id")
    return clustered.select(
        "doc_id",
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    damping: float = 0.85,
    scale: int = 1_000_000,
) -> DataFrame:
    """(node, pr) — PageRank after ``iters`` synchronous power-iteration
    rounds, entirely on the 1/``scale`` fixed-point grid (same
    reproducibility discipline as operators/kmeans.py: iterative ML
    must be bit-exact across engines and partitionings, so every
    intermediate is an integer and every division is ONE double
    division rounded back to the grid).

    Semantics (the classic unnormalized form, Page et al. 1999):

        pr_0(v)   = scale                          (i.e. 1.0)
        pr_t+1(v) = (1-d)*scale + d * SUM over in-edges (u,v) of
                    round(pr_t(u) / outdeg(u))     (then rounded)

    Dangling nodes (no out-edges) contribute nothing — their mass
    leaks, which keeps every round a pure edge-list join (the
    redistribute-to-all variant needs a global aggregate per round;
    callers who want it can add the constant themselves).  Duplicate
    edges are collapsed first, so the graph is simple and the result
    partition-invariant.

    Scale shape: each round is one shuffle on src (contribution join)
    + one on dst (sum), both map-side combinable, over the edge list
    only; lineage is cut per round with eager localCheckpoint exactly
    like ``connected_components``.  Round state is one bigint per node.
    """
    # materialize the deduped edge list ONCE: every round joins it, and
    # nodes/outdeg derive from it — without the checkpoint each round
    # re-runs the upstream plan that produced the edges (often a join).
    # r12: pin it hash-partitioned on __s — the per-round contribution
    # join and the outdeg aggregate both key on __s, so neither ever
    # exchanges the edge data again (guide §2.4)
    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .distinct()
        .repartition("__s")
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    base = int(round((1.0 - damping) * scale))

    # init needs no checkpoint of its own: it is a narrow projection of
    # the already-checkpointed node frame
    pr = nodes.withColumn("pr", F.lit(int(scale)).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(pr.withColumnRenamed("node", "__s"), "__s")
            .join(outdeg, "__s")
            .select(
                F.col("__d").alias("node"),
                F.round(F.col("pr").cast("double") / F.col("__deg"))
                .cast("long")
                .alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.round(
                        F.lit(damping)
                        * F.coalesce(F.col("__in"), F.lit(0)).cast("double")
                    ).cast("long")
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr


def triangle_counts(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """(node, triangles) — how many triangles each node belongs to, for
    nodes in at least one (the clustering-coefficient numerator;
    community density / spam-cluster signals over similarity and
    co-occurrence graphs).

    Degree-ordered orientation (Suri & Vassilvitskii, WWW'11): each
    undirected edge points from its LOWER-(degree, id) endpoint to the
    higher, so every triangle is generated by exactly one wedge — the
    one centered at its lowest-ranked corner — and per-node wedge
    fan-out is bounded by out-degree², which the orientation caps at
    O(sqrt(m)) even for hub nodes.  That bound is the whole point: the
    naive wedge join explodes quadratically at hubs ("the curse of the
    last reducer"); the oriented join's total wedge count is O(m^1.5)
    regardless of skew.

    Plan: degree aggregation (combinable), two joins to attach ranks,
    one self-join on the wedge center, one edge-membership join, then a
    corner explode + count.  All shuffles key on node ids.  The
    orientation is semantically invisible — the oracle counts triangles
    by brute-force enumeration.
    """
    # the edge list is referenced ~6x downstream (degree union, rank
    # join, two wedge sides, the closing join); pin it once so an
    # expensive edge DERIVATION (e.g. a co-occurrence self-join) does
    # not re-execute per reference — same eager-localCheckpoint
    # discipline as connected_components
    e = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ranked = (
        e.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            "u",
            "v",
            F.struct(F.col("du").alias("d"), F.col("u").alias("n")).alias("ru"),
            F.struct(F.col("dv").alias("d"), F.col("v").alias("n")).alias("rv"),
        )
    )
    # oriented feeds both wedge sides and the closing join (3 refs):
    # pin it so the degree joins run once
    oriented = ranked.select(
        F.when(F.col("ru") < F.col("rv"), F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(F.col("ru") < F.col("rv"), F.col("v")).otherwise(F.col("u")).alias("d"),
        F.when(F.col("ru") < F.col("rv"), F.col("rv")).otherwise(F.col("ru")).alias("rd"),
    ).localCheckpoint(eager=True)
    o1 = oriented.select("s", F.col("d").alias("b"), F.col("rd").alias("rb"))
    o2 = oriented.select("s", F.col("d").alias("c"), F.col("rd").alias("rc"))
    wedges = o1.join(o2, "s").where(F.col("rb") < F.col("rc")).select(
        F.col("s").alias("a"), "b", "c"
    )
    closing = oriented.select(F.col("s").alias("b"), F.col("d").alias("c"))
    tri = wedges.join(closing, ["b", "c"])
    corners = tri.select(
        F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("long").alias("triangles")
    )


def kcore(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    k: int = 2,
    rounds: int = 4,
) -> DataFrame:
    """(node, degree) — the subgraph surviving ``rounds`` of k-core
    peeling (Seidman 1983): each round drops every node whose degree in
    the CURRENT subgraph is below ``k``, then the edges touching it.
    The k-core itself is the fixpoint; peeling is confluent, so the
    FIXED round count makes an iterative graph algorithm bit-exact
    against an unrolled SQL oracle (the operators/kmeans discipline —
    determinism first, with convergence asserted separately by tests:
    on a converged input another round changes nothing).  Cores
    separate load-bearing community structure from tendrils — the
    dedup-cluster / spam-ring density screen one level above
    ``triangle_counts``.

    Per round: one combinable degree aggregate + two node-keyed
    semi-joins of the edge list, eager-checkpointed (bounded lineage,
    shrinking edge set).  At 100 TB each round shuffles the SURVIVING
    edges only — cost decays with the peeling.
    """
    e = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        deg = (
            e.select(F.col("u").alias("node"))
            .union(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("__deg"))
        )
        keep = deg.where(F.col("__deg") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )


def label_propagation(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    rounds: int = 3,
) -> DataFrame:
    """(node, community) — synchronous label propagation (Raghavan et
    al. 2007) for ``rounds`` fixed iterations: every node starts in its
    own community, and each round simultaneously adopts the label most
    frequent among its neighbors, ties broken by smallest label.  The
    cheap community detector one level above ``connected_components``
    (which merges everything reachable): LPA splits a component into
    dense regions, the spam-ring / topic-cluster signal over
    similarity, co-purchase, and interaction graphs.

    Deterministic by construction — synchronous updates (no
    update-order dependence) plus total-order tie-breaks — so the FIXED
    round count is bit-exact against an unrolled SQL oracle, the
    operators/kmeans discipline; convergence is a test concern, not a
    semantics one.

    Per round: ONE nbr-keyed join of the pre-partitioned adjacency
    list against the label frame, one (node, label) count (combinable
    partial agg), one per-node argmax via ``min_by`` on a
    (-count, label) struct.  Labels are eager-checkpointed per round
    (bounded lineage).  r12 optimization (guide §2.4 — remove shuffles
    outright): the former shape joined the canonical EDGE list against
    the labels twice per round (once per direction), re-shuffling the
    edges on u and on v every round; symmetrizing once into an
    adjacency list hash-partitioned on the join key (``nbr``) at build
    time means no round ever exchanges the edge data again — only the
    node-sized label frame moves.  At 100 TB every shuffle keys on
    node ids and state is one row per node — pagerank's exact cost
    shape.
    """
    sym = pairs.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    ).where(F.col("u") != F.col("v"))
    adj = (
        sym.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(
            sym.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
        .distinct()
        .repartition("nbr")
        .localCheckpoint(eager=True)
    )
    labels = (
        adj.select("node")
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        nbr = adj.join(
            labels.select(F.col("node").alias("nbr"), "lbl"), "nbr"
        ).select("node", "lbl")
        cnt = nbr.groupBy("node", "lbl").agg(F.count("*").alias("__c"))
        labels = (
            cnt.groupBy("node")
            .agg(
                F.min_by(
                    "lbl",
                    F.struct((-F.col("__c")).alias("nc"), F.col("lbl")),
                ).alias("lbl")
            )
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("lbl").alias("community"))


def bfs_hops(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    sources: DataFrame | None = None,
    source_col: str = "node",
    rounds: int = 4,
) -> DataFrame:
    """(node, hops) — exact minimum hop distance from the source set
    for every node within ``rounds`` hops (undirected); farther nodes
    are ABSENT, which is the fixed-round contract (kcore's discipline:
    determinism first, convergence asserted by tests).  The
    neighborhood-expansion primitive under "friends of friends",
    blast-radius, and supply-chain-exposure questions.

    Per round: ONE nbr-keyed join of the pre-partitioned adjacency
    list against the CURRENT frontier frame plus one min-combine,
    eager-checkpointed.  r12 optimization (guide §2.4, same move as
    ``label_propagation``): the adjacency list is symmetrized and
    hash-partitioned on the join key once at build, so no round
    re-shuffles the edge data — only the frontier moves.  State is one
    row per REACHED node — cost grows with the neighborhood, not the
    graph.
    """
    if sources is None:
        raise ValueError(
            "bfs_hops: a sources frame (the hop-0 node set) is required"
        )
    sym = pairs.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    ).where(F.col("u") != F.col("v"))
    adj = (
        sym.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(
            sym.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
        .distinct()
        .repartition("nbr")
        .localCheckpoint(eager=True)
    )
    dist = sources.select(
        F.col(source_col).alias("node"), F.lit(0).cast("int").alias("hops")
    ).distinct()
    for _ in range(rounds):
        step = adj.join(
            dist.select(F.col("node").alias("nbr"), "hops"), "nbr"
        ).select("node", (F.col("hops") + 1).alias("hops"))
        dist = (
            dist.unionAll(step)
            .groupBy("node")
            .agg(F.min("hops").cast("int").alias("hops"))
            .localCheckpoint(eager=True)
        )
    return dist
