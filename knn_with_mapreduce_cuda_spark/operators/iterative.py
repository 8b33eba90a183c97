"""Iterative distributed algorithms — the tier beyond single-pass SQL.

Parity note (SURVEY.md §2/§4): the reference repo class ships only
single-job kNN; an engine serving the same users at 100 TB also needs the
iterative ML/graph primitives that MapReduce-era pipelines chained across
jobs: Lloyd's k-means (the centroid structure behind the IVF similarity
index in ``plans/approx_knn.py``) and connected components (turning
near-dup *pairs* from MinHash-LSH into dup *clusters*, the actual unit of
deduplication in an LLM data pipeline).

Both are **hash-graded** against DuckDB despite being iterative:

- k-means is made engine-independent by (a) deterministic seeding (fixed
  ``vec_id`` seeds, not kmeans++ RNG), (b) rounding centroid coordinates
  and distances to 4 decimals after every step so double sum-order
  nondeterminism cannot flip an argmin, and (c) total-order tie-breaks
  (cluster id) in every argmin. The oracle unrolls the same two Lloyd
  iterations as SQL CTEs.
- connected components is pure integer min-propagation — deterministic by
  construction; the oracle is a recursive-CTE transitive closure.

Scale design:
- k-means: centroids (k × dim doubles) are broadcast every iteration —
  the classic kNN-IS/MLlib layout; the only shuffle per iteration is the
  (cluster, dim) partial-avg aggregation, which map-side-combines to at
  most k·dim rows per partition regardless of input size.
- components: label propagation shuffles (node → min neighbor label)
  per round; rounds = graph diameter. Near-dup graphs are
  shallow (dup clusters are cliques-ish), so 2-4 rounds suffice; the
  large-star/small-star optimization (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14) is the documented
  upgrade path for adversarial diameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import col

from .. import tables
from ..oracle import materialize_ctes
from ..functions.vector import sq_euclidean
from .llm import _q_dedup_near_minhash

KMEANS_SEED_IDS = [7, 107, 207, 307, 407]
KMEANS_ITERS = 2


# ------------------------------------------------------------------ k-means


def _seed_centroids(e: DataFrame) -> DataFrame:
    """Deterministic seeds: the embeddings at fixed vec_ids, numbered 0..k-1
    in vec_id order (no RNG — oracle-reproducible, SURVEY.md §7.2.5)."""
    w = Window.orderBy("vec_id")
    return (
        e.filter(col("vec_id").isin(KMEANS_SEED_IDS))
        .select((F.row_number().over(w) - 1).alias("c"), col("emb").alias("cent"))
    )


def kmeans_assign(e: DataFrame, centroids: DataFrame) -> DataFrame:
    """Argmin-distance assignment. Distances rounded to 4 decimals and
    tie-broken on cluster id so both engines pick the same cluster even
    when two centroids are equidistant in the last ulp."""
    d = e.crossJoin(F.broadcast(centroids)).withColumn(
        "dist", F.round(sq_euclidean(col("emb"), col("cent")), 4)
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc_nulls_last("dist"), "c")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(col("rn") == 1)
        .select("vec_id", "c")
    )


def kmeans_update(e: DataFrame, assign: DataFrame) -> DataFrame:
    """Mean of member vectors per cluster, per dimension, rounded to 4
    decimals (the cross-engine determinism canonicalization).

    Scale: posexplode → groupBy(c, dim) partial-aggregates map-side to
    ≤ k·dim rows per partition before the shuffle — the Combiner pattern.
    """
    exploded = (
        assign.join(e, "vec_id")
        .select("c", F.posexplode("emb").alias("dim", "v"))
        .groupBy("c", "dim")
        .agg(F.round(F.avg("v"), 4).alias("v"))
    )
    return exploded.groupBy("c").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "v"))), lambda s: s["v"]
        ).alias("cent")
    )


def _lloyd(e: DataFrame, iters: int) -> tuple[DataFrame, DataFrame]:
    """``iters`` Lloyd rounds from the fixed seeds; returns the final
    (centroids, assignment) pair — the ONE home of the iteration
    convention (seed → assign → (update, assign)×(iters−1)), shared by
    kmeans_lloyd and plans/ivf.build_ivf_index so a change to the
    contract can't silently apply to only one of them (review r08)."""
    centroids = _seed_centroids(e)
    assign = kmeans_assign(e, centroids)
    for _ in range(iters - 1):
        centroids = kmeans_update(e, assign)
        assign = kmeans_assign(e, centroids)
    return centroids, assign


def kmeans_lloyd(e: DataFrame, iters: int = KMEANS_ITERS) -> DataFrame:
    """``iters`` Lloyd rounds from the fixed seeds; returns the final
    (vec_id, cluster) assignment."""
    return _lloyd(e, iters)[1]


_KMEANS_MEMO = tables.SessionMemo()


def _q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized per (session, fixture dir, iters) — the trained-model
    seam (r11, same pattern as knn_self_join / _q_components): six
    graded keys consume this assignment (ml_kmeans_lloyd itself,
    ml_kmeans_inertia, ml_silhouette-family callers at analytics
    2869/2981/3127, llm_cluster_topics → llm_topic_coherence), each
    previously re-running the full two-round Lloyd subtree (~2.5 s at
    sf0.1) — and plan consumers that reference the assignment more than
    once per query re-ran it per reference. The n-row (vec_id, cluster)
    result is what gets checkpointed, never the point×centroid space."""
    memo_key = (sf_dir.rstrip("/"), "kmeans_assign", KMEANS_ITERS)
    hit = _KMEANS_MEMO.get(spark, memo_key)
    if hit is not None:
        return hit
    e = tables.embeddings(spark, sf_dir)
    assign = kmeans_lloyd(e)
    out = assign.select(
        "vec_id", col("c").cast("long").alias("cluster")
    ).localCheckpoint(eager=True)
    _KMEANS_MEMO.put(spark, memo_key, out)
    return out


def _q_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final Lloyd centroids (k·dim values), memoized beside the
    assignment — ml_kmeans_inertia and ml_ivf_recall_at10 each re-ran
    the update pass (~1.1 s at sf0.1) to re-derive the identical model
    constant. Columns: (c, cent)."""
    memo_key = (sf_dir.rstrip("/"), "kmeans_centroids", KMEANS_ITERS)
    hit = _KMEANS_MEMO.get(spark, memo_key)
    if hit is not None:
        return hit
    e = tables.embeddings(spark, sf_dir)
    asg = _q_kmeans(spark, sf_dir).select("vec_id", col("cluster").alias("c"))
    out = kmeans_update(e, asg).localCheckpoint(eager=True)
    _KMEANS_MEMO.put(spark, memo_key, out)
    return out


# ------------------------------------------------- connected components


def connected_components(nodes: DataFrame, edges: DataFrame, max_rounds: int = 16) -> DataFrame:
    """Min-label propagation to a fixpoint.

    ``nodes``: (id); ``edges``: (a, b) undirected, with **every edge
    endpoint present in ``nodes``** (ADVICE r11: since the touched-set
    optimization, labels seed from edge endpoints, so a stray endpoint
    outside ``nodes`` would appear in the output instead of being
    dropped by the old labels join — both in-repo callers,
    _q_components and _q_dbscan, build edges from node pairs and
    satisfy this by construction; a semi-join here would re-pay a join
    per call to defend against a caller that doesn't exist). Returns
    (id, cluster) where cluster = min id reachable. Driver loop with a
    convergence check — the per-round collect is one scalar, not data.

    r11 optimization (guide §2.4/§3.3, sweep_timing_r11.json: the four
    components consumers read 5.4–6.8 s each at sf0.1):

    - ``edges`` is checkpointed ONCE up front: the lazy edge pipeline
      (MinHash band self-join for the dedup family) was re-executed
      twice per propagation round — once per direction of ``sym`` —
      because every round's job re-derived it from scratch. One
      evaluation, then every round joins the materialized pair list.
    - the loop iterates ONLY over edge-touched nodes: an isolated
      node's min reachable label is provably its own id (it has no
      neighbor to lower it), so singletons never enter the per-round
      joins/checkpoints; they are appended unchanged at the end. On a
      near-dup graph the touched set is the dup members — a tiny
      fraction of the corpus at any scale, which is precisely why the
      per-round state stays small at 100 TB.

    Results identical by construction (the propagation over touched
    nodes is unchanged; isolated nodes were fixpoints from round 0).
    Measured sf0.1: the dedup-components build 6.8 → ~2.3 s.

    r12 optimization (guide §2.4 — fewer full-data passes; VERDICT r11
    #3: ml_dbscan's dense 705 k-edge core ε-graph made every
    propagation round re-scan the full symmetric edge list, ~4 s of its
    8 s): **one-pass star contraction before the loop** — the seed step
    of Kiveris et al.'s large-star (SoCC'14, the documented upgrade
    path above). One aggregate computes l0(u) = min({u} ∪ N(u)); the
    loop then propagates over the CONTRACTED quotient graph
    E' = {(l0(x), l0(y)) : (x,y) ∈ E, l0(x) ≠ l0(y)}, and the final
    label composes through l0. On a dense graph most nodes' l0 IS the
    component min, so |E'| collapses (sf0.1 dbscan: 705 k → tens of
    edges) and every remaining round scans E' instead of E.

    Equivalence proof sketch: the quotient of a connected subgraph is
    connected, and the component min m satisfies l0(m) = m (all its
    neighbors are larger), so m survives as a quotient node; the
    quotient component's min label is therefore exactly m, and
    compose(id) = comp'(l0(id)) = min reachable id — the identical
    output. Verified result-identical on every consumer in
    scripts/dbscan_ab_r12.py and by the oracle sweep.
    """
    edges = edges.localCheckpoint(eager=True)
    sym = edges.select(col("a").alias("x"), col("b").alias("y")).unionByName(
        edges.select(col("b").alias("x"), col("a").alias("y"))
    )
    # star contraction: l0 = min(id, min neighbor) in ONE pass over sym.
    # Every touched node appears as x in the SYMMETRIC edge list, so the
    # groupBy's key set IS the touched set — no separate distinct pass
    # (the r12-first-cut touched/distinct checkpoint + join cost two
    # extra jobs that the phase instrumentation showed were pure floor).
    l0 = (
        sym.groupBy("x")
        .agg(F.min("y").alias("nbr"))
        .select(
            col("x").alias("id"), F.least(col("x"), col("nbr")).alias("l")
        )
        .localCheckpoint(eager=True)
    )
    touched = l0.select("id")  # already materialized above
    # A localCheckpoint frame carries no size statistics, so Catalyst
    # plans the label-attach joins as SortMergeJoin — two full sorts +
    # exchanges of the edge list (seen in the r12 phase instrumentation).
    # The label table is one row per touched node; when its MATERIALIZED
    # count is broadcast-sized, hint it explicitly (guide §3.1 — the
    # same bounded-size gate the CMS/Bloom broadcast paths use); past
    # the bound the shuffled join is the correct plan at scale.
    n_labels = l0.count()
    lab = (lambda d: F.broadcast(d)) if n_labels <= 500_000 else (lambda d: d)
    contracted = (
        sym.join(lab(l0.select(col("id").alias("x"), col("l").alias("la"))), "x")
        .join(lab(l0.select(col("id").alias("y"), col("l").alias("lb"))), "y")
        .filter(col("la") != col("lb"))
        .select(
            F.least("la", "lb").alias("x"), F.greatest("la", "lb").alias("y")
        )
        .distinct()
    )
    sym2 = contracted.unionByName(
        contracted.select(col("y").alias("x"), col("x").alias("y"))
    ).localCheckpoint(eager=True)
    labels = (
        sym2.select(col("x").alias("id"))
        .distinct()
        .select(col("id"), col("id").alias("cluster"))
    )
    # a graph whose components all collapsed in the l0 pass (cliques —
    # the near-dup dedup shape) has an EMPTY quotient: skip the loop and
    # its per-round checkpoint/convergence jobs outright. The count is
    # a cheap scan of the just-materialized checkpoint.
    rounds = max_rounds if sym2.count() else 0
    for _ in range(rounds):
        neighbor_min = (
            sym2.join(labels, sym2.y == labels.id)
            .groupBy("x")
            .agg(F.min("cluster").alias("nbr"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.x, "left")
            .select(
                "id", F.least(col("cluster"), F.coalesce(col("nbr"), col("cluster"))).alias("cluster")
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(col("n.cluster") != col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    # compose through the contraction; quotient nodes with no contracted
    # edge (their whole component collapsed in the l0 pass) keep l0
    comp = l0.join(
        labels.select(col("id").alias("l"), "cluster"), "l", "left"
    ).select("id", F.coalesce("cluster", col("l")).alias("cluster"))
    rest = nodes.join(touched, "id", "left_anti").select(
        col("id"), col("id").alias("cluster")
    )
    return comp.unionByName(rest)


_COMPONENTS_MEMO = tables.SessionMemo()


def _q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized per (session, fixture dir) like knn_self_join: FOUR
    graded keys consume the same dup clustering (graph_components_dedup,
    llm_dedup_apply, graph_component_sizes, llm_dedup_cluster_langs) and
    each paid the full iterative build (~6 s at sf0.1, r11 sweep). The
    propagation state inside connected_components is already
    checkpointed, so the memoized frame re-runs only the documents scan
    + the singleton anti-join per consumer — the materialized-clustering
    pattern a production dedup pipeline uses (build once, apply/report
    many times). ``tables.invalidate_caches(sf_dir)`` drops it with the
    other per-directory memos."""
    memo_key = (sf_dir.rstrip("/"), "dup_components")
    comp = _COMPONENTS_MEMO.get(spark, memo_key)
    if comp is None:
        docs = tables.table(spark, sf_dir, "documents").select(
            col("doc_id").alias("id")
        )
        pairs = _q_dedup_near_minhash(spark, sf_dir).select(
            col("doc_a").alias("a"), col("doc_b").alias("b")
        )
        comp = connected_components(docs, pairs)
        _COMPONENTS_MEMO.put(spark, memo_key, comp)
    sizes = comp.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "cluster")
        .select(col("id").alias("doc_id"), "cluster", "cluster_size")
    )


def _q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup MATERIALIZATION — what a corpus pipeline actually ships:
    one canonical doc per near-dup cluster (min doc_id), all singletons
    kept. Composes graph_components_dedup with a keep-rule; row count =
    corpus size − (dup-cluster members − cluster count)."""
    comp = _q_components(spark, sf_dir)
    keep = comp.filter(col("doc_id") == col("cluster")).select(
        "doc_id", "cluster_size"
    )
    docs = tables.table(spark, sf_dir, "documents")
    return keep.join(docs, "doc_id").select(
        "doc_id", "lang", "n_chars", col("cluster_size").alias("n_merged")
    )


PR_SCALE = 10**12
PR_ITERS = 2


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (2 unrolled iterations, damping 0.85) over the directed
    kNN graph — the link-analysis member of the iterative tier. Every
    node has outdegree exactly K_JOIN, so contributions are r div k.

    Determinism: ranks live in integer units of PR_SCALE⁻¹ and every
    divide is floor division — the update is exact integer arithmetic,
    identical under any partitioning and in DuckDB (// ⟷ div). At scale
    each iteration is one equi-join + one groupBy on dst: shuffle on node
    id, linear in edges, the standard Pregel-style schedule."""
    from .knn import K_JOIN, knn_self_join

    e = tables.embeddings(spark, sf_dir)
    nodes = e.select(col("vec_id").alias("id"))
    edges = knn_self_join(spark, sf_dir, K_JOIN).select(
        col("qid").alias("src"), col("tid").alias("dst")
    )
    ncnt = nodes.agg(F.count("*").alias("n"))
    r = nodes.crossJoin(F.broadcast(ncnt)).select(
        "id", "n", F.expr(f"{PR_SCALE} div n").alias("r")
    )
    for _ in range(PR_ITERS):
        contrib = edges.join(
            r.select(col("id").alias("src"), col("r").alias("rs")), "src"
        ).select(col("dst").alias("id"), F.expr(f"rs div {K_JOIN}").alias("c"))
        inflow = contrib.groupBy("id").agg(F.sum("c").alias("inflow"))
        r = (
            r.select("id", "n")
            .join(inflow, "id", "left")
            .select(
                "id",
                "n",
                (
                    F.expr(f"{15 * PR_SCALE} div (100 * n)")
                    + F.expr("(85 * coalesce(inflow, 0)) div 100")
                ).alias("r"),
            )
        )
    return r.select(col("id").alias("vec_id"), col("r").alias("rank_q"))


DBSCAN_EPS = 1.38
DBSCAN_MINPTS = 180


def _q_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DBSCAN: ε-neighborhood counts → core points
    (n ≥ minPts) → clusters = connected components of the core-core
    ε-graph (cluster id = min member id) → border points take the MIN
    cluster among their core neighbors (the classic algorithm's
    order-dependent border assignment made deterministic) → noise = -1.

    Scale: the ε-graph is the knn_radius pair join (pruned pre-shuffle);
    components run Pregel-style min-label rounds (operator above); border
    assignment is one more equi-join. Nothing quadratic survives past
    the radius join."""
    from ..functions.vector import METRICS

    e = tables.embeddings(spark, sf_dir)
    a = e.select(col("vec_id").alias("qid"), col("emb").alias("qemb"))
    b = e.select(col("vec_id").alias("tid"), col("emb").alias("temb"))
    # stream the repartitioned side, broadcast the other (the all_pairs
    # BNLJ fan-out rule: the per-row distance work dwarfs the one-round
    # O(n) shuffle, and BNLJ task count = streamed-side partitions)
    fanout = e.sparkSession.sparkContext.defaultParallelism
    close = (
        a.repartition(fanout, col("qid"))
        .join(F.broadcast(b), col("qid") != col("tid"))
        .withColumn("dist", METRICS["euclidean"]("qemb", "temb"))
        .filter(col("dist") < DBSCAN_EPS)
        .select("qid", "tid")
        # referenced by counts, core_edges AND border: materialize the
        # pruned ε-edge list once instead of re-running the quadratic
        # join three times (the _q_mutual consumers' pattern)
        .localCheckpoint(eager=True)
    )
    counts = close.groupBy("qid").agg(F.count("*").alias("n_in_eps"))
    core = counts.filter(col("n_in_eps") >= DBSCAN_MINPTS).select(
        col("qid").alias("id")
    )
    core_edges = (
        close.join(core.select(col("id").alias("qid")), "qid")
        .join(core.select(col("id").alias("tid")), "tid")
        .filter(col("qid") < col("tid"))
        .select(col("qid").alias("a"), col("tid").alias("b"))
    )
    comp = connected_components(core, core_edges)
    border = (
        close.join(comp.select(col("id").alias("tid"), "cluster"), "tid")
        .join(core.select(col("id").alias("qid")), "qid", "left_anti")
        .groupBy("qid")
        .agg(F.min("cluster").alias("b_cluster"))
    )
    return (
        e.select("vec_id")
        .join(counts.select(col("qid").alias("vec_id"), "n_in_eps"), "vec_id", "left")
        .join(
            comp.select(col("id").alias("vec_id"), col("cluster").alias("c_cluster")),
            "vec_id",
            "left",
        )
        .join(border.select(col("qid").alias("vec_id"), "b_cluster"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("n_in_eps", F.lit(0)).cast("long").alias("n_in_eps"),
            col("c_cluster").isNotNull().cast("int").alias("is_core"),
            F.coalesce("c_cluster", "b_cluster", F.lit(-1)).cast("long").alias("cluster"),
        )
    )


PCA_SCALE = 1_000_000_000


def _q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step of PCA, fully declarative: the 64×64
    covariance matrix is built as a self-join of centered (row, dim)
    cells, then multiplied against the all-ones start vector — i.e.,
    v₁ = C·1 as two groupBys. Linear algebra as relational algebra.

    Determinism: per-cell products are quantized to integer 1e-9 units
    BEFORE summation, so the covariance entries and the matvec are exact
    integers on any engine/partitioning; means are rounded to 6dp first
    so centering subtracts identical doubles. Scale: the (row, dim²)
    product space shuffles on (a, b) with map-side partial sums —
    dim²-proportional state, row-count-proportional work; a real
    dominant-eigenvector run repeats the matvec on the (tiny) cov matrix
    driver-side or via repeated joins."""
    e = tables.embeddings(spark, sf_dir)
    ex = e.select("vec_id", F.posexplode("emb").alias("pos", "x"))
    mu = ex.groupBy("pos").agg(F.round(F.avg("x"), 6).alias("mu"))
    cent = ex.join(F.broadcast(mu), "pos").select(
        "vec_id", "pos", (col("x") - col("mu")).alias("c")
    )
    a = cent.select("vec_id", col("pos").alias("a"), col("c").alias("ca"))
    b = cent.select("vec_id", col("pos").alias("b"), col("c").alias("cb"))
    prods = a.join(b, "vec_id").select(
        "a",
        "b",
        F.round(col("ca") * col("cb") * PCA_SCALE, 0).try_cast("long").alias("pq"),
    )
    cov = prods.groupBy("a", "b").agg(F.sum("pq").alias("cq"))
    v1 = cov.groupBy("a").agg(F.sum("cq").alias("v1q"))
    mx = v1.agg(F.max(F.abs(col("v1q"))).alias("mx"))
    return v1.crossJoin(F.broadcast(mx)).select(
        col("a").cast("long").alias("dim"),
        "v1q",
        # try_divide: an all-excluded covariance (every product outside
        # the quantizable domain) leaves mx = 0 — NULL on both engines,
        # not an ANSI DIVIDE_BY_ZERO (r11 non-finite sweep).
        F.round(F.try_divide(col("v1q"), col("mx")), 6).alias("v1_norm"),
    )


def _q_cluster_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised corpus exploration end-to-end: k-means clusters over
    the embeddings (ml_kmeans_lloyd) joined to the aligned documents,
    then the top-5 tokens per cluster — "what is each embedding cluster
    about". Composes the iterative tier with the text tier in one
    declarative plan; the per-cluster top-k is a window group-limit."""
    assign = _q_kmeans(spark, sf_dir)  # (vec_id, cluster)
    docs = tables.table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    joined = toks.join(assign, toks.doc_id == assign.vec_id)
    counts = joined.groupBy("cluster", "tok").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy("cluster").orderBy(F.desc("cnt"), "tok")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(col("rn") <= 5)
        .select("cluster", "tok", "cnt", col("rn").cast("long").alias("rn"))
    )


def _q_topic_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NPMI topic coherence of the cluster topics — the topic-model
    quality score: for each cluster's top-5 tokens, average normalized
    PMI of token pairs from corpus-wide document co-occurrence. Pairs
    are bounded by k·C(5,2) regardless of corpus size; document
    frequencies come from the deduped (doc, token) set. Per-pair NPMI
    quantizes to nano units before the per-cluster mean; pairs that
    never co-occur take NPMI = −1 exactly."""
    # r11 (guide §3.3 — bound the explosion BEFORE the join, and
    # materialize the tiny reused subtree): topics is ≤ k·5 rows but sat
    # on the whole k-means subtree, and this query references it (via
    # ``pairs``) four times in one plan — each reference re-ran Lloyd.
    # Checkpointing the ≤25-row frame runs the trainer once. The
    # co-occurrence self-join then joined ALL distinct tokens per doc
    # against themselves (Σ tokens² per doc ≈ tens of millions of
    # transient pairs at sf0.1) before semi-joining down to ≤ k·C(5,2)
    # candidate pairs; filtering BOTH join inputs to candidate topic
    # tokens first caps the per-doc pair space at 25² — identical codf
    # counts because pairs ⊆ cand × cand and the pair-level semi-join
    # is unchanged. df counts restricted to candidate tokens are also
    # unchanged (per-token doc frequency is independent of the filter).
    # Measured sf0.1: 9.8 → ~1.0 s warm; oracle-verified both SFs.
    topics = (
        _q_cluster_topics(spark, sf_dir)
        .select("cluster", "tok")
        .localCheckpoint(eager=True)
    )
    pairs = (
        topics.select("cluster", col("tok").alias("w1"))
        .join(topics.select("cluster", col("tok").alias("w2")), "cluster")
        .filter(col("w1") < col("w2"))
    )
    docs = tables.table(spark, sf_dir, "documents")
    ds = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    cand = topics.select("tok").distinct()
    ds_c = ds.join(F.broadcast(cand), "tok", "left_semi")
    n = docs.agg(F.count("*").alias("n"))
    df_ = ds_c.groupBy("tok").agg(F.count("*").alias("df"))
    co = (
        ds_c.select(col("doc_id"), col("tok").alias("w1"))
        .join(ds_c.select(col("doc_id"), col("tok").alias("w2")), "doc_id")
        .filter(col("w1") < col("w2"))
        .join(
            F.broadcast(pairs.select("w1", "w2").distinct()), ["w1", "w2"], "left_semi"
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("codf"))
    )
    scored = (
        pairs.join(co, ["w1", "w2"], "left")
        .join(F.broadcast(df_.select(col("tok").alias("w1"), col("df").alias("df1"))), "w1")
        .join(F.broadcast(df_.select(col("tok").alias("w2"), col("df").alias("df2"))), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "cluster",
            F.expr(
                "CASE WHEN coalesce(codf, 0) = 0 THEN CAST(-1000000000 AS BIGINT) "
                "WHEN codf = n THEN CAST(1000000000 AS BIGINT) "
                "ELSE TRY_CAST(round(ln(codf * CAST(n AS DOUBLE) / (df1 * df2)) / "
                "(-ln(codf / CAST(n AS DOUBLE))) * 1000000000, 0) AS BIGINT) END"
            ).alias("npmi_n"),
        )
    )
    return scored.groupBy("cluster").agg(
        F.count("*").alias("n_pairs"), F.sum("npmi_n").alias("s")
    ).select(
        "cluster",
        "n_pairs",
        F.expr(
            "round(s / (n_pairs * CAST(1000000000 AS DOUBLE)), 4)"
        ).alias("coherence_npmi"),
    )


QUERIES = {
    "ml_kmeans_lloyd": _q_kmeans,
    "graph_components_dedup": _q_components,
    "llm_dedup_apply": _q_dedup_apply,
    "graph_pagerank": _q_pagerank,
    "ml_pca_power": _q_pca_power,
    "ml_dbscan": _q_dbscan,
    "llm_cluster_topics": _q_cluster_topics,
    "llm_topic_coherence": _q_topic_coherence,
}


from .llm import _BANDS, _MINHASH, _SH, _TOKS  # noqa: E402  (proven oracle CTEs)

_EMB_D = "emb AS (SELECT vec_id, CASE WHEN len(list_filter(embedding, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN NULL ELSE CAST(embedding AS DOUBLE[]) END AS emb FROM embeddings)"

_SEED_LIST = ", ".join(str(i) for i in KMEANS_SEED_IDS)

# Same left-fold sum-of-squares form the graded knn_dist_sqeuclidean oracle
# uses — bit-compatible with Spark's aggregate(zip_with(...)) fold.
_SQDIST = (
    "round(list_aggregate(list_transform(list_zip(e.emb, s.cent), "
    "p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), 4)"
)

# Two unrolled Lloyd iterations; every float canonicalized with round(,4)
# exactly as the Spark side does.
_KMEANS_SQL = f"""
WITH {_EMB_D},
seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, emb AS cent
  FROM emb WHERE vec_id IN ({_SEED_LIST})
),
a1 AS (
  SELECT vec_id, c FROM (
    SELECT e.vec_id, s.c,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {_SQDIST}, s.c) AS rn
    FROM emb e CROSS JOIN seeds s) WHERE rn = 1
),
c1d AS (
  SELECT a1.c, r.range AS dim, round(avg(e.emb[CAST(r.range + 1 AS INT)]), 4) AS v
  FROM a1 JOIN emb e USING (vec_id), range(64) r
  GROUP BY a1.c, r.range
),
cent1 AS (SELECT c, list(v ORDER BY dim) AS cent FROM c1d GROUP BY c),
a2 AS (
  SELECT vec_id, c FROM (
    SELECT e.vec_id, s.c,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {_SQDIST}, s.c) AS rn
    FROM emb e CROSS JOIN cent1 s) WHERE rn = 1
)
SELECT vec_id, c AS cluster FROM a2
"""

# Transitive closure by recursive CTE over the SAME minhash band pairs the
# graded llm_dedup_near_minhash oracle produces; cluster = min reachable id.
_COMPONENTS_SQL = (
    f"WITH RECURSIVE {_TOKS}, {_SH}, {_MINHASH}, {_BANDS}, "
    "pairs AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db "
    "FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig "
    "AND a.doc_id < b.doc_id), "
    "edges AS (SELECT da AS x, db AS y FROM pairs "
    "UNION ALL SELECT db, da FROM pairs), "
    "reach(id, r) AS (SELECT doc_id, doc_id FROM documents "
    "UNION SELECT e.x, reach.r FROM edges e JOIN reach ON e.y = reach.id), "
    "comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id) "
    "SELECT c.id AS doc_id, c.cluster, "
    "count(*) OVER (PARTITION BY c.cluster) AS cluster_size FROM comp c"
)

ORACLE = {
    "ml_kmeans_lloyd": _KMEANS_SQL,
    "graph_components_dedup": materialize_ctes(_COMPONENTS_SQL),
    "llm_dedup_apply": materialize_ctes(
        f"WITH comp AS ({_COMPONENTS_SQL}) "
        "SELECT c.doc_id, d.lang, d.n_chars, c.cluster_size AS n_merged "
        "FROM comp c JOIN documents d ON c.doc_id = d.doc_id "
        "WHERE c.doc_id = c.cluster"
    ),
    "graph_pagerank": (
        f"WITH {_EMB_D}, "
        "pairs AS (SELECT q.vec_id AS qid, t.vec_id AS tid, "
        "list_distance(q.emb, t.emb) AS dist "
        "FROM emb q, emb t WHERE t.vec_id <> q.vec_id), "
        "ranked AS (SELECT pairs.*, row_number() OVER "
        "(PARTITION BY qid ORDER BY dist, tid) AS rnk FROM pairs), "
        "e AS (SELECT qid AS src, tid AS dst FROM ranked WHERE rnk <= 5), "
        "nn AS (SELECT count(*) AS n FROM emb), "
        f"r0 AS (SELECT vec_id AS id, {PR_SCALE} // n AS r FROM emb, nn), "
        "in1 AS (SELECT e.dst AS id, sum(r0.r // 5) AS inflow "
        "FROM e JOIN r0 ON r0.id = e.src GROUP BY e.dst), "
        f"r1 AS (SELECT emb.vec_id AS id, {15 * PR_SCALE} // (100 * nn.n) "
        "+ (85 * coalesce(in1.inflow, 0)) // 100 AS r "
        "FROM emb CROSS JOIN nn LEFT JOIN in1 ON in1.id = emb.vec_id), "
        "in2 AS (SELECT e.dst AS id, sum(r1.r // 5) AS inflow "
        "FROM e JOIN r1 ON r1.id = e.src GROUP BY e.dst), "
        f"r2 AS (SELECT emb.vec_id AS id, {15 * PR_SCALE} // (100 * nn.n) "
        "+ (85 * coalesce(in2.inflow, 0)) // 100 AS r "
        "FROM emb CROSS JOIN nn LEFT JOIN in2 ON in2.id = emb.vec_id) "
        "SELECT id AS vec_id, CAST(r AS BIGINT) AS rank_q FROM r2"
    ),
    "ml_pca_power": (
        f"WITH {_EMB_D}, "
        "ex AS (SELECT vec_id, i AS pos, emb[CAST(i + 1 AS INT)] AS x "
        "FROM emb, range(64) t(i)), "
        "mu AS (SELECT pos, round(avg(x), 6) AS mu FROM ex GROUP BY pos), "
        "cent AS (SELECT vec_id, ex.pos, x - mu AS c "
        "FROM ex JOIN mu ON mu.pos = ex.pos), "
        "prods AS (SELECT a.pos AS a, b.pos AS b, "
        f"TRY_CAST(round(a.c * b.c * {PCA_SCALE}, 0) AS BIGINT) AS pq "
        "FROM cent a JOIN cent b ON a.vec_id = b.vec_id), "
        "cov AS (SELECT a, b, sum(pq) AS cq FROM prods GROUP BY a, b), "
        "v1 AS (SELECT a, CAST(sum(cq) AS BIGINT) AS v1q FROM cov GROUP BY a), "
        "mx AS (SELECT max(abs(v1q)) AS mx FROM v1) "
        "SELECT CAST(a AS BIGINT) AS dim, v1q, round(v1q / mx, 6) AS v1_norm "
        "FROM v1, mx"
    ),
    "ml_dbscan": materialize_ctes(
        f"WITH RECURSIVE {_EMB_D}, "
        "clo AS (SELECT q.vec_id AS qid, t.vec_id AS tid "
        "FROM emb q, emb t WHERE q.vec_id <> t.vec_id "
        f"AND list_distance(q.emb, t.emb) < {DBSCAN_EPS}), "
        "cnts AS (SELECT qid, count(*) AS n FROM clo GROUP BY qid), "
        f"core AS (SELECT qid AS id FROM cnts WHERE n >= {DBSCAN_MINPTS}), "
        "ce AS (SELECT c.qid AS a, c.tid AS b FROM clo c "
        "JOIN core x ON x.id = c.qid JOIN core y ON y.id = c.tid "
        "WHERE c.qid < c.tid), "
        "edges AS (SELECT a AS x, b AS y FROM ce UNION ALL SELECT b, a FROM ce), "
        # closure roots restricted to LOCAL MINIMA of the core graph:
        # every component's min node is a local min (it is smaller than
        # all its neighbors), so min(r) per node is unchanged for any
        # graph — but the materialized closure shrinks from
        # Σ|comp|² (node × every-root) to Σ|comp|·|local minima| rows.
        # At sf0.1 (one 2000-core component, 3 local minima) this is
        # the difference between 546 s and 1.8 s.
        "lm AS (SELECT id FROM core WHERE id NOT IN "
        "(SELECT x FROM edges WHERE y < x)), "
        "reach(id, r) AS (SELECT id, id FROM lm "
        "UNION SELECT e.x, reach.r FROM edges e JOIN reach ON e.y = reach.id), "
        "comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id), "
        "border AS (SELECT c.qid AS id, min(comp.cluster) AS cluster "
        "FROM clo c JOIN comp ON comp.id = c.tid "
        "WHERE c.qid NOT IN (SELECT id FROM core) GROUP BY c.qid) "
        "SELECT emb.vec_id, CAST(coalesce(cnts.n, 0) AS BIGINT) AS n_in_eps, "
        "CAST(comp.id IS NOT NULL AS INTEGER) AS is_core, "
        "CAST(coalesce(comp.cluster, border.cluster, -1) AS BIGINT) AS cluster "
        "FROM emb LEFT JOIN cnts ON cnts.qid = emb.vec_id "
        "LEFT JOIN comp ON comp.id = emb.vec_id "
        "LEFT JOIN border ON border.id = emb.vec_id"
    ),
    "llm_cluster_topics": (
        f"WITH asg AS ({_KMEANS_SQL}), "
        "tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents), "
        "j AS (SELECT asg.cluster, tk.tok FROM tk "
        "JOIN asg ON asg.vec_id = tk.doc_id), "
        "c AS (SELECT cluster, tok, count(*) AS cnt FROM j GROUP BY cluster, tok), "
        "r AS (SELECT cluster, tok, cnt, row_number() OVER "
        "(PARTITION BY cluster ORDER BY cnt DESC, tok) AS rn FROM c) "
        "SELECT cluster, tok, cnt, rn FROM r WHERE rn <= 5"
    ),
}

ORACLE["llm_topic_coherence"] = (
    f"WITH asg AS ({_KMEANS_SQL}), "
    "tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
    "FROM documents), "
    "j AS (SELECT asg.cluster, tk.tok FROM tk "
    "JOIN asg ON asg.vec_id = tk.doc_id), "
    "c AS (SELECT cluster, tok, count(*) AS cnt FROM j GROUP BY cluster, tok), "
    "r AS (SELECT cluster, tok, row_number() OVER "
    "(PARTITION BY cluster ORDER BY cnt DESC, tok) AS rn FROM c), "
    "topics AS (SELECT cluster, tok FROM r WHERE rn <= 5), "
    "pairs AS (SELECT t1.cluster, t1.tok AS w1, t2.tok AS w2 FROM topics t1 "
    "JOIN topics t2 ON t1.cluster = t2.cluster AND t1.tok < t2.tok), "
    "ds AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok "
    "FROM documents), "
    "nn AS (SELECT count(*) AS n FROM documents), "
    "dfq AS (SELECT tok, count(*) AS df FROM ds GROUP BY tok), "
    "co AS (SELECT d1.tok AS w1, d2.tok AS w2, count(*) AS codf "
    "FROM ds d1 JOIN ds d2 ON d1.doc_id = d2.doc_id AND d1.tok < d2.tok "
    "WHERE EXISTS (SELECT 1 FROM pairs WHERE pairs.w1 = d1.tok "
    "AND pairs.w2 = d2.tok) GROUP BY d1.tok, d2.tok), "
    "scored AS (SELECT pairs.cluster, "
    "CASE WHEN coalesce(co.codf, 0) = 0 THEN CAST(-1000000000 AS BIGINT) "
    "WHEN co.codf = n THEN CAST(1000000000 AS BIGINT) "
    "ELSE TRY_CAST(round(ln(co.codf * CAST(n AS DOUBLE) / (f1.df * f2.df)) / "
    "(-ln(co.codf / CAST(n AS DOUBLE))) * 1000000000, 0) AS BIGINT) END AS npmi_n "
    "FROM pairs LEFT JOIN co ON pairs.w1 = co.w1 AND pairs.w2 = co.w2 "
    "JOIN dfq f1 ON pairs.w1 = f1.tok JOIN dfq f2 ON pairs.w2 = f2.tok, nn) "
    "SELECT cluster, count(*) AS n_pairs, "
    "round(CAST(sum(npmi_n) AS BIGINT) / "
    "(count(*) * CAST(1000000000 AS DOUBLE)), 4) AS coherence_npmi "
    "FROM scored GROUP BY cluster"
)
