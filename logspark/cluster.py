"""Duplicate-cluster resolution: connected components over near-dup pairs.

The last stage of a real training-data dedup pipeline. LSH + verify emits
PAIRS (a ~ b); what the pipeline must act on is CLUSTERS — transitive
closure of ~ — with one canonical survivor per cluster (near-duplication
is not transitive: a~b and b~c does not imply a~c passes the threshold,
but keeping both b and c when each duplicates a is still double-counting
the same content). Reference analog: the dedup/retire survivor selection
in clean_data (/root/reference/proc/clean_data.py:27-52 picks one file to
keep per retired group); here it is generalized to similarity clusters.

Spark-first design — min-label propagation with pointer jumping:

  * labels(v) starts as v; each PROPAGATE step takes the min label over
    v and its neighbors (one edge-keyed shuffle join + groupBy);
  * each JUMP step composes the label map with itself
    (labels[v] = min(labels[v], labels[labels[v]]) — one self-join),
    the pointer-jumping trick that collapses chains geometrically, so
    p propagate rounds with interleaved jumps cover diameters far beyond
    p (a pure propagate loop needs diameter rounds);
  * each round ends with localCheckpoint(eager): iterative self-joins
    reference the previous labels TWICE per round, so an unbroken lazy
    plan grows ~4^rounds copies of the upstream subplan (LSH + verify)
    and Catalyst analysis itself becomes the bottleneck — the same
    reason GraphX/Pregel materializes each superstep. The checkpointed
    state is node-sized (doc_id, label), not corpus-sized;
  * no collect, no driver-side graph; the loop runs to the min-label
    FIXPOINT (early exit when a round changes zero labels, bounded by
    PROPAGATE_ROUNDS) — deterministic, and the DuckDB recursive-CTE
    oracle (the same fixpoint) verifies it value-for-value.

Scale: the input is the verified near-dup pair set — orders of magnitude
smaller than the corpus (selective LSH banding keeps candidates ~0.02% of
n^2; see textops.NUM_PERMS). Each round shuffles only this edge set, keyed
by node id — balanced, broadcast-free, no O(n^2) stage anywhere. For
pathological diameters at extreme scale the same plan extends to the
large-star/small-star algorithm (alternating min-joins); the fixed-round
pointer-jumping loop here is its bounded-depth form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Max propagate rounds (safety bound): the loop EXITS EARLY as soon as a
# full propagate+jump round changes zero labels — that is the min-label
# fixpoint (every node already holds the min over itself and its
# neighborhood), i.e. true convergence, so the early exit returns exactly
# what any larger fixed round count would. Near-dup clusters are
# near-cliques (observed diameter <= 3; typically exits after 2-3 rounds);
# the bound covers pathological chain diameters >= 3*2^16 via the jumps.
PROPAGATE_ROUNDS = 16


def connected_components(
    pairs: DataFrame, rounds: int = PROPAGATE_ROUNDS
) -> DataFrame:
    """(doc_a, doc_b) undirected pairs -> (doc_id, cluster_id) where
    cluster_id is the lexicographic-min doc_id of the component.

    Converges by fixpoint detection: each round ends with a node-sized
    changed-label count (cheap — both sides are checkpointed label maps)
    and the loop stops on the first round that changes nothing."""
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    # the edge set is referenced every round: materialize it once so the
    # (potentially expensive) pair-producing upstream plan runs once
    edges = fwd.union(rev).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for rnd in range(rounds):
        prev = labels
        # propagate: min over neighborhood
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr, labels["node"] == nbr["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_min", F.col("label"))
                ).alias("label"),
            )
        )
        # jump: labels[v] <- min(labels[v], labels[labels[v]])
        lab2 = labels.select(
            F.col("node").alias("node2"), F.col("label").alias("label2")
        )
        labels = (
            labels.join(lab2, labels["label"] == lab2["node2"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("label2", F.col("label"))
                ).alias("label"),
            )
            # truncate lineage: the next round references this twice
            .localCheckpoint(eager=True)
        )
        # fixpoint check: labels only ever DECREASE, so "no label changed
        # this round" == converged. Node-sized equi-join between two
        # materialized label maps; skipped on round 0 (always changes).
        if rnd > 0:
            changed = (
                labels.join(
                    prev.select("node", F.col("label").alias("_prev")),
                    "node",
                )
                .filter(F.col("label") != F.col("_prev"))
                .limit(1)
                .count()
            )
            if changed == 0:
                break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def neardup_clusters(pairs: DataFrame) -> DataFrame:
    """Cluster assignment with survivor flag: (doc_id, cluster_id,
    cluster_size, is_canonical). Canonical = the cluster's min doc_id —
    the deterministic keep-one-drop-rest dedup decision."""
    cc = connected_components(pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def cluster_representatives(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """Quality-aware survivor selection: one row per near-dup cluster with
    the member the pipeline should KEEP — the longest document (word
    count, ties broken by smallest doc_id) rather than ``neardup_clusters``'s
    arbitrary min-id canonical. Keeping the longest duplicate is the
    standard curation policy when near-dups are truncations/excerpts of
    one another: the longest member dominates the others' content.
    Reference analog: clean_data's keep-one choice per retired group
    (/root/reference/proc/clean_data.py:27-52), upgraded from arbitrary
    to quality-ranked.

    Returns (cluster_id, rep_doc_id, rep_n_words, cluster_size, n_dropped).

    Scale shape: the cluster map is PAIR-derived — bounded by the verified
    near-dup set (LSH banding + Jaccard>=0.7 verification keeps that a few
    percent of the corpus), so it is broadcast onto the corpus scan and
    the inner join prunes unclustered docs map-side without shuffling the
    corpus. The rank-1 selection is a ROW_NUMBER window over cluster-sized
    (not corpus-sized) data, partitioned on cluster_id. If a pathological
    corpus made the cluster map outgrow the broadcast ceiling, dropping
    the hint degrades to a plain doc_id equi-join — same semantics."""
    from pyspark.sql.window import Window

    cc = connected_components(pairs)
    members = docs.join(F.broadcast(cc), "doc_id").select(
        "doc_id",
        "cluster_id",
        F.size(F.split("text", " ")).alias("n_words"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_words").desc(), F.col("doc_id")
    )
    sizes = members.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    reps = members.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return reps.join(sizes, "cluster_id").select(
        "cluster_id",
        F.col("doc_id").alias("rep_doc_id"),
        F.col("n_words").alias("rep_n_words"),
        "cluster_size",
        (F.col("cluster_size") - F.lit(1)).alias("n_dropped"),
    )


# PageRank fixed-point scale: pr values live in [0, PR_SCALE] integer
# micro-units. Bound check: every per-edge contribution multiplies
# pr (<= 1e12) by an edge count before the integer divide, so BIGINT
# (9.2e18) headroom caps edge counts at ~9e6 per edge at this scale —
# raise the divide-before-multiply form or split the scale if a corpus
# ever exceeds that (documented, not silently truncated).
PR_SCALE = 1_000_000_000_000


def pagerank_fixedpoint(
    edges: DataFrame, iters: int = 2, damping_pct: int = 85
) -> DataFrame:
    """Weighted PageRank over a (from_node, to_node, cnt) edge table in
    exact scaled-integer FIXED POINT — the iterative-graph-algorithm
    operator next to connected_components, in the same order-free
    arithmetic regime as kmeans_update_fixedpoint: every mass transfer is
    an integer ``(pr * cnt) DIV out_w`` computed per edge, so the
    per-node SUM is a sum of integers — associative, order-free, and
    therefore bit-reproducible at ANY parallelism (a float PageRank's
    sums reorder under shuffle and drift run-to-run). The DuckDB oracle
    replays every iteration value-for-value.

    rank_{t+1}(v) = (100-d)% * (SCALE DIV n)  +  d% * sum over in-edges
    (u,v) of (rank_t(u) * cnt(u,v)) DIV out_w(u), all integer ops.
    Dangling-node mass (no out-edges) is dropped, not redistributed —
    the deterministic simple variant; both engines state the same choice.

    Scale shape: the edge table is an AGGREGATED transition graph
    (taxonomy^2-bounded for event graphs; host-graph-sized for web
    graphs), orders of magnitude smaller than the corpus that produced
    it. Each iteration is one equi-join keyed on the from-node + one
    sum shuffle keyed on the to-node — GraphX/Pregel's superstep shape
    expressed relationally; nodes and the scalar n ride as broadcasts.
    For billion-node graphs the same plan holds with the node map
    bucketed on node id; nothing here is per-row Python.
    """
    base_lit = F.lit(PR_SCALE)
    nodes = (
        edges.select(F.col("from_node").alias("node"))
        .union(edges.select(F.col("to_node").alias("node")))
        .distinct()
    )
    n_df = nodes.agg(F.count("*").alias("n"))
    out_w = edges.groupBy("from_node").agg(F.sum("cnt").alias("out_w"))
    keep = 100 - damping_pct
    pr = (
        nodes.crossJoin(F.broadcast(n_df))
        .select("node", F.expr(f"{PR_SCALE} DIV n").alias("pr_scaled"))
    )
    for _ in range(iters):
        contrib = (
            edges.join(
                pr.withColumnRenamed("node", "from_node"), "from_node"
            )
            .join(out_w, "from_node")
            .select(
                F.col("to_node").alias("node"),
                F.expr("(pr_scaled * cnt) DIV out_w").alias("c"),
            )
        )
        s = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        pr = (
            nodes.join(s, "node", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (
                    F.expr(f"({keep} * ({PR_SCALE} DIV n)) DIV 100")
                    + F.expr(f"({damping_pct} * coalesce(s, 0)) DIV 100")
                ).alias("pr_scaled"),
            )
        )
    return pr.withColumn(
        "pr", F.col("pr_scaled").cast("double") / base_lit.cast("double")
    )
