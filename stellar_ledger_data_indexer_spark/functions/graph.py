"""Connected components — duplicate-cluster formation at scale.

The missing piece between pairwise near-dup detection (MinHash/SimHash/
embedding pairs) and an actionable dedup decision is CLUSTERING: near-dup
is transitive in practice (A~B, B~C ⇒ keep one of {A,B,C}), so the
candidate-pair graph must be folded into components and one canonical
document kept per component. The reference has no analog (its dedup is
keyed, not content-based); this is a training-data-pipeline first-class
operator per the build brief.

Algorithm: min-label propagation (the HashToMin family) — every node's
label converges to the smallest node id in its component. One round is
a join + min-aggregation (both shuffles on node id); rounds needed is
the graph DIAMETER, and near-dup graphs are piles of small star/clique
clusters (diameter ≤ ~3), so convergence is a handful of rounds even at
10^10 nodes. Convergence is detected with a driver-side count of
changed labels (one scalar per round, no data to the driver). Each
round's result is cached and the previous round unpersisted, so the
lineage stays O(1) deep — without that, round k would recompute rounds
1..k-1 (quadratic) and the plan would grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 20) -> DataFrame:
    """Components of the undirected graph given by (id_a, id_b) edge
    rows. Returns (node, component) where component = min node id in
    the node's component — deterministic canonical labels. Nodes appear
    iff they occur in an edge (callers union isolated nodes themselves,
    e.g. ``component = own id``). Raises if ``max_iter`` rounds don't
    converge (diameter > max_iter — a pathological chain, not a
    near-dup workload).

    Cache contract (ADVICE r4): the returned DataFrame is persisted and
    already materialized — unpersisting it would make any later
    evaluation recompute the whole O(diameter) iteration through the
    full join lineage, so the cache is kept and THE CALLER OWNS IT:
    call ``.unpersist()`` once done consuming (``neardup_clusters``
    does exactly this after materializing its own result). The
    non-convergence path unpersists before raising — nothing leaks on
    error."""
    sym = (edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
           .union(edges.select(F.col(id_b).alias("src"),
                               F.col(id_a).alias("dst"))))
    labels = (sym.groupBy("src").agg(F.min("dst").alias("nbr"))
              .select(F.col("src").alias("node"),
                      F.least("src", "nbr").alias("component"))
              .persist())
    labels.count()   # materialize round 0
    from pyspark.sql import Observation
    for _ in range(max_iter):
        # neighbor's current label, folded with own: new = min(own
        # label, min over neighbors of their label). The changed-label
        # count rides the SAME action as the materialization via an
        # Observation (r7): the old shape re-joined new vs old labels
        # and ran a second count action per round — one extra join +
        # job per round for a scalar the fold already knows.
        nbr_lbl = (sym.join(labels.withColumnRenamed("node", "dst"), "dst")
                   .groupBy("src").agg(F.min("component").alias("nbr_min")))
        obs = Observation()
        new_labels = (labels.join(nbr_lbl,
                                  labels.node == nbr_lbl.src, "left")
                      .select(F.col("node"),
                              F.least(F.col("component"),
                                      F.coalesce(F.col("nbr_min"),
                                                 F.col("component")))
                              .alias("component"),
                              F.col("component").alias("_old"))
                      .observe(obs,
                               F.sum((F.col("component") != F.col("_old"))
                                     .cast("long")).alias("chg"))
                      .drop("_old")
                      .persist())
        new_labels.count()   # materialize round k (collects obs too)
        # _obs_metrics: an edge-less call makes every round runtime-empty,
        # AQE propagates the empty relation over the CollectMetrics node
        # and the observation never materializes — absent metrics mean
        # zero rows changed, which also terminates correctly
        from ..operators.merge import _obs_metrics
        changed = int(_obs_metrics(obs).get("chg") or 0)
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            return labels
    labels.unpersist()
    raise RuntimeError(f"connected_components did not converge in "
                       f"{max_iter} rounds (graph diameter too large)")


def neardup_clusters(docs: DataFrame, pairs: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """Fold verified near-dup pairs into clusters over the whole corpus:
    returns (doc_id, component) for EVERY document — connected docs get
    their component's min id, isolated docs get themselves. Downstream
    dedup keeps rows where doc_id == component (the canonical copy).

    Cache contract: materializes its own (doc_id, component) result into
    a fresh cache and releases ``connected_components``'s inner one
    before returning — the returned cache (ONE two-column DataFrame) is
    the caller's to ``.unpersist()`` when done; callers that don't pay
    one bounded cached frame per call, never an accumulating chain."""
    comp = connected_components(pairs, max_iter=20)
    out = (docs.select(F.col(id_col))
           .join(comp.withColumnRenamed("node", id_col), id_col, "left")
           .select(id_col,
                   F.coalesce("component", F.col(id_col))
                   .alias("component"))
           .persist())
    out.count()
    comp.unpersist()
    return out
