"""Connected components over near-duplicate pair edges (EXT).

Pair generators (n-gram Jaccard, MinHash LSH, SimHash, embedding
cosine) emit EDGES; an actual dedup pipeline must then resolve
CLUSTERS — if A~B and B~C, then {A,B,C} keep one survivor even though
(A,C) was never emitted as a pair. That resolution is connected
components, computed here as distributed min-label propagation:

    label(n) ← min(label(n), min over neighbors m of label(m))

iterated to fixpoint. Each round is one join + one aggregation on the
symmetrized edge list; rounds needed = graph diameter, and near-dup
clusters are near-cliques (diameter 2–3), so a handful of rounds
closes 100 TB-scale graphs too — this is the textbook map-reduce CC
(the simplified form of Hash-to-Min, Vassilvitskii et al.).

Scale notes:
- ``localCheckpoint`` truncates the iterative plan each round —
  without it Catalyst re-derives an exponentially deeper lineage.
- The convergence probe is one count() per round on the CHANGED set
  only (cheap, early-exits the loop); ``max_iter`` hard-bounds work.
- Edges-only: documents with no dup edge are singleton components and
  never enter the computation (at 100 TB the edge set is orders of
  magnitude smaller than the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from server_spark.barrier import barrier


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component id is
    the minimum node id of the cluster (deterministic survivor)."""
    # Materialize the (possibly expensive) pair plan ONCE — the
    # symmetrizing union references it twice and would otherwise
    # recompute the whole upstream per branch. Pair generators emit
    # unique (a < b) edges, so the symmetrized list is duplicate-free
    # without a distinct shuffle; min-agg tolerates dupes anyway.
    e = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("nbr")
    ).transform(barrier)
    sym = e.unionAll(e.select(F.col("nbr").alias("node"), F.col("node").alias("nbr")))

    # Init folds the first propagation round in: label = min(self,
    # neighbors) straight off the edge list (one agg, no join).
    # eager=False (r15, guide §5 job-count pass): the first round's
    # convergence count materializes this checkpoint as part of its
    # own job — an eager barrier here was a whole extra job that
    # computed nothing the next action wouldn't.
    labels = barrier(
        sym.groupBy("node")
        .agg(F.min("nbr").alias("_mn"))
        .select("node", F.least("node", "_mn").alias("component")),
        eager=False,
    )
    changed = -1  # bound before the loop: max_iter <= 0 must reach the
    # non-convergence RuntimeError below, not an UnboundLocalError
    for _ in range(max_iter):
        # One propagation round as ONE join + ONE aggregation (r14
        # optimization pass, guide §2.4): neighbor labels flow through
        # the edge join as before, but instead of a second labels-side
        # join to merge/compare, the node's OWN label rides the same
        # aggregation as a tagged "self message" — min over
        # (self ∪ neighbor messages) IS least(old, min-neighbor), and
        # the self row's value doubles as the old label for the
        # convergence flag. Replaces join+agg+join (5 exchanges) with
        # join+union+agg (4) and drops a blocking operator from every
        # round; labels are bit-identical (exact min over the same
        # multiset).
        msgs = (
            sym.select(F.col("node").alias("n"), "nbr")
            .join(
                labels.select(F.col("node").alias("_ln"), "component"),
                F.col("nbr") == F.col("_ln"),
            )
            .select(
                F.col("n").alias("node"),
                "component",
                F.lit(False).alias("_self"),
            )
        )
        new_labels = (
            labels.select("node", "component", F.lit(True).alias("_self"))
            .unionAll(msgs)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                # exactly one self row per node (labels is keyed), so
                # this min is just that row's value: the OLD label
                F.min(F.when(F.col("_self"), F.col("component"))).alias(
                    "_old"
                ),
            )
            .select(
                "node",
                "component",
                (F.col("component") < F.col("_old")).alias("_chg"),
            )
        )
        # LAZY checkpoint + count in ONE action (r15): the convergence
        # count's full-partition scan materializes the checkpoint
        # blocks, so each round runs one job instead of two (eager
        # ckpt job + count job). Same blocks, same lineage cut, same
        # labels.
        new_labels = barrier(new_labels, eager=False)
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    else:
        # Exhausting max_iter means some chain is > max_iter hops from
        # its min id; returning the partial labels would silently keep
        # or drop the WRONG documents downstream (x21 corpus build,
        # x32 survivor pick). Near-dup clusters are near-cliques
        # (diameter 2–3), so this never fires in practice and the
        # guard is free.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"rounds ({changed} labels still changing); raise max_iter"
        )
    return labels


def resolve_clusters(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """One row per dup CLUSTER: canonical survivor (min id), member
    count, sorted member list (canonical string form for comparison)."""
    comp = connected_components(edges, src, dst, max_iter)
    return comp.groupBy("component").agg(
        F.min("node").alias("canonical_doc_id"),
        F.count("*").alias("n_members"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("node")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("member_ids"),
    )
