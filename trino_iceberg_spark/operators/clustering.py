"""Duplicate-cluster resolution: distributed connected components over a
near-duplicate pair graph, and survivor selection.

Pair generators (``dedup.minhash_dedup_pairs``, ``ngram_jaccard_pairs``,
``simhash_dedup_pairs``, ``embedding_dedup_pairs``) emit *edges*; a real
dedup pipeline must then group transitively-linked documents into clusters
and keep one representative per cluster. The reference repo has no analog
(its surface is SQL-only, SURVEY.md §2.D — this is a north-star operator);
semantics follow the standard MapReduce connected-components literature
(Kiveris et al., "Connected Components in MapReduce and Beyond").

Scale design (100 TB rule):

- Min-label propagation alone needs O(graph diameter) rounds — a chained
  near-dup set (a-b, b-c, c-d, ...) degrades it to O(n). Each round here
  therefore also *pointer-jumps* (``comp(v) := comp(comp(v))``), halving
  label-chain depth per round, so convergence is O(log n) rounds — the
  same asymptotic as alternating large-star/small-star but with simpler,
  easily-audited dataframe joins (two shuffles per round, keyed by node).
- Every round materializes with ``persist() + localCheckpoint()`` to
  truncate lineage; without it Spark re-derives round k from round 0 at
  every action and the job is O(k^2). On a cluster, point
  ``spark.sparkContext.setCheckpointDir`` at durable storage and swap
  ``localCheckpoint`` for ``checkpoint`` to also survive executor loss.
- Convergence test is an aggregate (count of changed labels), never a
  ``collect()`` of labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["connected_components", "attach_components", "near_dedup_survivors"]


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 25,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Resolve an undirected edge list into connected components.

    Returns ``(node, component)`` with one row per distinct node appearing
    in ``pairs``; ``component`` is the minimum node id in that node's
    component (a deterministic, join-friendly cluster key).

    Constant-factor design (each round is fixed job overhead at small SF,
    real shuffle cost at scale, so both matter):

    - Round 0 *seeds* ``comp(v) = min(v, min neighbor)`` with one
      aggregate over the edge list — a full propagate round over identity
      labels for free. Star-shaped duplicate clusters (the common case)
      converge one round earlier.
    - Labels carry their previous value through the round, so the
      convergence test is a filter-count on the just-checkpointed result —
      no extra old-vs-new join.
    - ``shuffle_partitions``, when given, scopes
      ``spark.sql.shuffle.partitions`` to this computation (restored
      after). The pair graph is orders of magnitude smaller than the
      corpus; inheriting a corpus-sized setting (or an untuned session's
      200) makes every round pay hundreds of empty tasks.

    ``max_iter`` bounds the label-propagation + pointer-jumping rounds;
    O(log n) are needed, so 25 covers graphs far beyond any realistic
    duplicate set. Raises ``RuntimeError`` if not converged by then.
    """
    spark = pairs.sparkSession
    prev_parts: str | None = None
    if shuffle_partitions is not None:
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        edges = pairs.select(
            F.col(src).alias("u"), F.col(dst).alias("v")
        ).where(F.col("u") != F.col("v"))
        # Symmetrize once; reused every round.
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        sym = sym.persist(StorageLevel.MEMORY_AND_DISK)

        # Round-0 seeding (one aggregate, no join).
        labels = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select(
                F.col("u").alias("node"),
                F.least(F.col("u"), F.col("mn")).alias("comp"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        labels = labels.localCheckpoint(eager=True)

        for _ in range(max_iter):
            # Propagate: comp(v) <- min(comp(v), min_{u in N(v)} comp(u)).
            nbr = (
                sym.join(labels, sym["v"] == labels["node"])
                .groupBy("u")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            stepped = labels.join(nbr, labels["node"] == nbr["u"], "left").select(
                labels["node"],
                labels["comp"].alias("old_comp"),
                F.least(
                    labels["comp"], F.coalesce(nbr["nbr_comp"], labels["comp"])
                ).alias("mid"),
            )
            # Pointer-jump: comp(v) <- comp(comp(v)), halving label-chain
            # depth. Left join: settled minima point at themselves.
            jump = stepped.select(
                F.col("node").alias("jnode"), F.col("mid").alias("jcomp")
            )
            new_labels = (
                stepped.join(jump, stepped["mid"] == jump["jnode"], "left")
                .select(
                    "node",
                    "old_comp",
                    F.coalesce(F.col("jcomp"), F.col("mid")).alias("comp"),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            new_labels = new_labels.localCheckpoint(eager=True)

            # Rides the checkpointed partitions — no join, no rescan of sym.
            changed = new_labels.where(F.col("comp") != F.col("old_comp")).count()
            labels.unpersist()
            # Keep the checkpointed frame itself (unpersist must hit it next
            # round); the stale old_comp column is dropped on return.
            labels = new_labels
            if changed == 0:
                sym.unpersist()
                return labels.select("node", F.col("comp").alias("component"))
        sym.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        if prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def attach_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Attach a ``component`` column to ``df``. Rows not in any pair form
    singleton clusters (component = own id)."""
    cc = connected_components(pairs, src, dst, shuffle_partitions=shuffle_partitions)
    return (
        df.join(cc, df[id_col] == cc["node"], "left")
        .drop("node")
        .withColumn("component", F.coalesce(F.col("component"), F.col(id_col)))
    )


def near_dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Drop every row transitively linked to a lower-id duplicate.

    Keeps the minimum-id representative of each duplicate cluster and all
    rows that never appear in ``pairs``. Executed as a broadcast-friendly
    anti-join of ``df`` against the (small: duplicates only) victim set —
    the full dataset is scanned once and never shuffled.
    """
    cc = connected_components(pairs, src, dst, shuffle_partitions=shuffle_partitions)
    victims = cc.where(F.col("node") != F.col("component")).select("node")
    return df.join(victims, df[id_col] == victims["node"], "left_anti")
