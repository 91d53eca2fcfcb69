package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup detectors ([[Dedup]]) emit
  * PAIRS, but a training pipeline drops DOCUMENTS — which requires the
  * transitive closure of the pair relation (A~B, B~C ⇒ {A,B,C} is one
  * cluster, keep exactly one). This is connected components over the
  * candidate-pair graph, the step between "found near-dups" and "wrote
  * the deduplicated corpus".
  *
  * Spark-first design: iterative min-label propagation with pointer
  * jumping, all in DataFrame ops —
  *
  *  - each round does `label(v) ← min(label(v), min_{u~v} label(u))`
  *    (one shuffle: edge⋈label + groupBy-min, with map-side partial
  *    aggregation), then a pointer-jump `label(v) ← label(label(v))`
  *    (one more equi-join), which contracts chains geometrically: a
  *    path of length d converges in O(log d) rounds, not O(d);
  *  - every round `localCheckpoint`s the label table, so the plan/
  *    lineage stays O(1) per round instead of growing with the loop
  *    (the classic iterative-algorithm failure mode on Spark);
  *  - convergence is detected with a single count over changed labels;
  *    near-dup graphs have tiny diameter (dup clusters are dense), so
  *    2–4 rounds is typical regardless of corpus size.
  *
  * At 100 TB the edge set is the near-dup candidate output — orders of
  * magnitude smaller than the corpus — and each round's cost is one
  * shuffle of that edge set: the same shape GraphX/GraphFrames CC uses,
  * without the RDD round-trip.
  */
object Clusters {

  /** Connected components of the undirected graph given by `pairs`
    * (two long-castable endpoint columns). Returns one row per distinct
    * node: (id, cluster) where `cluster` is the minimum node id
    * reachable from `id` — a deterministic canonical representative.
    */
  def connectedComponents(
      pairs: DataFrame, a: Column, b: Column, maxIter: Int = 25): DataFrame = {
    val dir = pairs.select(a.cast("long").as("u"), b.cast("long").as("v"))
    // both directions, deduped once up front — reused every round
    val edges = dir.union(dir.select(col("v"), col("u")))
      .distinct().localCheckpoint(true)
    // A non-numeric id column (e.g. string doc ids) casts to null
    // silently, which would collapse every such node into one bogus
    // null-keyed cluster — misuse must fail loudly instead. One cheap
    // scan of the already-checkpointed (deduped) edge set.
    require(edges.filter(col("u").isNull || col("v").isNull).isEmpty,
      "connectedComponents: endpoint columns must be long-castable " +
        "ids with no nulls (map string ids to longs first, e.g. via " +
        "monotonically-increasing id assignment or a hash)")
    var labels = edges.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("lbl")).localCheckpoint(true)
    var round = 0
    var converged = false
    while (round < maxIter && !converged) {
      // min label among neighbors (map-side combine on the groupBy)
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "u"), "u")
        .groupBy(col("v").as("id")).agg(min("lbl").as("nbr"))
      // carry the previous label through the round so convergence is a
      // filter on the checkpointed frame, not an extra join+job
      val propagated = labels.withColumnRenamed("lbl", "old")
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("nbr"), col("old"))).as("lbl"))
      // pointer jump: a label is itself a node id, so chase one hop
      // (a second hop per round was measured slower — the extra join
      // costs more than the rounds it saves on near-dup graph shapes)
      val next = propagated
        .join(
          propagated.select(col("id").as("lbl"), col("lbl").as("lbl2")),
          Seq("lbl"), "left")
        .select(col("id"), col("old"), coalesce(col("lbl2"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
      converged = next.filter(col("lbl") =!= col("old")).isEmpty
      labels = next.select("id", "lbl")
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("id"), col("lbl").as("cluster"))
  }

  /** Cluster assignment + canonical-member flag for every node that
    * appears in a near-dup pair: the doc to KEEP is the cluster's
    * minimum id (`is_canonical`); everything else is a duplicate to
    * drop. Singleton docs never enter the pair graph and are kept
    * implicitly — the output is exactly the "affected" set, so the
    * anti-join against it stays proportional to the duplicates found,
    * not the corpus.
    */
  def duplicateClusters(pairs: DataFrame, a: Column, b: Column): DataFrame =
    connectedComponents(pairs, a, b)
      .select(col("id"), col("cluster"),
        (col("id") === col("cluster")).as("is_canonical"))
}
