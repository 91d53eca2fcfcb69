package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Duplicate-cluster resolution: near-dup detectors ([[Dedup]]) emit
  * PAIRS, but a training pipeline drops DOCUMENTS — which requires the
  * transitive closure of the pair relation (A~B, B~C ⇒ {A,B,C} is one
  * cluster, keep exactly one). This is connected components over the
  * candidate-pair graph, the step between "found near-dups" and "wrote
  * the deduplicated corpus".
  *
  * Two execution paths, picked by measured graph size (the shape
  * GraphFrames' CC uses: iterate while big, finish small):
  *
  *  - SMALL graphs (≤ `spark.graft.cc.localEdgeThreshold` undirected
  *    edges, default 4M) run a driver-side union–find with path
  *    halving. A near-dup pair graph at gate scale is a few
  *    thousand edges; burning 5+ scheduled Spark jobs per propagation
  *    round on it is pure scheduling floor. The collect is BOUNDED by
  *    the threshold — this is the broadcast-join size argument, not a
  *    corpus-through-the-driver anti-pattern — AND primitive end to
  *    end: per-partition packed `Array[Long]` chunks (16 bytes/edge,
  *    64 MB at the threshold; never an `Array[Row]`), id compaction
  *    onto a sorted array, int-indexed parent vector. Driver peak is
  *    ~220 MB at the default threshold, a real bound, where a boxed
  *    Row/HashMap spelling would cost ~20× that.
  *
  *  - LARGE graphs run iterative min-label propagation with pointer
  *    jumping, all in DataFrame ops:
  *     * each round does `label(v) ← min(label(v), min_{u~v} label(u))`
  *       (edge⋈label + groupBy-min with map-side partial aggregation),
  *       then a pointer-jump `label(v) ← label(label(v))`, which
  *       contracts chains geometrically: a path of length d converges
  *       in O(log d) rounds, not O(d);
  *     * the edge set is hash-partitioned on the join key ONCE before
  *       its checkpoint, so per-round joins shuffle only the label
  *       table — the edge set crosses the wire once total;
  *     * every round `localCheckpoint`s the label table (lineage stays
  *       O(1) per round), lazily, so ONE action per round both
  *       materializes the labels and decides convergence.
  *
  * At 100 TB the edge set is the near-dup candidate output — orders of
  * magnitude smaller than the corpus but potentially billions of edges:
  * the distributed loop is the real path, the local finish is the
  * small-graph fast path both land on after contraction.
  */
object Clusters {

  /** Connected components of the undirected graph given by `pairs`
    * (two long-castable endpoint columns). Returns one row per distinct
    * node: (id, cluster) where `cluster` is the minimum node id
    * reachable from `id` — a deterministic canonical representative.
    */
  def connectedComponents(
      pairs: DataFrame, a: Column, b: Column, maxIter: Int = 25): DataFrame = {
    val spark = pairs.sparkSession
    val dir = pairs.select(a.cast("long").as("u"), b.cast("long").as("v"))
    // both directions, deduped once up front — reused every round.
    // Hash-partitioned on the join key BEFORE the checkpoint: the
    // checkpointed frame keeps its outputPartitioning, so the per-round
    // edge⋈label join shuffles only the (much smaller) label table.
    val edges = dir.union(dir.select(col("v"), col("u")))
      .distinct().repartition(col("u")).localCheckpoint(true)
    // A non-numeric id column (e.g. string doc ids) casts to null
    // silently, which would collapse every such node into one bogus
    // null-keyed cluster — misuse must fail loudly instead. One cheap
    // scan of the already-checkpointed (deduped) edge set.
    require(edges.filter(col("u").isNull || col("v").isNull).isEmpty,
      "connectedComponents: endpoint columns must be long-castable " +
        "ids with no nulls (map string ids to longs first, e.g. via " +
        "monotonically-increasing id assignment or a hash)")
    val threshold = spark.conf
      .getOption("spark.graft.cc.localEdgeThreshold")
      .map(_.toLong).getOrElse(4L << 20)
    // u<=v keeps one direction of every edge plus self-loops; since the
    // set above holds both directions, every node still appears.
    val undirected = edges.filter(col("u") <= col("v"))
    if (undirected.count() <= threshold)
      localComponents(spark, undirected)
    else
      propagateComponents(edges, maxIter)
  }

  /** Driver-side union–find finish for graphs bounded by the edge
    * threshold (memory is capped by construction — see object doc).
    * Identical contract: cluster = min reachable id. Everything stays
    * primitive on the driver: edges arrive as per-partition packed
    * long arrays, endpoint ids are compacted onto a sorted array, and
    * the parent forest is an int-index vector — no boxed Rows, tuples
    * or HashMap nodes at any point.
    */
  private def localComponents(
      spark: org.apache.spark.sql.SparkSession, undirected: DataFrame): DataFrame = {
    // per-partition packed [u0,v0,u1,v1,...] chunks: 16 bytes/edge
    val chunks: Array[Array[Long]] = undirected
      .select(col("u"), col("v")).rdd
      .mapPartitions { it =>
        val b = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { r => b += r.getLong(0); b += r.getLong(1) }
        Iterator(b.result())
      }.collect()
    val all = new Array[Long](chunks.iterator.map(_.length).sum)
    var off = 0
    chunks.foreach { c => System.arraycopy(c, 0, all, off, c.length); off += c.length }
    // id compaction: sorted distinct endpoints; index IS the node handle
    val ids = {
      val s = all.clone()
      java.util.Arrays.sort(s)
      var n = 0
      var i = 0
      while (i < s.length) {
        if (n == 0 || s(n - 1) != s(i)) { s(n) = s(i); n += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(s, n)
    }
    val parent = Array.tabulate(ids.length)(identity)
    def find(x0: Int): Int = {
      var r = x0
      while (parent(r) != r) {
        parent(r) = parent(parent(r)) // path halving
        r = parent(r)
      }
      r
    }
    var e = 0
    while (e < all.length) {
      val ru = find(java.util.Arrays.binarySearch(ids, all(e)))
      val rv = find(java.util.Arrays.binarySearch(ids, all(e + 1)))
      // ids is sorted, so union by min INDEX is union by min id — the
      // root stays the component minimum throughout
      if (ru < rv) parent(rv) = ru else if (rv < ru) parent(ru) = rv
      e += 2
    }
    val cluster = new Array[Long](ids.length)
    var i = 0
    while (i < ids.length) { cluster(i) = ids(find(i)); i += 1 }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("cluster", LongType, nullable = false)))
    // ship the two primitive arrays once per executor, not per task
    val bIds = spark.sparkContext.broadcast(ids)
    val bCluster = spark.sparkContext.broadcast(cluster)
    val parts = math.max(1, ids.length / 500000)
    spark.createDataFrame(
      spark.sparkContext.parallelize(0 until ids.length, parts)
        .map(j => Row(bIds.value(j), bCluster.value(j))),
      schema)
  }

  /** Distributed min-label propagation with pointer jumping (the
    * billions-of-edges path).
    */
  private def propagateComponents(edges: DataFrame, maxIter: Int): DataFrame = {
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
      // costs more than the rounds it saves on near-dup graph shapes).
      // Lazy checkpoint + a single count: ONE action both materializes
      // the round's label table (localCheckpoint caches on first use)
      // and decides convergence.
      val next = propagated
        .join(
          propagated.select(col("id").as("lbl"), col("lbl").as("lbl2")),
          Seq("lbl"), "left")
        .select(col("id"), col("old"), coalesce(col("lbl2"), col("lbl")).as("lbl"))
        .localCheckpoint(false)
      converged = next.filter(col("lbl") =!= col("old")).count() == 0L
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
