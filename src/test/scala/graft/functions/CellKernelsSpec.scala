package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The cell-assignment kernels must be VALUE-IDENTICAL to the
  * declarative spellings they replaced: the per-cell inlined
  * `dot_q(vec, lit(centroid))` struct sort (IVF) and the broadcast-
  * join grouped argmax (PQ). Ties are the dangerous part — both
  * conventions resolve equal scores to the LARGEST cell id — so the
  * fixtures plant duplicate centroids.
  */
class CellKernelsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic small codebook: 7 cells of 8 dims in milli units;
  // cells 2 and 5 are IDENTICAL (every vector ties between them)
  private val dim = 8
  private val cellVecs: Array[Array[Long]] = Array.tabulate(7) { c =>
    val base = if (c == 5) 2 else c
    Array.tabulate(dim)(p => ((base * 31 + p * 17) % 41 - 20).toLong * 10)
  }
  private val cellIds: Array[Long] = Array.tabulate(7)(_.toLong)
  private val norms: Array[Long] = cellVecs.map(_.map(x => x * x).sum)

  private def vecs = spark.range(40).toDF("id")
    .withColumn("v", transform(sequence(lit(0), lit(dim - 1)),
      p => (((pmod(hash(col("id"), p), lit(2001)) - 1000).cast("float") / 1000f).cast("float"))))

  /** The literal spelling: per-cell dot_q against a float literal
    * (exactly `Similarity.cellScores`), struct-sorted descending.
    */
  private def literalTop(vec: Column, c: Int): Column = {
    val scores = array(cellIds.indices.map { j =>
      struct(
        (Bridge.dotQ(vec, lit(cellVecs(j).map(_ / 1000f))) * 2
          - lit(norms(j))).as("score"),
        lit(cellIds(j)).as("cell"))
    }: _*)
    slice(reverse(array_sort(scores)), 1, c).getField("cell")
  }

  private object Bridge {
    def dotQ(a: Column, b: Column): Column =
      org.apache.spark.sql.graftbridge.Bridge.column(
        QuantizedDot(
          org.apache.spark.sql.graftbridge.Bridge.expression(a),
          org.apache.spark.sql.graftbridge.Bridge.expression(b)))
  }

  test("TopCells == literal struct sort for every c, ties to the largest cell") {
    for (c <- Seq(1, 2, 3, 7)) {
      val bad = vecs.select(
        TopCells(col("v"), cellIds, cellVecs, norms, c).as("kernel"),
        literalTop(col("v"), c).as("literal"))
        .filter(col("kernel") =!= col("literal"))
        .count()
      assert(bad == 0L, s"kernel/literal divergence at c=$c")
    }
  }

  test("TopCells resolves the planted tie to cell 5, never cell 2") {
    val firsts = vecs.select(
      TopCells(col("v"), cellIds, cellVecs, norms, 7).as("cells"))
      .select(array_position(col("cells"), 2L).as("p2"),
        array_position(col("cells"), 5L).as("p5"))
      .as[(Long, Long)].collect()
    firsts.foreach { case (p2, p5) =>
      assert(p5 < p2, "equal scores must rank the larger cell id first")
    }
  }

  test("PqAssign == per-subspace broadcast-join argmax (the old spelling)") {
    val m = 4
    val subDim = 2
    // per-sub codebooks: 3 codewords of 2 dims; sub 1 has two identical
    // codewords (ids 0 and 2) so every row ties
    val ids = Array.tabulate(m)(_ => Array(0L, 1L, 2L))
    val cw = Array.tabulate(m) { sub =>
      Array.tabulate(3) { c =>
        val base = if (sub == 1 && c == 2) 0 else c
        Array.tabulate(subDim)(p => ((sub * 7 + base * 13 + p * 5) % 21 - 10).toLong * 100)
      }
    }
    val nrm = cw.map(_.map(_.map(x => x * x).sum))
    val data = spark.range(30).toDF("id")
      .withColumn("v", transform(sequence(lit(0), lit(m * subDim - 1)),
        p => (((pmod(hash(col("id"), p, lit(7)), lit(2001)) - 1000).cast("float") / 1000f).cast("float"))))
    val kernel = data.select(col("id"),
      posexplode(PqAssign(col("v"), m, subDim, ids, cw, nrm)).as(Seq("sub", "cell")))
    // reference: explode subvectors, cross with codeword literals,
    // grouped max(struct(score, cell)) — the old pqEncodeWith shape
    val cwRows = (0 until m).flatMap(sub => (0 until 3).map(c =>
      (sub, ids(sub)(c), cw(sub)(c).toSeq, nrm(sub)(c))))
      .toDF("sub", "cell", "cvec", "nrm")
    val reference = data
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        graft.operators.Similarity.quantize(col("v")).as("qm"))
      .select(col("id"), col("sub"),
        slice(col("qm"), col("sub") * subDim + 1, lit(subDim)).as("qsub"))
      .join(broadcast(cwRows), Seq("sub"))
      .withColumn("score",
        aggregate(zip_with(col("qsub"), col("cvec"), (a, b) => a * b),
          lit(0L), (a, x) => a + x) * 2 - col("nrm"))
      .groupBy(col("id"), col("sub"))
      .agg(max(struct(col("score"), col("cell"))).getField("cell").as("ref_cell"))
    val bad = kernel.join(reference, Seq("id", "sub"))
      .filter(col("cell") =!= col("ref_cell")).count()
    assert(bad == 0L)
  }

  test("PqNearestCell agrees with PqAssign on the same codebook") {
    val m = 4
    val subDim = 2
    val ids = Array.tabulate(m)(_ => Array(0L, 1L, 2L))
    val cw = Array.tabulate(m) { sub =>
      Array.tabulate(3) { c =>
        Array.tabulate(subDim)(p => ((sub * 7 + c * 13 + p * 5) % 21 - 10).toLong * 100)
      }
    }
    val nrm = cw.map(_.map(_.map(x => x * x).sum))
    val data = spark.range(30).toDF("id")
      .withColumn("v", transform(sequence(lit(0), lit(m * subDim - 1)),
        p => (((pmod(hash(col("id"), p, lit(9)), lit(2001)) - 1000).cast("float") / 1000f).cast("float"))))
    val viaAssign = data.select(col("id"),
      posexplode(PqAssign(col("v"), m, subDim, ids, cw, nrm)).as(Seq("sub", "cell")))
    val viaNearest = data
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        graft.operators.Similarity.quantize(col("v")).as("qm"))
      .select(col("id"), col("sub"),
        slice(col("qm"), col("sub") * subDim + 1, lit(subDim)).as("qsub"))
      .select(col("id"), col("sub"),
        PqNearestCell(col("qsub"), col("sub"), ids, cw, nrm).as("n_cell"))
    val bad = viaAssign.join(viaNearest, Seq("id", "sub"))
      .filter(col("cell") =!= col("n_cell")).count()
    assert(bad == 0L)
  }
}
