package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("bucket id is monotone and its bounds always contain the value") {
    val vals = Seq(Long.MinValue + 1, -1000001L, -999999L, -16L, -15L, -1L,
      0L, 1L, 7L, 8L, 15L, 16L, 17L, 31L, 32L, 255L, 256L,
      999999L, 1000000L, 123456789L, (1L << 52) + 12345L)
    val df = vals.toDF("v")
    val rows = df.select(col("v"),
      Quantiles.bucketId(col("v")).as("id"))
      .select(col("v"), col("id"),
        Quantiles.bucketLo(col("id")).as("lo"),
        Quantiles.bucketHi(col("id")).as("hi"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    rows.foreach { case (v, _, lo, hi) =>
      assert(lo <= v && v <= hi, s"value $v outside [$lo, $hi]")
    }
    // monotone: sorted values have non-decreasing ids
    rows.sliding(2).foreach {
      case Array((v1, id1, _, _), (v2, id2, _, _)) =>
        assert(id1 <= id2, s"id($v1)=$id1 > id($v2)=$id2")
      case _ =>
    }
    // sub-bucket width is <= lo/8 beyond the exact range: 2^-3 relative
    rows.filter(r => math.abs(r._1) > 15).foreach { case (v, _, lo, hi) =>
      val width = hi - lo
      assert(width <= math.max(math.abs(lo), math.abs(hi)) / 8.0,
        s"bucket [$lo,$hi] of $v wider than 12.5%")
    }
  }

  test("quantile bounds bracket the exact discrete percentile per group") {
    val events = spark.read.parquet(s"$Sf0001/events.parquet")
    val out = Quantiles.quantiles(events, col("event_type"), col("value"),
      permille = Seq(500, 900, 990))
      .select(col("grp"), col("q_permille"), col("lo_micro"), col("hi_micro"))
      .as[(String, Long, Long, Long)].collect()
    val exact = events.select(col("event_type"),
      round(col("value") * 1000000).cast("bigint").as("vm"))
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    out.foreach { case (g, q, lo, hi) =>
      val vs = exact(g)
      val rank = ((q * vs.length + 999) / 1000).toInt // ceil, positive
      val ex = vs(rank - 1)
      assert(lo <= ex && ex <= hi,
        s"$g p$q: exact $ex outside sketch bucket [$lo, $hi]")
    }
  }

  test("sketches merge by addition: sketch(A union B) == sketch(A) + sketch(B)") {
    val a = spark.range(0, 500).select((col("id") * 37 % 9973).cast("double").as("v"))
    val b = spark.range(500, 900).select((col("id") * 91 % 4999).cast("double").as("v"))
    val merged = Quantiles.sketch(a.union(b), lit("g"), col("v"))
    val added = Quantiles.sketch(a, lit("g"), col("v"))
      .unionByName(Quantiles.sketch(b, lit("g"), col("v")))
      .groupBy("grp", "bucket_id").agg(sum("cnt").as("cnt"))
    assert(merged.exceptAll(added).isEmpty && added.exceptAll(merged).isEmpty)
  }

  test("sketch is model-sized: far fewer buckets than values") {
    val v = spark.range(100000).select((col("id") % 50000).cast("double").as("v"))
    val n = Quantiles.sketch(v, lit("g"), col("v")).count()
    assert(n < 2000, s"sketch has $n buckets")
  }

  test("percentileStats: exact percentile() parity at fixture scale — " +
    "exact median/p90 inside the sketch bounds") {
    val events = spark.read.parquet(s"$Sf0001/events.parquet")
    val got = Quantiles.percentileStats(events, col("event_type"), col("value"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // the exact spelling this operator replaces, kept here as the
    // fixture-scale parity oracle (discrete exact percentile)
    val exact = events.select(col("event_type"),
      round(col("value") * 1000000).cast("bigint").as("vm"))
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    assert(got.nonEmpty)
    got.foreach { case (g, n, medLo, medHi, p90Lo, p90Hi) =>
      val vs = exact(g)
      assert(n == vs.length)
      val med = vs((((500L * n + 999) / 1000) - 1).toInt)
      val p90 = vs((((900L * n + 999) / 1000) - 1).toInt)
      assert(medLo <= med && med <= medHi, s"$g median $med outside [$medLo,$medHi]")
      assert(p90Lo <= p90 && p90 <= p90Hi, s"$g p90 $p90 outside [$p90Lo,$p90Hi]")
    }
  }

  test("percentileStats plan has no exact Percentile aggregate (the " +
    "per-group value-map buffer this spelling removes)") {
    val events = spark.read.parquet(s"$Sf0001/events.parquet")
    val plans = Seq(
      Quantiles.percentileStats(events, col("event_type"), col("value")),
      Quantiles.outliersMad(events, col("event_type"),
        round(col("value") * 1000000).cast("bigint"), cut = 5L))
      .map(_.queryExecution.executedPlan.toString)
    plans.foreach { p =>
      assert(!p.contains("percentile("), s"exact percentile in plan:\n$p")
    }
  }

  test("outliersMad (sketch): planted far outliers flagged, tight cluster not; " +
    "deterministic across partitionings") {
    // 200 inliers in [100, 102) and 3 planted outliers at 1e6 —
    // dev(outlier) >> 5·MAD for any in-bucket median representative
    val inliers = spark.range(200)
      .select(lit("g").as("grp"), (lit(100.0) + col("id") / 100.0).as("v"))
    val outs = Seq(1000000.0, 1000001.0, -999999.0).toDF("v")
      .select(lit("g").as("grp"), col("v"))
    val df = inliers.unionByName(outs)
    def run(parts: Int) = Quantiles.outliersMad(
        df.repartition(parts), col("grp"),
        round(col("v") * 1000000).cast("bigint"), cut = 5L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val r1 = run(1)
    assert(r1 == run(7), "result depends on partitioning")
    val (_, n, _, _, nOut, lo, hi) = r1.head
    assert(n == 203 && nOut == 3, s"expected 3 outliers of 203, got $nOut of $n")
    assert(lo == -999999000000L && hi == 1000001000000L)
  }
}
