package graft.tools

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage a larger scale factor from an existing driver-generated one by
  * DETERMINISTIC replication: `factor` decorrelated copies of every
  * fact table, key domains shifted per replica so every intra-replica
  * relationship (joins, duplicate clusters, near-dup pairs, account
  * histories) is preserved exactly while nothing correlates ACROSS
  * replicas:
  *
  *  - TPC-H keys shift by replica × (max(key)+1) of the key's OWNING
  *    table, so foreign keys stay consistent within a replica;
  *  - `documents.text` gets every token suffixed with `~r` (r > 0) — a
  *    per-replica token bijection: shingle/minhash/simhash structure
  *    inside a replica is untouched, across replicas nothing matches
  *    (keeping the originals verbatim would make every doc a 10-way
  *    exact duplicate — a degenerate dedup corpus);
  *  - `embeddings.embedding` rotates components by 7·r (mod dim): norms
  *    and within-replica similarity are exactly preserved (one global
  *    permutation), cross-replica cosine decorrelates;
  *  - `doc_id`/`vec_id` shift by ONE shared delta (they join in the
  *    curation pipeline);
  *  - `region`/`nation` stay single-copy (dimensions).
  *
  * Timestamps are written back as TIMESTAMP_NTZ to match the driver's
  * encoding (Tables.load + the DuckDB oracle read both the same way).
  *
  * Run: `sbt "runMain graft.tools.StageScale <baseDir> <outDir> [factor]"`
  * e.g.   StageScale /root/testdata/sf0.1 /root/repo/testdata-sf1 10
  */
object StageScale {
  def main(args: Array[String]): Unit = {
    val base = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.local.dir", graft.LocalDir.scratch)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def maxOf(name: String, c: String): Long =
      Tables.load(spark, base, name).agg(max(col(c))).head().getLong(0)

    val custD = maxOf("customer", "c_custkey") + 1
    val ordD = maxOf("orders", "o_orderkey") + 1
    val partD = maxOf("part", "p_partkey") + 1
    val suppD = maxOf("supplier", "s_suppkey") + 1
    val evD = maxOf("events", "event_id") + 1
    val userD = maxOf("events", "user_id") + 1
    // documents and embeddings share an id domain (curation joins
    // em.vec_id = doc_id) — one delta keeps the linkage per replica
    val docD = math.max(maxOf("documents", "doc_id"), maxOf("embeddings", "vec_id")) + 1

    val reps = spark.range(factor).select(col("id").cast("int").as("__r"))

    def replicate(name: String)(transform: (DataFrame, org.apache.spark.sql.Column) => DataFrame): Unit = {
      val df = Tables.load(spark, base, name)
      val outDf = transform(df.crossJoin(broadcast(reps)), col("__r")).drop("__r")
      // NTZ write: the driver's testdata encoding, so Tables.load and
      // the DuckDB oracle see the staged set exactly like the original
      val ntz = outDf.schema.fields.foldLeft(outDf) { (d, f) =>
        if (f.dataType.typeName == "timestamp")
          d.withColumn(f.name, col(f.name).cast("timestamp_ntz"))
        else d
      }
      ntz.repartition(8).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[stage-scale] $name -> ${factor}x")
    }

    def shift(c: String, delta: Long)(df: DataFrame, r: org.apache.spark.sql.Column): DataFrame =
      df.withColumn(c, col(c) + r.cast("bigint") * delta)

    replicate("region")((d, _) => d.filter(col("__r") === 0))
    replicate("nation")((d, _) => d.filter(col("__r") === 0))
    replicate("customer")(shift("c_custkey", custD))
    replicate("supplier")(shift("s_suppkey", suppD))
    replicate("part")(shift("p_partkey", partD))
    replicate("orders") { (d, r) =>
      shift("o_custkey", custD)(shift("o_orderkey", ordD)(d, r), r)
    }
    replicate("lineitem") { (d, r) =>
      shift("l_suppkey", suppD)(
        shift("l_partkey", partD)(shift("l_orderkey", ordD)(d, r), r), r)
    }
    replicate("events") { (d, r) =>
      shift("user_id", userD)(shift("event_id", evD)(d, r), r)
    }
    replicate("documents") { (d, r) =>
      val suffixed = array_join(
        transform(split(trim(col("text")), "\\s+"),
          t => concat(t, lit("~"), r.cast("string"))), " ")
      shift("doc_id", docD)(d, r)
        .withColumn("text", when(r === 0, col("text")).otherwise(suffixed))
        .withColumn("n_chars", length(col("text")).cast("bigint"))
    }
    replicate("embeddings") { (d, r) =>
      val dim = 64
      val k = (r * 7) % dim
      val rotated = concat(
        slice(col("embedding"), k + 1, lit(dim) - k),
        slice(col("embedding"), lit(1), k))
      shift("vec_id", docD)(d, r)
        .withColumn("embedding",
          when(r === 0, col("embedding")).otherwise(rotated))
    }
    println(s"[stage-scale] staged ${factor}x of $base at $out")
    spark.stop()
  }
}
