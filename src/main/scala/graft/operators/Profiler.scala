package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass dataset profiler — the data-quality step of a training
  * pipeline: per-column null counts, HLL++ distinct estimates, and
  * min/max, computed as a SINGLE aggregation over the table (one scan,
  * one reduce, no matter how many columns) and then unpivoted. At
  * 100 TB the one-scan property is the whole point.
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields
    val aggs: Seq[Column] = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        approx_count_distinct(c).as(s"${f.name}__distinct"),
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"))
    }.toSeq
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map { f =>
      struct(
        lit(f.name).as("column"),
        lit(f.dataType.simpleString).as("type"),
        col("__n").as("n_rows"),
        col(s"${f.name}__nulls").as("n_nulls"),
        col(s"${f.name}__distinct").as("approx_distinct"),
        col(s"${f.name}__min").as("min_value"),
        col(s"${f.name}__max").as("max_value"))
    }
    one
      .select(explode(array(entries.toIndexedSeq: _*)).as("p"))
      .select("p.*")
  }
}
