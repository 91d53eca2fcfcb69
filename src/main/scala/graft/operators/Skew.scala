package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys at 100 TB.
  *
  * Plain `groupBy().sum()` already does map-side partial aggregation,
  * which absorbs most key skew. Salting matters for the operators that
  * DON'T partial-aggregate — window folds, `collect_list`-style
  * aggregates, and skewed join sides — where one hot key pins a single
  * reducer. (AQE's skew-join split handles the join case at runtime;
  * this utility is the explicit-plan variant, and the two compose.)
  */
object Skew {

  /** Two-phase salted aggregation: spread each key over `salts`
    * sub-keys (deterministic salt from the value hash), partially
    * aggregate, then reduce per key. Exact for associative integer
    * aggregates (all graft money math is int64 cents).
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame =
    df.select(key.as("key"), value.as("v"),
      pmod(hash(value), lit(salts)).as("__salt"))
      .groupBy(col("key"), col("__salt"))
      .agg(sum(col("v")).as("partial"), count(lit(1)).as("n_partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("value"), sum(col("n_partial")).as("n_updates"))

  /** Salted top-k candidate cut for heavily skewed window ranks: per
    * (key, salt) keep the local top-k, then rank the k·salts survivors
    * per key — the hot key's window never exceeds k·salts rows.
    */
  def saltedTopK(
      df: DataFrame, key: Column, order: Column, tiebreak: Column,
      k: Int, salts: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("__salt", pmod(hash(tiebreak), lit(salts)))
    val wLocal = Window.partitionBy(key, col("__salt")).orderBy(order.desc, tiebreak)
    val local = salted
      .withColumn("__lrnk", row_number().over(wLocal))
      .filter(col("__lrnk") <= k)
      .drop("__salt", "__lrnk")
    val wFinal = Window.partitionBy(key).orderBy(order.desc, tiebreak)
    local
      .withColumn("rnk", row_number().over(wFinal).cast("bigint"))
      .filter(col("rnk") <= k)
  }
}
