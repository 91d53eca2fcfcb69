package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed tables behind a catalog;
  * reading through `spark.read.parquet` keeps predicate pushdown and
  * column pruning available to every downstream query.
  *
  * The physical encoding of the testdata has drifted between rounds
  * (`events.ts` was parquet TIMESTAMP(NANOS) — readable only as int64
  * under a legacy flag — and later became plain `timestamp[us]`), so the
  * loader normalizes by DISPATCHING ON THE READ TYPE rather than assuming
  * one fixed physical schema, then validates every table against its
  * declared logical schema so any future drift fails loudly at load with
  * the drifted column named, instead of deep inside 36 queries.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Logical column type families the engine relies on downstream. */
  private sealed trait Family {
    def accepts(dt: DataType): Boolean
    def label: String
  }
  private case object Integral extends Family {
    def accepts(dt: DataType): Boolean = dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      case _ => false
    }
    val label = "integral"
  }
  private case object Fractional extends Family {
    def accepts(dt: DataType): Boolean = dt match {
      case _: FloatType | _: DoubleType | _: DecimalType => true
      case _ => false
    }
    val label = "fractional"
  }
  private case object Str extends Family {
    def accepts(dt: DataType): Boolean = dt.isInstanceOf[StringType]
    val label = "string"
  }
  private case object Ts extends Family {
    // After normalizeTimestamps every Ts column must be a wall-clock
    // TimestampType; accepting anything else would silently change
    // window/watermark semantics downstream.
    def accepts(dt: DataType): Boolean = dt.isInstanceOf[TimestampType]
    val label = "timestamp"
  }
  private case object FloatVec extends Family {
    // normalizeVectors runs first, so post-load this must be exactly
    // the array<float> the native kernels require
    def accepts(dt: DataType): Boolean = dt match {
      case ArrayType(_: FloatType, _) => true
      case _ => false
    }
    val label = "array<float>"
  }

  /** The logical schema each table must satisfy after load. */
  private val Expected: Map[String, Seq[(String, Family)]] = Map(
    "region" -> Seq("r_regionkey" -> Integral, "r_name" -> Str),
    "nation" -> Seq(
      "n_nationkey" -> Integral, "n_name" -> Str, "n_regionkey" -> Integral),
    "customer" -> Seq(
      "c_custkey" -> Integral, "c_name" -> Str, "c_nationkey" -> Integral,
      "c_acctbal" -> Fractional, "c_mktsegment" -> Str),
    "supplier" -> Seq(
      "s_suppkey" -> Integral, "s_name" -> Str, "s_nationkey" -> Integral,
      "s_acctbal" -> Fractional),
    "part" -> Seq(
      "p_partkey" -> Integral, "p_name" -> Str, "p_brand" -> Str,
      "p_type" -> Str, "p_size" -> Integral, "p_retailprice" -> Fractional),
    "orders" -> Seq(
      "o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_orderstatus" -> Str, "o_totalprice" -> Fractional,
      "o_orderdate" -> Ts, "o_orderpriority" -> Str),
    "lineitem" -> Seq(
      "l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Fractional, "l_extendedprice" -> Fractional,
      "l_discount" -> Fractional, "l_tax" -> Fractional,
      "l_returnflag" -> Str, "l_linestatus" -> Str, "l_shipdate" -> Ts),
    "events" -> Seq(
      "event_id" -> Integral, "ts" -> Ts, "user_id" -> Integral,
      "event_type" -> Str, "value" -> Fractional, "props" -> Str),
    "documents" -> Seq(
      "doc_id" -> Integral, "text" -> Str, "lang" -> Str,
      "source" -> Str, "n_chars" -> Integral),
    "embeddings" -> Seq(
      "vec_id" -> Integral, "embedding" -> FloatVec, "label" -> Integral))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The NTZ→TimestampType and Date→TimestampType normalizations below
    // are session-timezone-dependent casts; their "value-preserving /
    // midnight UTC" contract (and oracle hash-parity) holds only under
    // a UTC session. Every graft entrypoint pins UTC — a caller that
    // doesn't must hear about it here, not as shifted timestamps later.
    require(spark.sessionState.conf.sessionLocalTimeZone == "UTC",
      "Tables.load requires spark.sql.session.timeZone=UTC (timestamp " +
        "normalization casts are session-timezone-dependent)")
    // Legacy flag so parquet TIMESTAMP(NANOS) files are still readable
    // (as int64) instead of failing the scan; runtime-settable, idempotent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = normalizeVectors(
      normalizeTimestamps(spark.read.parquet(s"$dir/$name.parquet"), name), name)
    validate(df, name)
    df
  }

  /** Bring declared float-vector columns to `array<float>` — the exact
    * type the native kernels (`dot_q`, `cos_q_ge`) require. A
    * regeneration that re-encodes embeddings as `array<double>` would
    * otherwise kill every ANN query at analysis; the original values
    * are float32-generated, so the cast back is lossless.
    */
  private def normalizeVectors(df: DataFrame, name: String): DataFrame =
    Expected.getOrElse(name, Seq.empty).foldLeft(df) {
      case (d, (colName, FloatVec)) if d.columns.contains(colName) =>
        d.schema(colName).dataType match {
          case ArrayType(_: FloatType, _) => d
          case ArrayType(_, _) =>
            d.withColumn(colName, col(colName).cast(ArrayType(FloatType)))
          case _ => d // validate() reports the mismatch loudly
        }
      case (d, _) => d
    }

  /** Bring every declared timestamp column to wall-clock TimestampType,
    * whatever the file's physical encoding was:
    *   - int64 under the legacy-nanos flag → `timestamp_micros(v div 1000)`
    *     (integer `div` keeps the full 63-bit value exact; a double
    *     division would not);
    *   - TIMESTAMP_NTZ (parquet `timestamp[us]`, isAdjustedToUTC=false,
    *     the current testdata) → cast, value-preserving because every
    *     entrypoint pins `spark.sql.session.timeZone=UTC`;
    *   - TimestampType → already right, pass through.
    */
  private def normalizeTimestamps(df: DataFrame, name: String): DataFrame =
    Expected.getOrElse(name, Seq.empty).foldLeft(df) {
      case (d, (colName, Ts)) if d.columns.contains(colName) =>
        d.schema(colName).dataType match {
          case _: LongType =>
            d.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
          case _: TimestampNTZType =>
            d.withColumn(colName, col(colName).cast(TimestampType))
          case _: DateType => // date32 drift: midnight UTC, value-preserving
            d.withColumn(colName, col(colName).cast(TimestampType))
          case _: TimestampType => d
          case other =>
            throw new IllegalStateException(
              s"table '$name' column '$colName': cannot normalize " +
                s"${other.simpleString} to a timestamp — testdata drifted " +
                "beyond the encodings Tables.load knows how to read")
        }
      case (d, _) => d
    }

  /** Fail loudly, naming the drifted column, if a table no longer matches
    * its declared logical schema.
    */
  private def validate(df: DataFrame, name: String): Unit =
    Expected.get(name).foreach { cols =>
      val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
      val problems = cols.flatMap { case (colName, family) =>
        actual.get(colName) match {
          case None =>
            Some(s"missing column '$colName' (expected ${family.label})")
          case Some(dt) if !family.accepts(dt) =>
            Some(s"column '$colName' read as ${dt.simpleString}, " +
              s"expected ${family.label}")
          case _ => None
        }
      }
      if (problems.nonEmpty)
        throw new IllegalStateException(
          s"testdata drift in table '$name': ${problems.mkString("; ")}")
    }
}
