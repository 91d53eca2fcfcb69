package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables: the co-located-join lever at
  * 100 TB. Writing both join sides bucketed+sorted on the join key
  * lets Spark's bucketed scan satisfy the join's distribution
  * requirement from disk layout — the join runs with NO shuffle on
  * either side (the `BucketingSpec` asserts the plan has no Exchange).
  *
  * Rule of thumb at scale: bucket the big fact tables on their
  * highest-fan-in join key (orderkey for lineitem/orders), bucket
  * count sized so a bucket ~ one task's memory (128-256 MB).
  */
object Bucketing {

  /** Drop a bucketed managed table AND its leftover warehouse
    * directory. A fresh session starts with an empty in-memory catalog
    * but inherits the warehouse dir on disk, so a managed-table write
    * that survived a previous session fails with
    * LOCATION_ALREADY_EXISTS unless the orphaned location is cleared.
    *
    * The location comes from the CATALOG when the table exists (works
    * for any database/warehouse layout); only an orphan — on-disk dir
    * with no catalog entry — falls back to deriving
    * `<database location>/<table>`, with an optional `db.table`
    * qualifier handled instead of silently mis-pathing.
    */
  def dropBucketed(spark: SparkSession, table: String): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val fromCatalog: Option[java.net.URI] =
      if (catalog.tableExists(ident)) Some(catalog.getTableMetadata(ident).location)
      else None
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc: java.net.URI = fromCatalog.getOrElse {
      val db = ident.database.getOrElse(catalog.getCurrentDatabase)
      val dbLoc = catalog.getDatabaseMetadata(db).locationUri
      new java.net.URI(
        dbLoc.toString.stripSuffix("/") + "/" + ident.table.toLowerCase)
    }
    // local-filesystem warehouses only (this build's only layout);
    // leave non-file locations to the catalog's own DROP handling
    if (loc.getScheme == null || loc.getScheme == "file") {
      val dir = new java.io.File(
        if (loc.getScheme == null) new java.io.File(loc.toString).getPath
        else java.nio.file.Paths.get(loc).toString)
      if (dir.exists()) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir.toPath).iterator().asScala.toSeq
          .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  /** Persist `df` as a bucketed+sorted managed table (replacing any
    * previous incarnation, catalog or orphaned on-disk).
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    dropBucketed(df.sparkSession, table)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — shuffle-free when
    * bucket counts match.
    */
  def bucketedJoin(
      spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Same, when the two sides name their bucket key differently. The
    * join condition is bound to the SAME Dataset instances being
    * joined — binding it to fresh `spark.table(...)` lookups only
    * resolves while the relation cache hands both analyses identical
    * expression ids, a fragile invariant.
    */
  def bucketedJoin(
      spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
