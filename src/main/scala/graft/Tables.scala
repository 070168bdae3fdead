package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * Parquet carries its own schema in the footer, so no inference pass is
  * needed (SURVEY.md §1.3 — the new engine declares/knows schemas up front;
  * at 100 TB an inference pass over JSON would be a full extra scan).
  * All reads go through `spark.read.parquet` → vectorized reader, column
  * pruning + predicate pushdown handled by Catalyst.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet has shipped `ts` as parquet TIMESTAMP(NANOS) in some
    * testdata generations, which Spark's vectorized reader rejects
    * without the nanosAsLong conf. Graft sessions pin it at build time;
    * for foreign sessions this sets it as a fallback. NOTE: unset and
    * explicitly-false sessions are indistinguishable (conf.getOption
    * returns the registered default "false" either way), so an explicit
    * false is overridden too — the loaders simply cannot work without
    * it, and that trade is documented here. Shared by the batch loader
    * and the streaming reader so the two can't drift. Harmless for
    * micros-typed data (the conf only affects NANOS columns). */
  private[graft] def ensureNanosAsLong(spark: SparkSession): Unit = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.get(key, "false") != "true") spark.conf.set(key, "true")
  }

  /** Normalize an events-shaped frame's `ts` to session-zoned
    * TimestampType (micros), whatever physical type the parquet
    * generation shipped — the testdata generator has produced BOTH
    * TIMESTAMP(NANOS) (read as long under nanosAsLong) and plain
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ):
    *  - long nanos → floor-divide to micros (floor, not
    *    truncate-toward-zero, so pre-1970 values match DuckDB's ns→µs
    *    cast; `(ts - pmod(ts,1000)) div 1000` is exact integer floor
    *    division, immune to double precision loss on 10^18-ns values);
    *  - TIMESTAMP_NTZ → interpret the wall clock AS UTC (the data
    *    contract), zone-independently: a bare cast would reinterpret in
    *    the SESSION zone, which is only correct because graft sessions
    *    pin UTC — a foreign session in another zone would silently
    *    shift every instant (the same foreign-session hazard
    *    ensureNanosAsLong closes for the nanos path).
    *    convert_timezone('UTC', current_timezone(), ts) rewrites the
    *    UTC wall clock to the session zone's wall clock for the SAME
    *    instant, so the subsequent session-zone cast lands on the
    *    UTC-interpreted instant whatever the session zone is (identity
    *    under UTC);
    *  - TIMESTAMP → already the canonical shape. */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts",
          expr("timestamp_micros((ts - pmod(ts, 1000L)) div 1000L)"))
      case TimestampNTZType =>
        df.withColumn("ts",
          expr("CAST(convert_timezone('UTC', current_timezone(), ts) " +
            "AS TIMESTAMP)"))
      case _ => df
    }
  }

  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    ensureNanosAsLong(spark)
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    normalizeEventTs(eventsRaw(s, d))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
