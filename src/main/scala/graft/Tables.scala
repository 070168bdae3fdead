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

  /** events.parquet carries `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects unless spark.sql.legacy.parquet.nanosAsLong
    * is set. Graft sessions pin it at construction (Verify, Bench, test
    * fixtures); on a foreign session that left it UNSET this loader sets
    * it once as a fallback — a deliberate session mutation, preferred
    * over failing every events query (a session that explicitly set it
    * to "false" is respected... by failing the read, loudly). The long
    * nanos are floor-divided to micros (floor, not truncate-toward-zero,
    * so pre-1970 timestamps would also match DuckDB's ns→µs cast;
    * `(ts - pmod(ts,1000)) div 1000` is exact integer floor division,
    * immune to double precision loss on 10^18-ns values).
    */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.getOption(key).isEmpty) spark.conf.set(key, "true")
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
    import org.apache.spark.sql.functions.{col, expr}
    eventsRaw(s, d)
      .withColumn("ts", expr("timestamp_micros((ts - pmod(ts, 1000L)) div 1000L)"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
