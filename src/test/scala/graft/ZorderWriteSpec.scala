package graft

import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** x11's loop closed from report to real files (VERDICT r13 #4): write
  * the Z-ordered table via repartitionByRange(z) to Parquet, read each
  * file's FOOTER min/max back through the Parquet metadata API (the
  * statistics a real engine's file pruner consults — not a rescan), and
  * assert the skip ratios the relational report claims: a predicate on
  * EITHER interleaved dim skips most Z files, while the linear
  * (one-dimension sort) write only skips on its own sort key. */
class ZorderWriteSpec extends SparkSuite {

  private val FILES = 16

  /** Per-file (min, max) of `column` from parquet FOOTER statistics. */
  private def footerRanges(dir: String, column: String)
      : Seq[(Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try {
          val stats = r.getFooter.getBlocks.asScala
            .flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == column)
            .map(_.getStatistics)
          assert(stats.nonEmpty, s"no footer stats for $column in $f")
          assert(stats.forall(st => !st.isEmpty && st.hasNonNullValue),
            s"footer stats missing min/max for $column in $f")
          (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long]
              .longValue).min,
            stats.map(_.genericGetMax.asInstanceOf[java.lang.Long]
              .longValue).max)
        } finally r.close()
      }
  }

  /** Fraction of files whose footer [min,max] on `column` misses
    * [lo, hi] — exactly the row-group/file pruning decision. */
  private def skipFraction(dir: String, column: String,
      lo: Long, hi: Long): Double = {
    val ranges = footerRanges(dir, column)
    ranges.count { case (mn, mx) => mx < lo || mn > hi }.toDouble /
      ranges.size
  }

  test("Z-ordered parquet files skip on BOTH dims; linear only on its key") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-zorder-write").toString
    val base = operators.Extended.zOrderedBase(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey", "z")
    base.repartitionByRange(FILES, col("z"))
      .write.mode("overwrite").parquet(s"$out/zorder")
    base.repartitionByRange(FILES, col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$out/linear")

    // mid-domain predicates on each interleaved dim (suppkey 0..9,
    // partkey 0..199 in the driver testdata; read the real bounds so a
    // regenerated fixture can't invalidate the predicate)
    val Array(mxPk, mxSk) = base
      .agg(max("l_partkey"), max("l_suppkey")).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val skKkk = (mxSk / 2, mxSk / 2) // single mid value
    val pkLo = mxPk * 2 / 5
    val pkHi = mxPk * 2 / 5 + mxPk / 20

    val zSkipSk = skipFraction(s"$out/zorder", "l_suppkey",
      skKkk._1, skKkk._2)
    val zSkipPk = skipFraction(s"$out/zorder", "l_partkey", pkLo, pkHi)
    val linSkipSk = skipFraction(s"$out/linear", "l_suppkey",
      skKkk._1, skKkk._2)
    info(s"footer skip: zorder suppkey=$zSkipSk partkey=$zSkipPk " +
      s"linear suppkey=$linSkipSk")
    // Z files carry tight boxes on both dims: most files miss a
    // mid-domain point/range predicate on either dim
    assert(zSkipSk >= 0.5, s"zorder suppkey skip $zSkipSk")
    assert(zSkipPk >= 0.5, s"zorder partkey skip $zSkipPk")
    // the linear write's files each span the whole suppkey domain —
    // nothing skips (the asymmetry the Z rewrite exists to fix)
    assert(linSkipSk <= 0.25, s"linear suppkey skip $linSkipSk")
    assert(zSkipSk > linSkipSk)
  }
}
