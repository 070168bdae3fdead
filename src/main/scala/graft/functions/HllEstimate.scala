package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst AGGREGATE: HyperLogLog cardinality estimate over a
  * 60-bit `Portable.h60` hash column — the mergeable-state counterpart
  * of a9's relational register table, and the §2.11 demonstration that
  * the custom-expression surface covers aggregation, not just scalars.
  *
  * Semantics are BIT-IDENTICAL to a9_hll_distinct's relational pipeline
  * (and therefore to its DuckDB oracle): p=8 → 256 registers, index =
  * h div 2^52, rank = 53 - bitlength(h mod 2^52) (0 for an untouched
  * register, 53 for a zero suffix), harmonic mean accumulated as the
  * EXACT integer Σ 2^(53-rho_j), one double division by the shared
  * alpha·m²·2^53 literal, the m·ln(m/V) linear-counting branch below
  * 2.5m, and a final HALF_UP round to 4dp via the same
  * shortest-decimal-string BigDecimal Spark's `round` uses. a9 keeps
  * both forms honest: the spec and the a9b query assert the native
  * estimate equals the relational one per group.
  *
  * Why it exists when a9 already passes: state. The relational form
  * shuffles one (group, idx, rho) row per TOUCHED register; this
  * aggregate carries a fixed 256-BYTE buffer through
  * ObjectHashAggregate's partial/merge path — map-side combine reduces
  * each partition's contribution to one buffer per group regardless of
  * row count, which at 100 TB is the difference between a sketch and a
  * shuffle. merge() is element-wise max, so the same buffers serve
  * cluster-wide rollups and streaming state (StreamingJobs keeps the
  * register table; this is its batch-side twin).
  */
case class HllEstimate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  import HllEstimate._

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_estimate"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = (h / WMASK).toInt // h is 60-bit non-negative by contract
      val w = h % WMASK
      // bitlength(w) = 64 - nlz(w); w < 2^52 so rho ∈ [1, 53] — an
      // untouched register's 0 is unambiguous
      val rho =
        (if (w == 0L) 53
         else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
      if (rho > buf(idx)) buf(idx) = rho
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    var z = 0L // Σ 2^(53-rho) ≤ 256·2^53 < 2^62: exact in BIGINT
    var vZero = 0
    var i = 0
    while (i < M) {
      val r = buf(i)
      z += 1L << (53 - r)
      if (r == 0) vZero += 1
      i += 1
    }
    val raw = NUMC / z
    val est =
      if (raw <= 2.5 * M && vZero > 0) M.toDouble * math.log(M.toDouble / vZero)
      else raw
    // Spark round(x, 4): HALF_UP over the shortest decimal string
    java.math.BigDecimal.valueOf(est)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

object HllEstimate {
  // MUST mirror LlmOps' HLL_P/HLL_M/HLL_WMASK/HLL_NUMC (a9) and
  // StreamingJobs' register derivation — HllAggSpec and a9b's oracle
  // pin the sync.
  val P = 8
  val M: Int = 1 << P
  val WMASK: Long = 1L << (60 - P)
  val NUMC: Double = 0.7213 / (1 + 1.079 / M) * M * M * math.pow(2, 53)

  /** FunctionRegistry entry, injected by [[graft.GraftExtensions]];
    * usable from SQL / expr() as `hll_estimate(h60col)`. */
  val description: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("hll_estimate"),
    new ExpressionInfo(classOf[HllEstimate].getName, "hll_estimate"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "hll_estimate takes exactly 1 argument")
      HllEstimate(exprs.head)
    })
}
