package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming restatements of the batch event-time windows
  * (SURVEY §2.10). The reference ingests incrementally with
  * file-existence checkpoints (fitbit_utils.py:213-232); the Spark-native
  * form is readStream → watermark → window agg → writeStream with a
  * checkpoint dir, which gives exactly-once incremental loads for free.
  *
  * These transforms take the streaming DataFrame as input (readStream on
  * a source dir, or MemoryStream in tests — see StreamingSpec) so the
  * logic is source-agnostic and unit-testable. The expressions are the
  * SAME ones the batch queries w1/w3 use: one definition of the
  * semantics, two execution modes.
  */
object StreamingJobs {

  /** File-source stream over an events-shaped parquet directory — the
    * readStream twin of Tables.events (same nanos→micros conversion;
    * streaming sources need an explicit schema: no inference pass). New
    * files landing in `dir` become micro-batches; with a checkpoint dir
    * on the sink this is the exactly-once version of the reference's
    * skip-if-exists incremental load. */
  def eventsFileStream(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    // a declared BIGINT ts over a TIMESTAMP(NANOS) parquet column
    // needs the same conf fallbacks as the batch loader; NTZ micros
    // files likewise read verbatim as UTC-instant TimestampType
    graft.Tables.ensureNanosAsLong(spark)
    graft.Tables.ensureNtzReadAsUtc(spark)
    // Streaming sources need an explicit schema (no inference pass per
    // micro-batch); take it from one batch footer read so the stream
    // tracks whichever physical ts type this events generation shipped
    // (long nanos vs TIMESTAMP_NTZ micros), then normalize identically
    // to the batch loader. CONTRACT: one landing dir = one generation —
    // the schema freezes at stream definition, so producers that drift
    // the physical type must land in a NEW dir, streamed separately and
    // unioned (the cross-generation StreamingSpec shape). An EMPTY dir
    // (stream bootstrapped before the first producer file) can't be
    // footer-read; it starts on the modern-generation schema
    // (TIMESTAMP_NTZ micros) rather than failing the bootstrap.
    // Empty-dir detection keys on the stable error CLASS, not message
    // wording (which drifts across Spark versions/locales — r11
    // advice), with the message substring kept as a belt-and-braces
    // fallback for builds predating error classes. A NONEXISTENT dir
    // throws PATH_NOT_FOUND, which deliberately escapes this catch:
    // a landing dir is part of the pipeline contract and a typo'd path
    // should fail the bootstrap loudly, not start an empty stream.
    val fileSchema =
      try spark.read.parquet(dir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" ||
              String.valueOf(e.getMessage).contains("infer schema") =>
          org.apache.spark.sql.types.StructType.fromDDL(
            "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, " +
              "event_type STRING, value DOUBLE, props STRING")
      }
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(fileSchema).parquet(dir))
  }

  /** Tumbling 5-minute per-type counts with a 30-minute watermark: state
    * for windows older than the watermark is evicted, so state size is
    * bounded by (types × windows-in-30min), not by stream length. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-user session windows (10-minute gap), streaming form. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("n"))

  /** Watermarked STREAM-STREAM interval join — the one Structured
    * Streaming join mode the suite's other jobs don't exercise (every
    * other streaming join here is stream-static with a broadcast
    * dimension). Each probe event matches the candidate events of the
    * SAME user landing in [probe.ts, probe.ts + 10 minutes): the
    * streaming twin of x6's batch interval join. Both sides carry
    * watermarks and the join condition bounds candidate time from BOTH
    * directions, which is exactly what lets Spark evict buffered rows:
    * a candidate older than (probe watermark) can never match a future
    * probe, so join state is O(events-in-window) per side, not
    * O(stream). Inner join → results append as matches arrive; no
    * watermark wait for completeness within a micro-batch.
    */
  def streamStreamIntervalJoin(
      probes: DataFrame, cands: DataFrame): DataFrame = {
    val l = probes
      .select(col("event_id").as("probe_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "30 minutes")
    val r = cands
      .select(col("event_id").as("cand_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"), col("value"))
      .withWatermark("c_ts", "30 minutes")
    l.join(r,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") &&
        col("c_ts") < col("p_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("probe_id"), col("cand_id"), col("user_id"),
        col("p_ts"), col("c_ts"), col("value"))
  }

  /** Streaming exact dedup — the streaming twin of the d1 batch dedup,
    * keyed on event_id ALONE (a redelivered event with a jittered
    * ingestion timestamp still dedups); the watermark bounds state to
    * the window, so state is O(events-in-window), not O(stream). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Running per-user event totals carried in explicit GroupState —
    * the custom-state escape hatch (`flatMapGroupsWithState`) for
    * semantics the built-in window aggregations can't express. State is
    * one Long per user; each micro-batch emits the updated totals for
    * the users it touched (Update mode). */
  final case class UserTotal(user_id: Long, total: Long)
  def runningUserTotals(
      spark: org.apache.spark.sql.SparkSession,
      events: DataFrame): org.apache.spark.sql.Dataset[UserTotal] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    events.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) => {
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          Iterator(UserTotal(user, total))
        })
  }

  /** File-source stream over a directory of stream-row parquet shards —
    * the readStream twin of e3's lineitem-derived `streams` frame. Each
    * shard landing in `dir` is one fetched activity batch; with a
    * checkpointed sink the pipeline is the exactly-once version of the
    * reference's cached-file reuse. */
  def streamShards(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("activity_id BIGINT, time BIGINT, distance DOUBLE")
      .parquet(dir)

  /** The e3 Strava streams composition as a STREAMING job: the same
    * cached ∪ fresh split (stream-static left-semi joins against the
    * id dimension), the same union, the same metadata enrich join —
    * only the execution mode changes. The static side is broadcast, so
    * each micro-batch is one narrow pass over its new shard; writeStream
    * with a checkpoint dir to a parquet sink makes the whole pipeline
    * restart-resumable with exactly-once file handling (StreamingSpec
    * proves a shard landing during downtime is neither lost nor
    * duplicated). */
  def streamsPipeline(stream: DataFrame, activities: DataFrame): DataFrame = {
    val ids = activities.select(col("activity_id")).distinct()
    val cachedIds = ids.filter(col("activity_id") % 4 === 0)
    val freshIds = ids.join(cachedIds, Seq("activity_id"), "left_anti")
    val cached = stream
      .join(broadcast(cachedIds), Seq("activity_id"), "left_semi")
      .withColumn("src", lit("cached"))
    val fresh = stream
      .join(broadcast(freshIds), Seq("activity_id"), "left_semi")
      .withColumn("src", lit("fetched"))
    cached.unionByName(fresh)
      .join(broadcast(activities), Seq("activity_id"))
  }

  /** Streaming maintenance of a9's HyperLogLog registers: per-stratum
    * state is the FIXED 256-int register array, each micro-batch folds
    * its hashes in by max, and the emitted rows are the non-zero
    * registers after the batch. Because registers only ever grow, the
    * final streaming state equals the batch-computed register table
    * EXACTLY (StreamingSpec proves it) — so a 100 TB backfill sketched
    * in batch and a live stream sketched here are one mergeable,
    * interchangeable artifact. State per stratum is 1 KB, independent
    * of stream length — the sketch property doing the state bounding. */
  /** Streaming maintenance of t12's count-min sketch: per-depth state is
    * the FIXED 64-long counter row, each micro-batch ADDS its bucket
    * hits in, and the emitted rows are the non-zero cells after the
    * batch. Count-min is add-mergeable (cells sum across partitions,
    * days, or a batch backfill and a live stream), so the streaming
    * state converges to the batch sketch CELL FOR CELL (StreamingSpec
    * proves it) — the second leg, beside the HLL registers, of "one
    * sketch artifact, two execution modes". State per depth is 512
    * bytes, independent of stream length. */
  final case class CmCell(depth: Int, bucket: Int, cnt: Long)
  def streamingCountminCells(
      spark: org.apache.spark.sql.SparkSession,
      cells: DataFrame): org.apache.spark.sql.Dataset[CmCell] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val W = graft.operators.LlmOps.CM_W
    cells.select(col("depth").cast("int"), col("bucket").cast("int"))
      .as[(Int, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (depth: Int, rows: Iterator[(Int, Int)],
            state: GroupState[Array[Long]]) => {
          val regs = state.getOption.getOrElse(new Array[Long](W))
          rows.foreach { case (_, b) => regs(b) += 1L }
          state.update(regs)
          regs.iterator.zipWithIndex.collect {
            case (c, i) if c > 0 => CmCell(depth, i, c)
          }
        })
  }

  final case class HllRegister(lang: String, idx: Int, m_rho: Int)
  def streamingHllRegisters(
      spark: org.apache.spark.sql.SparkSession,
      hashed: DataFrame): org.apache.spark.sql.Dataset[HllRegister] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val W = 52 // suffix bits of the 60-bit h60 (p = 8 index bits)
    hashed.select(col("lang"), col("h")).as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (lang: String, rows: Iterator[(String, Long)],
            state: GroupState[Array[Int]]) => {
          val regs = state.getOption.getOrElse(new Array[Int](1 << (60 - W)))
          rows.foreach { case (_, h) =>
            val idx = (h >>> W).toInt
            val w = h & ((1L << W) - 1)
            // rho = 53 - bitlength(w); bin-length parity with the batch
            // form's length(bin(w)) = 64 - numberOfLeadingZeros(w)
            val rho =
              if (w == 0L) W + 1
              else W + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
            if (rho > regs(idx)) regs(idx) = rho
          }
          state.update(regs)
          regs.iterator.zipWithIndex.collect {
            case (m, i) if m > 0 => HllRegister(lang, i, m)
          }
        })
  }

  /** One-pass, bounded-memory min-owner election inside a
    * flatMapGroupsWithState group (ADVICE r15 #4 — the rows.toSeq form
    * buffered the WHOLE group, unbounded for a hot fingerprint, and its
    * first-arrival election matched the batch min(doc_id) election only
    * under id-ordered delivery).
    *
    * The owner candidate starts at the standing state owner (or +inf)
    * and only ever DECREASES as rows stream past, so at group end it is
    * min(state, min(batch ids)) whatever order the iterator delivered —
    * the within-batch election is now order-independent, and a
    * reordered multi-batch stream converges state to the true min owner.
    *
    * Cross-batch contract (ADVICE r16 #1): at most ONE kept owner per
    * key, EVER. If the state already existed at batch start, a prior
    * batch already emitted this key's kept row (Append mode cannot
    * retract it), so this batch's final pending rows route as dups even
    * when they lowered the candidate — the state still converges to the
    * true min so the standing table records the right owner; only the
    * first batch to see the key emits keptStatus. StreamingSpec pins
    * this with an out-of-order multi-batch fixture (a later batch
    * delivering both a smaller id and an exact redelivery of the owner).
    * Memory: history rows and rows strictly above the candidate route
    * immediately; only rows TIED to the running minimum are held (at
    * most one document's repeats of the key), flushed as dups the
    * moment a smaller id displaces them. The state write happens when
    * the output iterator drains — safe, because
    * FlatMapGroupsWithStateExec commits state via a CompletionIterator
    * that runs only after full consumption. */
  private def minOwnerRoutes[A, O](
      rows: Iterator[A],
      state: org.apache.spark.sql.streaming.GroupState[Long],
      histStatus: A => Option[String], idOf: A => Long,
      emit: (A, String) => O,
      keptStatus: String, dupStatus: String): Iterator[O] =
    new Iterator[O] {
      private val hadState = state.exists
      private var candidate = state.getOption.getOrElse(Long.MaxValue)
      private var pending = List.empty[A] // rows tied to candidate
      private val queue = scala.collection.mutable.Queue.empty[O]
      private var flushed = false
      private def advance(): Unit = {
        while (queue.isEmpty && rows.hasNext) {
          val r = rows.next()
          histStatus(r) match {
            case Some(st) => queue += emit(r, st)
            case None =>
              val id = idOf(r)
              if (id < candidate) {
                pending.reverseIterator
                  .foreach(p => queue += emit(p, dupStatus))
                pending = r :: Nil
                candidate = id
              } else if (id == candidate) pending ::= r
              else queue += emit(r, dupStatus)
          }
        }
        if (queue.isEmpty && !rows.hasNext && !flushed) {
          flushed = true
          // a pre-existing state means a prior batch already emitted
          // this key's kept owner — final pending rows are cross-batch
          // dups, never a second kept (at-most-one-kept contract)
          val finalStatus = if (hadState) dupStatus else keptStatus
          pending.reverseIterator.foreach(p => queue += emit(p, finalStatus))
          if (candidate != Long.MaxValue) state.update(candidate)
        }
      }
      def hasNext: Boolean = { advance(); queue.nonEmpty }
      def next(): O = { advance(); queue.dequeue() }
    }

  /** Streaming incremental dedup — d10's daily three-way routing run
    * continuously: each arriving document is fingerprinted (the SAME
    * LlmOps normalization the batch path hashes), checked against the
    * STANDING corpus's fingerprint table (a stream-static broadcast
    * join — the static side is the 16-byte-per-doc fingerprint table,
    * never the corpus text), and then routed through per-fingerprint
    * GroupState:
    *   dup_of_history — fingerprint exists in the standing table;
    *   new            — first in-stream arrival of an unseen fingerprint
    *                    (the state records its doc_id as owner);
    *   dup_in_batch   — any later arrival of an owned fingerprint.
    * State is one Long per DISTINCT new fingerprint — the streaming twin
    * of d10's batchOwner aggregate. Batch d10 elects min(doc_id) as
    * owner while the stream elects the FIRST ARRIVAL — identical when
    * ingestion is id-ordered (the daily-batch shape); under reordering
    * the election differs but the new/dup partition sizes do not
    * (StreamingSpec proves batch parity on ordered delivery). */
  final case class DocRoute(doc_id: Long, h: String, status: String)
  def streamingIncrementalDedup(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      historyFp: DataFrame): org.apache.spark.sql.Dataset[DocRoute] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val fp = graft.operators.LlmOps.fingerprintsOf(docs)
    val flagged = fp
      .join(broadcast(historyFp.select(col("h")).distinct()
        .withColumn("in_hist", lit(1))), Seq("h"), "left")
      .select(col("doc_id").as("doc_id"), col("h"),
        coalesce(col("in_hist"), lit(0)).as("in_hist"))
      .as[(Long, String, Int)]
    flagged
      .groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (h: String, rows: Iterator[(Long, String, Int)],
            state: GroupState[Long]) =>
          // min-owner election streamed in one pass ([[minOwnerRoutes]]):
          // the within-batch election is min(doc_id) — d10's batchOwner
          // aggregate — independent of iterator delivery order, with
          // memory bounded by the owner's own rows, not the group
          minOwnerRoutes[(Long, String, Int), DocRoute](
            rows, state,
            r => if (r._3 == 1) Some("dup_of_history") else None,
            _._1,
            (r, st) => DocRoute(r._1, h, st),
            keptStatus = "new", dupStatus = "dup_in_batch"))
  }

  /** Streaming twin of d16's incremental LINE dedup: arriving docs
    * segment through the SAME LlmOps.linesOf projection (pure
    * expressions — streaming-safe), flag against the STATIC standing
    * line-fingerprint table via a broadcast stream-static left join,
    * and elect batch-internal line owners in flatMapGroupsWithState
    * keyed on the 8-byte line hash (state = one Long owner per distinct
    * new line — the streaming form of d16's batchOwner aggregate, the
    * d10 pattern one level down). Routes per LINE: 'standing' (the
    * standing corpus already carries it), 'batch_dup' (another arriving
    * doc owns it), 'kept'. The owner doc keeps ALL its copies
    * (within-doc repeats are t13's concern), matching d16's
    * doc_id =!= owner rule; under id-ordered delivery the stream's
    * first-arrival election equals d16's min(doc_id) election and
    * StreamingSpec pins route-for-route equality. */
  final case class LineRoute(
      doc_id: Long, line_no: Long, line: String, status: String)
  def streamingLineDedup(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      standingFp: DataFrame): org.apache.spark.sql.Dataset[LineRoute] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val lines = graft.operators.LlmOps.linesOf(docs)
    val flagged = lines
      .join(broadcast(standingFp.select(col("lh")).distinct()
        .withColumn("in_hist", lit(1))), Seq("lh"), "left")
      .select(col("doc_id"), col("line_no"), col("line"), col("lh"),
        coalesce(col("in_hist"), lit(0)).as("in_hist"))
      .as[(Long, Long, String, Long, Int)]
    flagged
      .groupByKey(_._4)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[(Long, Long, String, Long, Int)],
            state: GroupState[Long]) =>
          // min-owner election streamed in one pass ([[minOwnerRoutes]]):
          // the within-batch election is min(doc_id) — exactly d16's
          // owner aggregate, now independent of delivery order — the
          // owner doc keeps ALL its copies (rows tied to the winning id
          // flush as 'kept' together), and a hot boilerplate line no
          // longer buffers its whole group (ADVICE r15 #4)
          minOwnerRoutes[(Long, Long, String, Long, Int), LineRoute](
            rows, state,
            r => if (r._5 == 1) Some("standing") else None,
            _._1,
            (r, st) => LineRoute(r._1, r._2, r._3, st),
            keptStatus = "kept", dupStatus = "batch_dup"))
  }

  final case class BloomBit(shard: Int, pos: Int)
  private val SHARD_BITS = 512
  /** Streaming maintenance of d9's Bloom filter bits: eval-set gram
    * hashes stream in, each folds to its K positions (the SAME
    * derivation d9's batch filter uses — LlmOps.bloomPositionCols), and
    * per-shard boolean state accumulates set bits. Bits only turn ON, so
    * the union of emissions equals the batch bit table exactly
    * (StreamingSpec proves it) — the third sketch, after HLL registers
    * and count-min cells, shipping as one artifact with two execution
    * modes. State per shard is SHARD_BITS booleans; total state is the
    * filter's 2^14 bits regardless of stream length.
    */
  def streamingBloomBits(
      spark: org.apache.spark.sql.SparkSession,
      hashed: DataFrame): org.apache.spark.sql.Dataset[BloomBit] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    hashed.select(explode(array(
        graft.operators.LlmOps.bloomPositionCols: _*)).as("pos"))
      .as[Int]
      .groupByKey(_ / SHARD_BITS)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (shard: Int, rows: Iterator[Int],
            state: GroupState[Array[Boolean]]) => {
          val bits = state.getOption.getOrElse(new Array[Boolean](SHARD_BITS))
          rows.foreach(p => bits(p - shard * SHARD_BITS) = true)
          state.update(bits)
          bits.iterator.zipWithIndex.collect {
            case (set, i) if set => BloomBit(shard, shard * SHARD_BITS + i)
          }
        })
  }

  /** MinHash band keys as ONE stateless projection — d2's signature
    * derivation (8 seeded shingle-min hashes → 4 two-row bands → md5
    * band key) collapsed into per-row array expressions, so the SAME
    * definition runs over a static corpus (batch index build) and a
    * readStream (arrival checking) with no shuffle and no state.
    * Hash-for-hash parity with the batch pipeline is load-bearing
    * (StreamingSpec pins it): shingle = h60('sh|' + 2-gram), permuted
    * hash = h60('mh<i>|' + shingle-as-decimal-string), min over the
    * multiset equals min over d2's distinct set, and the band key
    * concatenates the two member minima exactly as the batch form does.
    * Docs under 2 tokens have no shingles and emit no band rows —
    * matching d2, where they never enter the signature table. */
  def bandKeys(docs: DataFrame): DataFrame = {
    val P = 8
    val sh =
      "transform(sequence(0, size(t)-2), i -> " +
        "CAST(conv(substring(md5(concat('sh|', concat_ws(' ', t[i], " +
        "t[i+1]))), 1, 15), 16, 10) AS BIGINT))"
    val mins = (0 until P).map(i =>
      expr(s"array_min(transform($sh, x -> CAST(conv(substring(md5(" +
        s"concat('mh$i|', CAST(x AS STRING))), 1, 15), 16, 10) " +
        "AS BIGINT)))").as(s"m$i"))
    docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id") +: mins: _*)
      .select(col("doc_id"), explode(array((0 until P / 2).map(b =>
        struct(lit(b).as("band"),
          md5(concat_ws(",", col(s"m${2 * b}"), col(s"m${2 * b + 1}")))
            .as("bkey"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bkey").as("bkey"))
  }

  final case class NearDupHit(
      doc_id: Long, matched_id: Long, band: Int, kind: String)

  /** Streaming near-dup surfacing — d2's band-collision candidate
    * generation run continuously: each arriving document's band keys
    * are checked against (a) the STANDING corpus's band table — a
    * stream-static broadcast join, the static side is 4 rows × 16-ish
    * bytes per indexed doc, never the text — and (b) the arrivals seen
    * so far, held as per-bucket owner lists in GroupState. Emitted rows
    * are candidate PAIRS (doc_id, matched_id, band, hist|stream), the
    * input to a downstream exact-verify stage exactly as d2's `cand`
    * feeds its intersection join.
    *
    * State per band bucket is min(members, BUCKET_CAP) longs. The cap
    * is a PREFIX cap — once a bucket holds cap owners, later arrivals
    * match against those cap docs but are not added — where batch d2
    * drops an over-cap bucket RETROACTIVELY (it sees the final size).
    * A streaming operator cannot unemit, so prefix semantics are the
    * honest streaming analogue; under the cap the two surface exactly
    * the same pairs (StreamingSpec proves batch parity pair-for-pair).
    */
  def streamingNearDupPairs(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame,
      standingDocs: DataFrame): org.apache.spark.sql.Dataset[NearDupHit] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val cap = graft.operators.LlmOps.BUCKET_CAP
    val arrivalBands = bandKeys(arrivals)
    // (a) against the standing index: plain stream-static equi-join,
    // stateless, append-safe; the standing band table broadcasts
    val standing = standingDocs.transform(bandKeys)
      .select(col("band").as("s_band"), col("bkey").as("s_bkey"),
        col("doc_id").as("matched_id"))
    val hist = arrivalBands
      .join(broadcast(standing),
        col("band") === col("s_band") && col("bkey") === col("s_bkey"))
      .select(col("doc_id"), col("matched_id"), col("band"),
        lit("hist").as("kind")).as[NearDupHit]
    // (b) against earlier arrivals: per-bucket owner state
    val stream = arrivalBands
      .select(col("doc_id"), col("band"), col("bkey")).as[(Long, Int, String)]
      .groupByKey { case (_, band, bkey) => s"$band|$bkey" }
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[(Long, Int, String)],
            state: GroupState[List[Long]]) => {
          val band = key.takeWhile(_ != '|').toInt
          var owners = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
          // doc_id order within the micro-batch group, so in-batch
          // pairing elects min(doc_id) as the earlier side — d10's
          // batch-election convention
          rows.toSeq.sortBy(_._1).foreach { case (id, _, _) =>
            owners.foreach(o => out += NearDupHit(id, o, band, "stream"))
            if (owners.size < cap) owners = id :: owners
          }
          state.update(owners)
          out.iterator
        })
    hist.unionByName(stream)
  }

  /** Full MinHash signature (m0..m7) AND band keys per doc in ONE
    * stateless projection — [[bandKeys]] extended to carry the P mins
    * through the band explode, because d17-style routing VERIFIES by
    * signature agreement (n_match = |{i : mᵢ = m'ᵢ}|), not by band
    * collision alone. Same hash-for-hash parity contract as bandKeys. */
  private def sigBands(docs: DataFrame): DataFrame = {
    val P = graft.operators.LlmOps.P
    val sh =
      "transform(sequence(0, size(t)-2), i -> " +
        "CAST(conv(substring(md5(concat('sh|', concat_ws(' ', t[i], " +
        "t[i+1]))), 1, 15), 16, 10) AS BIGINT))"
    val mins = (0 until P).map(i =>
      expr(s"array_min(transform($sh, x -> CAST(conv(substring(md5(" +
        s"concat('mh$i|', CAST(x AS STRING))), 1, 15), 16, 10) " +
        "AS BIGINT)))").as(s"m$i"))
    docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id") +: mins: _*)
      .select((col("doc_id") +: (0 until P).map(i => col(s"m$i"))) :+
        explode(array((0 until P / 2).map(b =>
          struct(lit(b).as("band"),
            md5(concat_ws(",", col(s"m${2 * b}"), col(s"m${2 * b + 1}")))
              .as("bkey"))): _*)).as("bb"): _*)
      .select((col("doc_id") +: (0 until P).map(i => col(s"m$i"))) :+
        col("bb.band").as("band") :+ col("bb.bkey").as("bkey"): _*)
  }

  /** Streaming twin of d17's incremental near-dup ROUTING (VERDICT r18
    * #8) — each arriving document is routed dup_of_history /
    * dup_in_batch / new as it arrives, with the best partner and its
    * signature agreement on the row, d17's exact report schema.
    *
    * The standing side is touched only through d17's OWN artifacts,
    * derived by the SAME LlmOps helpers so batch and stream cannot
    * drift: the P-column MinHash signature table
    * (minhashSigsOf∘shinglesOf) and the standing-capped band table
    * (capBucketsJoin∘bandsFromMh) — both broadcast (16-ish bytes/doc),
    * never the standing text. ONE per-bucket stateful stage (owner
    * (id, signature) pairs) does three jobs: admits at most BUCKET_CAP
    * rows per bucket, emits stream-partner candidates (d17's
    * dup_in_batch, the batch being "everything that arrived before
    * you") for admitted rows, and gates the history join — only
    * ADMITTED arrival band rows meet the standing band table
    * (stateless stream-static broadcast left join downstream), so the
    * per-bucket join fanout stays bounded on BOTH match paths, the
    * property batch d17's two-sided cap exists for (ADVICE r19). The
    * routing fold (best history partner beats best stream partner
    * beats new; ties by max n_match then min id) is a second
    * Append-mode flatMapGroupsWithState keyed by doc_id — legal after
    * the first (all flatMapGroupsWithStates in Append mode), and each
    * doc's candidate rows all land in its own arrival micro-batch, so
    * one invocation sees the whole group and the verdict is emitted
    * once; a Boolean marker swallows re-deliveries inside the TTL
    * window (the margin miner's dedup pattern).
    *
    * State is BOUNDED (ADVICE r19 — the r18 crawl-scale OOM class):
    * both stateful stages carry a [[ROUTING_TTL_MS]] processing-time
    * timeout and REMOVE the entry on expiry. Within the window a
    * bucket holds ≤ BUCKET_CAP (id, sig) pairs and a doc one Boolean.
    * The TTL trade, stated: an idle bucket's owners are forgotten, so
    * an in-stream pair separated by more than the TTL routes `new`
    * rather than dup_in_batch (cross-epoch dups are still caught by
    * the standing artifacts once the corpus re-snapshots), and a doc
    * RE-DELIVERED after its marker expired re-emits its (identical)
    * verdict.
    *
    * Honest divergences vs batch d17, stated: (1) in-batch election is
    * ARRIVAL order, not min-id order — equal to batch whenever
    * arrivals flow in id order (the spec's replay), divergent for
    * out-of-order delivery, where the stream elects who-came-first
    * (the only causally available convention); (2) the arrival-side
    * bucket cap is a PREFIX cap on both match paths — the first
    * BUCKET_CAP arrivals of a bucket participate and later ones are
    * dropped from it — where batch's capBucketsJoin drops the whole
    * over-cap bucket retroactively, first rows included; (3) the TTL
    * evictions above, which batch (one terminal pass) never faces. */
  private[graft] val ROUTING_TTL_MS = 6L * 3600 * 1000
  final case class BucketEmit(kind: String, doc_id: Long, band: Int,
    bkey: String, sig: Array[Long], matched_id: Long, n_match: Long)
  final case class RouteVerdict(doc_id: Long, status: String,
    matched_id: Long, n_match: Long)
  def streamingNeardupRouting(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame,
      standingDocs: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    import graft.operators.LlmOps
    val P = LlmOps.P
    val cap = LlmOps.BUCKET_CAP
    val mins = LlmOps.D17_MINS
    // frozen standing artifacts — d17's, by the same definitions
    val mhS = LlmOps.minhashSigsOf(LlmOps.shinglesOf(standingDocs))
    val bandsS = LlmOps.capBucketsJoin(
      LlmOps.bandsFromMh(mhS), Seq("band", "bkey"))
    val standingSig = bandsS.select(col("doc_id"), col("band"), col("bkey"))
      .join(mhS, Seq("doc_id"))
      .select((col("doc_id").as("h_id") +: col("band").as("hband") +:
        col("bkey").as("hkey") +: (0 until P).map(i => col(s"m$i").as(s"s$i"))): _*)
    val ab = sigBands(arrivals)
    // per-bucket owner state: admit → emit stream candidates against
    // prior owners + an "admit" row that carries the signature to the
    // history join; over-cap arrivals emit nothing for this bucket
    val bucketRows = ab
      .select(col("doc_id"), col("band"), col("bkey"),
        array((0 until P).map(i => col(s"m$i")): _*).as("sig"))
      .as[(Long, Int, String, Array[Long])]
      .groupByKey { case (_, band, bkey, _) => s"$band|$bkey" }
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (key: String, rows: Iterator[(Long, Int, String, Array[Long])],
            state: GroupState[List[(Long, Array[Long])]]) => {
          if (state.hasTimedOut) {
            state.remove() // idle bucket: release its owners
            Iterator.empty
          } else {
            var owners = state.getOption.getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer
              .empty[BucketEmit]
            rows.toSeq.sortBy(_._1).foreach { case (id, band, bkey, sig) =>
              if (owners.size < cap) {
                owners.foreach { case (oid, osig) =>
                  val n = (0 until P).count(i => sig(i) == osig(i)).toLong
                  out += BucketEmit("stream", id, band, bkey, null, oid, n)
                }
                out += BucketEmit("admit", id, band, bkey, sig, -1L, 0L)
                owners = (id, sig) :: owners
              }
            }
            state.update(owners)
            state.setTimeoutDuration(ROUTING_TTL_MS)
            out.iterator
          }
        })
    // history candidates: admitted rows fan out against the standing
    // band table; stream-candidate rows pass through untouched (the
    // join condition excludes them); admit rows without a standing
    // partner drop (the self row below still gives them a verdict)
    def agree: org.apache.spark.sql.Column =
      (0 until P).map(i =>
        when(col("sig")(i) === col(s"s$i"), 1L).otherwise(0L))
        .reduce(_ + _)
    val cands = bucketRows.toDF()
      .join(broadcast(standingSig),
        col("kind") === "admit" && col("band") === col("hband") &&
          col("bkey") === col("hkey"),
        "left")
      .select(col("doc_id"),
        when(col("kind") === "stream", col("matched_id"))
          .otherwise(col("h_id")).as("matched_id"),
        when(col("kind") === "stream", col("n_match"))
          .otherwise(agree).as("n_match"),
        when(col("kind") === "stream", lit("stream"))
          .otherwise(lit("hist")).as("kind"))
      .filter(col("matched_id").isNotNull)
    // every arrival gets a verdict, banded or not (d17's left join)
    val self = arrivals.select(col("doc_id"), lit(-1L).as("matched_id"),
      lit(0L).as("n_match"), lit("self").as("kind"))
    cands.unionByName(self)
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (id: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[Boolean]) => {
          if (state.hasTimedOut) {
            state.remove() // verdict-dedup window closed
            Iterator.empty
          } else if (state.exists) {
            // re-delivery inside the window: swallow, re-arm
            state.setTimeoutDuration(ROUTING_TTL_MS)
            Iterator.empty
          } else {
            state.update(true)
            state.setTimeoutDuration(ROUTING_TTL_MS)
            val rs = rows.toVector
            def best(kind: String): Option[(Long, Long)] =
              rs.collect { case (_, mid, n, k) if k == kind && n >= mins =>
                (mid, n)
              }.sortBy { case (mid, n) => (-n, mid) }.headOption
            val verdict = best("hist") match {
              case Some((mid, n)) => RouteVerdict(id, "dup_of_history", mid, n)
              case None => best("stream") match {
                case Some((mid, n)) => RouteVerdict(id, "dup_in_batch", mid, n)
                case None => RouteVerdict(id, "new", -1L, 0L)
              }
            }
            Iterator.single(verdict)
          }
        })
      .toDF()
  }

  /** Streaming decode with quarantine — m2b's total decode stage run
    * per micro-batch. The decode is STATELESS (containerize is
    * deterministic in the payload bytes and each row decodes alone), so
    * the streaming form is the batch `decodeBatch` applied to every
    * arriving shard via mapPartitions: healthy containers emit feature
    * rows, malformed ones emit null-featured rows carrying the parse
    * error in `err` — the SAME err-column contract as batch m2b, so one
    * dead-letter monitor (`WHERE err IS NOT NULL`) serves both modes.
    * Statelessness is the parity argument: union-of-micro-batch outputs
    * ≡ batch output row for row regardless of how arrivals shard
    * (StreamingSpec proves it on a planted-truncation stream). */
  def streamingDecodeRoute(
      spark: org.apache.spark.sql.SparkSession,
      media: DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.DecodedMedia] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("mime"))
      .as[graft.operators.Multimodal.MediaRow]
      .mapPartitions(graft.operators.Multimodal.decodeBatch)
  }

  /** Streaming twin of t8b's PII scrub — the masking pass run at
    * ingest time, before raw text ever lands in the lake (the shape a
    * privacy review actually wants: PII never persisted). The scrub is
    * STATELESS (one codegen'd projection, each row scrubs alone), so
    * the streaming form is batch [[graft.operators.LlmOps
    * .piiScrubProjection]] applied to every arriving micro-batch —
    * the streamingDecodeRoute statelessness argument: union of
    * micro-batch outputs ≡ batch output row for row regardless of how
    * arrivals shard, with per-class counts on every row feeding the
    * same removal monitor as batch t8b. */
  def streamingPiiScrub(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame): DataFrame =
    graft.operators.LlmOps.piiScrubProjection(docs)

  /** Running per-mime ok/quarantined counts over the streaming decode —
    * the operational report m2b aggregates in batch, carried as
    * GroupState so the monitor sees the CUMULATIVE split after every
    * micro-batch, not just per-batch deltas. State is two Longs per
    * mime (4 mimes → 64 bytes total), independent of stream length;
    * after the last arrival the state equals batch m2b's (mime, n_ok,
    * n_quarantined) rows exactly (StreamingSpec proves state-for-state
    * parity). */
  final case class MimeCounts(mime: String, n_ok: Long, n_quarantined: Long)
  def streamingQuarantineCounts(
      spark: org.apache.spark.sql.SparkSession,
      decoded: org.apache.spark.sql.Dataset[
        graft.operators.Multimodal.DecodedMedia])
      : org.apache.spark.sql.Dataset[MimeCounts] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    decoded
      .groupByKey(_.mime)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (mime: String,
            rows: Iterator[graft.operators.Multimodal.DecodedMedia],
            state: GroupState[(Long, Long)]) => {
          var (ok, quarantined) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { r =>
            if (r.err.isEmpty) ok += 1L else quarantined += 1L
          }
          state.update((ok, quarantined))
          Iterator(MimeCounts(mime, ok, quarantined))
        })
  }

  /** Streaming greedy-beam ANN over a FROZEN a17 graph — the arrival
    * analog of [[streamingNearDupPairs]] for vectors: each arriving
    * vector surfaces its top-K nearest STANDING neighbors via the same
    * NSW beam the batch a17 search walks. The standing index (embedding
    * map, adjacency map, entry list) collapses to ONE static row that
    * broadcasts to every task — the load-the-index-once serving shape —
    * and the whole NSW_HOPS-hop beam unrolls into a single stateless
    * per-row chain of higher-order functions: no aggregation state, no
    * shuffle, no watermark, append-safe. An arrival touches
    * hops × beam × degree map entries — constant per row, so the stream
    * shards freely; at 100 TB the broadcast index is the per-serving-
    * shard partition of the graph (the same deployment note as a17's
    * edge reuse). Rounding and tie-breaks mirror the batch beam exactly
    * (round-6 sims, (sim desc, vec_id asc)), so an arrival equal to a
    * batch probe surfaces the identical top-K — StreamingSpec proves
    * row-for-row parity against a17's batch output. */
  def nswSearchArrivals(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame,
      standing: DataFrame,
      edges: DataFrame): DataFrame = {
    import graft.operators.Ann
    val embm = standing
      .agg(map_from_entries(collect_list(
        struct(col("vec_id"), col("emb")))).as("embm"))
    val adjm = edges.groupBy(col("v"))
      .agg(collect_list(col("n")).as("ns"))
      .agg(map_from_entries(collect_list(
        struct(col("v"), col("ns")))).as("adjm"))
    val ents = standing
      .withColumn("ek", graft.functions.Portable
        .h60(col("vec_id").cast("string"), "nswe|"))
      .orderBy(col("ek").asc, col("vec_id").asc)
      .limit(Ann.NSW_ENTRIES)
      .agg(collect_list(col("vec_id")).as("ents"))
    val index = embm.crossJoin(adjm).crossJoin(ents)
    // the batch beam's kernel and ordering, verbatim: round-6 cosine,
    // (sim desc, id asc) — array_sort's comparator spells out the
    // window's orderBy
    val cos = Ann.cosineSql(spark, "embm[id]", "emb")
    val cmp = "(l, r) -> CASE WHEN l.sim > r.sim THEN -1 " +
      "WHEN l.sim < r.sim THEN 1 WHEN l.id < r.id THEN -1 " +
      "WHEN l.id > r.id THEN 1 ELSE 0 END"
    def rank(ids: String): String =
      s"slice(array_sort(transform(array_distinct($ids), id -> " +
        s"named_struct('sim', round($cos, 6), 'id', id)), $cmp), " +
        s"1, ${Ann.NSW_B})"
    val beamExpr = (1 to Ann.NSW_HOPS).foldLeft(rank("ents")) {
      (prev, _) =>
        val ids = s"concat(transform($prev, s -> s.id), " +
          s"flatten(transform($prev, s -> " +
          "coalesce(adjm[s.id], CAST(array() AS ARRAY<BIGINT>)))))"
        rank(ids)
    }
    arrivals.crossJoin(broadcast(index))
      .withColumn("beam", expr(s"slice($beamExpr, 1, ${Ann.NSW_K})"))
      .select(col("vec_id").as("probe_id"),
        posexplode(col("beam")).as(Seq("i", "s")))
      .select(col("probe_id"), col("s.id").as("vec_id"),
        col("s.sim").as("sim"), (col("i") + 1).cast("long").as("rank"))
  }

  /** Streaming arrival search over the FROZEN hierarchical graph —
    * a19's three-phase descent as the same stateless per-row chain
    * [[nswSearchArrivals]] uses for a17's flat beam: the index
    * collapses to ONE broadcast row (embedding map, one adjacency map
    * PER LAYER, entries from the highest populated layer), and each
    * arrival runs upper-layer beams at width HNSW_UBEAM passing their
    * top-HNSW_DESC down into the full-width base beam — all
    * higher-order functions, no state, no shuffle, constant work per
    * arrival. `layerEdges` is the (v, n, elvl) union a19 builds. */
  def hnswSearchArrivals(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame,
      standing: DataFrame,
      layerEdges: DataFrame): DataFrame = {
    import graft.operators.Ann
    val p1 = Ann.HNSW_PROMOTE.toLong
    def lh = graft.functions.Portable
      .h60(col("vec_id").cast("string"), "lvl|")
    val lvlCol = when(pmod(lh, lit(p1 * p1)) === 0, 2)
      .when(pmod(lh, lit(p1)) === 0, 1).otherwise(0)
    val embm = standing
      .agg(map_from_entries(collect_list(
        struct(col("vec_id"), col("emb")))).as("embm"))
    def adjmOf(k: Int) = layerEdges.filter(col("elvl") === k)
      .groupBy(col("v")).agg(collect_list(col("n")).as("ns"))
      .agg(map_from_entries(collect_list(
        struct(col("v"), col("ns")))).as(s"adjm$k"))
    val ents = standing.withColumn("lvl", lvlCol)
      .withColumn("ek", graft.functions.Portable
        .h60(col("vec_id").cast("string"), "nswe|"))
      .orderBy(col("lvl").desc, col("ek").asc, col("vec_id").asc)
      .limit(Ann.NSW_ENTRIES)
      .agg(collect_list(col("vec_id")).as("ents"))
    val index = (0 to Ann.HNSW_MAXL).map(adjmOf)
      .foldLeft(embm)(_ crossJoin _).crossJoin(ents)
    val cos = Ann.cosineSql(spark, "embm[id]", "emb")
    val cmp = "(l, r) -> CASE WHEN l.sim > r.sim THEN -1 " +
      "WHEN l.sim < r.sim THEN 1 WHEN l.id < r.id THEN -1 " +
      "WHEN l.id > r.id THEN 1 ELSE 0 END"
    def rank(ids: String, width: Int): String =
      s"slice(array_sort(transform(array_distinct($ids), id -> " +
        s"named_struct('sim', round($cos, 6), 'id', id)), $cmp), " +
        s"1, $width)"
    def expand(prev: String, adjm: String): String =
      s"concat(transform($prev, s -> s.id), " +
        s"flatten(transform($prev, s -> " +
        s"coalesce($adjm[s.id], CAST(array() AS ARRAY<BIGINT>)))))"
    val descended = (Ann.HNSW_MAXL to 1 by -1)
      .foldLeft(rank("ents", Ann.HNSW_UBEAM)) { (start, k) =>
        val beamed = (1 to Ann.HNSW_UHOPS).foldLeft(start) { (prev, _) =>
          rank(expand(prev, s"adjm$k"), Ann.HNSW_UBEAM)
        }
        s"slice($beamed, 1, ${Ann.HNSW_DESC})"
      }
    val beamExpr = (1 to Ann.HNSW_BHOPS).foldLeft(descended) {
      (prev, _) => rank(expand(prev, "adjm0"), Ann.NSW_B)
    }
    arrivals.crossJoin(broadcast(index))
      .withColumn("beam", expr(s"slice($beamExpr, 1, ${Ann.NSW_K})"))
      .select(col("vec_id").as("probe_id"),
        posexplode(col("beam")).as(Seq("i", "s")))
      .select(col("probe_id"), col("s.id").as("vec_id"),
        col("s.sim").as("sim"), (col("i") + 1).cast("long").as("rank"))
  }

  /** Streaming arrival routing against a FROZEN centroid table — the
    * a15 incremental-index maintenance in streaming form. The centroid
    * table collapses to ONE broadcast row carrying all (cid, c_emb)
    * structs, and each arriving vector computes its packed argmax
    * (round-6 cosine ×10⁶ in the high bits, 15−cid in the low 4 — the
    * same encoding as the batch assignment, so highest-sim-then-
    * lowest-cid wins identically) in a single stateless projection:
    * no per-row aggregation state, no shuffle, append-mode safe. At
    * 100 TB the stream shards freely — every row touches only the K
    * broadcast centroid rows. */
  def routeArrivals(arrivals: DataFrame, cents: DataFrame): DataFrame = {
    val packed = cents
      .agg(collect_list(struct(col("cid"), col("c_emb"))).as("cents"))
    // the batch assignment's kernel and rounding, verbatim: cosineSql
    // dispatches to the same native cosine_sim (or its HOF fallback,
    // whose nullif zero-norm guard NULLs a degenerate cosine); a NULL
    // seed + greatest's null-skipping leave pk NULL when every cosine
    // is NULL — a zero arrival vector routes to a NULL cell exactly as
    // the batch path does, never to a garbage sentinel cell.
    val cos = graft.operators.Ann
      .cosineSql(arrivals.sparkSession, "emb", "c.c_emb")
    val pk =
      "aggregate(cents, CAST(NULL AS BIGINT), (acc, c) -> " +
        s"greatest(acc, CAST(round(round($cos, 6) * 1000000) AS BIGINT) " +
        "* 16 + (15 - c.cid)))"
    arrivals.crossJoin(broadcast(packed))
      .withColumn("pk", expr(pk))
      .select(col("vec_id"),
        (lit(15) - pmod(col("pk"), lit(16))).as("cell"),
        round(floor(col("pk") / 16) / 1e6, 6).as("csim"))
  }

  /** Streaming twin of w4's gap fill — LOCF as a stateful GENERATOR.
    * Per resource, GroupState carries the last observed (epoch-minute,
    * value); each arriving per-minute observation EMITS exactly the
    * gap rows batch w4's grid would contain up to itself: a resource's
    * first-ever arrival back-fills its day's leading minutes as
    * 'unfilled' (nothing to carry, ever), a same-day arrival fills the
    * minutes since the previous observation as 'locf_same_day', and a
    * NEW-day arrival first closes the previous observed day's tail
    * ('locf_same_day' with that day's close — the value the batch
    * carry column reads) then back-fills the new day's leading minutes
    * as 'locf_prev_day'. Wholly-unobserved days emit nothing, exactly
    * like the batch grid (it covers observed days only).
    *
    * Honest streaming divergences, both intrinsic to Append mode: the
    * FINAL observed day's tail cannot emit until a later-day arrival
    * proves the day closed (batch sees the day boundary; a stream
    * would need a watermark-driven timeout to flush it), and the
    * per-day missing-minute count is a day-close aggregate so the
    * streaming rows don't carry it. Delivery must be minute-ordered
    * per resource (the d10 ordering contract). State is one
    * (Long, Double) per resource; emissions stream lazily (≤1439 gap
    * rows per arrival, never a buffered batch group).
    * StreamingSpec pins row-for-row parity with batch w4 on everything
    * up to each resource's final observation. */
  final case class FilledMinute(
      event_type: String, minute_ts: java.sql.Timestamp,
      value: Option[Double], status: String)
  def streamingGapFill(
      spark: org.apache.spark.sql.SparkSession,
      obs: DataFrame): org.apache.spark.sql.Dataset[FilledMinute] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    obs.select(col("event_type"),
        (unix_timestamp(col("m")) / 60L).cast("long").as("mm"),
        col("val"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (et: String, rows: Iterator[(String, Long, Double)],
            state: GroupState[(Long, Double)]) => {
          // arrivals per (resource, micro-batch) are the distinct
          // observed minutes — bounded; the generated gap rows are NOT
          // buffered (lazy iterator, committed state after drain)
          val sorted = rows.map(r => (r._2, r._3)).toSeq.sortBy(_._1)
          sorted.iterator.flatMap { case (m, v) =>
            val gaps: Iterator[FilledMinute] =
              state.getOption match {
                case None =>
                  val dayStart = m - m % 1440
                  (dayStart until m).iterator
                    .map(g => FilledMinute(et, ts(g), None, "unfilled"))
                case Some((lastM, lastV)) if lastM / 1440 == m / 1440 =>
                  (lastM + 1 until m).iterator.map(g =>
                    FilledMinute(et, ts(g), Some(lastV), "locf_same_day"))
                case Some((lastM, lastV)) =>
                  val lastDayEnd = lastM - lastM % 1440 + 1439
                  val dayStart = m - m % 1440
                  (lastM + 1 to lastDayEnd).iterator.map(g =>
                    FilledMinute(et, ts(g), Some(lastV),
                      "locf_same_day")) ++
                    (dayStart until m).iterator.map(g =>
                      FilledMinute(et, ts(g), Some(lastV),
                        "locf_prev_day"))
              }
            state.update((m, v))
            gaps ++ Iterator(FilledMinute(et, ts(m), Some(v), "observed"))
          }
        })
  }

  /** Stateless rank scoring of an arriving doc stream against a STATIC
    * g1 rank table — the graph family's streaming representative
    * (VERDICT r15 #8). Link analysis itself recomputes in batch (an
    * iterative fixpoint is not a streaming shape), but SERVING the
    * resulting prior is exactly the a15/NSW arrival pattern: the rank
    * frame broadcasts to every task, the join is stream-static and
    * append-safe — no state, no watermark, constant work per arrival,
    * shards freely. Arrivals the last crawl snapshot never ranked
    * surface with pr NULL and ranked=false instead of dropping — the
    * "how stale is the rank table" monitor column. StreamingSpec pins
    * row-for-row parity with the identical batch join. */
  def streamingRankScore(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame,
      ranks: DataFrame): DataFrame =
    arrivals
      .join(broadcast(ranks.select(col("doc_id"), col("pr"))),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"), col("pr"),
        col("pr").isNotNull.as("ranked"))

  /** Streaming quality routing — t22's trained Bernoulli-NB model
    * SERVED: the grid (class × 64-bucket lp1/lp0) and priors are
    * model-sized whatever the corpus, so they ride the task closure
    * (the production model-serving shape: train in batch, score every
    * arrival statelessly). Per arrival: tokenize with t22's exact
    * feature derivation (lowercase split, bigrams, h60 % 64, distinct),
    * then argmax over classes of Σ_f (present ? lp1 : lp0) + logprior —
    * the 6-dp model values summed as BigDecimal, t11's decimal-exact
    * discipline, so the streamed guess is bit-identical to the batch
    * router's. No state, no watermark, append-safe, constant work per
    * arrival (|classes| × 64 terms). StreamingSpec pins guess-for-guess
    * parity with batch t22 on the held-out slice.
    *
    * Model rows arrive COLLECTED (grid: (p_label, fh, lp1, lp0);
    * priors: (p_label, logprior)) — the caller collects the two
    * planner-sized frames once; a 100 TB deployment broadcasts the
    * same few KB. */
  final case class QualityRoute(doc_id: Long, guess: String)
  def streamingQualityRoute(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame,
      grid: Array[(String, Long, Double, Double)],
      priors: Array[(String, Double)]): org.apache.spark.sql.Dataset[QualityRoute] = {
    import spark.implicits._
    val nfeat = graft.operators.LlmOps.T22_NFEAT
    // (class, fh) -> (lp1, lp0), plus per-class prior — immutable maps
    // serialized into the task closure
    val lp = grid.map { case (c, f, l1, l0) => (c, f) -> ((l1, l0)) }.toMap
    val pri = priors.toMap
    val classes = priors.map(_._1).sorted
    arrivals.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = text.toLowerCase.split(" ", -1)
        val present: Set[Long] =
          if (toks.length < 2) Set.empty
          else (0 until toks.length - 1).map { i =>
            graft.functions.Portable
              .h60Jvm(s"t22|${toks(i)} ${toks(i + 1)}") % nfeat
          }.toSet
        // argmax (score DESC, class ASC) — the batch window's order
        val guess = classes.map { c =>
          var sum = BigDecimal(0)
          var f = 0L
          while (f < nfeat) {
            val (l1, l0) = lp((c, f))
            sum += BigDecimal(if (present(f)) l1 else l0)
            f += 1
          }
          (sum + BigDecimal(pri(c)), c)
        }.sortBy { case (score, c) => (-score, c) }.head._2
        QualityRoute(id, guess)
      }
  }

  /** Match thresholds for [[streamingHybridMatch]] — alerting dials,
    * driver-visible in the output next to the raw arm scores. */
  private[graft] val HYBRID_TAU_DENSE = 0.5
  private[graft] val HYBRID_TAU_BM25 = 2.0

  /** The standing-query index for [[streamingHybridMatch]], collapsed
    * to ONE broadcastable row: a26's query side frozen at build time —
    * the probe embeddings, each probe doc's top terms (a26's exact
    * derivation), the df of those <= PROBES·QTERMS terms, and the
    * corpus n/avgdl. A 100 TB corpus still collapses to a few KB here:
    * everything is query-sized or scalar, never corpus-sized. */
  def hybridStandingIndex(
      spark: org.apache.spark.sql.SparkSession,
      e: DataFrame, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Ann
    val toks = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val wQ = Window.partitionBy(col("probe_id"))
      .orderBy(col("qtf").desc, col("tok").asc)
    val qterms = tf
      .filter(col("doc_id") < Ann.RRF_PROBES &&
        length(col("tok")) >= Ann.RRF_MINLEN)
      .select(col("doc_id").as("probe_id"), col("tok"),
        col("tf").as("qtf"))
      .withColumn("qrn", row_number().over(wQ))
      .filter(col("qrn") <= Ann.RRF_QTERMS)
      .select("probe_id", "tok")
    val dfm = toks
      .join(broadcast(qterms.select("tok").distinct()), Seq("tok"))
      .groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .agg(map_from_entries(collect_list(
        struct(col("tok"), col("df")))).as("dfm"))
    val qarr = e.filter(col("vec_id") < Ann.RRF_PROBES)
      .join(qterms.groupBy(col("probe_id"))
          .agg(sort_array(collect_list(col("tok"))).as("qtoks")),
        col("vec_id") === col("probe_id"), "left")
      .select(struct(col("vec_id").as("probe_id"),
        col("emb").as("p_emb"),
        coalesce(col("qtoks"), array().cast("array<string>"))
          .as("qtoks")).as("q"))
      .agg(array_sort(collect_list(col("q"))).as("queries"))
    qarr.crossJoin(broadcast(dfm)).crossJoin(broadcast(stats))
  }

  /** Streaming standing-query hybrid matching — a26's two retrieval
    * arms SERVED in the alerting direction: the standing QUERY set
    * broadcasts (one row, [[hybridStandingIndex]]) and every arriving
    * doc is scored against every standing query on BOTH arms
    * statelessly — dense cosine on the batch kernel, BM25 with the
    * frozen df/avgdl and the per-term tf computed in-row by
    * higher-order functions (per-term scores rounded 6 then summed as
    * DECIMAL, so the sum is order-independent and bit-equal to a
    * relational explode+groupBy recompute — StreamingSpec pins it).
    * matched = either arm over its threshold; no state, no watermark,
    * append-safe, constant work per arrival (|queries| × qterms).
    * Corpus-rank-based fusion (a26's RRF) needs the corpus and stays
    * batch; THIS is the per-arrival face: which standing queries does
    * the new doc light up. */
  def streamingHybridMatch(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame,
      index: DataFrame): DataFrame = {
    import graft.operators.Ann
    val cos = Ann.cosineSql(spark, "q.p_emb", "emb")
    val term =
      """aggregate(q.qtoks, CAST(0.0 AS DECIMAL(20,6)), (acc, tk) ->
         CAST(acc + CAST(
           CASE WHEN size(filter(tks, x -> x = tk)) = 0
                  OR dfm[tk] IS NULL THEN 0.0
           ELSE round(round(ln((n - dfm[tk] + 0.5D) / (dfm[tk] + 0.5D)
               + 1.0D), 6)
             * (size(filter(tks, x -> x = tk)) * 2.2D)
             / (size(filter(tks, x -> x = tk)) + 1.2D *
                (0.25D + 0.75D * (dl / avgdl))), 6)
           END AS DECIMAL(20,6)) AS DECIMAL(20,6)))"""
    arrivals.crossJoin(broadcast(index))
      .withColumn("tks", split(lower(col("text")), " "))
      .withColumn("dl", size(col("tks")).cast("double"))
      .select(col("doc_id"), col("emb"), col("tks"), col("dl"),
        col("dfm"), col("n"), col("avgdl"),
        explode(col("queries")).as("q"))
      .select(col("doc_id"), col("q.probe_id").as("probe_id"),
        expr(s"round($cos, 6)").as("dense_sim"),
        expr(term).cast("double").as("bm25"))
      .withColumn("matched",
        col("dense_sim") >= lit(HYBRID_TAU_DENSE) ||
          col("bm25") >= lit(HYBRID_TAU_BM25))
  }

  /** Streaming data-quality monitor — x16's per-row contracts run as a
    * STANDING query: every micro-batch folds into running
    * (check, n_checked, n_violations) totals (complete-mode global
    * aggregate — the monitor's whole state is one row per check,
    * bounded by the checklist, never the stream). The per-row
    * predicates are x16's own (null key/type, negative value, future
    * timestamp), so the batch suite and the live monitor cannot drift
    * semantically; the stateful PK-uniqueness face of x16 lives in
    * [[streamingIncrementalDedup]]'s GroupState election (one Long per
    * distinct key), which is the same contract in routed-rows form.
    * Alerting = n_violations > 0 on any row, the bool_and(passed) gate
    * k10 applies at publish time, evaluated continuously instead. */
  def streamingConstraints(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame): DataFrame =
    arrivals
      .select(explode(array(
        struct(lit("not_null").as("check_name"),
          when(col("event_id").isNull || col("event_type").isNull, 1L)
            .otherwise(0L).as("v")),
        struct(lit("value_range").as("check_name"),
          when(col("value") < 0, 1L).otherwise(0L).as("v")),
        struct(lit("no_future_ts").as("check_name"),
          when(col("ts") > lit("2030-01-01").cast("timestamp"), 1L)
            .otherwise(0L).as("v")))).as("c"))
      .groupBy(col("c.check_name"))
      .agg(count(lit(1)).as("n_checked"),
        sum(col("c.v")).as("n_violations"))
      .withColumn("passed", col("n_violations") === 0)

  /** Per-resource trailing baseline for [[streamingAnomaly]]: the open
    * day's accumulating total plus the last ≤7 CLOSED day totals in
    * value-micros — at most 8 (day, total) pairs per resource, the
    * bounded-state discipline. */
  final case class AnomalyState(
      openDay: String, openTotalU: Long, closedDays: List[String],
      closedTotalsU: List[Long])
  final case class DayStatus(
      event_type: String, day: String, total_u: Long, n_prev: Long,
      base_sum_u: Long, status: String)

  /** Streaming twin of w8 — the anomaly monitor run LIVE: per
    * resource, GroupState accumulates the open day's total (exact
    * value-micros, the batch query's DECIMAL discipline JVM-side via
    * BigDecimal) and a ring of the last 7 closed-day totals; a new
    * day's first arrival CLOSES the previous day and emits its status
    * through the SAME cross-multiplied integer thresholds as batch w8
    * (spike / drop / normal / warmup — no quotient, no rounding, no
    * ulp-flapping alerts). Honest divergences, both pinned by
    * StreamingSpec: (1) a day only closes when a LATER day's first
    * event arrives (the final open day emits nothing — the stream
    * cannot know the day ended; the batch query is the replayable
    * truth); (2) an event arriving for an already-closed day is
    * dropped from the baseline (Append mode cannot retract an emitted
    * status) — the w4/minOwnerRoutes lateness convention, stated not
    * implied. In-order delivery therefore reproduces batch w8 exactly
    * on every closed day. */
  def streamingAnomaly(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame): org.apache.spark.sql.Dataset[DayStatus] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    arrivals
      .select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"), col("value"))
      .as[(String, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AnomalyState, DayStatus](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { case (typ, rows, state) =>
        var st = state.getOption
          .getOrElse(AnomalyState("", 0L, Nil, Nil))
        val out = scala.collection.mutable.ArrayBuffer.empty[DayStatus]
        def statusOf(totalU: Long): DayStatus = {
          val n = st.closedTotalsU.size.toLong
          val baseSum = st.closedTotalsU.sum
          DayStatus(typ, st.openDay, totalU, n, baseSum,
            if (n < 3) "warmup"
            else if (totalU * n > baseSum * 2) "spike"
            else if (totalU * n * 2 < baseSum) "drop"
            else "normal")
        }
        def close(): Unit = if (st.openDay.nonEmpty) {
          out += statusOf(st.openTotalU)
          st = AnomalyState("", 0L,
            (st.openDay :: st.closedDays).take(7),
            (st.openTotalU :: st.closedTotalsU).take(7))
        }
        // micros per event: round to 6 fractional digits BEFORE the
        // exact conversion, matching the batch DECIMAL(18,6) cast —
        // without the setScale, a value like 0.1234567 (shortest
        // decimal > 6 digits) would throw in toLongExact and kill the
        // streaming query where batch w8 just rounds it
        def micros(v: Double): Long =
          (BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            * 1000000).toLongExact
        // one pass folds the batch to per-day sums (memory = distinct
        // days in THIS batch, never the event count), then days apply
        // in order so a multi-day batch closes each day exactly once
        val byDay = scala.collection.mutable.Map.empty[String, Long]
        rows.foreach { case (_, day, v) =>
          byDay(day) = byDay.getOrElse(day, 0L) + micros(v)
        }
        byDay.keys.toSeq.sorted.foreach { day =>
          if (st.openDay.isEmpty) st = st.copy(openDay = day)
          if (day == st.openDay)
            st = st.copy(openTotalU = st.openTotalU + byDay(day))
          else if (day > st.openDay) {
            close()
            st = st.copy(openDay = day, openTotalU = byDay(day))
          } // day < openDay: late events for a closed day — dropped
        }
        state.update(st)
        out.iterator
      }
  }

  /** Per-user funnel anchors for [[streamingFunnel]] — epoch micros,
    * -1 = step not yet reached. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long)
  final case class FunnelProgress(
      user_id: Long, step_reached: Int, t1_us: Long, t2_us: Long,
      t3_us: Long)

  /** Streaming funnel — w5's strict-sequence conversion tracker run
    * continuously: per user, GroupState holds the three step anchors
    * (first view; first click strictly after it; first purchase
    * strictly after that) and every micro-batch emits the user's
    * refreshed progress — the live funnel dashboard face of the batch
    * report.
    *
    * Cross-batch contract (the minOwnerRoutes discipline, stated
    * rather than implied): each anchor refines MONOTONICALLY DOWNWARD
    * while the step above it is still open, and FREEZES the moment
    * that step anchors — so in-order (or even reordered-within-batch)
    * delivery reproduces batch w5 exactly, while a late-arriving
    * earlier event can only improve steps whose successors haven't
    * fired yet. Two honest divergences from the replayable batch
    * truth, both pinned by StreamingSpec: (1) a step candidate that
    * arrived before its predecessor anchored in a PRIOR batch is gone
    * (the stream holds anchors, never event history); (2) once t2
    * anchors, a later-arriving earlier view cannot re-open it. The
    * batch query is the truth; the stream is the monitoring face.
    *
    * Memory: one 24-byte state per user, plus — within a single
    * batch — the user's distinct click/purchase timestamps (TreeSets,
    * needed because the view anchor is only final at group end and the
    * "first click AFTER t1" successor query cannot be answered
    * one-sided mid-pass); views fold to a single running min. Bounded
    * by the user's per-batch event count, never by stream history. */
  def streamingFunnel(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame): org.apache.spark.sql.Dataset[FunnelProgress] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    arrivals
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelState, FunnelProgress](
        GroupStateTimeout.NoTimeout) { case (user, rows, state) =>
        val st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
        var minView = Long.MaxValue
        val clicks = scala.collection.mutable.TreeSet.empty[Long]
        val purchases = scala.collection.mutable.TreeSet.empty[Long]
        rows.foreach { case (_, typ, us) =>
          typ match {
            case "view" => if (us < minView) minView = us
            case "click" => clicks += us
            case "purchase" => purchases += us
            case _ => ()
          }
        }
        // anchors resolve bottom-up at group end; each refines downward
        // only while the NEXT step is still open (freeze-on-anchor)
        val t1 =
          if (st.t2 >= 0) st.t1
          else Seq(st.t1, minView).filter(_ >= 0)
            .filter(_ != Long.MaxValue).sorted.headOption.getOrElse(-1L)
        def succ(s: scala.collection.mutable.TreeSet[Long],
            after: Long): Long =
          if (after < 0) -1L
          else s.rangeFrom(after + 1).headOption.getOrElse(-1L)
        val t2 =
          if (st.t3 >= 0) st.t2
          else Seq(st.t2, succ(clicks, t1)).filter(_ >= 0)
            .sorted.headOption.getOrElse(-1L)
        // t3 has no successor step, so it refines downward forever
        val t3 = Seq(st.t3, succ(purchases, t2)).filter(_ >= 0)
          .sorted.headOption.getOrElse(-1L)
        val next = FunnelState(t1, t2, t3)
        state.update(next)
        FunnelProgress(user,
          if (t3 >= 0) 3 else if (t2 >= 0) 2 else if (t1 >= 0) 1 else 0,
          t1, t2, t3)
      }
  }

  /** One row per count-min depth, re-emitted per batch: that depth's
    * running inner product with the standing side's frozen cells. The
    * serving estimate is min(ip) across the CM_D rows. */
  final case class JoinSizeEst(
      depth: Int, n_keys: Long, cells_nonzero: Long, ip: Long)

  /** Streaming twin of x19's join-size estimation — the statistic
    * MAINTAINED as one join side keeps arriving (the CBO feed for a
    * standing dimension joined by a growing fact): the standing side
    * folds ONCE to its CM_D×CM_W count-min cells (metadata-sized, so
    * they ride the closure the way a15's centroids broadcast), and
    * each arriving key updates CM_D state cells (state = one
    * 64-long array per depth — bounded whatever the stream) via the
    * SAME seeded h60 rows as x19/t12, then the depth re-emits its
    * running inner product Σ_b cells_arrival[b]·cells_standing[b].
    * min across the CM_D emitted rows = the current |standing ⋈
    * arrivals| estimate, ≥ exact always, exactly x19's batch algebra —
    * with x17 (register-max NDV), x18 (bottom-K quantiles) and the
    * count-min cell stream this closes 'every sketch is maintained
    * incrementally' for the join-size statistic too. */
  def streamingJoinSizeEstimate(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame,
      standingKeys: DataFrame): org.apache.spark.sql.Dataset[JoinSizeEst] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    import graft.functions.Portable
    import graft.operators.LlmOps.{CM_W, CM_D}
    // frozen standing cells: CM_D arrays of CM_W longs, driver-held
    val standingCells: Map[Int, Array[Long]] = {
      val cells = standingKeys
        .select(explode(array((0 until CM_D).map(i =>
          struct(lit(i).as("depth"),
            (Portable.h60(col("k").cast("string"), s"cm$i|") % CM_W)
              .as("bucket"))): _*)).as("db"))
        .groupBy(col("db.depth").as("depth"),
          col("db.bucket").as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
      (0 until CM_D).map { i =>
        val row = new Array[Long](CM_W.toInt)
        cells.filter(_.getInt(0) == i).foreach(r =>
          row(r.getLong(1).toInt) = r.getLong(2))
        i -> row
      }.toMap
    }
    arrivals
      .select(explode(array((0 until CM_D).map(i =>
        struct(lit(i).as("depth"),
          (Portable.h60(col("k").cast("string"), s"cm$i|") % CM_W)
            .as("bucket"))): _*)).as("db"))
      .select(col("db.depth").as("depth"), col("db.bucket").as("bucket"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], JoinSizeEst](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (depth, rows, state) =>
          val cells = state.getOption.getOrElse(new Array[Long](CM_W.toInt))
          rows.foreach { case (_, b) => cells(b.toInt) += 1L }
          state.update(cells)
          val frozen = standingCells(depth)
          var ip = 0L; var nz = 0L; var n = 0L
          var i = 0
          while (i < cells.length) {
            if (cells(i) > 0) nz += 1
            n += cells(i)
            // Exact-arithmetic guard (ADVICE r18): with CM_W=64 a
            // per-cell count is ~N/64, so cnt_a·cnt_b crosses int64
            // around N≈10^11 keys per side. A silent wrap would emit a
            // confidently WRONG join-size estimate to a CBO consumer —
            // fail loudly instead (matching batch x19, whose DECIMAL
            // accumulation stays exact up to the emitted BIGINT range).
            ip = Math.addExact(ip, Math.multiplyExact(cells(i), frozen(i)))
            i += 1
          }
          Iterator.single(JoinSizeEst(depth, n, nz, ip))
      }
  }

  /** Streaming twin of x20's Bloom-pruned join — the shuffle saver
    * applied to a stream: every arriving fact row is gated by the
    * FROZEN dim-side Bloom filter BEFORE the stream-static confirm
    * join, so rows the dim side cannot possibly match never reach the
    * join at all. The filter is the same 2^14-bit/3-hash h60 fold as
    * batch x20, packed into 256 longs and embedded as a LITERAL array
    * column — the gate is a pure stateless projection (three h60s,
    * an element_at, a shiftright each), no broadcast join, no state,
    * append-safe; at 100 TB/day this is the map-side row kill that
    * keeps the confirm join's shuffle proportional to the MATCHING
    * slice. Output is row-level and self-evaluating (the d13 rule):
    * every arrival emits exactly one row with its disposition —
    * `rejected` (gate said no: GUARANTEED non-match, Bloom has no
    * false negatives), `confirmed` (gate yes, dim join yes), or
    * `false_pos` (gate yes, join no — the visible overhead column).
    * StreamingSpec proves disposition-for-disposition equality with a
    * driver replay of batch x20's arithmetic. */
  def streamingBloomGate(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame,
      dimKeys: DataFrame): DataFrame = {
    import graft.functions.Portable
    import graft.operators.LlmOps.{BLOOM_M, BLOOM_K}
    val bits = new Array[Long](BLOOM_M / 64)
    dimKeys.select(explode(array((0 until BLOOM_K).map(j =>
        (Portable.h60(col("k").cast("string"), s"xj$j|") % BLOOM_M)
          .cast("int")): _*)).as("pos"))
      .distinct().collect().foreach { r =>
        val p = r.getInt(0); bits(p / 64) |= 1L << (p % 64)
      }
    def bitTest(j: Int): String = {
      val pos = s"CAST(${Portable.h60Sql("CAST(k AS STRING)", s"xj$j|")} % $BLOOM_M AS INT)"
      // `div` not `/`: Spark SQL `/` is double division
      s"(shiftright(element_at(bm, CAST(($pos div 64) AS INT) + 1), $pos % 64) & 1) = 1"
    }
    val gated = arrivals
      .withColumn("bm", typedLit(bits.toSeq))
      .withColumn("bloom_pass",
        expr((0 until BLOOM_K).map(bitTest).mkString(" AND ")))
      .drop("bm")
    gated
      // distinct: the bits fold is dup-safe but this confirm join is
      // not — a dim input with duplicate k values would emit one
      // disposition row per duplicate, breaking the one-row-per-arrival
      // contract (ADVICE r19)
      .join(broadcast(dimKeys.select(col("k")).distinct()
        .withColumn("in_dim", lit(true))),
        Seq("k"), "left")
      .select(col("k"),
        when(col("bloom_pass") && col("in_dim").isNotNull, "confirmed")
          .when(col("bloom_pass"), "false_pos")
          // a dim member the gate rejected would be a no-false-negative
          // contract violation — surface it loudly, never fold it into
          // "rejected" (the spec asserts this row never exists)
          .when(col("in_dim").isNotNull, "false_neg_bug")
          .otherwise("rejected").as("status"))
  }

  /** One row per micro-batch: the live KMV set-operation estimates of
    * the arrival stream against the frozen standing sketch. */
  final case class SetopsEst(
      n_seen: Long, n_arrivals_est: Long, n_union_est: Long,
      n_intersect_est: Long, n_new_est: Long)

  /** Streaming twin of x21's set-operation estimates — "how many NEW
    * keys has this crawl added SO FAR" served live: the standing side
    * folds ONCE to its K-row bottom-K sketch (driver-held, the
    * streamingJoinSizeEstimate discipline), and the arrival stream
    * maintains ITS bottom-K in one GroupState (a ≤K-long sorted set —
    * bounded whatever the stream; a new hash enters only if it beats
    * the current K-th minimum, the standard KMV insert). Each batch
    * re-emits x21's exact algebra: arrival estimate (K-1)·2^60/v_K,
    * union via merged bottom-Ks, intersection via the theta rule, and
    * n_new = max(union − standing, 0) — integer BigInt arithmetic
    * matching the batch op bit for bit, which the spec replays at
    * every cumulative cut. Single-group state, but the state task is
    * never the stream's funnel: a stateless per-partition bottom-K
    * pre-shrink folds each partition to one (count, ≤K hashes) tuple
    * first, so the group receives partition-many sketch-sized rows per
    * batch whatever the arrival volume — legal because KMV inserts are
    * idempotent and order-free and the carried counts keep n_seen
    * exact (the spec bounds the state task's input mechanically). */
  def streamingSetopsEstimate(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame,
      standingKeys: DataFrame): org.apache.spark.sql.Dataset[SetopsEst] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    import graft.functions.Portable
    import graft.operators.Extended.{X21_K, X21_H}
    val standing: Array[Long] = standingKeys
      .select(Portable.h60(col("k").cast("string"), "x21|").as("h"))
      .distinct().orderBy(col("h").asc).limit(X21_K)
      .collect().map(_.getLong(0)).sorted
    def est(sk: Seq[Long]): Long =
      if (sk.size < X21_K) sk.size.toLong
      else (BigInt(X21_K - 1) * X21_H / sk.max).toLong
    def eff(sk: Seq[Long]): Long =
      if (sk.size < X21_K) X21_H else sk.max
    def kmvInsert(sk: scala.collection.mutable.TreeSet[Long],
        h: Long): Unit =
      if (sk.size < X21_K) sk += h
      else if (h < sk.max && !sk.contains(h)) { sk += h; sk -= sk.max }
    arrivals
      .select(Portable.h60(col("k").cast("string"), "x21|").as("h"))
      .as[Long]
      // map-side pre-shrink (VERDICT r19 #4): each partition folds its
      // slice to (row count, its own bottom-K) BEFORE the single-group
      // state fold, so the state task receives one K-bounded tuple per
      // partition instead of the full arrival stream. Semantics are
      // untouched: KMV inserts are idempotent and order-free, only a
      // partition's bottom-K can enter the global bottom-K, and the
      // carried counts keep n_seen exact (duplicates included).
      .mapPartitions { it =>
        var cnt = 0L
        val sk = scala.collection.mutable.TreeSet.empty[Long]
        it.foreach { h => cnt += 1; kmvInsert(sk, h) }
        if (cnt == 0) Iterator.empty
        else Iterator.single((cnt, sk.toArray))
      }
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[(Long, Array[Long]), SetopsEst](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          var (seen, sk0) = state.getOption.getOrElse((0L, Array.empty[Long]))
          val sk = scala.collection.mutable.TreeSet.from(sk0)
          rows.foreach { case (cnt, hs) =>
            seen += cnt
            hs.foreach(kmvInsert(sk, _))
          }
          val arr = sk.toArray
          state.update((seen, arr))
          val union = (arr ++ standing).distinct.sorted.take(X21_K).toSeq
          val theta = math.min(eff(arr.toSeq), eff(standing.toSeq))
          val c = arr.toSet.intersect(standing.toSet).count(_ < theta)
          val estI = (BigInt(c) * X21_H / theta).toLong
          Iterator.single(SetopsEst(seen, est(arr.toSeq), est(union),
            estI, math.max(est(union) - est(standing.toSeq), 0L)))
      }
  }

  /** One mined pair served per arriving B-side vector: its best
    * standing-A anchor, both neighborhoods' margin inputs, the
    * integer-margin verdict, and whether the arrival DISPLACES the
    * anchor's standing best (the refresh signal). */
  final case class MinedPair(
      b_id: Long, a_id: Long, sim_u: Long, n_b: Long, sum_b_u: Long,
      n_a: Long, sum_a_u: Long, accepted: Boolean, displaces: Boolean)

  /** Dedup-state TTL for [[streamingMarginMining]]: how long a mined
    * arrival id is remembered for re-delivery swallowing before its
    * state entry is released. */
  private[graft] val MARGIN_DEDUP_TTL_MS = 6L * 3600 * 1000

  /** Streaming twin of a31's margin miner — mining run LIVE as new
    * B-side documents arrive (the crawl shape: the standing corpus is
    * yesterday's build, arrivals are today's candidate translations).
    * The standing side is touched only through FROZEN artifacts, the
    * a15/a18 incremental-index discipline: (1) the standing A-side
    * band table, capped with the SAME BUCKET_CAP (frozen sizing);
    * (2) per-anchor k-NN statistics (sum_a_u, n_a) and the anchor's
    * standing-best similarity, both derived from a31's own
    * [[graft.operators.Ann.marginRanked]] frame so batch and stream
    * share one definition. An arrival bands through the identical
    * d4 tables, meets standing anchors bucket-wise (stream-static
    * broadcast join — stateless, append-safe), and its WHOLE candidate
    * set lands in one micro-batch group (keyed by b_id), where its own
    * top-[[graft.operators.Ann.MARGIN_K]] stats and the
    * cross-multiplied margin verdict compute in one pass — the same
    * 40·sim·nA·nB > 21·(ΣA·nB + ΣB·nA) integer test as batch a31.
    *
    * Honest divergences, stated not implied: the anchor's k-NN stats
    * do NOT absorb arrivals (frozen until the next batch rebuild, like
    * a15's centroids), and batch a31's cross-candidate `mutual` flag
    * is replaced by `displaces` = the arrival beats the anchor's
    * standing-best similarity (an anchor with no standing candidate is
    * always displaced — a new anchor coming alive is a refresh signal
    * too).
    *
    * Stat-less anchors (n_a = 0: the anchor had no standing B-side
    * candidate, so its frozen neighborhood average is undefined): the
    * two-sided margin degenerates to 0 > 0 and would structurally
    * reject even a perfect match (ADVICE r18). The verdict falls back
    * to the arrival-side-only ratio margin — sim / avg_B > 1.05,
    * cross-multiplied as 20·sim·n_B > 21·Σ_B — i.e. the same 1.05
    * margin bar judged against the only neighborhood that exists
    * (the arrival's top-K, self included, the batch convention). One
    * corner stays conservative BY DESIGN: an arrival whose sole
    * candidate is a stat-less anchor has avg_B = sim, margin exactly
    * 1.0 < 1.05 → rejected. A pair with no neighborhood on either
    * side carries no margin evidence either way; it still surfaces
    * through `displaces` (always true for a stat-less anchor), which
    * is the rebuild signal, not through `accepted`.
    * Arrivals are filtered to the suite's B-side parity (vec_id odd),
    * the contract batch a31 enforces on its candidate join; an even id
    * on the arrival stream is corpus-side content and is dropped, not
    * mined.
    *
    * GroupState is one Boolean per arrival id: re-deliveries of an
    * already-mined b emit nothing. The state carries a processing-time
    * TTL ([[MARGIN_DEDUP_TTL_MS]]) and is REMOVED on timeout — with
    * NoTimeout the dedup set would grow one entry per distinct arrival
    * forever, an eventual OOM at crawl scale (ADVICE r18). The stated
    * trade: a re-delivery arriving later than the TTL after its
    * original is mined again (at-least-once within the window,
    * bounded state always). */
  def streamingMarginMining(
      spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame,
      standing: DataFrame): org.apache.spark.sql.Dataset[MinedPair] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    import graft.operators.{Ann, LlmOps}
    val e = standing.select(col("vec_id"), col("embedding").as("emb"))
    // frozen standing artifacts (static frames; computed from the
    // standing table only)
    val keptA = LlmOps.capBuckets(Ann.d4BandsOf(e), Seq("tbl", "bkey"))
      .filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("a_id"), col("tbl"), col("bkey"))
    val rkS = Ann.marginRanked(spark, e)
    val aStats = rkS.filter(col("rk_a") <= Ann.MARGIN_K)
      .groupBy(col("a_id"))
      .agg(sum(col("sim_u")).as("sum_a_u"), count(lit(1)).as("n_a"))
    val aBest = rkS.filter(col("rk_a") === 1)
      .select(col("a_id"), col("sim_u").as("a_best_u"))
    val anchors = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("a_id"), col("emb").as("emb_a"))
      .join(keptA, Seq("a_id"))
      .join(aStats, Seq("a_id"), "left")
      .join(aBest, Seq("a_id"), "left")
      .select(col("a_id"), col("emb_a"), col("tbl"), col("bkey"),
        coalesce(col("sum_a_u"), lit(0L)).as("sum_a_u"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("a_best_u"), lit(Long.MinValue)).as("a_best_u"))
    // stream side: band the arrival IN ONE PROJECTION (emb carried
    // through the explode — a band re-join would be a stream-stream
    // self-join), meet standing anchors bucket-wise, score on the
    // identical kernel/scaling. A (b, a) pair agreeing on several band
    // tables yields identical candidate tuples; they dedupe INSIDE the
    // group function (a streaming dropDuplicates would be a second
    // stateful operator).
    val cands = Ann.d4BandsWithEmb(
        arrivals.select(col("vec_id"), col("embedding").as("emb"))
          .filter(col("vec_id") % 2 === 1))
      .withColumnRenamed("emb", "emb_b")
      .join(broadcast(anchors), Seq("tbl", "bkey"))
      .select(col("vec_id").as("b_id"), col("a_id"),
        Ann.microCos(spark, "emb_a", "emb_b").as("sim_u"),
        col("sum_a_u"), col("n_a"), col("a_best_u"))
      .as[(Long, Long, Long, Long, Long, Long)]
    cands
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, MinedPair](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout) {
        case (bId, rows, state) =>
          if (state.hasTimedOut) {
            state.remove() // dedup window closed: release the entry
            Iterator.empty
          } else if (state.exists) {
            // re-delivered arrival inside the window: swallow, and
            // re-arm the TTL (it clears whenever the key sees data)
            state.setTimeoutDuration(MARGIN_DEDUP_TTL_MS)
            Iterator.empty
          } else {
            state.update(true)
            state.setTimeoutDuration(MARGIN_DEDUP_TTL_MS)
            val cs = rows.toVector.distinct
              .sortBy { case (_, aId, simU, _, _, _) => (-simU, aId) }
            if (cs.isEmpty) Iterator.empty
            else {
              val (_, aId, simU, sumA, nA, aBestU) = cs.head
              val top = cs.take(Ann.MARGIN_K)
              val (sumB, nB) = (top.map(_._3).sum, top.size.toLong)
              val accepted =
                if (nA > 0L)
                  40L * simU * nA * nB >
                    21L * (sumA * nB + sumB * nA)
                else // stat-less anchor: arrival-side-only 1.05 margin
                  20L * simU * nB > 21L * sumB
              Iterator.single(MinedPair(bId, aId, simU, nB, sumB,
                nA, sumA, accepted, simU > aBestU))
            }
          }
      }
  }
}
