package graft

import org.apache.spark.sql.functions._

import graft.operators.LlmOps

/** T20 BPE merge learning: the distributed trainer must equal an
  * INDEPENDENT driver-side recompute of the same algorithm (plain
  * Scala string ops, not a re-run of the operator's code), anchor to
  * the classic Sennrich fixture, and the bounded-pass replace
  * semantics must resolve planted symbol runs exactly. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** The t20 algorithm in plain Scala: word-freq table → delimited
    * symbol strings → per-round (argmax pair by (weight desc, pair
    * asc), apply via BPE_REPLACE_PASSES non-overlapping replaces —
    * String.replace is left-to-right non-overlapping, the same
    * semantics both engines' replace() implement). */
  private def referenceBpe(
      wordFreq: Map[String, Long]): Seq[(Long, String, String, Long)] = {
    var seq = wordFreq.map { case (w, f) =>
      (w, f, " " + w.map(c => s"$c ").mkString)
    }.toSeq
    (1 to LlmOps.BPE_ROUNDS).flatMap { i =>
      val weights = seq.flatMap { case (_, f, s) =>
        val syms = s.trim.split(" ")
        syms.zip(syms.tail).map(p => (p, f))
      }.groupBy(_._1).map { case (p, vs) => (p, vs.map(_._2).sum) }
      // a fully-merged vocab has no adjacent pairs left: BPE is done,
      // later rounds emit nothing (the operator and both engines'
      // oracle chains agree — an empty argmax empties every later CTE)
      weights.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }
        .headOption.map { case ((lhs, rhs), w) =>
          seq = seq.map { case (word, f, s) =>
            val applied = (1 to LlmOps.BPE_REPLACE_PASSES).foldLeft(s)(
              (acc, _) => acc.replace(s" $lhs $rhs ", s" $lhs$rhs "))
            (word, f, applied)
          }
          (i.toLong, lhs, rhs, w)
        }
    }
  }

  private def writeDocs(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("bpefix").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s1") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("T20: learned merges equal the independent recompute, and the " +
    "classic fixture learns (e,s) then (es,t)") {
    // Sennrich's worked example: low x5, lower x2, newest x6, widest x3.
    // 'e s' and 's t' tie at weight 9; (e,s) wins on pair order, and
    // round 2 must merge the RESULT symbol ('es','t') — a trainer that
    // re-pairs from round-0 sequences repeats (s,t) instead.
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val dir = writeDocs(words.grouped(4).map(_.mkString(" ")).toSeq)
    val got = LlmOps.t20BpeMerges.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(4))).sortBy(_._1)
    val want = referenceBpe(
      words.groupBy(identity).map { case (w, vs) => w -> vs.size.toLong })
    assert(got.toSeq === want, "every merge round, bit for bit")
    assert(got(0) === ((1L, "e", "s", 9L)), "round 1: (e,s) on tie-break")
    assert(got(1) === ((2L, "es", "t", 9L)),
      "round 2 must consume round 1's merged symbol")
    // merged column is lhs||rhs
    val merged = LlmOps.t20BpeMerges.fn(spark, dir).collect()
    merged.foreach(r =>
      assert(r.getString(3) === r.getString(1) + r.getString(2)))
  }

  /** t21's encoding in plain Scala: per doc, alpha words explode to
    * char symbols, anything else becomes the non-mergeable '0', word
    * strings concatenate (double-space boundaries), then every learned
    * merge applies in order with the same bounded replace passes. */
  private def referenceEncode(
      text: String, merges: Seq[(String, String)]): Long = {
    val seq0 = text.toLowerCase.split(" ").filter(_.nonEmpty).map { w =>
      if (w.forall(c => c >= 'a' && c <= 'z'))
        " " + w.map(c => s"$c ").mkString
      else " 0 "
    }.mkString
    val enc = merges.foldLeft(seq0) { case (s, (l, r)) =>
      (1 to LlmOps.BPE_REPLACE_PASSES).foldLeft(s)(
        (acc, _) => acc.replace(s" $l $r ", s" $l$r "))
    }
    if (enc.trim.isEmpty) 0L else enc.trim.split(" +").length.toLong
  }

  test("T21: per-doc token counts equal the independent encode replay, " +
    "merges stop at word boundaries, non-alpha tokens count as one") {
    // the Sennrich vocabulary again, but now laid out so the ENCODING
    // edge cases fire: 'newest lowest' must NOT merge across the word
    // boundary even though 'st lo' could look adjacent in a flat
    // single-space string; digits/punct count exactly 1 token each;
    // and a doc of only separators counts 0
    val texts = Seq(
      Seq.fill(5)("low").mkString(" ") + " " +
        Seq.fill(2)("lower").mkString(" "),
      Seq.fill(6)("newest").mkString(" "),
      Seq.fill(3)("widest").mkString(" "),
      "newest lowest",
      "pay 42 dollars, now!",
      "   ")
    val dir = writeDocs(texts)
    // the learned rules, independently recomputed (referenceBpe) from
    // the fixture's word-frequency table — t21 must apply THESE
    val wordFreq = texts.flatMap(_.toLowerCase.split(" "))
      .filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'))
      .groupBy(identity).map { case (w, vs) => w -> vs.size.toLong }
    val merges = referenceBpe(wordFreq).map(m => (m._2, m._3))
    val got = LlmOps.t21BpeEncode.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val wantCounts = texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> referenceEncode(t, merges)
    }
    assert(got.map(r => (r._1, r._2)).toSeq === wantCounts,
      "every doc's token count, bit for bit vs the encode replay")
    // corpus total is the same number on every row and sums the counts
    val total = wantCounts.map(_._2).sum
    assert(got.map(_._3).toSet === Set(total), "corpus_tokens must ride " +
      "every row with the exact total")
    // the planted edge cases did what the comment claims
    val byId = got.map(r => r._1 -> r._2).toMap
    assert(byId(5L) === 0L, "separator-only doc must count 0 tokens")
    // 'pay 42 dollars, now!': 42 / 'dollars,' / 'now!' are single '0'
    // symbols; 'pay' is alpha and segments by the learned merges
    assert(byId(4L) === 3L + referenceEncode("pay", merges),
      "each non-alpha whitespace token counts exactly one")
    // word-boundary isolation: encoding 'newest lowest' equals the sum
    // of encoding each word alone (no cross-word merge ever applies)
    assert(byId(3L) === referenceEncode("newest", merges) +
      referenceEncode("lowest", merges),
      "merges must not span the double-space word boundary")
  }

  test("T9b: packing budgets on the learned tokenizer's counts, " +
    "replayed exactly") {
    val texts = Seq(
      Seq.fill(5)("low").mkString(" "),
      Seq.fill(2)("lower").mkString(" "),
      Seq.fill(6)("newest").mkString(" "),
      Seq.fill(3)("widest").mkString(" "),
      "pay 42 dollars, now!",
      "newest lowest low lower widest")
    val dir = writeDocs(texts)
    val wordFreq = texts.flatMap(_.toLowerCase.split(" "))
      .filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'))
      .groupBy(identity).map { case (w, vs) => w -> vs.size.toLong }
    val merges = referenceBpe(wordFreq).map(m => (m._2, m._3))
    val counts = texts.zipWithIndex
      .map { case (t, i) => i.toLong -> referenceEncode(t, merges) }
    // the BPE counts genuinely differ from the whitespace proxy
    // somewhere (otherwise this op proves nothing over t9)
    val ws = texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.split(" ").count(_.nonEmpty).toLong }.toMap
    assert(counts.exists { case (id, n) => n != ws(id) },
      "fixture must expose the subword/whitespace count gap")
    // driver-side packing replay: one source, doc_id order
    val budget = operators.LlmOps.PACK_BUDGET
    var cum = 0L
    val want = counts.sortBy(_._1).map { case (id, n) =>
      val before = cum; cum += n
      (id, n, before / budget, before - (before / budget) * budget)
    }
    val got = operators.LlmOps.t9bPackBpe.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq === want, "pack assignment, bit for bit")
    got.foreach { case (id, _, _, off) =>
      assert(off >= 0 && off < budget, s"doc $id offset $off out of range")
    }
  }

  test("T20: bounded replace passes resolve same-symbol runs <= 8") {
    // 'aaaaaaaa' (run of 8): one replace pass takes ' a a a a a a a a '
    // to ' aa aa aa aa ' only if the scanner re-used the trailing
    // delimiter — it does NOT (non-overlapping, continue-after-match),
    // so pass 1 yields 4 merges interleaved with singles and passes
    // 2-3 finish the job; the spec pins that Spark and the reference
    // agree on the EXACT final segmentation via the round-2+ weights.
    val dir = writeDocs(Seq(Seq.fill(12)("aaaaaaaa").mkString(" ")))
    val got = LlmOps.t20BpeMerges.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(4))).sortBy(_._1)
    val want = referenceBpe(Map("aaaaaaaa" -> 12L))
    assert(got.toSeq === want,
      "run-of-8 merge schedule, bit for bit vs the reference semantics")
    assert(got(0)._2 === "a" && got(0)._3 === "a", "round 1 merges (a,a)")
  }
}
