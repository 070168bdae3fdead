package graft

import org.apache.spark.sql.functions._

/** d13_cap_report: the no-silent-caps accounting (VERDICT r13 #2). The
  * planted-fixture test pins the exact drop/sample arithmetic against a
  * hand-computable band table; the registry test asserts the report
  * covers every capped index surface on real data. */
class CapReportSpec extends SparkSuite {
  import spark.implicits._

  test("capStats pins drop and sample arithmetic on a planted hot bucket") {
    // bucket "hot": 100 members (over a cap of 64); "cold": 3 members
    val bands = ((1 to 100).map(i => ("hot", i.toLong)) ++
      (1 to 3).map(i => ("cold", i.toLong))).toDF("bkey", "doc_id")
    val drop = operators.LlmOps
      .capStats("t_drop", "drop", bands, Seq("bkey"), 64)
      .as[(String, String, Long, Long, Long, Long, Long)].head()
    assert(drop === (("t_drop", "drop", 64L, 2L, 1L, 103L, 100L)),
      "drop policy: whole over-cap bucket counts as affected")
    val sample = operators.LlmOps
      .capStats("t_sample", "sample", bands, Seq("bkey"), 64)
      .as[(String, String, Long, Long, Long, Long, Long)].head()
    assert(sample === (("t_sample", "sample", 64L, 2L, 1L, 103L, 36L)),
      "sample policy: only members beyond the cap sample are affected")
  }

  test("capStats of an under-cap table reports zero affected rows") {
    val bands = (1 to 10).map(i => ("b" + (i % 3), i.toLong))
      .toDF("bkey", "doc_id")
    val r = operators.LlmOps
      .capStats("t", "drop", bands, Seq("bkey"), 64)
      .as[(String, String, Long, Long, Long, Long, Long)].head()
    assert(r === (("t", "drop", 64L, 3L, 0L, 10L, 0L)))
  }

  test("d13 reports a planted over-cap STANDING bucket on a18's surface") {
    // 700 vectors with IDENTICAL embeddings: every standing vector
    // (vec_id % 10 != 0 → 630 of them) lands in the SAME sign bucket of
    // each sign family (identical emb → identical hyperplane signs), so
    // an arriving vector's neighbor-candidate pool is sampled
    // 630 → NSW_CAP. The report must surface exactly that: 1 occupied
    // bucket, over cap, 630 − 256 rows sampled out — hand-computable
    // because nbits(630) = 4 (630 < 128·2^4) and the pile-up is total.
    val nVec = 700L
    val emb = Array.tabulate(64)(j => ((j % 5) + 1) * 0.1f)
    val dir = java.nio.file.Files.createTempDirectory("a18cap").toString
    (0L until nVec).map(i => (i, emb, (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    (0L until 20L)
      .map(id => (id, "the quick brown fox jumps over the lazy dog",
        "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.LlmOps.d13CapReport.fn(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val nStanding = (0L until nVec).count(_ % 10 != 0).toLong // 630
    val overflow = nStanding - operators.Ann.NSW_CAP // 374
    for (fam <- Seq("a18_sign_a", "a18_sign_b")) {
      assert(rows(fam) === ((1L, 1L, nStanding, overflow)),
        s"$fam: planted standing pile-up not reported")
    }
    // the random family spreads by vec_id hash (identical payloads
    // cannot co-bucket it) — accounting must still cover every member
    assert(rows("a18_rand")._3 === nStanding)
  }

  test("d13_cap_report covers every capped index surface") {
    val rows = operators.LlmOps.d13CapReport.fn(spark, sf).collect()
    val idx = rows.map(_.getString(0)).toSet
    assert(idx === Set("d2_minhash", "d3b_simhash", "d4_banded",
      "d5_anchor", "d12b_banded", "nsw_sign_a", "nsw_sign_b", "nsw_rand",
      "a19_l1_sign_a", "a19_l1_sign_b", "a19_l1_rand",
      "a19_l2_sign_a", "a19_l2_sign_b", "a19_l2_rand",
      "a18_sign_a", "a18_sign_b", "a18_rand",
      "a24_l1_sign_a", "a24_l1_sign_b", "a24_l1_rand",
      "a24_l2_sign_a", "a24_l2_sign_b", "a24_l2_rand",
      "a22_band", "t20_vocab"))
    for (r <- rows) {
      // a19 layer slices may be legitimately empty at tiny fixture
      // sizes (the 1-in-64 draw over 20 vectors); everything else must
      // carry rows
      if (!r.getString(0).startsWith("a19_") &&
          !r.getString(0).startsWith("a24_"))
        assert(r.getLong(5) > 0L, s"${r.getString(0)}: empty band table")
      // affected ≤ total, and over-cap bucket count consistent with rows
      assert(r.getLong(6) <= r.getLong(5), r.getString(0))
      assert(r.getLong(4) <= r.getLong(3), r.getString(0))
    }
    // graph frames are sample policy, dedup frames drop policy
    val byIdx = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    def graphRow(n: String) = n.startsWith("nsw") ||
      n.startsWith("a19_") || n.startsWith("a18_") ||
      n.startsWith("a24_") ||
      n == "a22_band" // sampled for the same reason: pool grows with corpus
    assert(byIdx.filter(kv => graphRow(kv._1)).values.toSet ===
      Set("sample"))
    assert(byIdx("t20_vocab") === "topk")
    assert(byIdx.filterNot(kv =>
      graphRow(kv._1) || kv._1 == "t20_vocab").values.toSet ===
      Set("drop"))
    // layer accounting is EXACT: each layer family's rows_total equals
    // the layer's member count (one bucket row per member per family)
    val e = Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").as("emb"))
    for (k <- 1 to operators.Ann.HNSW_MAXL) {
      val m = operators.Ann.hnswMembers(e, k).count()
      for (fam <- Seq("sign_a", "sign_b", "rand")) {
        val r = rows.find(_.getString(0) == s"a19_l${k}_$fam").get
        assert(r.getLong(5) === m,
          s"a19_l${k}_$fam rows_total ${r.getLong(5)} != members $m")
      }
    }
    // a24's per-layer surfaces cover exactly the STANDING layer slice
    for (k <- 1 to operators.Ann.HNSW_MAXL) {
      val m = operators.Ann
        .hnswMembers(operators.Ann.a18Standing(e), k).count()
      for (fam <- Seq("sign_a", "sign_b", "rand")) {
        val r = rows.find(_.getString(0) == s"a24_l${k}_$fam").get
        assert(r.getLong(5) === m,
          s"a24_l${k}_$fam rows_total ${r.getLong(5)} != standing " +
            s"layer members $m")
      }
    }
    // a18's accounting covers exactly the standing corpus per family
    val standing = operators.Ann.a18Standing(e).count()
    for (fam <- Seq("sign_a", "sign_b", "rand")) {
      val r = rows.find(_.getString(0) == s"a18_$fam").get
      assert(r.getLong(5) === standing,
        s"a18_$fam rows_total ${r.getLong(5)} != standing $standing")
    }
  }

  test("d13 reports t20's vocab saturation on a planted over-cap vocab") {
    // 300 distinct words (past BPE_VOCAB_CAP = 256) with a frequency
    // staircase: word w_i appears (i < 100 ? 3 : 1) times, so the
    // top-256 under (freq DESC, word ASC) is all 100 tripled words
    // plus the 156 lexicographically-first singles; the 44 remaining
    // singles are the saturation — hand-computable mass of 44 tokens
    val cap = operators.LlmOps.BPE_VOCAB_CAP // 256
    // alpha-only (the pre-tokenizer drops anything else), lexicographic
    // order == index order
    val words = (0 until 300).map(i =>
      s"w${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    val text = (words.take(100).flatMap(w => Seq(w, w, w)) ++
      words.drop(100)).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("t20cap").toString
    Seq((0L, text, "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings table must exist for the other report branches
    Seq((0L, Array.fill(64)(0.1f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = operators.LlmOps.d13CapReport.fn(spark, dir).collect()
      .find(_.getString(0) == "t20_vocab").get
    assert(r.getLong(3) === 300L, "buckets_total = distinct words")
    assert(r.getLong(4) === (300L - cap), "buckets_over = words past cap")
    assert(r.getLong(5) === 500L, "rows_total = token occurrences")
    assert(r.getLong(6) === (300L - cap),
      "rows_affected = occurrences carried by dropped words")
  }
}
