package graft

import java.nio.file.Files
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.CurationQueries
import graft.functions.Text

/** Behavioral coverage for the content-curation batch (CurationQueries);
  * the oracle gate covers cross-engine value parity, these pin the
  * semantics the oracle can't state (span-removal exactness, two-phase ==
  * naive rank, the integer-ratio LM score, redaction layout). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  /** A documents.parquet-shaped temp dir with crafted (id, text, source). */
  private def corpusDir(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("curation-spec").toString
    rows.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("substring dedup: shared 8-gram spans removed from BOTH docs, rest untouched") {
    val dir = corpusDir(Seq(
      (1L, "a b c d e f g h i j", "s"),
      (2L, "z y x a b c d e f g h w", "s"),
      (3L, "p q r s t u v aa bb cc", "s")))
    val got = CurationQueries.substringDedup.build(spark, dir)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // doc 1: gram "a b c d e f g h" starts at 1, covers 1..8 -> "i j" survives
    assert(got(0) == ((1L, 10L, 8L, "i j")))
    // doc 2: same gram starts at 4, covers 4..11 -> "z y x" + "w" survive
    assert(got(1) == ((2L, 12L, 8L, "z y x w")))
    // doc 3 shares nothing: untouched
    assert(got(2) == ((3L, 10L, 0L, "p q r s t u v aa bb cc")))
  }

  test("substring dedup: a span repeated only WITHIN one doc is not removed") {
    val eight = "a b c d e f g h"
    val dir = corpusDir(Seq(
      (1L, s"$eight x $eight", "s"),
      (2L, "p q r s t u v w aa bb", "s")))
    val got = CurationQueries.substringDedup.build(spark, dir)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0)._3 == 0L && got(0)._4 == s"$eight x $eight",
      "within-doc repetition is q_repetition_quality's job, not cross-doc dedup")
  }

  test("substring dedup: fully-duplicated doc rebuilds to the empty string") {
    val t = "a b c d e f g h"
    val dir = corpusDir(Seq((1L, t, "s"), (2L, t, "s")))
    val got = CurationQueries.substringDedup.build(spark, dir)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got.forall(r => r._3 == 8L && r._4 == ""))
  }

  test("engine substring dedup: n and minDocs parameterize the span rule") {
    val dir = corpusDir(Seq(
      (1L, "a b c x1 y1 z1", "s"),
      (2L, "a b c x2 y2 z2", "s"),
      (3L, "a b c x3 y3 z3", "s"),
      (4L, "d e f x4 y4 z4", "s"),
      (5L, "d e f x5 y5 z5", "s")))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = graft.engine.Curation
      .substringDedup(docs, "doc_id", "text", n = 3, minDocs = 3)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    // "a b c" occurs in 3 docs -> removed everywhere; "d e f" only in 2 -> kept
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 0L, 5L -> 0L), s"got $got")
  }

  test("source cap: two-phase rank equals the naive single-window rank exactly") {
    val got = CurationQueries.sourceCap.build(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSet
    val h = Text.md5Hash32(concat(lit("cap:"), col("doc_id").cast("string")))
    val naive = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), h.as("h"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("source").orderBy(col("h"), col("doc_id"))).cast("long"))
      .filter(col("rnk") <= CurationQueries.SourceCap)
      .select(col("doc_id"), col("source"), col("rnk"))
      .as[(Long, String, Long)].collect().toSet
    assert(got.map { case (d, s2, r, _) => (d, s2, r) } == naive)
    // every source contributes at most cap docs with contiguous ranks
    val bySource = got.groupBy(_._2)
    assert(bySource.forall { case (_, rows) =>
      rows.size <= CurationQueries.SourceCap &&
        rows.map(_._3).toSeq.sorted == (1L to rows.size).toSeq })
  }

  test("curriculum order: band-major, shuffled within, equal to the naive global rank") {
    val got = CurationQueries.curriculumOrder.build(spark, sf)
      .as[(Long, Long, Long)].collect()
    // ords are a permutation of 1..N
    assert(got.map(_._3).sorted.toSeq == (1L to got.length).toSeq)
    // band-major: every doc of a lower band precedes every doc of a higher
    val byOrd = got.sortBy(_._3)
    assert(byOrd.map(_._2).toSeq == byOrd.map(_._2).sorted.toSeq,
      "bands must ascend along the training order")
    // the distributed stitch equals the naive single-window rank
    val h = graft.functions.Text.md5Hash32(
      concat(lit("cur:"), col("doc_id").cast("string")))
    val naive = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        floor(graft.functions.Text.tokenCount(col("text")) / lit(25.0))
          .cast("long").as("band"), h.as("h"))
      .withColumn("ord", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("band"), pmod(col("h"), lit(64L)), col("h"), col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("band"), col("ord"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got.toSet == naive)
  }

  test("lm score: integer sums match the hand-computed MLE ratio") {
    val dir = corpusDir(Seq(
      (1L, "a b a b", "s"), (2L, "a b c", "s"), (3L, "x", "s")))
    val got = CurationQueries.lmScore.build(spark, dir)
      .as[(Long, Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    // c2: "a b"->3, "b a"->1, "b c"->1 ; c1: a->3, b->2
    assert(got(0) == ((1L, 3L, 7L, 8L, Some(7.0 / 8))))
    assert(got(1) == ((2L, 2L, 4L, 5L, Some(4.0 / 5))))
    assert(got(2) == ((3L, 0L, 0L, 0L, None)), "single-token doc: no bigrams, null support")
  }

  test("curation report: each gate fires on its plant, priority order holds") {
    val bench = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    val clean = (1 to 24).map(i => s"w$i").mkString(" ")
    val dir = corpusDir(Seq(
      (0L, bench, "s"),                                    // benchmark slice
      (1L, bench, "s"),                                    // verbatim copy -> contaminated
      (2L, "x y z", "s"),                                  // too_short
      (3L, Seq.fill(25)("r").mkString(" "), "s"),          // repetitive
      (4L, (1 to 12).flatMap(i => Seq("spark", s"u$i")).mkString(" "), "s"), // blocklisted
      (5L, clean, "s"),                                    // keep
      (6L, Seq.fill(20)(bench).mkString(" "), "s")))       // contaminated AND repetitive
    val got = CurationQueries.curationReport.build(spark, dir)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "contaminated", 2L -> "too_short",
      3L -> "repetitive", 4L -> "blocklisted", 5L -> "keep",
      6L -> "contaminated"), s"got $got")
    assert(!got.contains(0L), "the benchmark slice itself is not reported")
  }

  test("budget mixture: every stripe stays within budget and admits greedily") {
    val got = CurationQueries.budgetMixture.build(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    assert(got.nonEmpty)
    // every admitted doc STARTED under its stripe budget
    val budget = Map("en" -> 5000L / 64, "zh" -> 2000L / 64).withDefaultValue(3000L / 64)
    assert(got.forall { case (_, lang, _, cum) => cum < budget(lang) })
    // greedy: within a (lang, stripe) the admitted cum_starts are exactly
    // the running sum of the admitted docs in hash order (no gaps)
    val h = graft.functions.Text.md5Hash32(
      concat(lit("bud:"), col("doc_id").cast("string")))
    val hashes = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), h.as("h")).as[(Long, Long)].collect().toMap
    got.groupBy { case (id, lang, _, _) => (lang, hashes(id) % 64) }
      .foreach { case (_, rows) =>
        val ordered = rows.sortBy { case (id, _, _, _) => (hashes(id), id) }
        var cum = 0L
        ordered.foreach { case (id, _, toks, cumStart) =>
          assert(cumStart == cum, s"doc $id: gap in stripe cumsum")
          cum += toks
        }
      }
  }

  test("pipeline e2e: every output doc passed every stage") {
    val out = CurationQueries.pipelineE2e.build(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val ids = out.map(_._1).toSet
    // stage 1: gate — output ⊆ the report's keep set
    val keep = CurationQueries.curationReport.build(spark, sf)
      .filter(col("verdict") === "keep")
      .select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(keep), "a gated-out doc leaked into the shards")
    // stage 2: dedup — output fingerprints are unique
    val fps = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select(graft.functions.Text.fingerprint(col("text")).as("fp"))
      .as[String].collect()
    assert(fps.distinct.length == fps.length, "duplicate content in the output")
    // stage 3: split — only train-bucket docs
    val trainBucket = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), (graft.functions.Text.md5Hash32(
        concat(lit("split:"), col("doc_id").cast("string"))) % 100).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(ids.forall(trainBucket(_) < 90), "non-train doc in the output")
    // stage 4: pack arithmetic — shard = bucket*stride + (cum-toks)/budget
    assert(out.forall { case (_, bucket, shard, toks, cum) =>
      shard == bucket * graft.functions.Text.PackShardStride +
        (cum - toks) / graft.functions.Text.PackBudget })
  }

  test("corpus diff: verdict partition matches the plant rules") {
    val got = CurationQueries.corpusDiff.build(spark, sf)
      .as[(Long, String)].collect()
    got.foreach { case (id, v) =>
      val expected =
        if (id % 11 == 3 && id % 17 == 5) None // in neither snapshot
        else if (id % 11 == 3) Some("added")
        else if (id % 17 == 5) Some("removed")
        else if (id % 13 == 2) Some("changed")
        else Some("same")
      assert(expected.contains(v), s"doc $id: got $v expected $expected")
    }
    assert(Set("added", "removed", "changed", "same")
      .subsetOf(got.map(_._2).toSet), "all four verdicts must occur")
  }

  test("pii scrub: plants detected and redacted, corpus otherwise clean") {
    // ids chosen against the plant rules: 2 -> email (2 % 17), 5 -> phone
    // (5 % 23), 189 -> both (CRT: 189 = 2 mod 17 = 5 mod 23), 1 -> neither
    val dir = corpusDir(Seq(
      (1L, "plain text here", "s"),
      (2L, "write to me", "s"),
      (5L, "ring me", "s"),
      (189L, "both kinds", "s")))
    val got = CurationQueries.piiScrub.build(spark, dir)
      .as[(Long, Long, Long, String, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 0L, 0L, "plain text here", "clean")))
    assert(got(1) == ((2L, 1L, 0L, "write to me contact [EMAIL] now", "redacted")))
    assert(got(2) == ((5L, 0L, 1L, "ring me call [PHONE]", "redacted")))
    assert(got(3) == ((189L, 1L, 1L,
      "both kinds contact [EMAIL] now call [PHONE]", "redacted")))
    // the synthetic corpus carries NO natural PII, so every count must be
    // exactly what the plant rule implies — over-matching patterns (or a
    // corpus drift that introduces PII-shaped text) fail loudly here
    val real = CurationQueries.piiScrub.build(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_emails", "n_phones")
      .as[(Long, Long, Long)].collect()
    assert(real.nonEmpty)
    real.foreach { case (id, e, p) =>
      assert(e == (if (id % 17 == 2) 1L else 0L), s"doc $id emails")
      assert(p == (if (id % 23 == 5) 1L else 0L), s"doc $id phones")
    }
  }

  test("blocklist scrub: redaction in place, threshold verdict") {
    val dir = corpusDir(Seq(
      (1L, "spark is fast", "s"),
      (2L, "the cat sat on the mat", "s"),
      (3L, "spark query data join spark", "s")))
    val got = CurationQueries.blocklistScrub.build(spark, dir)
      .select("doc_id", "n_hits", "hit_frac", "scrubbed_text", "verdict")
      .as[(Long, Long, Double, String, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 1L, 1.0 / 3, "[X] is fast", "drop")))
    assert(got(1) == ((2L, 0L, 0.0, "the cat sat on the mat", "keep")))
    assert(got(2) == ((3L, 5L, 1.0, "[X] [X] [X] [X] [X]", "drop")))
  }

  test("stratified top-k: fallback branch is exact when the hash filter starves") {
    // reference: plain per-stratum rank by (h, doc_id)
    def ref(rows: Seq[(String, Long, Long)], k: Int): Set[(String, Long, Long)] =
      rows.groupBy(_._1).toSeq.flatMap { case (lang, rs) =>
        rs.sortBy(r => (r._3, r._2)).take(k).zipWithIndex
          .map { case ((l, id, _), i) => (l, id, (i + 1).toLong) }
      }.toSet
    // three strata: 'ok' passes the oversample filter; 'starved' has ALL
    // hashes above the 4k/n cutoff (impossible for uniform md5 — exactly
    // the adversarial case the fallback union exists for); 'tiny' has
    // n < k so the cutoff opens to the full key space
    val n = 200
    val k = 5
    val cutoff = (4L * k << 32) / n
    val rows =
      (0 until n).map(i => ("ok", i.toLong, i.toLong)) ++
        (0 until n).map(i => ("starved", i.toLong, cutoff + i)) ++
        (0 until 3).map(i => ("tiny", i.toLong, (1L << 33) + i))
    val got = CurationQueries.stratifiedTopK(
        rows.toDF("lang", "doc_id", "h"), k)
      .select("lang", "doc_id", "rk").as[(String, Long, Long)].collect().toSet
    assert(got == ref(rows, k))
    assert(got.count(_._1 == "starved") == k, "starved stratum must still yield k rows")
    assert(got.count(_._1 == "tiny") == 3, "undersized stratum yields all its rows")
  }

  test("quality score: exact integer dot product; repetition/stopword docs drop") {
    val docs = Seq(
      (0L, "alpha beta gamma delta", "s"),   // varied, no stopwords
      (1L, "aa aa aa aa", "s"),              // degenerate repetition
      (2L, "the the the the a a a a", "s"))  // pure stopword density
    val dir = corpusDir(docs)
    val got = CurationQueries.qualityScore.build(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6))).toMap
    // literal recompute of the declared features and weight vector
    def expect(text: String) = {
      val tk = text.split(" ")
      val nT = tk.length.toLong
      val distinct = tk.distinct.length * 1000000L / nT
      val wlen = tk.map(_.length.toLong).sum * 1000000L / nT
      val stop = tk.count(t => t == "a" || t == "the") * 1000000L / nT
      val score = 600L * distinct + 500000L * math.min(nT, 80L) +
        20L * wlen - 900L * stop
      (nT, distinct, wlen, stop, score,
        if (score >= 340000000L) "keep" else "drop")
    }
    for ((id, text, _) <- docs)
      assert(got(id) == expect(text), s"doc $id")
    // the classifier's point: the varied doc clears the operating point,
    // the repetition and stopword degenerates fall below it
    assert(got(0L)._6 == "keep" && got(1L)._6 == "drop" && got(2L)._6 == "drop")
    assert(got(2L)._5 < got(1L)._5 && got(1L)._5 < got(0L)._5)
  }

  test("q_ngram_novelty: replicas score 0, splices only boundary grams, originals high") {
    val rows = graft.queries.CurationQueries.ngramNovelty.build(spark, sf)
      .select("doc_id", "n_ngrams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, nov, frac) =>
      assert(nov <= n, s"doc $id: n_novel $nov > n_ngrams $n")
      if (n > 0) assert(frac == nov.toDouble / n)
    }
    val replicas = rows.filter(r => r._1 >= 1000000L && r._1 < 3000000L)
    assert(replicas.nonEmpty, "plant broken: no replica docs")
    replicas.foreach { case (id, _, nov, _) =>
      assert(nov == 0L, s"replica $id claims $nov novel grams — its original precedes it")
    }
    val splices = rows.filter(_._1 >= 3000000L)
    assert(splices.nonEmpty, "plant broken: no splice docs")
    splices.foreach { case (id, _, nov, _) =>
      // only grams crossing the splice boundary can be new: at most 7 for
      // 8-grams (and the paste can collide with itself, so >= 0 is all
      // the lower bound we assert)
      assert(nov <= 7L, s"splice $id claims $nov novel grams > boundary bound 7")
    }
    // originals: the synthetic 31-word vocabulary makes 8-gram collisions
    // across docs vanishingly rare — novelty stays high
    val originals = rows.filter(_._1 < 1000000L)
    assert(originals.count(_._4 > 0.9) > originals.length * 9 / 10,
      "original docs should be overwhelmingly novel")
  }

  test("score calibration: bins, gaps and ECE match a hand-computed table") {
    // docA: 80 distinct 6-char tokens -> score 760e6, clamps to the
    //       ladder ceiling -> pred 999999, bin 9, long (pos)
    // docB: 'the' x10 -> score -775e6, clamps to 0 -> bin 0, short
    // docC: 20 distinct 3-char tokens x2 (n=40) -> pred 542857, bin 5, long
    // docD: 15 distinct 3-char tokens x2 (n=30) -> pred 535714, bin 5, short
    val docA = (0 until 80).map(i => f"tok$i%03d").mkString(" ")
    val docB = Seq.fill(10)("the").mkString(" ")
    val docC = (0 until 20).flatMap(i => Seq(f"w$i%02d", f"w$i%02d")).mkString(" ")
    val docD = (0 until 15).flatMap(i => Seq(f"w$i%02d", f"w$i%02d")).mkString(" ")
    val dir = corpusDir(Seq(
      (0L, docA, "s"), (1L, docB, "s"), (2L, docC, "s"), (3L, docD, "s")))
    val got = CurationQueries.scoreCalibration.build(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got(9L) == ((1L, 999999L, 1000000L, 1L, 19642L)))
    assert(got(0L) == ((1L, 0L, 0L, 0L, 19642L)))
    // bin 5: mean_pred = (542857 + 535714) DIV 2 = 539285, obs = 500000,
    // gap = 39285; ECE = (2*39285 + 1*1 + 1*0) DIV 4 = 19642
    assert(got(5L) == ((2L, 539285L, 500000L, 39285L, 19642L)))
    assert(got.size == 3, "only populated bins appear")
  }
}
