package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.CorpusQueries

/** Behavioral coverage for the corpus-curation batch (CorpusQueries); the
  * oracle gate covers cross-engine value parity, these pin the semantics the
  * oracle can't state (plant detection, threshold behavior, id contiguity). */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  /** A documents.parquet-shaped temp dir with crafted texts. */
  private def corpusDir(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("corpus-spec").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("decontaminate: verbatim benchmark copies flag at 1.0, splices partially, rest clean") {
    val out = CorpusQueries.decontaminate.build(spark, sf)
      .select("doc_id", "contamination", "verdict")
      .as[(Long, Double, String)].collect()
    val full = out.filter(_._1 >= 2000000L).filter(_._1 < 3000000L)
    assert(full.nonEmpty && full.forall { case (_, c, v) =>
      c == 1.0 && v == "contaminated" }, "re-planted benchmark docs must be fully contaminated")
    val partial = out.filter(_._1 >= 3000000L)
    assert(partial.forall { case (_, c, v) =>
      c > 0.0 && c < 1.0 && v == "contaminated" },
      "spliced docs must be partially contaminated")
    // sf0.001 plants genuine near-copies of doc 0 (the benchmark slice) at
    // ids 50/82 — those MUST flag; everything else stays clean
    val originals = out.filter(_._1 < 2000000L)
    assert(originals.filter(o => o._1 == 50L || o._1 == 82L)
      .forall(_._3 == "contaminated"),
      "genuine near-copies of a benchmark doc must be caught")
    assert(originals.filterNot(o => o._1 == 50L || o._1 == 82L)
      .forall(_._3 == "clean"), "unrelated corpus docs must not be flagged")
  }

  test("decontaminate: disjoint-vocabulary corpus stays clean end-to-end") {
    // doc 0 is the benchmark slice (0 % 97 == 0); 5 gets spliced (5 % 31 == 5)
    val dir = corpusDir(Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (5L, "one two three four five six seven eight nine ten"),
      (10L, "red orange yellow green blue indigo violet white black gray")))
    val out = CorpusQueries.decontaminate.build(spark, dir)
      .select("doc_id", "contamination", "verdict")
      .as[(Long, Double, String)].collect().toSeq
    assert(out.filter(_._1 < 2000000L).forall(_._3 == "clean"),
      "disjoint originals must be clean")
    assert(out.find(_._1 == 2000000L).get._2 == 1.0)
    val spliced = out.find(_._1 == 3000005L).get
    assert(spliced._2 > 0.0 && spliced._2 < 1.0 && spliced._3 == "contaminated")
  }

  test("semantic decontaminate: plants leak, scaled copy scores bit-equal, rest clean") {
    val benchIds = graft.engine.Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") % 97 === 0 && col("vec_id") < 1000)
      .select("vec_id").as[Long].collect().toSet
    assert(benchIds.nonEmpty, "sf corpus must yield a benchmark slice")
    val out = CorpusQueries.semanticDecontaminate.build(spark, sf)
      .select("vec_id", "nearest_bench", "max_cos", "verdict")
      .as[(Long, Long, Double, String)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    // every plant (verbatim + scaled) flags against ITS OWN source vector
    for (b <- benchIds; off <- Seq(5000000L, 6000000L)) {
      val (_, nb, cos, v) = byId(off + b)
      assert(v == "leaked" && nb == b && cos >= 0.999,
        s"plant ${off + b} must leak against bench $b, got ($nb, $cos, $v)")
    }
    // doubling every component is exact, so the scaled plant's max_cos is
    // BIT-EQUAL to the verbatim plant's — the scale-invariance the operator
    // exists to catch, pinned exactly
    for (b <- benchIds)
      assert(byId(5000000L + b)._3 == byId(6000000L + b)._3,
        s"scaled plant of $b must score bit-equal to the verbatim plant")
    // natural corpus: all clean, with real margin below the 0.9 threshold
    val natural = out.filter(_._1 < 5000000L)
    assert(natural.length == out.length - 2 * benchIds.size)
    assert(natural.forall(_._4 == "clean"), "no natural vector may be flagged")
    assert(natural.map(_._3).max < 0.75,
      "natural max cosine must keep wide margin below the threshold")
    assert(out.forall(r => benchIds.contains(r._2)),
      "nearest_bench must always come from the benchmark slice")
  }

  test("repetition quality: degenerate repetition drops, varied text keeps") {
    val dir = corpusDir(Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over the lazy sleeping dog"),
      (3L, "buy now buy now buy now buy now buy now")))
    val got = CorpusQueries.repetitionQuality.build(spark, dir)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(got(1L) == "drop", "single-token doc must fail every repetition rule")
    assert(got(2L) == "keep")
    assert(got(3L) == "drop", "two-token loop must fail the bigram rule")
    // fraction sanity on the varied doc: "the" appears twice in 10 tokens
    val row = CorpusQueries.repetitionQuality.build(spark, dir)
      .filter(col("doc_id") === 2L)
      .select("n_tokens", "distinct_frac", "top_token_frac", "top_bigram_frac")
      .as[(Long, Double, Double, Double)].head()
    assert(row == ((10L, 0.9, 0.2, 1.0 / 9)))
  }

  test("mix sample: rate-1000 language keeps everything; kept set is a hash property") {
    val out = CorpusQueries.mixSample.build(spark, sf)
      .select("lang", "n_docs", "n_kept", "accept_rate")
      .as[(String, Long, Long, Double)].collect()
    val en = out.find(_._1 == "en").get
    assert(en._2 == en._3 && en._4 == 1.0, "en rate is 1000/1000 -> keep all")
    assert(out.forall { case (_, n, k, r) => k <= n && r == k.toDouble / n })
  }

  test("vocab top-k: contiguous ids in (cf desc, token) order") {
    val v = CorpusQueries.vocabTopk.build(spark, sf)
      .select("token_id", "tok", "cf")
      .as[(Long, String, Long)].collect()
    assert(v.map(_._1).toSeq == (1L to v.length).toSeq, "ids contiguous from 1")
    val ordered = v.sortBy { case (_, tok, cf) => (-cf, tok) }
    assert(v.toSeq == ordered.toSeq, "id order must be (cf desc, token asc)")
  }

  test("tfidf keywords: at most 3 per doc, rank 1..3, score = tf/df") {
    val k = CorpusQueries.tfidfKeywords.build(spark, sf)
      .select("doc_id", "rnk", "tf", "df", "score")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(k.nonEmpty)
    assert(k.forall { case (_, r, tf, df, s) =>
      r >= 1 && r <= 3 && s == tf.toDouble / df })
    assert(k.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq })
  }

  test("bpe pairs: crafted corpus counts exactly (overlaps, weights, support)") {
    // vocab: ab:3, ba:1, aaa:2 -> pairs: ab = 3 (1 word), ba = 1 (1 word),
    // aa = 2 occurrences x freq 2 = 4 (1 word) — "aaa" contributes its
    // overlapping "aa" TWICE per occurrence, the standard BPE position count
    val dir = corpusDir(Seq((1L, "ab ab ba aaa"), (2L, "ab aaa")))
    val got = CorpusQueries.bpePairs.build(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("aa", 4L, 1L), ("ab", 3L, 1L), ("ba", 1L, 1L)), got.toString)
  }

  test("bpe pairs: conservation law over the real corpus") {
    // sum over ALL pairs of pair_count must equal
    // sum over vocab of freq * (len(word) - 1) for len >= 2 — every
    // adjacent position of every word occurrence is counted exactly once
    val docs = graft.engine.Tables.t(spark, sf, "documents")
    val full = CorpusQueries.bpePairAgg(docs)
    val gotTotal = full.agg(sum("pair_count")).as[Long].head()
    val wantTotal = docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "" && length(col("w")) >= 2)
      .agg(sum(length(col("w")) - 1)).as[Long].head()
    assert(gotTotal == wantTotal, s"$gotTotal != $wantTotal")
    // the declared query is exactly the top-50 of the full table under
    // (count desc, pair asc) — limit determinism depends on this order
    // being total, which it is because pair is unique after the group-by
    val top = CorpusQueries.bpePairs.build(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    val want = full.as[(String, Long, Long)].collect().toSeq
      .sortBy { case (p, c, _) => (-c, p) }.take(50)
    assert(top == want)
  }

  test("bm25: exact hand recompute; length normalization ranks short over long") {
    val dir = corpusDir(Seq(
      (0L, "spark aa"),             // tf(spark)=1, len 2
      (1L, "spark aa bb cc"),       // tf(spark)=1, len 4
      (2L, "spark spark query aa"), // tf(spark)=2, tf(query)=1, len 4
      (3L, "aa bb")))               // no query terms -> absent
    val got = CorpusQueries.bm25Search.build(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got.keySet == Set(0L, 1L, 2L), "term-free docs must not appear")
    // the engine's exact pipeline: one IEEE division of exact integer
    // operands per term, each addend rounded to DECIMAL(38,6) (HALF_UP)
    // before the order-free sum — recomputed literally here
    val (n, lTot) = (4L, 12L)
    def term(tf: Long, df: Long, len: Long): BigDecimal = {
      val v = (1048576L / df).toDouble *
        ((22.0 * tf * lTot) / (10.0 * tf * lTot + 3.0 * lTot + 9.0 * len * n).toDouble)
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    assert(got(0L) == ((term(1, 3, 2).toDouble, 1L)))
    assert(got(1L) == ((term(1, 3, 4).toDouble, 1L)))
    assert(got(2L) == (((term(2, 3, 4) + term(1, 1, 4)).toDouble, 2L)))
    // the BM25 point vs plain tf-idf: same tf, shorter doc scores higher
    assert(got(0L)._1 > got(1L)._1,
      "length normalization must rank the shorter same-tf doc first")
  }

  test("collocation lift: perfect pair lifts above independence, rare pair cut") {
    val dir = corpusDir(
      (1L to 8L).map(i => i -> "alpha beta x") ++
        (9L to 11L).map(i => i -> "gamma x") ++ // (gamma, x) n12=3 < support 5
        Seq(12L -> "delta x"))
    val got = CorpusQueries.collocationLift.build(spark, dir)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // n_docs=12; alpha/beta df=8, x df=12: perfect co-travel lifts 3/2,
    // independent-rate pairs sit exactly at 1e6 ppm
    assert(got == Seq(
      ("alpha", "beta", 8L, 8L, 8L, 1500000L),
      ("alpha", "x", 8L, 8L, 12L, 1000000L),
      ("beta", "x", 8L, 8L, 12L, 1000000L)))
  }

  test("source overlap: exact Jaccard/containment on crafted vocabularies") {
    val dir = Files.createTempDirectory("corpus-ovl").toString
    Seq(
      (1L, "a b c d", "A"), (2L, "a b", "A"), // A vocab {a,b,c,d}
      (3L, "c d e f", "B"),                   // B vocab {c,d,e,f}
      (4L, "x y", "C"))                       // C vocab {x,y} — disjoint
      .toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CorpusQueries.sourceOverlap.build(spark, dir)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    // A-B share {c,d}: jaccard 2/6, containment 2/4; disjoint pairs are
    // ABSENT (nothing joins — the inner-join contract, zero rows not zeros)
    assert(got == Seq(("A", "B", 2L, 4L, 4L, 333333L, 500000L)))
  }

  test("feature hash: bucket audit equals the in-memory hashing-trick recompute") {
    val got = CorpusQueries.featureHash.build(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    def md5h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().flatMap(_.getString(0).split(" "))
    val expect = toks.groupBy(t => md5h32(s"fh:$t") % 1024).map {
      case (b, ts) =>
        b -> (ts.length.toLong, ts.distinct.length.toLong,
          ts.map(t => if (md5h32(s"fs:$t") % 2 == 0) 1L else -1L).sum)
    }
    assert(got == expect)
    // conservation + sign-cancellation bound
    assert(got.values.map(_._1).sum == toks.length.toLong)
    got.values.foreach { case (n, d, net) =>
      assert(d >= 1 && d <= n && math.abs(net) <= n)
    }
  }

  test("rrf fusion: equals the fused recompute of both component rankings") {
    val got = CorpusQueries.rrfFusion.build(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }.toSeq
    // in-memory lexical ranking (the q_keyword_search integer tf-idf)
    val terms = Set("spark", "query", "join", "window")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tf = docs.flatMap { case (id, text) =>
      text.split(" ").filter(terms).map(tok => (id, tok))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val lexScore = tf.toSeq
      .map { case ((id, tok), n) => (id, n * (1048576L / df(tok))) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val lexRk = lexScore.sortBy { case (id, sc) => (-sc, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    // in-memory dense ranking (sequential-fold cosine, the engine's tree)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .toMap
    val qv = emb(0L)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map(p => p._1 * p._2).foldLeft(0.0)(_ + _)
    val qn = math.sqrt(dot(qv, qv))
    val semRk = emb.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, dot(qv, v) / (qn * math.sqrt(dot(v, v)))) }
      .sortBy { case (id, c) => (-c, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    // fuse and cut, exactly the query's integer rule
    val expect = (lexRk.keySet ++ semRk.keySet).toSeq.map { id =>
      val rrf = lexRk.get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L) +
        semRk.get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L)
      (id, rrf, lexRk.get(id), semRk.get(id))
    }.sortBy { case (id, rrf, _, _) => (-rrf, id) }.take(20)
    assert(got == expect)
    // a doc on BOTH lists outranks one holding only a comparable single rank
    assert(got.head._3.isDefined || got.head._4.isDefined)
  }

  test("source overlap on real data: bounds and ordering hold") {
    val got = CorpusQueries.sourceOverlap.build(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (s1, s2, inter, v1, v2, j, c) =>
      assert(s1 < s2)
      assert(inter <= math.min(v1, v2))
      assert(j >= 0 && j <= 1000000L && c >= j && c <= 1000000L)
    }
  }
}
