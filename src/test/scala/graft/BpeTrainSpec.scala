package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Golden merge-sequence pin for q_bpe_train on a crafted corpus that
  * exercises the three behaviors prose can't prove:
  *
  *  - greedy left-to-right OVERLAP resolution ("aaaaa" under top pair (a,a)
  *    must become [aa, aa, a] — islands with even-offset keeps, never
  *    [aa, a, aa] or a double-consume),
  *  - the (count DESC, left ASC, right ASC) total-order tie-break,
  *  - pair RE-COUNTING after each merge (round 2's counts are over the
  *    merged symbols, not the original characters).
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("crafted corpus: overlap run, tie-break, and re-count per round") {
    // one doc: "aaaaa" x3 and "bc" x2 (1-char words are excluded anyway)
    // round 1: (a,a) appears 4x per "aaaaa" -> 12; (b,c) -> 2. Top (a,a,12).
    //          greedy merge: positions 1..4 match; island keeps 1 and 3 ->
    //          "aaaaa" becomes [aa, aa, a].
    // round 2: (aa,aa) -> 3, (aa,a) -> 3, (b,c) -> 2. TIE at 3 broken by
    //          right symbol: "a" < "aa", so top is (aa, a, 3); merging the
    //          LAST two symbols gives [aa, aaa].
    // round 3: (aa,aaa) -> 3 beats (b,c) -> 2. Top (aa, aaa, 3).
    val dir = Files.createTempDirectory("graft_bpe").toString
    Seq((0L, "en", 23, "aaaaa aaaaa aaaaa bc bc"))
      .toDF("doc_id", "lang", "n_chars", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = graft.queries.CorpusQueries.bpeTrain.build(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1, "a", "a", 12L),
      (2, "aa", "a", 3L),
      (3, "aa", "aaa", 3L)), s"merge sequence was $got")
  }

  test("encode applies the learned merges in order (crafted corpus)") {
    // same corpus as the training pin, plus a 1-char word "x" (excluded
    // from the TRAINING vocab by the len>=2 filter, but still encoded — as
    // its single character). Learned merges: (a,a), (aa,a), (aa,aaa).
    //   "aaaaa": [a a a a a] -> [aa aa a] -> [aa aaa] -> [aaaaa]  = 1 token
    //   "bc":    no merge applies                                 = 2 tokens
    //   "x":     1 symbol                                         = 1 token
    // doc: 3x aaaaa + 2x bc + x -> n_words 6, n_chars 20,
    // n_bpe 3*1 + 2*2 + 1 = 8, saved_ppm = 12000000 DIV 20 = 600000.
    val dir = Files.createTempDirectory("graft_bpe_enc").toString
    Seq((0L, "en", 24, "aaaaa aaaaa aaaaa bc bc x"))
      .toDF("doc_id", "lang", "n_chars", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = graft.queries.CorpusQueries.bpeEncode.build(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == Seq((0L, 6L, 20L, 8L, 600000L)), s"encode readout was $got")
  }

  test("encode invariants on the real corpus") {
    val rows = graft.queries.CorpusQueries.bpeEncode.build(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWords, nChars, nBpe) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // merging only ever shrinks the stream, never below one token/word
      assert(nBpe <= nChars, s"doc ${r.getLong(0)}: n_bpe $nBpe > n_chars $nChars")
      assert(nBpe >= nWords, s"doc ${r.getLong(0)}: n_bpe $nBpe < n_words $nWords")
      assert(r.getLong(4) == (nChars - nBpe) * 1000000L / nChars)
    }
  }

  test("merges on the real corpus are distinct, positive, and re-derivable") {
    val rows = graft.queries.CorpusQueries.bpeTrain.build(spark, sf)
      .collect()
    assert(rows.length == 3)
    val pairs = rows.map(r => (r.getString(1), r.getString(2))).toSeq
    assert(pairs.distinct == pairs, "a pair must never be re-learned")
    assert(rows.forall(_.getLong(3) > 0))
    // determinism: a second independent build agrees exactly
    val again = graft.queries.CorpusQueries.bpeTrain.build(spark, sf)
      .collect().toSeq
    assert(again == rows.toSeq)
  }
}
