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
