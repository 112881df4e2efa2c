package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized sweep for [[graft.engine.Curation.substringDedup]]: the
  * distributed operator must agree with a direct sequential model on
  * arbitrary corpora — a tiny vocabulary forces dense cross-document
  * n-gram collisions, overlapping spans, and fully-duplicated documents,
  * the regimes where coverage arithmetic can silently drift. Fixed seed. */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Direct sequential model: per doc, positions covered by any n-gram
    * occurring in >= minDocs distinct docs; cleaned = surviving tokens. */
  private def model(docs: Seq[(Long, Array[String])], n: Int, minDocs: Int)
      : Map[Long, (Long, Long, String)] = {
    def grams(tk: Array[String]): Seq[(String, Int)] =
      if (tk.length < n) Nil
      else (0 to tk.length - n).map(i => (tk.slice(i, i + n).mkString(" "), i))
    val docsPerGram = docs
      .flatMap { case (id, tk) => grams(tk).map { case (g, _) => (g, id) } }
      .distinct.groupBy(_._1).view.mapValues(_.size).toMap
    docs.map { case (id, tk) =>
      val covered = grams(tk)
        .filter { case (g, _) => docsPerGram(g) >= minDocs }
        .flatMap { case (_, p) => p until p + n }
        .toSet
      val kept = tk.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      id -> ((tk.length.toLong, (tk.length - kept.length).toLong,
        kept.mkString(" ")))
    }.toMap
  }

  test("substring dedup agrees with the sequential model on random corpora") {
    val rnd = new Random(20260813L)
    val vocab = Array("a", "b", "c", "d", "e")
    for (trial <- 1 to 5) {
      val nDocs = 8 + rnd.nextInt(8)
      val docs = (1L to nDocs).map { id =>
        val len = 1 + rnd.nextInt(14)
        (id, Array.fill(len)(vocab(rnd.nextInt(vocab.length))))
      }
      val dir = Files.createTempDirectory(s"curation-prop-$trial").toString
      docs.map { case (id, tk) => (id, tk.mkString(" ")) }
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val n = 2 + rnd.nextInt(3) // 2..4
      val got = graft.engine.Curation
        .substringDedup(spark.read.parquet(s"$dir/documents.parquet"),
          "doc_id", "text", n = n, minDocs = 2)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = model(docs, n, minDocs = 2)
      assert(got == want,
        s"trial $trial (n=$n, docs=$nDocs): " +
          s"${(got.toSet diff want.toSet).take(2)} vs ${(want.toSet diff got.toSet).take(2)}")
    }
  }
}
