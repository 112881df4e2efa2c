package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document exact-substring deduplication (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better") at token
  * n-gram granularity — the generic, parameterized form of
  * q_substring_dedup: any n-token span occurring in at least `minDocs`
  * distinct documents is removed from EVERY document containing it, and
  * each document's text is rebuilt from the surviving tokens in order.
  *
  * Scale shape: gram extraction is per-row bounded fan-out (32-byte md5
  * keys, positions carried) over a lazily-checkpointed table consumed by
  * both the duplicate-key aggregation and the coverage join; coverage is a
  * keyed equi-join with a fixed x`n` position fan-out; the rebuild is a
  * per-document bounded collect. No pairwise compare, no global sort.
  */
object Curation {

  /** Returns (idCol, n_tokens, n_removed, cleaned_text) for every input
    * document. `minDocs` >= 2: a span repeated only WITHIN one document is
    * never removed (that is repetition filtering's job). */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val id = col(idCol)
    val tk = docs.select(id, split(col(textCol), " ").as("tk"))
    val g = tk.select(id, posexplode(
        when(size(col("tk")) >= n,
          transform(sequence(lit(1), size(col("tk")) - (n - 1)),
            i => md5(concat_ws(" ", slice(col("tk"), i, lit(n))).cast("binary"))))
          .otherwise(array().cast("array<string>"))).as(Seq("pos", "k")))
      .select(id, (col("pos") + 1).as("p"), col("k"))
      .localCheckpoint(eager = false)
    val dup = g.groupBy("k")
      .agg(countDistinct(id).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("k")
    // no distinct: overlapping duplicate grams cover some positions twice,
    // but the anti-join below excludes on ANY match, so duplicate coverage
    // rows are harmless — deduplicating them would cost a full extra
    // shuffle + aggregate for nothing
    val cov = g.join(dup, Seq("k"))
      .select(id.as("cov_id"),
        explode(sequence(col("p"), col("p") + (n - 1))).as("cp"))
    val tokpos = tk
      .select(id, posexplode(col("tk")).as(Seq("pos", "tok")))
      .select(id, (col("pos") + 1).as("p"), col("tok"))
    val kept = tokpos.join(cov,
      id === col("cov_id") && col("p") === col("cp"), "left_anti")
    val agg = kept.groupBy(idCol).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("p"), col("tok")))),
        x => x.getField("tok")), " ").as("cleaned"))
    tk.select(id, size(col("tk")).cast("long").as("n_tokens"))
      .join(agg, Seq(idCol), "left")
      .select(id, col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned_text"))
  }
}
