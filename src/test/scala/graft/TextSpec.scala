package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Pins the non-oracle text functions (the oracle queries cover the rest). */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("bpeish token count: runs and symbols") {
    val df = Seq("hello world", "gpt-4 is 100x better!", "").toDF("text")
    val got = df.select(Text.bpeishTokenCount(col("text"))).as[Int].collect().toSeq
    // "hello","world" = 2; "gpt","-","4","is","100","x","better","!" = 8; "" = 0
    assert(got == Seq(2, 8, 0))
  }

  test("rolling fingerprint: deterministic, order-sensitive, content-sensitive") {
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "c b a"), (4L, "a b d")).toDF("id", "text")
    for (fn <- Seq(Text.rollingFingerprint(_), Text.rollingFingerprintMd5(_))) {
      val fp = df.select(col("id"), fn(col("text")).as("fp"))
        .as[(Long, Long)].collect().toMap
      assert(fp(1L) == fp(2L), "same text, same fingerprint")
      assert(fp(1L) != fp(3L), "permutation must change the fingerprint")
      assert(fp(1L) != fp(4L), "content change must change the fingerprint")
    }
    // the mod-prime mirrorable form stays inside its modulus
    val md5Fps = df.select(Text.rollingFingerprintMd5(col("text")))
      .as[Long].collect()
    assert(md5Fps.forall(v => v >= 0 && v < 1000000007L))
  }
}
