package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.functions.Vectors

/** Int8 embedding quantization: round-trip error bound, storage type, and
  * cosine preservation on real embeddings. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("round-trip error bounded by scale/2 per element; zeros stay zeros") {
    val emb = Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("qz", Vectors.quantizeInt8(col("v")))
      .withColumn("back", Vectors.dequantizeInt8(col("qz")))
    val bad = emb.select(
      aggregate(zip_with(col("v"), col("back"), (a, b) => abs(a - b)),
        lit(0.0), (m, x) => greatest(m, x)).as("maxerr"),
      (col("qz").getField("scale").cast("double") / 2 + 1e-12).as("bound"))
      .filter(col("maxerr") > col("bound")).count()
    assert(bad == 0)
    val z = Seq(Tuple1(Seq(0.0, 0.0, 0.0))).toDF("v")
      .select(Vectors.dequantizeInt8(Vectors.quantizeInt8(col("v"))).as("back"))
      .as[Seq[Double]].head()
    assert(z == Seq(0.0, 0.0, 0.0))
  }

  test("quantized codes are tinyint in [-127, 127]") {
    val emb = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 100)
      .select(Vectors.quantizeInt8(Vectors.asDouble(col("embedding"))).as("qz"))
    assert(emb.schema("qz").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .apply("q").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.ByteType)
    val out = emb.select(
      aggregate(col("qz.q"), lit(0), (m, x) => greatest(m, abs(x.cast("int")))).as("mx"))
      .filter(col("mx") > 127).count()
    assert(out == 0)
  }

  test("cosine survives quantization within 1% on real embeddings") {
    val e = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 50)
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
      .withColumn("back", Vectors.dequantizeInt8(Vectors.quantizeInt8(col("v"))))
    val pairs = e.select(col("vec_id").as("i"), col("v").as("v1"), col("back").as("b1"))
      .crossJoin(e.select(col("vec_id").as("j"), col("v").as("v2"), col("back").as("b2")))
      .filter(col("i") < col("j"))
      .select(
        Vectors.cosine(col("v1"), col("v2")).as("exact"),
        Vectors.cosine(col("b1"), col("b2")).as("approx"))
    val worst = pairs.select(max(abs(col("exact") - col("approx")))).head.getDouble(0)
    assert(worst < 0.01, s"worst cosine drift $worst")
  }
}
