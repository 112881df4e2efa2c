package graft

import org.apache.spark.sql.functions._
import graft.engine.{MediaItem, Multimodal, Tables}

/** The decode is a documented stub; these tests pin the REAL parts — schema,
  * determinism, batch plumbing, frame-sampling row algebra — so swapping in
  * an actual codec only changes feature values, not shapes. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal
    .mediaFromDocuments(Tables.t(spark, sf, "documents"))
    .as[MediaItem]

  test("media schema: opaque binary payload + typed metadata") {
    val df = media.toDF()
    assert(df.schema("payload").dataType.typeName == "binary")
    assert(df.schema("kind").dataType.typeName == "string")
    val kinds = df.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("extractFeatures: fixed dim, deterministic, byte counts correct") {
    val feats = Multimodal.extractFeatures(media, dim = 32).cache()
    assert(feats.count() == media.count())
    assert(feats.filter(size(col("feature")) =!= 32).isEmpty)
    // deterministic: two runs agree exactly
    val a = feats.orderBy("media_id").limit(5).collect()
    val b = Multimodal.extractFeatures(media, dim = 32)
      .orderBy("media_id").limit(5).collect()
    a.lazyZip(b).foreach { (x, y) =>
      assert(x.media_id == y.media_id && x.feature.sameElements(y.feature))
    }
    // n_bytes is the payload length (UTF-8 text here)
    val doc = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).as("len"))
    val joined = feats.toDF().join(doc, col("media_id") === col("doc_id"))
      .filter(col("n_bytes") =!= col("len"))
    assert(joined.isEmpty)
  }

  test("resize rewrites metadata and shrinks payloads") {
    val resized = Multimodal.resize(media.filter(col("kind") === "image").as[MediaItem],
      targetW = 8, targetH = 8, dim = 16)
    val rows = resized.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(m => m.width == 8 && m.height == 8))
    assert(rows.forall(_.payload.nonEmpty))
  }

  test("sampleFrames decodes a concatenated-P6 container frame by frame") {
    import graft.engine.Codecs
    import graft.engine.Codecs.Raster
    // four 2x2 frames with distinct solid colors; stride 2 keeps frames 0, 2
    def solid(r: Int, g: Int, b: Int) = Raster(2, 2,
      Array.fill(4)(Array(r.toByte, g.toByte, b.toByte)).flatten)
    val container = Codecs.encodePpmFrames(Seq(
      solid(255, 0, 0), solid(0, 255, 0), solid(0, 0, 255), solid(255, 255, 255)))
    val items = Seq(
      MediaItem(1L, "video", container, 2, 2, 0, 0L),
      // not a P6 container: must take the byte-chunk fallback, not vanish
      MediaItem(2L, "video", "definitely not frames".getBytes, 0, 0, 0, 0L)).toDS()
    val rows = Multimodal.sampleFrames(items, frameBytes = 8, stride = 2, dim = 4)
      .collect().groupBy(_.media_id)
    // container: decoded frames 0 and 2, real per-frame luma (solid red /
    // solid blue on a 2x2 grid = 4 equal cells)
    val byIdx = rows(1L).map(f => f.frame_idx -> f.feature).toMap
    assert(byIdx.keySet == Set(0, 2))
    byIdx(0).foreach(v => assert(math.abs(v - 0.299f) < 1e-6, s"red luma $v"))
    byIdx(2).foreach(v => assert(math.abs(v - 0.114f) < 1e-6, s"blue luma $v"))
    // fallback: 21 bytes / frameBytes=8 -> chunks 0,1,2, stride 2 -> 0 and 2
    assert(rows(2L).map(_.frame_idx).sorted.sameElements(Array(0, 2)))
  }

  test("transcodeVideo resamples every container frame; junk passes through") {
    import graft.engine.Codecs
    import graft.engine.Codecs.Raster
    def solid(r: Int, g: Int, b: Int) = Raster(2, 2,
      Array.fill(4)(Array(r.toByte, g.toByte, b.toByte)).flatten)
    val container = Codecs.encodePpmFrames(Seq(solid(255, 0, 0), solid(0, 0, 255)))
    val junk = "not a container".getBytes
    val items = Seq(
      MediaItem(1L, "video", container, 2, 2, 0, 0L),
      MediaItem(2L, "video", junk, 7, 9, 0, 0L)).toDS()
    val out = Multimodal.transcodeVideo(items, targetW = 1, targetH = 1)
      .collect().map(m => m.media_id -> m).toMap
    val frames = Codecs.decodePpmFrames(out(1L).payload)
    assert(out(1L).width == 1 && out(1L).height == 1)
    assert(frames.size == 2)
    assert(frames(0).rgb.sameElements(Array[Byte](255.toByte, 0, 0)))
    assert(frames(1).rgb.sameElements(Array[Byte](0, 0, 255.toByte)))
    // non-container: payload AND metadata untouched
    assert(out(2L).payload.sameElements(junk) && out(2L).width == 7 && out(2L).height == 9)
  }

  test("sampleFrames: every stride-th fixed-size chunk becomes a row") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2, dim = 8)
      .cache()
    val counts = frames.groupBy("media_id").count()
    val expected = media.filter(col("kind") === "video")
      .select(col("media_id"),
        ceil(ceil(length(col("payload")).cast("double") / 64) / 2).as("want"))
    val bad = counts.join(expected, "media_id")
      .filter(col("count") =!= col("want"))
    assert(bad.isEmpty, s"frame counts off: ${bad.collect().mkString(",")}")
    assert(frames.filter(size(col("feature")) =!= 8).isEmpty)
  }
}
