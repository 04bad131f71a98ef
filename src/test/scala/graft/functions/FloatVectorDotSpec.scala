package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Multimodal, Similarity}
import graft.sources.Tables

class FloatVectorDotSpec extends SparkSpec {

  private lazy val emb = {
    GraftFunctions.register(spark)
    Tables.load(spark, sfDir, "embeddings").cache()
  }

  test("fvec_dot matches the exact-decimal dot within float tolerance") {
    val rows = emb.limit(50)
      .select(
        expr("fvec_dot(embedding, embedding)").as("fast"),
        Similarity.dotExact("embedding", "embedding").as("exact"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"fast=${r.getDouble(0)} exact=${r.getDouble(1)}")
    }
  }

  test("fvec_dot survives codegen and interpreted paths identically") {
    val fast = emb.limit(20).select(expr("fvec_dot(embedding, embedding)").as("d"))
    val codegen = fast.collect().map(_.getDouble(0)).toSeq
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = fast.collect().map(_.getDouble(0)).toSeq
      assert(interp === codegen)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("null inputs yield null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    val r = df.select(expr("fvec_dot(a, b)")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("type mismatch is rejected at analysis") {
    import spark.implicits._
    val df = Seq((Seq(1.0), Seq(1.0f))).toDF("a", "b") // a is array<double>
    val e = intercept[Exception](df.select(expr("fvec_dot(a, b)")).collect())
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }
}

class MultimodalSpec extends SparkSpec {

  private lazy val assets =
    Multimodal.assets(Tables.load(spark, sfDir, "documents"), "doc_id", "text", "source").cache()

  test("assets schema: opaque binary payload + typed metadata") {
    val f = assets.schema("payload")
    assert(f.dataType.typeName === "binary")
    assert(assets.schema("meta").dataType.typeName === "struct")
    val m = assets.select(col("meta.n_bytes"), col("meta.fingerprint")).collect()(0)
    assert(m.getLong(0) > 0)
    assert(m.getString(1).length === 16)
  }

  test("decodeFeatures (stubbed codec) is deterministic and partition-independent") {
    val one = Multimodal.decodeFeatures(assets.coalesce(1)).orderBy("asset_id").collect()
    val many = Multimodal.decodeFeatures(assets.repartition(7)).orderBy("asset_id").collect()
    assert(one.toSeq === many.toSeq)
    one.foreach { fRow =>
      assert(fRow.brightness >= 0.0 && fRow.brightness < 1.0)
      assert(fRow.n_frames === (fRow.n_bytes + Multimodal.FrameBytes - 1) / Multimodal.FrameBytes)
    }
  }

  test("frame sampling keeps every Nth frame with correct byte slices") {
    val sampled = Multimodal.sampleFrames(assets, everyN = 4)
    val counts = sampled.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Multimodal.decodeFeatures(assets).collect()
      .map(f => f.asset_id -> ((f.n_frames + 3) / 4)).toMap
    assert(counts === expected)
    val frame = sampled.filter(col("frame_idx") === 0).limit(1)
      .select(length(col("frame_payload"))).collect()(0).getInt(0)
    assert(frame <= Multimodal.FrameBytes)
  }
}
