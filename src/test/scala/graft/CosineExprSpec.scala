package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CosineSimilarityExpr
import graft.operators.Similarity

class CosineExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("codegen'd cosine_similarity matches the UDF kernel bitwise") {
    CosineSimilarityExpr.register(spark)
    val e = graft.core.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .where(col("id_a") < 30)
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      .where(col("id_b").between(30, 60))
    val pairs = a.crossJoin(b)
    val viaExpr = pairs
      .select(col("id_a"), col("id_b"),
        CosineSimilarityExpr.cosineSimilarity(col("va"), col("vb")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaUdf = pairs
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("va"), col("vb")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaExpr.nonEmpty)
    viaExpr.foreach { case (k, v) => assert(v == viaUdf(k), s"mismatch at $k") }
  }

  test("cosine_similarity is callable from SQL") {
    CosineSimilarityExpr.register(spark)
    graft.core.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb")
    val self = spark.sql(
      "SELECT cosine_similarity(embedding, embedding) AS c FROM emb LIMIT 5")
      .collect().map(_.getDouble(0))
    self.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("zero-norm vectors yield null in expr, UDF kernel, and codegen alike") {
    CosineSimilarityExpr.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
      (Array(0f, 0f, 0f), Array(0f, 0f, 0f))
    ).toDF("va", "vb")
    val viaExpr = df.select(
      CosineSimilarityExpr.cosineSimilarity(col("va"), col("vb")).as("c"))
      .collect().map(r => r.isNullAt(0))
    val viaUdf = df.select(Similarity.cosine(col("va"), col("vb")).as("c"))
      .collect().map(r => r.isNullAt(0))
    assert(viaExpr.forall(identity) && viaUdf.forall(identity))
  }

  test("type mismatch is rejected at analysis") {
    CosineSimilarityExpr.register(spark)
    graft.core.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("docs_t")
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(text, text) FROM docs_t").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }
}
