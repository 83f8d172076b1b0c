package graft.plans

import graft.SparkSpec
import graft.functions.CosineSimilarity
import graft.operators.Ann
import org.apache.spark.sql.functions._

class AnnTopKRewriteSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private lazy val q: Array[Float] = emb.filter(col("vec_id") === 0)
    .select("embedding").head().getSeq[Float](0).toArray
  private lazy val lsh = new Ann.RandomHyperplaneLsh(nBits = 8, dim = 64)
  private lazy val indexed = lsh.index(emb.filter(col("vec_id") =!= 0),
    "embedding")

  private def topk = indexed
    .select(col("vec_id"), col("bucket"),
      round(CosineSimilarity(col("embedding"), typedlit(q)), 6).as("score"))
    .orderBy(col("score").desc, col("vec_id"))
    .limit(5)

  private def withFlag[T](v: String)(f: => T): T = {
    spark.conf.set("spark.graft.ann.autoRewrite", v)
    try f finally spark.conf.unset("spark.graft.ann.autoRewrite")
  }

  test("flag off: plan untouched (full scan, no bucket filter)") {
    val p = topk.queryExecution.optimizedPlan.toString
    assert(!p.contains("bucket#") || !p.contains(" IN "), p)
  }

  test("flag on: bucket IN filter injected, results = manual LSH search") {
    withFlag("true") {
      val df = topk
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.toLowerCase.contains("bucket") && p.contains(" IN "), p)
      val auto = df.collect().map(_.getLong(0)).toSeq
      val manual = lsh.search(indexed, "vec_id", "embedding", q, 5, probes = 1)
        .collect().map(_.getLong(0)).toSeq
      assert(auto == manual)
    }
  }

  test("flag on: survives a parquet round-trip (metadata in footer)") {
    val dir = java.nio.file.Files.createTempDirectory("lsh-parquet").toString
    indexed.write.mode("overwrite").parquet(dir)
    withFlag("true") {
      val re = spark.read.parquet(dir)
      val df = re
        .select(col("vec_id"),
          round(CosineSimilarity(col("embedding"), typedlit(q)), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(5)
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.toLowerCase.contains("bucket") && p.contains(" IN "), p)
      assert(df.collect().length == 5)
    }
  }

  test("flag on but un-indexed relation: no rewrite, exact results") {
    withFlag("true") {
      val plain = emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(CosineSimilarity(col("embedding"), typedlit(q)), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(5)
      val p = plain.queryExecution.optimizedPlan.toString
      assert(!p.contains(" IN "), p)
      assert(plain.collect().length == 5)
    }
  }
}
