package graft.streaming

import graft.SparkSpec
import graft.store.VectorStore
import org.apache.spark.sql.functions._

class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest lands embedded chunks; redelivery rewrites identical bytes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-si")
    val docs = Seq((1L, "alpha beta gamma", "en"), (2L, "delta epsilon", "de"))
      .toDF("doc_id", "text", "lang")
    docs.coalesce(1).write.parquet(s"$tmp/in/f1")
    val schema = spark.read.parquet(s"$tmp/in/f1").schema
    val store = new VectorStore(spark, s"$tmp/store")

    def ingest(ckpt: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .parquet(s"$tmp/in/*/part-*.parquet")
      val q = StreamIngest.run(stream, store, "docs", "doc_id", "text",
        "lang", s"$tmp/$ckpt")
      q.awaitTermination(); q.stop()
    }
    ingest("ckpt1")
    def snapshot() = store.read("docs")
      .select(col("key"), col("documentid"), col("content"), col("context"),
        md5(concat_ws(",", transform(col("embedding"),
          x => x.cast("string")))).as("emb_md5"))
      .collect().map(_.toString).sorted.toSeq
    val first = snapshot()
    assert(first.size == 2)
    // fresh checkpoint = full redelivery; the store must not change
    ingest("ckpt2")
    assert(snapshot() == first)
  }
}
