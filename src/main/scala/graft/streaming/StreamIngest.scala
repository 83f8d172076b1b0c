package graft.streaming

import graft.model.Chunk
import graft.operators.Embed
import graft.store.ChunkStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest — the reference's `source → embed → vector store`
  * loop (E1 + W1) as a continuous pipeline: each microbatch's documents
  * become deterministic chunk records, embed via the per-partition
  * provider, and land with the store's documentid-partitioned dynamic
  * overwrite.
  *
  * Exactly-once BY CONSTRUCTION rather than by sink transactionality:
  * keys and embeddings are deterministic and the upsert replaces whole
  * documentid partitions, so a redelivered microbatch rewrites identical
  * bytes — at-least-once delivery cannot duplicate or corrupt the store.
  */
object StreamIngest {

  def run(stream: DataFrame, store: ChunkStore, collection: String,
      idCol: String, textCol: String, ctxCol: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val chunks = batch.select(
            col(idCol).cast("string").as("key"),
            col(textCol).as("content"),
            col(ctxCol).cast("string").as("context"),
            col(idCol).cast("string").as("documentid"),
            lit(0).as("chunk_index"))
          .as[Chunk]
        store.upsert(Embed.chunks(chunks), collection)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
