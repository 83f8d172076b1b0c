package graft.operators

import graft.functions.{Embedding, EmbeddingProvider}
import graft.model.{Chunk, EmbeddedChunk}
import org.apache.spark.sql.Dataset

/** Batch embedding operator (SURVEY.md §2.4, E1).
  *
  * `mapPartitions` so any per-partition setup (an ONNX session, were one
  * plugged in) is paid once per partition, not per row — the Spark analogue
  * of the reference registering one `IEmbeddingGenerator` for the whole run
  * (`Program.cs:64-79`). The default hashing embedder is pure CPU and
  * allocation-light, so the operator pipelines inside the task with no
  * shuffle.
  */
object Embed {

  def chunks(ds: Dataset[Chunk],
      provider: EmbeddingProvider = Embedding.default): Dataset[EmbeddedChunk] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map(c => EmbeddedChunk(c.key, provider.embed(c.content), c.content,
        c.context, c.documentid))
    }
  }
}
