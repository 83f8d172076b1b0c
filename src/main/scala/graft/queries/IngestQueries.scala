package graft.queries

import graft.operators.IngestionPipeline
import graft.sources.{DatabaseSource, MarkdownSource, PdfSource, SqliteReader}
import graft.store.VectorStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, StandardCopyOption}

/** q44: the reference's own ingestion loop end-to-end (S1/S2/S3/S4 →
  * P1-P10 → C1 → E1 → W1, SURVEY.md §2) over the bundled 10-topic corpus —
  * ALL THREE readers: markdown files, the PDFs, and the SQLite CMS.DB —
  * into a temp vector store; returns one row per (reader, document) with
  * its chunk count. Deterministic (hashing embedder + deterministic chunk
  * keys) but not SQL-expressible → driver records a rows-only check; the
  * semantics are golden-tested in `VectorStoreSpec`/`PdfAndSqliteSpec`.
  */
object IngestQueries {

  private val corpusFiles = Seq("ancient_egypt.md", "black_holes.md",
    "coral_reefs.md", "human_brain.md", "machine_learning.md",
    "photosynthesis.md", "plate_tectonics.md", "renewable_energy.md",
    "roman_empire.md", "solar_system.md")

  /** Extract bundled corpus resources to a temp dir (executors read files
    * via binaryFile, so they must be on a real filesystem path).
    */
  private def extractCorpus(): Path = {
    val dir = Files.createTempDirectory("graft-corpus")
    Files.createDirectory(dir.resolve("pdf"))
    val cl = getClass.getClassLoader
    corpusFiles.foreach { f =>
      val in = cl.getResourceAsStream(s"content/markdown/$f")
      try Files.copy(in, dir.resolve(f), StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      val pdfName = f.stripSuffix(".md") + ".pdf"
      val pin = cl.getResourceAsStream(s"content/pdf/$pdfName")
      try Files.copy(pin, dir.resolve("pdf").resolve(pdfName),
        StandardCopyOption.REPLACE_EXISTING)
      finally pin.close()
    }
    val db = cl.getResourceAsStream("content/CMS.DB")
    try Files.copy(db, dir.resolve("CMS.DB"), StandardCopyOption.REPLACE_EXISTING)
    finally db.close()
    dir
  }

  def q44(s: SparkSession, dir: String): DataFrame = {
    val corpus = extractCorpus()
    val storeRoot = Files.createTempDirectory("graft-q44-store").toString
    val store = new VectorStore(s, storeRoot)

    val rows = SqliteReader.readTable(s"$corpus/CMS.DB", "Items")
      .map(r => (r.long(0), r.string(1), r.string(2)))
    // One pipeline lineage over all three readers (one parse/chunk/embed
    // pass); collections stay separate per reader, as before.
    val results = IngestionPipeline.runTagged(
      Seq(
        "markdown" -> MarkdownSource.elements(s, corpus.toString),
        "pdf" -> PdfSource.elements(s, s"$corpus/pdf"),
        "database" -> DatabaseSource.elements(s.createDataFrame(rows)
          .toDF("id", "title", "body"))),
      store,
      Map("markdown" -> "md", "pdf" -> "pdf", "database" -> "db"))

    results
      .select(col("reader"), col("documentid"), col("succeeded"),
        col("n_chunks"))
      .orderBy(col("reader"), col("documentid"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_ingest_pipeline" -> (q44 _)
  )

  val oracle: Map[String, String] = Map.empty
}
