package graft.model

/** Core row types of the ingestion engine (SURVEY.md §1.2).
  *
  * The reference's document tree (`IngestionDocument → Section → Element`,
  * built at reference `Readers/Markdown/MarkdownParser.cs:42-46`) is
  * flattened to one row per element: `section_path` + `element_seq` preserve
  * document order, nested list/quote sections extend `section_path`, and
  * table cells become one row per (table_row, table_col) — mirroring the 2-D
  * cell array of reference `MarkdownParser.cs:244-297` in relational form so
  * the element stream composes with DataFrame ops and partitions by doc_id
  * at 100 TB.
  */
final case class ElementRow(
    doc_id: String,
    section_path: Seq[Int],
    page_number: Option[Int],
    element_seq: Int,
    element_type: String, // header|paragraph|footer|image|table_cell|error
    level: Option[Int],
    text: Option[String],
    markdown: Option[String],
    alt_text: Option[String],
    media_type: Option[String],
    image_bytes: Option[Array[Byte]],
    table_row: Option[Int],
    table_col: Option[Int])

object ElementRow {
  def para(docId: String, path: Seq[Int], seq: Int, text: String,
      md: String, page: Option[Int] = None): ElementRow =
    ElementRow(docId, path, page, seq, "paragraph", None, Some(text),
      Some(md), None, None, None, None, None)
}

/** One chunk record — the vector-store row schema of the reference
  * (`VectorStoreCommands.cs:95-102`): deterministic key, embedded content,
  * concatenated heading context, and the owning document id.
  */
final case class Chunk(
    key: String,
    content: String,
    context: String,
    documentid: String,
    chunk_index: Int)

/** Chunk + embedding, as written to a vector-store collection. */
final case class EmbeddedChunk(
    key: String,
    embedding: Array[Float],
    content: String,
    context: String,
    documentid: String)

/** Relational source row (reference `Article.cs:6-13`). */
final case class Article(id: Long, title: String, body: String)

/** Per-document pipeline outcome (reference `IngestionResult`,
  * `VectorStoreCommands.cs:163-180`): errors are carried as data, never as
  * task failures, preserving the reference's per-document fault isolation.
  */
final case class IngestionResult(
    documentid: String,
    succeeded: Boolean,
    n_chunks: Long,
    error: Option[String])
