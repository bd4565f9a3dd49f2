package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for retrieval / training-window preparation: split
  * each document into fixed-size character windows with overlap, carrying a
  * stable (doc_id, chunk_no) identity so a chunk can always be traced back
  * to its source span.
  *
  * Scale shape: the whole operator is a narrow projection — `sequence` over
  * the start offsets, `transform` + `explode`, `substring` — so at 100 TB
  * it is one codegen'd pass over the text column with no shuffle and full
  * column pruning; output size is input size × (1 + overlap/stride). The
  * reference has no chunking surface (its records pass through whole,
  * `tap_airbyte/tap.py:781-902`); this is part of the LLM-pipeline layer
  * the engine adds on top.
  */
object Chunking {

  /** Explode `textCol` into overlapping character windows.
    *
    * Chunks start every `chunkSize - overlap` characters; a chunk is
    * emitted only while the PREVIOUS chunk hasn't already reached
    * end-of-text (start <= len - overlap - 1), so no chunk is ever a pure
    * suffix of its predecessor — a redundant tail window would enter the
    * corpus twice as duplicate training/embedding content. The last chunk
    * always reaches end-of-text (its start + chunkSize >= len by the stop
    * rule) and may be shorter than `chunkSize`, never empty. Documents
    * with empty/null text produce no chunks — a chunker that emits empty
    * windows poisons downstream tokenization. Output columns: every column
    * of `df` plus `chunk_no` (0-based, per document), `chunk_start`
    * (0-based character offset) and `chunk` (the window text).
    */
  def chunkByChars(
      df: DataFrame,
      textCol: String,
      chunkSize: Int,
      overlap: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize): got overlap=$overlap, chunkSize=$chunkSize")
    val stride = chunkSize - overlap
    val len = length(col(textCol))
    // start offsets 0, stride, 2·stride, … while start + overlap < len
    // (chunk at `start` adds content beyond the previous chunk's end at
    // start + overlap); the greatest() keeps chunk 0 for short texts
    val starts = when(len.isNull || len === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0),
        greatest(lit(0), (len - overlap - 1).cast("int")), lit(stride)))
    df.select(col("*"), posexplode(starts).as(Seq("chunk_no", "chunk_start")))
      .withColumn("chunk", substring_index_safe(col(textCol), col("chunk_start"), chunkSize))
  }

  /** 1-based `substring` over a 0-based offset column (Spark's two-arg
    * Column `substring` wants literals; `expr` keeps it codegen'd).
    */
  private def substring_index_safe(text: Column, start0: Column, n: Int): Column =
    text.substr(start0 + 1, lit(n))
}
