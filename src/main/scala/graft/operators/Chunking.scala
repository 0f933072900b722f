package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking: split long texts into fixed-size overlapping windows —
  * the context-window preparation step of a training/RAG pipeline (each chunk
  * becomes one embedding / one training sample, with `overlap` characters of
  * shared context so no boundary-straddling span is lost).
  *
  * Scale design: the chunk starts are a `sequence()` literal-range per row
  * and the split is `posexplode` over codegen'd `substring` — a pure
  * MAP-SIDE transform with no shuffle, no UDF, and output size bounded by
  * `ceil(len/step)` rows per document. At 100 TB this is the same plan per
  * partition regardless of cluster size; downstream embedding/packing stages
  * decide the shuffles.
  */
object Chunking {

  /** One row per (document, chunk). Chunk c starts at `c * (size - overlap)`
    * (0-based), carries `size` chars (the final chunk may be shorter), and
    * start positions run while `start < max(len - overlap, 1)` — i.e. a
    * trailing window whose every character is already covered by the
    * previous chunk's overlap is NOT emitted, but a final short chunk that
    * adds new characters is. Empty/null texts yield no rows.
    *
    * Output: input columns + `chunk_ix` (int, 0-based) + `chunk` (string).
    */
  def chunk(df: DataFrame, textCol: String, size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    // every input column is carried through, so the two output columns and
    // the internal start column must be fresh — silently clobbering caller
    // data (or producing a duplicate-name frame) is worse than failing
    val reserved = df.columns.toSet.intersect(Set("chunk_ix", "chunk", "__start"))
    require(reserved.isEmpty,
      s"chunk(): input already has column(s) ${reserved.mkString(", ")} — rename them first")
    val step = size - overlap
    val len = length(col(textCol))
    val lastStartExcl = greatest(len - overlap, lit(1))
    val starts = sequence(lit(0), lastStartExcl - 1, lit(step))
    df.where(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(df.columns.map(col) :+ posexplode(starts).as(Seq("chunk_ix", "__start")): _*)
      // Column.substr takes a per-row start (the substring() overload is
      // literal-only); 1-based slice of `size` chars from the 0-based start
      .withColumn("chunk", col(textCol).substr(col("__start") + 1, lit(size)))
      .drop("__start")
  }
}
