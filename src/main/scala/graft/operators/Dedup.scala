package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => F, TextFunctions => T}

/** Deduplication operators for web-scale corpora.
  *
  * Scale design notes (the 100 TB story):
  *  - Exact dedup is one hash-shuffle on a 64-bit content hash — the full
  *    text never shuffles, only (hash, id); the winner set joins back
  *    map-side if needed.
  *  - MinHash-LSH is the classic shingle -> signature -> band-bucket
  *    pipeline: signatures are computed map-side (one pass per row, see
  *    MinHashSignature), then only (bucket_key, id) pairs shuffle. Bucket
  *    self-join produces candidates; candidates are verified with exact
  *    Jaccard on shingle sets. Every stage is a narrow map or a single
  *    keyed shuffle — no cartesian anywhere.
  *  - SimHash uses 4x16-bit band tables, the standard Hamming-LSH for
  *    distance <= 3.
  */
object Dedup {

  /** Exact duplicate groups by normalized text, keyed on a 128-bit content
    * hash so only (hash, id) pairs shuffle — never the text itself. At 100 TB
    * the shuffle payload is 24 bytes/row regardless of document size;
    * md5's 128 bits make collisions negligible at any corpus size
    * (~1e-18 at a trillion docs). Keeps min(id) as the canonical
    * representative.
    */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(T.normText(col(textCol)).cast("binary")).as("norm_hash"))
      .groupBy(col("norm_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Rows surviving exact dedup (the canonical representative per text). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val winners = exactDuplicates(df, idCol, textCol)
      .select(col("keep_id").as(idCol))
    df.join(winners, idCol) // broadcast-able when dup rate is high; hash join otherwise
  }

  /** MinHash-LSH candidate duplicate pairs.
    *
    * @param numHashes signature length (k)
    * @param bands     number of LSH bands; rows per band = numHashes/bands.
    *                  Similarity threshold ~ (1/bands)^(1/rowsPerBand).
    */
  def minHashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0)
    val rowsPerBand = numHashes / bands
    val sig = df.select(
      col(idCol).as("id"),
      F.minhash_signature(F.word_shingles(T.tokens(col(textCol)), shingleSize), numHashes).as("sig"))
    // band key = (band index, xxhash64 of the band's signature slice)
    val banded = sig.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand))), b))
    ).as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Candidate pairs verified with exact Jaccard over shingle sets
    * (array_intersect/array_union are codegen'd built-ins).
    */
  def minHashDuplicates(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, shingleSize: Int = 3,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val cand = minHashCandidatePairs(df, idCol, textCol, shingleSize, numHashes, bands)
    val jac = ngramJaccard(cand, df, idCol, textCol, shingleSize)
    jac.where(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard for given candidate pairs (id_a, id_b). */
  def ngramJaccard(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(F.word_shingles(T.tokens(col(textCol)), shingleSize)).as("sh"))
    pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
  }

  /** All-pairs n-gram Jaccard above a threshold via LSH candidates. */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame =
    minHashDuplicates(df, idCol, textCol, threshold)

  /** SimHash near-dup candidates: 64-bit simhash split into 4x16-bit bands;
    * docs sharing any band are candidates (guaranteed to include all pairs
    * with Hamming distance <= 3). Verified by exact popcount distance.
    */
  def simHashDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      F.simhash64(T.tokens(col(textCol))).as("sim"))
    val banded = sh.select(col("id"), col("sim"), posexplode(
      array((0 until 4).map(b => shiftright(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)
    ).as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sim").as("sim_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sim").as("sim_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs: cosine >= threshold via LSH bucketing (same
    * bucket => candidate) verified with exact cosine. Map-side bucket
    * assignment, one keyed shuffle, no cartesian.
    */
  def embeddingDuplicates(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 8, tables: Int = 1): DataFrame = {
    // L independent hash tables (disjoint hyperplane sets): a pair is a
    // candidate if it collides in ANY table. Recall = 1-(1-p^bits)^tables,
    // tuned via (bits, tables); each table is one keyed shuffle.
    val b = df.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(array((0 until tables).map(t =>
        F.lsh_bucket(col(vecCol), bits, planeOffset = t * bits)): _*))
        .as(Seq("table", "bucket")))
    val l = b.select(col("table"), col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = b.select(col("table"), col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("table", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), F.cosine_similarity(col("v_a"), col("v_b")).as("cosine"))
      .where(col("cosine") >= threshold)
      .distinct()
  }
}
