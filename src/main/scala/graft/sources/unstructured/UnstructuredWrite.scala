package graft.sources.unstructured

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unstructured write sink (reference: datasources/v2/UnstructuredFileFormat
  * .scala:35-121, BinOutputWriter.scala:79-116): rows of (path, content) are
  * written as files under a target directory; image payloads also get a
  * `<name>_thumbnail` sibling, matching the reference's auto-thumbnail.
  *
  * Distributed: each partition writes its own files through the Hadoop
  * FileSystem API (works on HDFS/S3A/local), no driver collect.
  */
object UnstructuredWrite {

  /** Write each row's bytes to `<targetDir>/<filename(path)>`.
    *
    * @param df columns: `path` (source name; only the final segment is used)
    *           and one binary/string content column.
    */
  def writeFiles(df: DataFrame, targetDir: String, contentCol: String = "content",
      thumbnails: Boolean = false): Unit = {
    val serConf = new SerializableHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
    val target = targetDir
    val rows = df.select(
      element_at(split(col("path"), "/"), -1).as("__name"),
      col(contentCol).cast("binary").as("__bytes"))
    rows.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      val conf = serConf.value
      val dir = new Path(target)
      // one output file per row is the sink's contract, so per-create cost
      // IS the cost model: on checksummed filesystems (local fs included)
      // every create otherwise writes a second `.crc` sidecar file,
      // doubling the create count. Disable client-side checksums on an
      // UNCACHED instance so the setting never leaks into the JVM-shared
      // cached FS other writers (the lake commit paths) use.
      val fs = org.apache.hadoop.fs.FileSystem.newInstance(dir.toUri, conf)
      try {
        fs.setWriteChecksum(false)
        fs.mkdirs(dir)
        it.foreach { r =>
          val name = r.getString(0)
          val bytes = r.getAs[Array[Byte]](1)
          val out = fs.create(new Path(dir, name), true)
          try out.write(bytes) finally out.close()
          if (thumbnails && isImageName(name)) {
            thumbnailBytes(bytes).foreach { tb =>
              val stem = name.lastIndexOf('.') match {
                case -1 => name
                case i => name.substring(0, i)
              }
              val t = fs.create(new Path(dir, s"${stem}_thumbnail.png"), true)
              try t.write(tb) finally t.close()
            }
          }
        }
      } finally fs.close()
    }
  }

  /** Write/overwrite `<file>.tag` JSON sidecars from a DataFrame of
    * (path, tag columns...). This wires up the tag-UPDATE design the
    * reference left unconnected (SURVEY.md §2.4: UpdateLightningTableTag
    * exists but the parser hook is commented out,
    * parser/LightningExtendedParser.scala:229-232).
    */
  def writeTagSidecars(df: DataFrame): Unit = {
    val serConf = new SerializableHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
    val tagCols = df.columns.filterNot(_ == "path").toIndexedSeq
    val json = df.select(col("path"),
      to_json(struct(tagCols.map(col): _*)).as("__tag_json"))
    json.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      val conf = serConf.value
      // same per-create cost model as writeFiles: uncached instance, no
      // client-side checksum sidecars (keyed per FS scheme — sidecar paths
      // normally share one)
      var fs: org.apache.hadoop.fs.FileSystem = null
      try {
        it.foreach { r =>
          val p = new Path(r.getString(0).stripPrefix("file:") + ".tag")
          if (fs == null) {
            fs = org.apache.hadoop.fs.FileSystem.newInstance(p.toUri, conf)
            fs.setWriteChecksum(false)
          }
          val out = fs.create(p, true)
          try out.write(r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
      } finally if (fs != null) fs.close()
    }
  }

  private def isImageName(name: String): Boolean = {
    val n = name.toLowerCase
    n.endsWith(".png") || n.endsWith(".jpg") || n.endsWith(".jpeg") ||
      n.endsWith(".gif") || n.endsWith(".bmp")
  }

  private def thumbnailBytes(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val m = Unstructured.ThumbnailMaxDim
        val scale = math.min(1.0, m.toDouble / math.max(img.getWidth, img.getHeight))
        val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
          math.max(1, (img.getHeight * scale).toInt))
        val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_SMOOTH), 0, 0, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }
}

/** Hadoop Configuration is not Serializable; standard wrapper. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
