package graft.formats

import java.io.ByteArrayInputStream

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar-shard I/O — the de-facto layout for
  * multimodal training corpora (one `.tar` per shard; a SAMPLE is a
  * run of adjacent entries sharing a basename key, one entry per
  * field: `000123.jpg`, `000123.txt`, `000123.json`, …). The format
  * is sequential-read-friendly object storage: training loaders
  * stream whole shards, so the Spark-side contract is one task per
  * shard and zero shuffles.
  *
  * Scale design:
  *  - READ: `binaryFile` gives one row per shard (shards are sized
  *    by the writer — the 100–500 MB WebDataset norm — so a shard is
  *    a task, not a split); the tar walk is one in-memory pass per
  *    shard and [[samples]] groups a sample's fields by ADJACENCY
  *    inside that pass — the format guarantees a sample's entries
  *    are consecutive, so grouping costs no shuffle and no state
  *    beyond one sample.
  *  - WRITE: one tar per input partition, streamed entry-by-entry
  *    (never a collect; repartition upstream to size shards).
  *  - Adversarial inputs: an entry DECLARING a size beyond
  *    `maxEntryBytes` refuses before any allocation (the multimodal
  *    decode-cap discipline — a crafted 60 GB entry header must not
  *    OOM an executor); a truncated archive surfaces commons-
  *    compress's IOException with the shard path attached.
  */
object TarShards {

  /** One row per tar ENTRY across all shards matching `path`:
    * (shard, entry, content). Directories and non-file entries skip.
    */
  def entries(spark: SparkSession, path: String,
              maxEntryBytes: Long = 256L << 20): DataFrame = {
    import spark.implicits._
    binaryShards(spark, path).flatMap { case (shard, bytes) =>
      walk(shard, bytes, maxEntryBytes)
    }.toDF("shard", "entry", "content")
  }

  /** One row per SAMPLE: (shard, key, fields: map<ext, bytes>),
    * grouped by adjacency within the shard — the WebDataset
    * contract — so no shuffle happens. The key is the entry
    * basename up to its first dot; the field name is the rest
    * (`000123.cls.json` → key `000123`, field `cls.json`). A
    * duplicate field within one sample refuses loudly (a malformed
    * shard silently dropping one of two `.txt` entries is the worst
    * failure mode a loader can have).
    */
  def samples(spark: SparkSession, path: String,
              maxEntryBytes: Long = 256L << 20): DataFrame = {
    import spark.implicits._
    binaryShards(spark, path).flatMap { case (shard, bytes) =>
      groupSamples(shard, bytes, maxEntryBytes)
    }.toDF("shard", "key", "fields")
  }

  /** One shard's entries grouped into samples by adjacency. */
  private def groupSamples(shard: String, bytes: Array[Byte],
                           maxEntryBytes: Long)
      : Seq[(String, String, Map[String, Array[Byte]])] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Map[String, Array[Byte]])]
    var curKey: String = null
    var cur = Map.empty[String, Array[Byte]]
    def flush(): Unit = if (curKey != null) {
      out += ((shard, curKey, cur)); curKey = null; cur = Map.empty
    }
    walk(shard, bytes, maxEntryBytes).foreach {
      case (_, name, content) =>
        val (key, ext) = splitKey(name)
        if (key != curKey) { flush(); curKey = key }
        require(!cur.contains(ext),
          s"duplicate field '$ext' for sample '$key' in $shard — " +
            "malformed shard")
        cur += (ext -> content)
    }
    flush()
    out.toSeq
  }

  /** Write `df` as WebDataset-style shards: one `shard-NNNNN.tar`
    * per input partition under `dir` (repartition upstream to size
    * shards — the WebDataset norm is 100–500 MB), each row one
    * sample, one entry per `(fieldName, column)` in `fields` (null
    * field values skip their entry; binary columns write verbatim,
    * anything else writes as UTF-8). Entry name = `<key>.<field>`.
    * Rows stream straight to the archive — nothing collects.
    */
  def write(df: DataFrame, keyCol: String,
            fields: Seq[(String, String)], dir: String): Unit = {
    require(fields.nonEmpty, "tar write needs >= 1 field column")
    val spark = df.sparkSession
    import spark.implicits._
    val cols = col(keyCol).cast("string").as("__k") +:
      fields.map { case (_, c) => col(c).cast("binary") }
    val exts = fields.map(_._1)
    val (f0, p0) = fsFor(spark, dir)
    f0.mkdirs(p0)
    df.select(cols: _*)
      .map { r =>
        (r.getString(0),
          (1 to exts.size).map(i =>
            if (r.isNullAt(i)) null else r.getAs[Array[Byte]](i)))
      }
      .foreachPartition {
        it: Iterator[(String, Seq[Array[Byte]])] =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val (fs, base) = fsForExecutor(dir)
          val out = new TarArchiveOutputStream(fs.create(
            new org.apache.hadoop.fs.Path(base, f"shard-$pid%05d.tar"),
            false))
          out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
          try it.foreach { case (key, vals) =>
            exts.zip(vals).foreach { case (ext, bytes) =>
              if (bytes != null) {
                val e = new TarArchiveEntry(s"$key.$ext")
                e.setSize(bytes.length.toLong)
                out.putArchiveEntry(e)
                out.write(bytes)
                out.closeArchiveEntry()
              }
            }
          } finally out.close()
        }
      }
  }

  /** STREAMING [[samples]]: continuous WebDataset ingestion — new
    * shard files landing under `path` arrive as sample rows
    * micro-batch by micro-batch (Spark's file source tracks seen
    * files; a shard is processed exactly once). The tar walk is
    * stateless per shard, so this source composes with any
    * downstream monitor/dedup operator; pair with
    * `maxFilesPerTrigger` on heavy shards.
    */
  def samplesStream(spark: SparkSession, path: String,
                    maxEntryBytes: Long = 256L << 20): DataFrame = {
    import spark.implicits._
    // binaryFile's schema is FIXED by the format, but the streaming
    // source requires it stated explicitly
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.tar")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (shard, bytes) =>
        groupSamples(shard, bytes, maxEntryBytes)
      }.toDF("shard", "key", "fields")
  }

  /** (shard path, shard bytes) — one row per shard file. */
  private def binaryShards(spark: SparkSession, path: String) = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
  }

  /** Walk one shard's entries; refuses oversized DECLARED entries
    * before allocating, attaches the shard path to parse failures.
    */
  private def walk(shard: String, bytes: Array[Byte],
                   maxEntryBytes: Long)
      : Seq[(String, String, Array[Byte])] = {
    val in = new TarArchiveInputStream(new ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Array[Byte])]
    try {
      var e = in.getNextEntry
      while (e != null) {
        if (e.isFile) {
          require(e.getSize >= 0 && e.getSize <= maxEntryBytes,
            s"tar entry '${e.getName}' in $shard declares " +
              s"${e.getSize} B > the $maxEntryBytes B cap — " +
              "adversarial or mis-sharded input (raise maxEntryBytes " +
              "only if such entries are expected)")
          out += ((shard, e.getName, in.readAllBytes()))
        }
        e = in.getNextEntry
      }
    } catch {
      case io: java.io.IOException =>
        throw new java.io.IOException(
          s"corrupt tar shard $shard: ${io.getMessage}", io)
    }
    out.toSeq
  }

  /** WebDataset key split: basename up to the FIRST dot. */
  private def splitKey(name: String): (String, String) = {
    val base = name.substring(name.lastIndexOf('/') + 1)
    val dot = base.indexOf('.')
    if (dot < 0) (base, "") else (base.take(dot), base.drop(dot + 1))
  }

  private def fsFor(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Executor-side FS handle (driver Hadoop conf isn't serialized
    * into the closure; default conf resolves file:// and
    * default-configured HDFS, the deployment shapes this library
    * targets).
    */
  private def fsForExecutor(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(new org.apache.hadoop.conf.Configuration()), p)
  }
}
