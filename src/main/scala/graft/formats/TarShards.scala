package graft.formats

import java.io.ByteArrayInputStream

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hadoop `Configuration` is not `java.io.Serializable`, so the
  * driver's session conf (object-store credentials, endpoints, every
  * `spark.hadoop.*` setting) cannot ride a closure as-is. This tiny
  * wrapper uses Hadoop's own `write`/`readFields` wire format inside
  * Java serialization — the standard pattern for shipping the
  * DRIVER's Hadoop conf to executor-side FileSystem resolution
  * (constructing `new Configuration()` on the executor would silently
  * drop all session settings and point shard writes at a
  * differently-configured filesystem than every other writer).
  */
private[graft] final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

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
  *    a task, not a split); the tar walk is one STREAMED pass per
  *    shard (an Iterator over entries — peak memory per task is
  *    ~1× shard bytes plus one in-flight sample, not a second
  *    materialized copy of every entry) and [[samples]] groups a
  *    sample's fields by ADJACENCY inside that pass — the format
  *    guarantees a sample's entries are consecutive, so grouping
  *    costs no shuffle and no state beyond one sample.
  *  - WRITE: one tar per input partition, streamed entry-by-entry
  *    (never a collect; repartition upstream to size shards). Each
  *    task writes to an ATTEMPT-SUFFIXED temp name and renames on
  *    completion — the `replaceWith` commit discipline the index
  *    writers follow — so a task that dies mid-write leaves only an
  *    invisible temp (never a partial tar at the final name) and its
  *    retry replaces rather than collides; at 100 TB, where task
  *    retries are routine, non-idempotent writes kill the job.
  *    A target dir already holding `shard-*.tar` files REFUSES up
  *    front: a rerun with a different partition count would
  *    otherwise leave stale shards that [[samples]]' glob silently
  *    picks up as duplicate data.
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

  /** One shard's entries grouped into samples by adjacency — an
    * Iterator over the streamed [[walk]], holding at most ONE sample
    * beyond the walk's in-flight entry.
    */
  private def groupSamples(shard: String, bytes: Array[Byte],
                           maxEntryBytes: Long)
      : Iterator[(String, String, Map[String, Array[Byte]])] = {
    val it = walk(shard, bytes, maxEntryBytes).buffered
    new scala.collection.AbstractIterator[
        (String, String, Map[String, Array[Byte]])] {
      override def hasNext: Boolean = it.hasNext
      override def next(): (String, String, Map[String, Array[Byte]]) = {
        val (_, name0, c0) = it.next()
        val (key, ext0) = splitKey(name0)
        var cur = Map(ext0 -> c0)
        var sameKey = true
        while (sameKey && it.hasNext) {
          val (k, e) = splitKey(it.head._2)
          if (k == key) {
            require(!cur.contains(e),
              s"duplicate field '$e' for sample '$key' in $shard — " +
                "malformed shard")
            cur += (e -> it.next()._3)
          } else sameKey = false
        }
        (shard, key, cur)
      }
    }
  }

  /** Write `df` as WebDataset-style shards: one `shard-NNNNN.tar`
    * per input partition under `dir` (repartition upstream to size
    * shards — the WebDataset norm is 100–500 MB), each row one
    * sample, one entry per `(fieldName, column)` in `fields` (null
    * field values skip their entry; binary columns write verbatim,
    * anything else writes as UTF-8). Entry name = `<key>.<field>`.
    * Rows stream straight to the archive — nothing collects.
    *
    * Fidelity guards (a write that cannot round-trip refuses instead
    * of silently corrupting the read side): a key containing `.` or
    * `/` refuses (the read side splits the basename on its FIRST
    * dot, so key `1.5` + field `txt` would read back as key `1`,
    * field `5.txt`), and a row whose fields are ALL null refuses
    * (it would write zero entries and silently vanish from
    * [[samples]] — row loss vs the source).
    *
    * Task-retry idempotency: each task writes
    * `.shard-NNNNN.tar.<attempt>.inprogress` and renames to the
    * final name on completion, replacing whatever a dead prior
    * attempt left there — retries and speculative attempts of the
    * same partition produce byte-identical archives, so
    * last-rename-wins is safe. A pre-existing `shard-*.tar` under
    * `dir` (a previous job's output) refuses before any task runs.
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
    refuseStaleShards(f0, p0, dir)
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    df.select(cols: _*)
      .map { r =>
        (r.getString(0),
          (1 to exts.size).map(i =>
            if (r.isNullAt(i)) null else r.getAs[Array[Byte]](i)))
      }
      .foreachPartition {
        it: Iterator[(String, Seq[Array[Byte]])] =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          writeShard(conf.value, dir, tc.partitionId(),
            tc.taskAttemptId(), exts, it)
        }
      }
  }

  /** SIZE-TARGETED shard write — the WebDataset sizing norm
    * (100–500 MB tars) as an operator instead of a "repartition
    * upstream" instruction: estimates each sample's exact tar entry
    * cost (512 B header + content padded to 512 per non-null field),
    * sums it in one column-pruned pass, derives `nShards =
    * ceil(total / targetShardBytes)`, and assigns samples to shards
    * with [[graft.operators.Packing.balancedShards]] — the serpentine
    * deal over the (bytes desc, key) rank, so shard byte totals track
    * the ideal within a few max-sample-weights without any
    * sequential packing state. One shuffle (the balancedShards
    * histogram rank) plus the assignment repartition; rows stream to
    * archives exactly as [[write]].
    *
    * Shard naming rides the ASSIGNED shard id, not the partition id,
    * and each task writes one tar per CONSECUTIVE shard-id run after
    * a within-partition sort — so a hash collision in
    * `repartition(nShards, shard)` (two shard ids landing in one
    * partition) still yields every shard its own correctly-named,
    * correctly-sized tar. Assignment and within-shard entry order
    * (key asc) are deterministic, so retries stay byte-identical and
    * the [[writeShard]] temp-name commit discipline applies
    * unchanged. Actual tar sizes run ~1–10 KB over the estimate per
    * shard (EOF blocks + record padding are not in the estimate).
    *
    * Sample keys must be unique corpus-wide (already the WebDataset
    * read-side contract — duplicate adjacent keys would merge into
    * one sample and refuse on the duplicate field). Returns nShards.
    */
  def writeSized(df: DataFrame, keyCol: String,
                 fields: Seq[(String, String)], dir: String,
                 targetShardBytes: Long = 256L << 20): Int = {
    require(fields.nonEmpty, "tar write needs >= 1 field column")
    require(targetShardBytes >= (64L << 10),
      s"targetShardBytes $targetShardBytes < 64 KiB — tar fixed " +
        "overhead would dominate every shard")
    val spark = df.sparkSession
    import spark.implicits._
    val entryCost = fields.map { case (_, c) =>
      val len = length(col(c).cast("binary")).cast("long")
      when(col(c).isNull, lit(0L))
        .otherwise(lit(512L) +
          floor((len + lit(511L)) / lit(512L)).cast("long") * lit(512L))
    }.reduce(_ + _)
    val withBytes = df.withColumn("__bytes", entryCost)
    val totalRow = withBytes.agg(sum(col("__bytes"))).head()
    require(!totalRow.isNullAt(0),
      "tar writeSized: empty input — nothing to shard")
    val total = totalRow.getLong(0)
    val nShards = math.max(1L,
      (total + targetShardBytes - 1) / targetShardBytes)
    require(nShards <= 1000000L,
      s"tar writeSized: $total B at $targetShardBytes B/shard = " +
        s"$nShards shards — raise targetShardBytes")
    val assigned = graft.operators.Packing.balancedShards(
      withBytes, keyCol, col("__bytes"), nShards.toInt)
    val exts = fields.map(_._1)
    val (f0, p0) = fsFor(spark, dir)
    f0.mkdirs(p0)
    refuseStaleShards(f0, p0, dir)
    val conf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    assigned
      .select(col("shard") +: col(keyCol).cast("string").as("__k") +:
        fields.map { case (_, c) => col(c).cast("binary") }: _*)
      .repartition(nShards.toInt, col("shard"))
      .sortWithinPartitions(col("shard"), col("__k"))
      .map { r =>
        (r.getLong(0), r.getString(1),
          (2 until 2 + exts.size).map(i =>
            if (r.isNullAt(i)) null else r.getAs[Array[Byte]](i)))
      }
      .foreachPartition {
        it: Iterator[(Long, String, Seq[Array[Byte]])] =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val buf = it.buffered
          while (buf.hasNext) {
            val sid = buf.head._1
            val group =
              new scala.collection.AbstractIterator[
                  (String, Seq[Array[Byte]])] {
                override def hasNext: Boolean =
                  buf.hasNext && buf.head._1 == sid
                override def next(): (String, Seq[Array[Byte]]) = {
                  val r = buf.next(); (r._2, r._3)
                }
              }
            writeShard(conf.value, dir, sid.toInt,
              tc.taskAttemptId(), exts, group)
          }
        }
      }
    nShards.toInt
  }

  private def refuseStaleShards(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, dir: String): Unit = {
    val stale = fs.globStatus(
      new org.apache.hadoop.fs.Path(p, "shard-*.tar"))
    require(stale == null || stale.isEmpty,
      s"${if (stale == null) 0 else stale.length} shard-*.tar " +
        s"file(s) already exist under $dir — refusing to mix shard " +
        "generations " +
        "(a rerun with a different partition count would leave stale " +
        "shards that samples() silently reads as duplicate data); " +
        "write to a fresh dir or clean the old shards first")
  }

  /** One task's shard write: stream rows into an attempt-suffixed
    * temp tar, rename to the final name on completion (task commit).
    * Exposed package-private so the retry-idempotency spec can drive
    * a die-mid-write + retry sequence directly (local-mode Spark
    * does not retry tasks).
    */
  private[graft] def writeShard(
      hadoopConf: org.apache.hadoop.conf.Configuration, dir: String,
      pid: Int, attemptId: Long, exts: Seq[String],
      it: Iterator[(String, Seq[Array[Byte]])]): Unit = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(hadoopConf)
    val finalPath =
      new org.apache.hadoop.fs.Path(base, f"shard-$pid%05d.tar")
    val tmpPath = new org.apache.hadoop.fs.Path(base,
      f".shard-$pid%05d.tar.$attemptId.inprogress")
    var committed = false
    try {
      val out = new TarArchiveOutputStream(fs.create(tmpPath, true))
      out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
      try it.foreach { case (key, vals) =>
        require(key != null && key.nonEmpty,
          "tar write: null/empty sample key — key column must be " +
            "non-null")
        require(!key.contains('.') && !key.contains('/'),
          s"tar write: sample key '$key' contains '.' or '/' — the " +
            "WebDataset read side splits entry basenames on their " +
            "FIRST dot, so such a key cannot round-trip (key '1.5' " +
            "with field 'txt' reads back as key '1', field '5.txt'); " +
            "sanitize the key column upstream")
        require(vals.exists(_ != null),
          s"tar write: sample '$key' has all-null fields — it would " +
            "write zero tar entries and silently vanish from " +
            "samples() (row loss); filter such rows or materialize " +
            "a marker field upstream")
        exts.zip(vals).foreach { case (ext, bytes) =>
          if (bytes != null) {
            val e = new TarArchiveEntry(s"$key.$ext")
            // pin mtime: TarArchiveEntry defaults to wall-clock NOW,
            // which makes archives non-reproducible — retries,
            // speculative attempts and re-runs must be byte-identical
            e.setModTime(0L)
            e.setSize(bytes.length.toLong)
            out.putArchiveEntry(e)
            out.write(bytes)
            out.closeArchiveEntry()
          }
        }
      } finally out.close()
      // task commit: replace whatever a dead prior attempt left at
      // the final name (attempts of one partition are byte-identical,
      // so last-rename-wins is safe even under speculation)
      if (fs.exists(finalPath)) fs.delete(finalPath, false)
      if (!fs.rename(tmpPath, finalPath))
        throw new java.io.IOException(
          s"tar write: could not commit $tmpPath -> $finalPath")
      committed = true
    } finally {
      if (!committed) {
        // best-effort temp cleanup on a dying attempt; the temp name
        // never matches samples()' shard-*.tar glob either way
        try fs.delete(tmpPath, false)
        catch { case _: java.io.IOException => () }
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

  /** Streamed walk over one shard's entries — an Iterator, so a
    * task's peak memory is the shard's byte array plus ONE in-flight
    * entry, never a second materialized copy of the whole shard.
    * Refuses oversized DECLARED entries before allocating; attaches
    * the shard path to parse failures (surfaced from hasNext/next at
    * whatever point of the walk the corruption sits).
    */
  private def walk(shard: String, bytes: Array[Byte],
                   maxEntryBytes: Long)
      : Iterator[(String, String, Array[Byte])] = {
    val in = new TarArchiveInputStream(new ByteArrayInputStream(bytes))
    new scala.collection.AbstractIterator[(String, String, Array[Byte])] {
      private var nextItem: (String, String, Array[Byte]) = _
      private var done = false
      private def advance(): Unit = {
        try {
          var e = in.getNextEntry
          while (e != null && !e.isFile) e = in.getNextEntry
          if (e == null) { done = true; nextItem = null }
          else {
            require(e.getSize >= 0 && e.getSize <= maxEntryBytes,
              s"tar entry '${e.getName}' in $shard declares " +
                s"${e.getSize} B > the $maxEntryBytes B cap — " +
                "adversarial or mis-sharded input (raise maxEntryBytes " +
                "only if such entries are expected)")
            nextItem = ((shard, e.getName, in.readAllBytes()))
          }
        } catch {
          case io: java.io.IOException =>
            throw new java.io.IOException(
              s"corrupt tar shard $shard: ${io.getMessage}", io)
        }
      }
      advance()
      override def hasNext: Boolean = !done
      override def next(): (String, String, Array[Byte]) = {
        if (done) throw new NoSuchElementException("walk exhausted")
        val r = nextItem
        advance()
        r
      }
    }
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
}
