package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode/feature-extract/
  * frame-sample operators.
  *
  * The actual codec step is STUBBED (this environment ships no image/
  * audio libraries): [[decodeStub]] derives deterministic fake
  * dimensions from the byte stream. Everything around it — schema,
  * binary handling, batch shape, partitioning — is real: swap
  * `fakeDecode` for a JNI/native-codec call and the pipeline is
  * production.
  */
object Multimodal {

  /** Metadata struct carried alongside every media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Wrap a text/bytes column as a media blob (test harness for the
    * binary path; real corpora read parquet/sequence files of blobs).
    */
  def asBlob(c: Column): Column = c.cast(BinaryType)

  def byteLength(blob: Column): Column = octet_length(blob)

  def sha256Hex(blob: Column): Column = sha2(blob, 256)

  /** Hex of the first n bytes — magic-number sniffing. */
  def headHex(blob: Column, n: Int = 8): Column =
    lower(hex(substring(blob, 1, n)))

  /** STUB decode: deterministic fake metadata from the bytes (first
    * byte → format class, length-derived dims). Real impl would call
    * an image codec here; signature and schema are the contract.
    */
  private val fakeDecode = udf { (bytes: Array[Byte]) =>
    if (bytes == null || bytes.isEmpty) null
    else {
      val fmt = (bytes(0) & 0x03) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "wav"; case _ => "mp4"
      }
      val w = 64 + (bytes(0) & 0x3f)
      val h = 64 + (if (bytes.length > 1) bytes(1) & 0x3f else 0)
      val frames = 1 + (bytes.length % 16)
      (fmt, w, h, frames)
    }
  }

  def decodeStub(blob: Column): Column =
    fakeDecode(blob).cast(mediaMetaSchema)

  /** Byte-histogram feature vector (16 bins, L1-normalized float) —
    * the feature-extraction plumbing: binary in, fixed-width
    * Array[Float] out, exactly the shape a real CNN/codec feature
    * extractor produces.
    */
  private val byteHistogram = udf { (bytes: Array[Byte]) =>
    if (bytes == null) null
    else {
      val bins = new Array[Float](16)
      var i = 0
      while (i < bytes.length) { bins((bytes(i) & 0xff) / 16) += 1f; i += 1 }
      val total = math.max(bytes.length, 1).toFloat
      bins.map(_ / total)
    }
  }

  def featureExtractStub(blob: Column): Column = byteHistogram(blob)

  /** Resize stub: recompute fake dims to fit a bounding box, keep the
    * byte payload truncated proportionally — the metadata/payload
    * rewrite shape of a real thumbnailer.
    */
  def resizeStub(blob: Column, maxDim: Int): Column = {
    val meta = decodeStub(blob)
    val w = meta.getField("width"); val h = meta.getField("height")
    val scale = least(lit(maxDim) / greatest(w, h).cast("double"), lit(1.0))
    struct(
      greatest((w * scale).cast("int"), lit(1)).as("width"),
      greatest((h * scale).cast("int"), lit(1)).as("height"),
      blob.substr(lit(1),
        greatest((octet_length(blob) * scale).cast("int"), lit(1)))
        .as("bytes"))
  }

  /** Frame sampling stub: every `stride`-th 16-byte slice as a
    * "frame" (array<binary>) — the partition-friendly shape of video
    * frame extraction (a real impl decodes keyframes; the slicing,
    * array schema, and per-row fan-out are the actual plumbing).
    */
  def frameSampleStub(blob: Column, stride: Int = 4): Column =
    transform(
      sequence(lit(0),
        greatest(((octet_length(blob) - 1) / lit(16 * stride)).cast("int"),
          lit(0))),
      i => blob.substr(i * lit(16 * stride) + 1, lit(16)))

  /** Batch-shaped decode: one iterator-to-iterator pass per partition
    * (the JVM analogue of mapInPandas' batch contract) — a real codec
    * amortizes per-batch setup (model load, JNI session) across the
    * whole partition here, which per-row UDFs cannot.
    */
  def decodePartitions(df: DataFrame, blobCol: String,
                       idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup happens once, here (codec/session init)
        it.map { case (id, bytes) =>
          val fmt = if (bytes.isEmpty) "empty" else (bytes(0) & 0x03) match {
            case 0 => "png"; case 1 => "jpeg"; case 2 => "wav"; case _ => "mp4"
          }
          val w = if (bytes.isEmpty) 0 else 64 + (bytes(0) & 0x3f)
          val h = if (bytes.length > 1) 64 + (bytes(1) & 0x3f) else 64
          (id, fmt, w, h, bytes.length)
        }
      }
      .toDF(idCol, "format", "width", "height", "n_bytes")
  }

  /** A media-table projection: blob + decoded meta + features — the
    * canonical multimodal pipeline stage.
    */
  def mediaPipeline(df: DataFrame, sourceCol: String,
                    idCol: String): DataFrame = {
    val blob = asBlob(col(sourceCol))
    df.select(col(idCol),
      blob.as("bytes"),
      byteLength(blob).as("n_bytes"),
      sha256Hex(blob).as("sha256"),
      headHex(blob).as("head_hex"),
      decodeStub(blob).as("meta"),
      featureExtractStub(blob).as("features"))
  }
}
