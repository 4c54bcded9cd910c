package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Streaming sequence packing — the continuous counterpart of
  * [[graft.operators.Packing.packChunks]] for unbounded ingest (the
  * batch form's global window sort cannot run on a stream).
  *
  * Same sharded concat-then-chunk contract: a document is routed to a
  * shard by the salted md5-prefix draw (identical key to the batch
  * operator, so batch and streaming layouts SHARD identically), and
  * takes the next `tokenCol` positions of its shard's concatenated
  * stream. State per shard is a single long — the stream's running
  * token length — so state size is exactly 16^shardChars longs
  * regardless of corpus size, and a restart resumes the layout
  * mid-stream from the checkpoint. Parallelism is 16^shardChars tasks
  * and each shard buffers its slice of a micro-batch for the in-batch
  * id sort — the batch operator's `shardChars` sizing rule
  * ([[graft.operators.Packing.packChunks]]) applies unchanged.
  *
  * ORDER CONTRACT (the one semantic difference from batch): a stream
  * has no global id order, so layout position is ARRIVAL order —
  * id-sorted within each micro-batch (deterministic given the batch
  * boundaries; replaying one batch of the whole corpus reproduces the
  * batch operator's layout exactly, a spec pins it), append order
  * across batches. All chunk arithmetic (integer div, zero-token docs
  * span zero chunks) matches the batch operator bit-for-bit.
  */
/** JVM-side orderings that reproduce Spark's column sort exactly —
  * for stateful operators that must order a micro-batch's rows the
  * way a batch `orderBy` would: strings compare as unsigned UTF-8
  * bytes (Spark's UTF8String.binaryCompare — Java compareTo is UTF-16
  * code-unit order, which inverts supplementary-plane chars vs BMP
  * chars above U+E000), integrals as longs, fractional as doubles (no
  * longValue truncation — 1.2 vs 1.5 must not tie), decimals exactly;
  * nulls first, as in Spark's default null ordering.
  */
private[streaming] object RowOrder {
  def forType(dt: DataType): Ordering[Any] = {
    def utf8(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xFF) - (y(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    val cmp: (Any, Any) => Int = dt match {
      case StringType => (a, b) =>
        utf8(a.asInstanceOf[String], b.asInstanceOf[String])
      case ByteType | ShortType | IntegerType | LongType => (a, b) =>
        java.lang.Long.compare(a.asInstanceOf[java.lang.Number].longValue,
          b.asInstanceOf[java.lang.Number].longValue)
      case FloatType | DoubleType => (a, b) =>
        // -0.0 == 0.0 and NaN greatest, matching Spark's sort order
        java.lang.Double.compare(
          a.asInstanceOf[java.lang.Number].doubleValue + 0.0,
          b.asInstanceOf[java.lang.Number].doubleValue + 0.0)
      case _: DecimalType => (a, b) =>
        a.asInstanceOf[java.math.BigDecimal]
          .compareTo(b.asInstanceOf[java.math.BigDecimal])
      case other => throw new IllegalArgumentException(
        s"unsupported ordering column type: $other")
    }
    (a: Any, b: Any) =>
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else cmp(a, b)
  }
}

object StreamingPacking {

  def packChunks(df: DataFrame, idCol: String, tokenCol: String,
                 capacity: Long, shardChars: Int = 1,
                 salt: String = graft.operators.Packing.ShardSalt)
      : DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(shardChars >= 1 && shardChars <= 8,
      "shardChars must be in [1, 8]")
    val prepared = df.withColumn("shard",
      graft.operators.Packing.shardKey(col(idCol), shardChars, salt))
    val inSchema = prepared.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("start", LongType), StructField("chunk", LongType),
      StructField("offset", LongType),
      StructField("chunks_spanned", LongType)))
    val outEnc: Encoder[Row] = ExpressionEncoder(outSchema)
    val idIdx = inSchema.fieldIndex(idCol)
    val tokIdx = inSchema.fieldIndex(tokenCol)

    // in-batch id ordering must MATCH the batch operator's column sort
    // (so single-batch replay reproduces its layout exactly) — see
    // [[RowOrder.forType]]
    val idOrdering: Ordering[Any] =
      RowOrder.forType(inSchema(idIdx).dataType)

    val keyed = prepared.groupByKey(
      _.getAs[String]("shard"))(Encoders.STRING)

    val processor = new StatefulProcessor[String, Row, Row] {
      @transient private var len: ValueState[Long] = _
      override def init(outputMode: OutputMode,
                        timeMode: TimeMode): Unit =
        len = getHandle.getValueState[Long]("len", Encoders.scalaLong,
          TTLConfig.NONE)

      override def handleInputRows(key: String, rows: Iterator[Row],
                                   timers: TimerValues): Iterator[Row] = {
        var cursor = if (len.exists()) len.get() else 0L
        // id order within the batch: deterministic layout for
        // deterministic batch boundaries, and single-batch replay ==
        // the batch operator's id-ordered layout
        val ordered = rows.toArray.sortWith { (a, b) =>
          idOrdering.compare(a.get(idIdx), b.get(idIdx)) < 0
        }
        val out = ordered.map { r =>
          val tok = r.get(tokIdx) match {
            case n: java.lang.Number => n.longValue()
            case _ => 0L
          }
          require(tok >= 0, s"negative token count $tok for id " +
            s"${r.get(idIdx)}")
          val start = cursor
          val chunk = start / capacity
          val spanned =
            if (tok == 0) 0L else (start + tok - 1) / capacity - chunk + 1
          cursor += tok
          Row.fromSeq(r.toSeq ++
            Seq(start, chunk, start % capacity, spanned))
        }
        len.update(cursor)
        out.iterator
      }

      override def handleExpiredTimer(key: String, timers: TimerValues,
          expired: ExpiredTimerInfo): Iterator[Row] = Iterator.empty
    }
    keyed.transformWithState(processor, TimeMode.None(),
      OutputMode.Append())(outEnc).toDF()
  }
}
