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
        val ordered = rows.toArray.sortBy { r =>
          r.get(idIdx) match {
            case n: java.lang.Number => (n.longValue(), "")
            case other => (Long.MinValue, String.valueOf(other))
          }
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
