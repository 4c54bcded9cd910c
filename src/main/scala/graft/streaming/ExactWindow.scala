package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Reference-exact streaming window emission as a custom stateful
  * operator (SURVEY §7.2 item 2): the reference's GroupedWindowAggStream
  * (/root/reference/crates/core/src/physical_plan/continuous/
  * grouped_window_agg_stream.rs:110-420) keeps one frame per open
  * (group, window-start), emits a window exactly when the watermark
  * passes its end, and drops batches for already-emitted windows.
  *
  * Spark's built-in append-mode aggregate matches those semantics
  * closely (StreamingSpec proves it); this operator exists for the
  * cases where frame-exact control matters — custom state layout,
  * per-window side effects, non-standard late policies — implemented
  * with flatMapGroupsWithState + EventTimeTimeout, the Spark-native
  * custom-stateful tier (one step below a full SparkStrategy, which
  * these semantics do not require).
  *
  * Aggregates computed per (group, window): count, sum, min, max, avg
  * over one value column — the reference example set
  * (simple_aggregation.rs:47-52).
  */
object ExactWindow {

  case class WindowKey(group: String, windowStartMs: Long)
  case class AggState(n: Long, sum: Double, min: Double, max: Double)
  case class WindowResult(group: String, window_start_time: Timestamp,
      window_end_time: Timestamp, n: Long, sum: Double, min: Double,
      max: Double, avg: Double)

  /** @param df streaming frame
    * @param groupCol   group key column (string)
    * @param tsCol      event-time column (TimestampType, watermarked here)
    * @param valueCol   numeric column to aggregate
    * @param lengthMs   tumbling window length in ms
    * @param delay      watermark delay (e.g. "0 seconds")
    */
  def tumbling(df: DataFrame, groupCol: String, tsCol: String,
               valueCol: String, lengthMs: Long,
               delay: String = "0 seconds"): DataFrame =
    sliding(df, groupCol, tsCol, valueCol, lengthMs, lengthMs, delay)

  /** Sliding variant: each row feeds every overlapping frame — the
    * reference's `get_windows_for_watermark` row routing
    * (grouped_window_agg_stream.rs:443-650); slide == length degrades
    * to tumbling.
    */
  def sliding(df: DataFrame, groupCol: String, tsCol: String,
              valueCol: String, lengthMs: Long, slideMs: Long,
              delay: String = "0 seconds"): DataFrame = {
    require(slideMs > 0 && lengthMs >= slideMs,
      "need 0 < slide <= length")
    val spark = df.sparkSession
    import spark.implicits._
    // non-multiple slides: ceil(length/slide) candidate frames per row,
    // the range filter below trims the one candidate that may fall out
    // (matches Spark's window() and the reference's per-row routing —
    // window starts are the slide grid, not length-aligned)
    val framesPerRow = ((lengthMs + slideMs - 1) / slideMs).toInt

    // frame explosion stays at Column level: an object-level flatMap
    // would strip the watermark tag from the event-time column and
    // EventTimeTimeout requires it downstream
    val tsMs = unix_millis(col("ts"))
    val newest = tsMs - pmod(tsMs, lit(slideMs))
    val keyed = df.withWatermark(tsCol, delay)
      // primitive Double encoding below: a null value would kill the
      // query, built-in aggs skip nulls — match that contract here
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(tsCol).as("ts"), col(valueCol).cast("double").as("v"))
      .withColumn("ws", explode(array(
        (0 until framesPerRow).map(k => newest - lit(k * slideMs)): _*)))
      .filter(col("ws") > tsMs - lit(lengthMs))
      .as[(String, Timestamp, Double, Long)]
      // NOTE: no mapValues — it re-serializes the value columns and
      // strips the watermark tag EventTimeTimeout depends on
      .groupByKey { case (g, _, _, ws) => WindowKey(g, ws) }(
        Encoders.product[WindowKey])

    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (key: WindowKey, rows: Iterator[(String, Timestamp, Double, Long)],
       state: GroupState[AggState]) => {
        if (state.hasTimedOut) {
          // watermark passed window end → emit once, drop the frame
          val s = state.get
          state.remove()
          Iterator(WindowResult(key.group,
            new Timestamp(key.windowStartMs),
            new Timestamp(key.windowStartMs + lengthMs),
            s.n, s.sum, s.min, s.max, s.sum / s.n))
        } else {
          // Spark routes only non-late rows here (watermark filter
          // upstream = the reference's closed-window batch drop)
          var s = state.getOption.getOrElse(
            AggState(0L, 0.0, Double.MaxValue, Double.MinValue))
          rows.foreach { case (_, _, v, _) =>
            s = AggState(s.n + 1, s.sum + v, math.min(s.min, v),
              math.max(s.max, v))
          }
          state.update(s)
          // fire exactly when watermark reaches window end
          state.setTimeoutTimestamp(key.windowStartMs + lengthMs)
          Iterator.empty
        }
      })(Encoders.product[AggState], Encoders.product[WindowResult])
      .toDF()
  }
}
