package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, ExpiredTimerInfo,
  TTLConfig, ValueState}
import org.apache.spark.sql.types._

/** Reference-exact streaming window emission as a custom stateful
  * operator (SURVEY §7.2 item 2): the reference's GroupedWindowAggStream
  * (/root/reference/crates/core/src/physical_plan/continuous/
  * grouped_window_agg_stream.rs:110-420) keeps one frame per open
  * (group, window-start), runs ARBITRARY accumulators per frame
  * (grouped_window_agg_stream.rs builds GroupsAccumulators from any
  * aggregate exprs; py udaf_example.py:30-89 runs a map-state UDAF
  * inside a window), emits a window exactly when the watermark passes
  * its end, and drops batches for already-emitted windows.
  *
  * Spark's built-in append-mode aggregate matches those semantics
  * closely (StreamingSpec proves it); this operator exists for the
  * cases where frame-exact control matters — custom state layout,
  * per-window side effects, non-standard late policies.
  *
  * Two interchangeable execution tiers behind the same surface:
  *  - [[slidingRows]] default: flatMapGroupsWithState +
  *    EventTimeTimeout (Spark's long-stable custom-stateful API);
  *  - `useTransformWithState = true`: the Spark 4 successor operator
  *    (StatefulProcessor + event-time timers, per-state-variable TTL,
  *    evolvable state schema). Both pass the same ExactWindowSpec
  *    matrix; both checkpoint/restore through the state store.
  *
  * Aggregates are caller-supplied [[ExactAgg]]s — any typed
  * `Aggregator` (including map-state UDAFs like Udafs.CountByValue)
  * lifts into the operator via `ExactAgg(name, extract, agg, type)`,
  * matching the reference's arbitrary-accumulator frames. Group keys
  * are any number of columns. The classic count/sum/min/max/avg
  * surface ([[tumbling]]/[[sliding]]) is a thin preset over the same
  * path.
  */
object ExactWindow {

  /** One named aggregate slot inside the exact-emission operator:
    * reduce rows into a buffer, serialize the buffer into the state
    * store between micro-batches (via the aggregator's own
    * bufferEncoder — columnar, restart-safe), finish at emission.
    */
  trait ExactAgg extends Serializable {
    def name: String
    def outputType: DataType
    def init(): Any
    def reduce(buf: Any, row: Row): Any
    /** Combine two partial buffers (session-merge and pane-merge use
      * this; plain frame aggregation never calls it).
      */
    def merge(b1: Any, b2: Any): Any
    def finish(buf: Any): Any
    def toBytes(buf: Any): Array[Byte]
    def fromBytes(bytes: Array[Byte]): Any
  }

  object ExactAgg {

    /** Lift a typed Aggregator into the operator. `extract` pulls the
      * aggregator's input out of the full row (column access by name),
      * so one operator invocation can aggregate different columns.
      */
    def apply[I, B, O](aggName: String, extract: Row => I,
                       agg: Aggregator[I, B, O],
                       output: DataType): ExactAgg = new ExactAgg {
      // encoder machinery materializes lazily on each executor; the
      // buffer crosses micro-batches as the UnsafeRow bytes of the
      // aggregator's OWN bufferEncoder (same layout Spark would use
      // for this Aggregator in a built-in aggregate)
      @transient private lazy val enc: ExpressionEncoder[B] =
        org.apache.spark.sql.catalyst.encoders.encoderFor(agg.bufferEncoder)
          .resolveAndBind()
      @transient private lazy val ser = enc.createSerializer()
      @transient private lazy val deser = enc.createDeserializer()
      @transient private lazy val proj =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(enc.schema)

      override def name: String = aggName
      override def outputType: DataType = output
      override def init(): Any = agg.zero
      override def reduce(buf: Any, row: Row): Any =
        agg.reduce(buf.asInstanceOf[B], extract(row))
      override def merge(b1: Any, b2: Any): Any =
        agg.merge(b1.asInstanceOf[B], b2.asInstanceOf[B])
      override def finish(buf: Any): Any = agg.finish(buf.asInstanceOf[B])
      override def toBytes(buf: Any): Array[Byte] =
        proj(ser(buf.asInstanceOf[B])).copy().getBytes
      override def fromBytes(bytes: Array[Byte]): Any = {
        val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(
          enc.schema.fields.length)
        r.pointTo(bytes, bytes.length)
        deser(r)
      }
    }

    /** Numeric presets over a double column. Null values are skipped at
      * reduce time (built-in agg null semantics), so calling
      * [[ExactWindow.slidingRows]] directly with a nullable column is
      * safe: count counts non-null rows, and a frame whose rows are all
      * null emits count 0 with null sum/min/max/avg — exactly what
      * `count(col)/sum/min/max/avg` return over an all-null group.
      * ([[ExactWindow.sliding]] additionally pre-filters null rows, so
      * all-null frames never even open on that surface.)
      */
    def count(name: String, valueCol: String): ExactAgg =
      numericPreset[Long, Long](name, valueCol, new CountA, LongType)
    def sum(name: String, valueCol: String): ExactAgg =
      numericPreset[(Long, Double), java.lang.Double](name, valueCol,
        new SumA, DoubleType)
    def min(name: String, valueCol: String): ExactAgg =
      numericPreset[(Long, Double), java.lang.Double](name, valueCol,
        new MinA, DoubleType)
    def max(name: String, valueCol: String): ExactAgg =
      numericPreset[(Long, Double), java.lang.Double](name, valueCol,
        new MaxA, DoubleType)
    def avg(name: String, valueCol: String): ExactAgg =
      numericPreset[(Long, Double), java.lang.Double](name, valueCol,
        new AvgA, DoubleType)

    /** Wrap a double-input Aggregator with a reduce-time null skip (a
      * bare `getAs[Double]` would silently unbox SQL NULL to 0.0).
      */
    private def numericPreset[B, O](aggName: String, valueCol: String,
                                    agg: Aggregator[Double, B, O],
                                    output: DataType): ExactAgg = {
      val lifted = apply[Double, B, O](aggName, _.getAs[Double](valueCol),
        agg, output)
      new ExactAgg {
        override def name: String = lifted.name
        override def outputType: DataType = lifted.outputType
        override def init(): Any = lifted.init()
        override def reduce(buf: Any, row: Row): Any =
          if (row.isNullAt(row.fieldIndex(valueCol))) buf
          else lifted.reduce(buf, row)
        override def merge(b1: Any, b2: Any): Any = lifted.merge(b1, b2)
        override def finish(buf: Any): Any = lifted.finish(buf)
        override def toBytes(buf: Any): Array[Byte] = lifted.toBytes(buf)
        override def fromBytes(bytes: Array[Byte]): Any =
          lifted.fromBytes(bytes)
      }
    }
  }

  private class CountA extends Aggregator[Double, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Double): Long = b + 1
    override def merge(x: Long, y: Long): Long = x + y
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
  // sum/min/max/avg buffers carry (non-null count, value) so an empty
  // (all-null-input) frame finishes to SQL NULL instead of a sentinel
  // (0.0 / ±Double.MaxValue) — the structural fix for the old "frames
  // only exist after ≥1 non-null row" comment-level contract
  private class SumA
      extends Aggregator[Double, (Long, Double), java.lang.Double] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), a: Double): (Long, Double) =
      (b._1 + 1, b._2 + a)
    override def merge(x: (Long, Double), y: (Long, Double)): (Long, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Double)): java.lang.Double =
      if (r._1 == 0L) null else Double.box(r._2)
    override def bufferEncoder: Encoder[(Long, Double)] =
      ExpressionEncoder[(Long, Double)]()
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }
  private class MinA
      extends Aggregator[Double, (Long, Double), java.lang.Double] {
    override def zero: (Long, Double) = (0L, Double.MaxValue)
    override def reduce(b: (Long, Double), a: Double): (Long, Double) =
      (b._1 + 1, math.min(b._2, a))
    override def merge(x: (Long, Double), y: (Long, Double)): (Long, Double) =
      (x._1 + y._1, math.min(x._2, y._2))
    override def finish(r: (Long, Double)): java.lang.Double =
      if (r._1 == 0L) null else Double.box(r._2)
    override def bufferEncoder: Encoder[(Long, Double)] =
      ExpressionEncoder[(Long, Double)]()
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }
  private class MaxA
      extends Aggregator[Double, (Long, Double), java.lang.Double] {
    override def zero: (Long, Double) = (0L, Double.MinValue)
    override def reduce(b: (Long, Double), a: Double): (Long, Double) =
      (b._1 + 1, math.max(b._2, a))
    override def merge(x: (Long, Double), y: (Long, Double)): (Long, Double) =
      (x._1 + y._1, math.max(x._2, y._2))
    override def finish(r: (Long, Double)): java.lang.Double =
      if (r._1 == 0L) null else Double.box(r._2)
    override def bufferEncoder: Encoder[(Long, Double)] =
      ExpressionEncoder[(Long, Double)]()
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }
  private class AvgA
      extends Aggregator[Double, (Long, Double), java.lang.Double] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), a: Double): (Long, Double) =
      (b._1 + 1, b._2 + a)
    override def merge(x: (Long, Double), y: (Long, Double)): (Long, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Double)): java.lang.Double =
      if (r._1 == 0L) null else Double.box(r._2 / r._1)
    override def bufferEncoder: Encoder[(Long, Double)] =
      ExpressionEncoder[(Long, Double)]()
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

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

  /** Classic single-key count/sum/min/max/avg surface — the reference
    * example set (simple_aggregation.rs:47-52) — as a preset over
    * [[slidingRows]]. Output columns: group, window_start_time,
    * window_end_time, n, sum, min, max, avg.
    */
  def sliding(df: DataFrame, groupCol: String, tsCol: String,
              valueCol: String, lengthMs: Long, slideMs: Long,
              delay: String = "0 seconds",
              useTransformWithState: Boolean = false): DataFrame = {
    val projected = df
      // primitive Double buffers: a null value would kill the query,
      // built-in aggs skip nulls — match that contract here
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("group"),
        col(tsCol).as("__ts"), col(valueCol).cast("double").as("v"))
    slidingRows(projected, Seq("group"), "__ts", lengthMs, slideMs,
      Seq(ExactAgg.count("n", "v"), ExactAgg.sum("sum", "v"),
        ExactAgg.min("min", "v"), ExactAgg.max("max", "v"),
        ExactAgg.avg("avg", "v")),
      delay, useTransformWithState)
  }

  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** Pane-based sliding windows: semantically identical to
    * [[slidingRows]] (a tier-equivalence spec pins it), but each row is
    * accumulated into exactly ONE slide-aligned pane instead of being
    * exploded into ceil(length/slide) overlapping frames — for a
    * 60s/1s window that is 60× less shuffle volume and 60× fewer state
    * rows, bought at emission time by merging length/slide pane
    * partials per closing window (cheap: panes, not rows).
    *
    * Panes live on the gcd(length, slide) grid: both the window length
    * and the slide are multiples of it, so panes tile every window
    * exactly for ARBITRARY length/slide ratios (a 7s/3s window uses
    * 1s panes, 7 per window). When length % slide == 0 the grid equals
    * the slide — the classic case, with its full length/slide shuffle
    * and state reduction; as the gcd shrinks the tier degrades
    * gracefully toward per-row granularity rather than rejecting the
    * shape. Requires [[ExactAgg.merge]] (any `Aggregator` lift
    * provides it). State per group: MapState pane-start → partial
    * buffers, a frontier marking watermark progress, and one
    * re-armable event-time timer at the earliest unemitted window end.
    * A pane is evicted as soon as the watermark passes the end of the
    * last window containing it, so state holds at most
    * (active time range / paneMs) panes per group. Emission instant
    * matches [[slidingRows]] and the built-in append-mode aggregate: a
    * window emits exactly when the watermark passes its end, and only
    * if at least one row fell in it.
    */
  def slidingPanes(df: DataFrame, groupCols: Seq[String], tsCol: String,
                   lengthMs: Long, slideMs: Long, aggs: Seq[ExactAgg],
                   delay: String = "0 seconds"): DataFrame = {
    require(slideMs > 0 && lengthMs >= slideMs,
      "need 0 < slide <= length")
    require(aggs.nonEmpty, "need at least one aggregate")
    require(aggs.map(_.name).distinct.length == aggs.length,
      "aggregate names must be unique")
    val paneMs = gcd(lengthMs, slideMs)
    val panesPerWindow = (lengthMs / paneMs).toInt
    val prepared = df.withWatermark(tsCol, delay)
    val nKeys = groupCols.length
    val keySchema = StructType(groupCols.map(c => prepared.schema(c)))
    val outSchema = StructType(
      groupCols.map(c => prepared.schema(c)) ++
        Seq(StructField("window_start_time", TimestampType),
          StructField("window_end_time", TimestampType)) ++
        aggs.map(a => StructField(a.name, a.outputType)))
    val keyEnc: Encoder[Row] = ExpressionEncoder(keySchema)
    val outEnc: Encoder[Row] = ExpressionEncoder(outSchema)

    val keyed = prepared.groupByKey { r: Row =>
      Row.fromSeq(groupCols.map(c => r.getAs[Any](c)))
    }(keyEnc)

    val processor = new StatefulProcessor[Row, Row, Row] {
      @transient private var panes:
        org.apache.spark.sql.streaming.MapState[Long, Array[Array[Byte]]] = _
      @transient private var frontier: ValueState[Long] = _

      override def init(outputMode: OutputMode,
                        timeMode: TimeMode): Unit = {
        panes = getHandle.getMapState[Long, Array[Array[Byte]]]("panes",
          Encoders.scalaLong, ExpressionEncoder[Array[Array[Byte]]](),
          TTLConfig.NONE)
        frontier = getHandle.getValueState[Long]("frontier",
          Encoders.scalaLong, TTLConfig.NONE)
      }

      // window-start index range containing pane p: starts are the
      // slide grid k·slide with k·slide ≤ p < k·slide + length
      private def kRange(p: Long): (Long, Long) =
        (Math.floorDiv(p - lengthMs, slideMs) + 1,
          Math.floorDiv(p, slideMs))

      // earliest window end > wm over the live panes; MaxValue if none
      private def nextEnd(wm: Long): Long = {
        var best = Long.MaxValue
        panes.keys().foreach { p =>
          val (kMin, kMax) = kRange(p)
          val k = math.max(kMin,
            Math.floorDiv(wm - lengthMs, slideMs) + 1)
          if (k <= kMax) {
            val e = k * slideMs + lengthMs
            if (e < best) best = e
          }
        }
        best
      }

      override def handleInputRows(key: Row, rows: Iterator[Row],
                                   timers: TimerValues): Iterator[Row] = {
        // buffer per touched pane for this batch, deserialized once
        val touched = scala.collection.mutable.Map[Long, Array[Any]]()
        rows.foreach { r =>
          val t = r.getAs[java.sql.Timestamp](tsCol).getTime
          val p = t - math.floorMod(t, paneMs)
          val bufs = touched.getOrElseUpdate(p,
            if (panes.containsKey(p)) {
              val bytes = panes.getValue(p)
              Array.tabulate[Any](aggs.length)(i =>
                aggs(i).fromBytes(bytes(i)))
            } else Array.tabulate[Any](aggs.length)(i => aggs(i).init()))
          var i = 0
          while (i < bufs.length) { bufs(i) = aggs(i).reduce(bufs(i), r); i += 1 }
        }
        touched.foreach { case (p, bufs) =>
          panes.updateValue(p,
            Array.tabulate(aggs.length)(i => aggs(i).toBytes(bufs(i))))
        }
        val e = nextEnd(timers.getCurrentWatermarkInMs())
        if (e != Long.MaxValue) getHandle.registerTimer(e)
        Iterator.empty
      }

      override def handleExpiredTimer(key: Row, timers: TimerValues,
          expired: ExpiredTimerInfo): Iterator[Row] = {
        val wm = timers.getCurrentWatermarkInMs()
        val fr = if (frontier.exists()) frontier.get() else Long.MinValue
        // candidate windows: derived from live panes, ending in
        // (frontier, wm] — ascending so panes are merged before any of
        // them becomes evictable
        val live: Map[Long, Array[Array[Byte]]] = panes.iterator().toMap
        val toEmit = live.keysIterator.flatMap { p =>
          val (kMin, kMax) = kRange(p)
          (kMin to kMax).iterator.map(k => k * slideMs + lengthMs)
            .filter(e => e > fr && e <= wm).map(e => e - lengthMs)
        }.toSet.toSeq.sorted
        val out = toEmit.map { w =>
          var bufs = Array.tabulate[Any](aggs.length)(i => aggs(i).init())
          var j = 0
          while (j < panesPerWindow) {
            live.get(w + j * paneMs).foreach { bytes =>
              var i = 0
              while (i < bufs.length) {
                bufs(i) = aggs(i).merge(bufs(i), aggs(i).fromBytes(bytes(i)))
                i += 1
              }
            }
            j += 1
          }
          Row.fromSeq(
            (0 until nKeys).map(key.get) ++
              Seq(new Timestamp(w), new Timestamp(w + lengthMs)) ++
              aggs.indices.map(i => aggs(i).finish(bufs(i))))
        }
        // a pane dies once the watermark passes its LAST window's end
        live.keysIterator
          .filter(p => kRange(p)._2 * slideMs + lengthMs <= wm)
          .foreach(panes.removeKey)
        if (!panes.exists()) {
          // key fully drained → drop ALL its state, frontier included
          // (a later row can only open windows ending > wm ≥ this
          // frontier, so re-emission is impossible without it); keeping
          // it would leak one ValueState row per key ever seen
          frontier.clear()
        } else {
          frontier.update(wm)
          val e = nextEnd(wm)
          if (e != Long.MaxValue) getHandle.registerTimer(e)
        }
        out.iterator
      }
    }
    keyed.transformWithState(processor, TimeMode.EventTime(),
      OutputMode.Append())(outEnc).toDF()
  }

  /** Session windows with gap merging in the custom stateful tier —
    * EXCEEDS the reference: its logical plan declares `Session(gap)`
    * but the physical operator `todo!()`s it
    * (/root/reference/crates/core/src/logical_plan/streaming_window.rs:69-74,
    * crates/core/src/physical_plan/continuous/streaming_window.rs:1062).
    * The built-in `session_window` covers the declarative path
    * (SparkEntry q9); this form gives sessions the same frame-exact
    * custom-state control [[slidingRows]] gives fixed windows, with the
    * same caller-supplied [[ExactAgg]] aggregates (their `merge` powers
    * session coalescing).
    *
    * State per group: the open sessions `[start, last, bufs]`. A row at
    * t merges every session whose `[start, last+gap)` interval touches
    * `(t-gap, t+gap)` — interval connectivity is order-independent, so
    * batch iteration order doesn't matter. One event-time timer tracks
    * the earliest open end; a session emits exactly when the watermark
    * passes its end (last + gap), the built-in append-mode instant.
    * Runs on the transformWithState tier (multiple live sessions per
    * key need re-armable timers; the single-timeout
    * flatMapGroupsWithState surface cannot express that cleanly).
    */
  def sessionRows(df: DataFrame, groupCols: Seq[String], tsCol: String,
                  gapMs: Long, aggs: Seq[ExactAgg],
                  delay: String = "0 seconds"): DataFrame = {
    require(gapMs > 0, "need gap > 0")
    require(aggs.nonEmpty, "need at least one aggregate")
    require(aggs.map(_.name).distinct.length == aggs.length,
      "aggregate names must be unique")
    val prepared = df.withWatermark(tsCol, delay)
    val nKeys = groupCols.length
    val keySchema = StructType(groupCols.map(c => prepared.schema(c)))
    val outSchema = StructType(
      groupCols.map(c => prepared.schema(c)) ++
        Seq(StructField("window_start_time", TimestampType),
          StructField("window_end_time", TimestampType)) ++
        aggs.map(a => StructField(a.name, a.outputType)))
    val keyEnc: Encoder[Row] = ExpressionEncoder(keySchema)
    val outEnc: Encoder[Row] = ExpressionEncoder(outSchema)

    val keyed = prepared.groupByKey { r: Row =>
      Row.fromSeq(groupCols.map(c => r.getAs[Any](c)))
    }(keyEnc)

    // state row: (session start ms, last event ms, one serialized
    // buffer per aggregate) — spelled concretely where an encoder is
    // derived (a local type alias has no TypeTag)
    type Sess = (Long, Long, Array[Array[Byte]])

    def emitRow(key: Row, start: Long, last: Long,
                bufs: Array[Any]): Row =
      Row.fromSeq(
        (0 until nKeys).map(key.get) ++
          Seq(new Timestamp(start), new Timestamp(last + gapMs)) ++
          aggs.indices.map(i => aggs(i).finish(bufs(i))))

    val processor = new StatefulProcessor[Row, Row, Row] {
      @transient private var st: ValueState[Array[Sess]] = _
      override def init(outputMode: OutputMode,
                        timeMode: TimeMode): Unit =
        st = getHandle.getValueState[Array[Sess]]("sessions",
          ExpressionEncoder[Array[(Long, Long, Array[Array[Byte]])]](),
          TTLConfig.NONE)

      private def load(): List[(Long, Long, Array[Any])] =
        if (!st.exists()) Nil
        else st.get().toList.map { case (s, e, bytes) =>
          (s, e, Array.tabulate[Any](aggs.length)(i =>
            aggs(i).fromBytes(bytes(i))))
        }
      private def store(open: List[(Long, Long, Array[Any])]): Unit =
        if (open.isEmpty) st.clear()
        else st.update(open.map { case (s, e, bufs) =>
          (s, e, Array.tabulate(aggs.length)(i => aggs(i).toBytes(bufs(i))))
        }.toArray)

      override def handleInputRows(key: Row, rows: Iterator[Row],
                                   timers: TimerValues): Iterator[Row] = {
        var open = load()
        rows.foreach { r =>
          val t = r.getAs[java.sql.Timestamp](tsCol).getTime
          // half-open session intervals: an event at exactly last+gap
          // starts a NEW session (built-in session_window semantics)
          val (touch, rest) = open.partition(s =>
            s._1 < t + gapMs && t < s._2 + gapMs)
          var start = t
          var last = t
          val bufs = Array.tabulate[Any](aggs.length)(i => aggs(i).init())
          var i = 0
          while (i < bufs.length) {
            bufs(i) = aggs(i).reduce(bufs(i), r); i += 1
          }
          touch.foreach { s =>
            start = math.min(start, s._1)
            last = math.max(last, s._2)
            var j = 0
            while (j < bufs.length) {
              bufs(j) = aggs(j).merge(bufs(j), s._3(j)); j += 1
            }
          }
          open = (start, last, bufs) :: rest
        }
        store(open)
        if (open.nonEmpty)
          getHandle.registerTimer(open.map(_._2).min + gapMs)
        Iterator.empty
      }

      override def handleExpiredTimer(key: Row, timers: TimerValues,
          expired: ExpiredTimerInfo): Iterator[Row] = {
        val open = load()
        if (open.isEmpty) Iterator.empty
        else {
          val wm = timers.getCurrentWatermarkInMs()
          val (closed, still) = open.partition(s => s._2 + gapMs <= wm)
          store(still)
          // stale timers (superseded by a session extension) land here
          // with nothing closed; re-arm for the earliest pending end so
          // emission is never lost
          if (still.nonEmpty)
            getHandle.registerTimer(still.map(_._2).min + gapMs)
          closed.sortBy(_._1).iterator
            .map { case (s, e, bufs) => emitRow(key, s, e, bufs) }
        }
      }
    }
    keyed.transformWithState(processor, TimeMode.EventTime(),
      OutputMode.Append())(outEnc).toDF()
  }

  /** Sliding window with ARBITRARY aggregates and multi-column group
    * keys — the general form matching the reference's
    * arbitrary-accumulator frames. Each row feeds every overlapping
    * frame (the reference's `get_windows_for_watermark` row routing,
    * grouped_window_agg_stream.rs:443-650); slide == length degrades
    * to tumbling.
    *
    * `groupCols` may be EMPTY: the ungrouped/global form keys frames on
    * the window start alone, mirroring the reference's dedicated
    * ungrouped operator pair (`WindowAggStream` partial + `FullWindow
    * AggStream` final, /root/reference/crates/core/src/physical_plan/
    * continuous/streaming_window.rs:640-828, :882-1035) with the same
    * emission instant (watermark passes window end). Scale note: a
    * global window concentrates each frame on one task by definition —
    * at high input rates prefer the built-in two-stage global path
    * (partial aggregation before the single-key shuffle, SparkEntry
    * q24) unless frame-exact control is required.
    *
    * Output schema: groupCols (original types) ++ window_start_time,
    * window_end_time ++ one column per [[ExactAgg]].
    *
    * @param useTransformWithState run on Spark 4's transformWithState
    *        (StatefulProcessor + event-time timers) instead of
    *        flatMapGroupsWithState + EventTimeTimeout; semantics are
    *        identical, state layouts differ (not checkpoint-compatible
    *        with each other).
    */
  def slidingRows(df: DataFrame, groupCols: Seq[String], tsCol: String,
                  lengthMs: Long, slideMs: Long, aggs: Seq[ExactAgg],
                  delay: String = "0 seconds",
                  useTransformWithState: Boolean = false): DataFrame = {
    require(slideMs > 0 && lengthMs >= slideMs,
      "need 0 < slide <= length")
    require(aggs.nonEmpty, "need at least one aggregate")
    require(aggs.map(_.name).distinct.length == aggs.length,
      "aggregate names must be unique")
    // non-multiple slides: ceil(length/slide) candidate frames per row,
    // the range filter below trims the one candidate that may fall out
    // (matches Spark's window() and the reference's per-row routing —
    // window starts are the slide grid, not length-aligned)
    val framesPerRow = ((lengthMs + slideMs - 1) / slideMs).toInt

    // frame explosion stays at Column level: an object-level flatMap
    // would strip the watermark tag from the event-time column and
    // event-time timeouts/timers require it downstream
    val tsMs = unix_millis(col(tsCol))
    val newest = tsMs - pmod(tsMs, lit(slideMs))
    val prepared = df.withWatermark(tsCol, delay)
      .withColumn("__ws", explode(array(
        (0 until framesPerRow).map(k => newest - lit(k * slideMs)): _*)))
      .filter(col("__ws") > tsMs - lit(lengthMs))

    val nKeys = groupCols.length
    val keySchema = StructType(
      groupCols.map(c => prepared.schema(c)) :+
        StructField("__ws", LongType, nullable = false))
    val outSchema = StructType(
      groupCols.map(c => prepared.schema(c)) ++
        Seq(StructField("window_start_time", TimestampType),
          StructField("window_end_time", TimestampType)) ++
        aggs.map(a => StructField(a.name, a.outputType)))
    val keyEnc: Encoder[Row] = ExpressionEncoder(keySchema)
    val outEnc: Encoder[Row] = ExpressionEncoder(outSchema)
    val stateEnc: Encoder[Array[Array[Byte]]] =
      ExpressionEncoder[Array[Array[Byte]]]()

    // NOTE: no mapValues — it re-serializes the value columns and
    // strips the watermark tag event-time timeouts depend on
    val keyed = prepared.groupByKey { r: Row =>
      Row.fromSeq(groupCols.map(c => r.getAs[Any](c)) :+
        r.getAs[Long]("__ws"))
    }(keyEnc)

    def emitRow(key: Row, bufs: Array[Any]): Row = {
      val ws = key.getLong(nKeys)
      Row.fromSeq(
        (0 until nKeys).map(key.get) ++
          Seq(new Timestamp(ws), new Timestamp(ws + lengthMs)) ++
          aggs.indices.map(i => aggs(i).finish(bufs(i))))
    }
    def reduceAll(bufs: Array[Any], rows: Iterator[Row]): Unit =
      rows.foreach { r =>
        var i = 0
        while (i < bufs.length) { bufs(i) = aggs(i).reduce(bufs(i), r); i += 1 }
      }
    def serialize(bufs: Array[Any]): Array[Array[Byte]] =
      Array.tabulate(bufs.length)(i => aggs(i).toBytes(bufs(i)))
    def deserialize(bytes: Array[Array[Byte]]): Array[Any] =
      Array.tabulate(bytes.length)(i => aggs(i).fromBytes(bytes(i)))

    val out =
      if (!useTransformWithState) {
        keyed.flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
          (key: Row, rows: Iterator[Row],
           state: GroupState[Array[Array[Byte]]]) => {
            if (state.hasTimedOut) {
              // watermark passed window end → emit once, drop the frame
              val bufs = deserialize(state.get)
              state.remove()
              Iterator(emitRow(key, bufs))
            } else {
              // Spark routes only non-late rows here (watermark filter
              // upstream = the reference's closed-window batch drop)
              val bufs = state.getOption.map(deserialize)
                .getOrElse(Array.tabulate[Any](aggs.length)(i => aggs(i).init()))
              reduceAll(bufs, rows)
              state.update(serialize(bufs))
              // fire exactly when watermark reaches window end
              state.setTimeoutTimestamp(key.getLong(nKeys) + lengthMs)
              Iterator.empty
            }
          })(stateEnc, outEnc)
      } else {
        val processor = new StatefulProcessor[Row, Row, Row] {
          @transient private var buf: ValueState[Array[Array[Byte]]] = _
          override def init(outputMode: OutputMode,
                            timeMode: TimeMode): Unit =
            buf = getHandle.getValueState[Array[Array[Byte]]]("frame",
              ExpressionEncoder[Array[Array[Byte]]](), TTLConfig.NONE)
          override def handleInputRows(key: Row, rows: Iterator[Row],
                                       timers: TimerValues): Iterator[Row] = {
            val first = !buf.exists()
            val bufs =
              if (first) Array.tabulate[Any](aggs.length)(i => aggs(i).init())
              else deserialize(buf.get())
            reduceAll(bufs, rows)
            buf.update(serialize(bufs))
            // one timer per (group, window) frame, set at first sight:
            // fires when the event-time watermark passes window end —
            // the same emission instant as the timeout form
            if (first) getHandle.registerTimer(key.getLong(nKeys) + lengthMs)
            Iterator.empty
          }
          override def handleExpiredTimer(key: Row, timers: TimerValues,
              expired: ExpiredTimerInfo): Iterator[Row] =
            if (!buf.exists()) Iterator.empty
            else {
              val bufs = deserialize(buf.get())
              buf.clear()
              Iterator(emitRow(key, bufs))
            }
        }
        keyed.transformWithState(processor, TimeMode.EventTime(),
          OutputMode.Append())(outEnc)
      }
    out.toDF()
  }
}
