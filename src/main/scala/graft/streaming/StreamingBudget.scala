package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming token-budget admission — the continuous counterpart of
  * [[graft.operators.Sampling.selectToTokenBudget]] for unbounded
  * ingest (the batch form's per-stratum prefix needs the whole corpus
  * in view; a stream admits as data arrives).
  *
  * Contract (the batch operator's PREFIX semantics, not greedy
  * best-fit): rows are admitted in order while the stratum's running
  * token total stays within `budget`; the FIRST row that would
  * overflow CLOSES the stratum — every later row is dropped even if
  * it would individually fit. This keeps streaming admission a prefix
  * of a deterministic order, exactly like batch: within a micro-batch
  * rows are sorted by the same (draw, id) key the batch operator
  * sorts by, so replaying the whole corpus as ONE batch reproduces
  * the batch operator's kept set exactly (spec-pinned); across
  * batches the prefix runs in arrival order, the same contract as
  * [[StreamingPacking]].
  *
  * State per stratum is one (spent, closed) pair, so state size is
  * the stratum cardinality regardless of corpus size, and a restart
  * resumes admission mid-budget from the checkpoint. SCALE NOTE:
  * admission against a single budget is inherently sequential — each
  * stratum is one task. That is the semantics' cost, not an
  * implementation accident (the batch form escapes it with a
  * cross-bucket histogram only because it sees all data at once);
  * strata are mixture components (languages, domains — tens, not
  * millions), so one-task-per-stratum is the right shape at ingest.
  */
object StreamingBudget {

  def selectToTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                          budget: Long,
                          strataCol: Option[String] = None,
                          salt: String =
                            graft.operators.Sampling.BudgetSalt)
      : DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val strat = strataCol.map(col).getOrElse(lit(""))
    val prepared = df
      .withColumn("__stratum", strat.cast("string"))
      .withColumn("__draw",
        graft.operators.Sampling.hashBucket(col(idCol), salt))
    val inSchema = prepared.schema
    val outEnc: Encoder[Row] = ExpressionEncoder(inSchema)
    val idIdx = inSchema.fieldIndex(idCol)
    val tokIdx = inSchema.fieldIndex(tokenCol)
    val drawIdx = inSchema.fieldIndex("__draw")
    val idOrdering = RowOrder.forType(inSchema(idIdx).dataType)

    val keyed = prepared.groupByKey(
      _.getAs[String]("__stratum"))(Encoders.STRING)

    val processor = new StatefulProcessor[String, Row, Row] {
      @transient private var state
        : org.apache.spark.sql.streaming.ValueState[(Long, Boolean)] = _
      override def init(outputMode: OutputMode,
                        timeMode: TimeMode): Unit =
        state = getHandle.getValueState[(Long, Boolean)]("budget",
          Encoders.product[(Long, Boolean)], TTLConfig.NONE)

      override def handleInputRows(key: String, rows: Iterator[Row],
                                   timers: TimerValues): Iterator[Row] = {
        var (spent, closed) =
          if (state.exists()) state.get() else (0L, false)
        // batch-operator order within the batch: (draw, id)
        val ordered = rows.toArray.sortWith { (a, b) =>
          val c = a.getString(drawIdx).compareTo(b.getString(drawIdx))
          if (c != 0) c < 0
          else idOrdering.compare(a.get(idIdx), b.get(idIdx)) < 0
        }
        val out = Array.newBuilder[Row]
        ordered.foreach { r =>
          if (!closed) {
            val tok = r.get(tokIdx) match {
              case n: java.lang.Number => n.longValue()
              case _ => 0L
            }
            require(tok >= 0, s"negative token count $tok for id " +
              s"${r.get(idIdx)}")
            if (spent + tok <= budget) {
              spent += tok
              out += r
            } else closed = true // prefix, not best-fit: stratum done
          }
        }
        state.update((spent, closed))
        out.result().iterator
      }

      override def handleExpiredTimer(key: String, timers: TimerValues,
          expired: ExpiredTimerInfo): Iterator[Row] = Iterator.empty
    }
    keyed.transformWithState(processor, TimeMode.None(),
      OutputMode.Append())(outEnc).toDF()
      .drop("__stratum", "__draw")
  }
}
