package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** one event on the unified as-of stream: side 0 = sample (value
  * meaningful), side 1 = probe (probe_id meaningful) — the same tagged
  * union shape the batch operator shuffles ([[graft.ops.AsofJoin]])
  */
final case class AsofEvent(key: Long, ts_ms: Long, side: Int,
    probe_id: Long, value: Double)

/** per-key state: rows not yet releasable by the watermark, plus the
  * carry — the latest sample already folded out of the buffer
  */
final case class AsofBuffer(buf: List[AsofEvent],
    carryTs: Long, carryVal: Double, hasCarry: Boolean)

/** a finalized probe with its as-of match (None = no sample at-or-before
  * within tolerance)
  */
final case class AsofOut(key: Long, probe_id: Long, ts_ms: Long,
    asof_ts: Option[Long], asof_value: Option[Double])

/** forward-direction state: only a buffer — the forward match has no
  * carry (the candidate set lies AHEAD of each probe)
  */
final case class AsofFwdBuffer(buf: List[AsofEvent])

/** Streaming backward as-of enrichment — the stateful twin of
  * [[graft.ops.AsofJoin.backward]]: every probe event is matched to the
  * most recent sample at-or-before its event time on the same key, over
  * a LIVE stream where probes and samples arrive interleaved and out of
  * order (exemplar → nearest pre-agg sample, log line → active deploy,
  * span → most recent config — the enrichments the batch op serves,
  * running continuously).
  *
  * Why not compose [[StreamJoin.intervalJoin]] + a latest-per-probe
  * aggregate: "most recent at-or-before" needs an UNBOUNDED lookback —
  * the matching sample may be arbitrarily old — and interval joins keep
  * state proportional to rate × lookback. Here the state per key is the
  * not-yet-releasable buffer plus ONE carry row (the latest sample whose
  * time the watermark has passed), so an idle series costs one row of
  * state forever, exactly like the reference's in-memory latest-value
  * maps.
  *
  * Correctness contract: a probe at time p finalizes only once the
  * watermark passes p — by watermark semantics no sample with ts ≤ p can
  * still arrive (later ones are late data and dropped by the engine
  * before this operator). Releasable rows process in (ts, side, value)
  * order: samples fold into the carry before probes at the same
  * timestamp consume it — the exact right-sorts-before-left tie rule of
  * the batch operator — and equal-(key, ts) samples collapse to the
  * greatest value, mirroring the batch tieBreak. Event-time timeouts
  * re-invoke a key whose buffer is nonempty even when no new rows
  * arrive, so quiet series still drain.
  */
object StreamAsof {

  /** Fixture helper shared by the catalog rows and the specs: write the
    * given arrival waves into `dir` as one parquet file each, then a
    * far-future sentinel sample on key 999, with EXPLICIT mtime
    * staggering — the file source orders batches by modification time,
    * and the sentinel (whose huge watermark would drop real rows as
    * late) must always tick LAST. No wall-clock sleeps. The sentinel's
    * watermark advance is what drains every key's pending buffer through
    * the event-time timeouts at stream end.
    */
  def writeArrivalWaves(waves: Seq[Dataset[AsofEvent]], sentinelTs: Long,
      dir: String): Unit = {
    require(waves.nonEmpty)
    val spark = waves.head.sparkSession
    import spark.implicits._
    def parts(): Set[java.io.File] = {
      val fs = new java.io.File(dir).listFiles()
      if (fs == null) Set.empty else fs.filter(_.getName.startsWith("part-")).toSet
    }
    val cum = waves.map { w =>
      w.coalesce(1).write.mode("append").parquet(dir)
      parts()
    }
    Seq(AsofEvent(999L, sentinelTs, 0, 0L, 0.0)).toDS()
      .coalesce(1).write.mode("append").parquet(dir)
    val now = new java.io.File(dir).lastModified()
    val span = 2000L * (cum.size + 1)
    cum.zipWithIndex.foreach { case (c, i) =>
      val prev = if (i == 0) Set.empty[java.io.File] else cum(i - 1)
      (c -- prev).foreach(_.setLastModified(now - span + i * 2000L))
    }
    (parts() -- cum.last).foreach(_.setLastModified(now))
  }

  def backward(events: Dataset[AsofEvent], toleranceMs: Long = Long.MaxValue,
      watermarkDelay: String = "0 seconds"): Dataset[AsofOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("__et", timestamp_millis(col("ts_ms")))
      .withWatermark("__et", watermarkDelay)
      .as[AsofEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofBuffer, AsofOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[AsofEvent], state: GroupState[AsofBuffer]) =>
          val st = state.getOption.getOrElse(
            AsofBuffer(Nil, Long.MinValue, 0.0, hasCarry = false))
          val all = st.buf ++ rows
          val wm = state.getCurrentWatermarkMs()
          // releasable rows in (ts, side, value) order: samples before
          // probes at equal ts, greatest-value sample wins an exact tie
          val (ready, pending) = all.partition(_.ts_ms <= wm)
          val out = scala.collection.mutable.Buffer.empty[AsofOut]
          var cTs = st.carryTs; var cVal = st.carryVal; var cHas = st.hasCarry
          ready.sortBy(e => (e.ts_ms, e.side, e.value)).foreach { e =>
            if (e.side == 0) {
              // carry advances monotonically; sort order already put the
              // greatest value last among equal timestamps
              if (!cHas || e.ts_ms >= cTs) { cTs = e.ts_ms; cVal = e.value; cHas = true }
            } else {
              val hit = cHas && e.ts_ms - cTs <= toleranceMs
              out += AsofOut(key, e.probe_id, e.ts_ms,
                if (hit) Some(cTs) else None, if (hit) Some(cVal) else None)
            }
          }
          if (pending.isEmpty && !cHas) state.remove()
          else {
            state.update(AsofBuffer(pending, cTs, cVal, cHas))
            // wake this key when the watermark reaches its oldest pending
            // row; an all-carry state needs no timeout (nothing to emit)
            if (pending.nonEmpty) {
              val next = pending.map(_.ts_ms).min
              state.setTimeoutTimestamp(math.max(next, wm + 1))
            }
          }
          out.iterator
      }
  }

  /** Forward streaming as-of: each probe matches the EARLIEST sample
    * at-or-after its event time on the same key, within `toleranceMs` —
    * the time-mirror of [[backward]] (next deploy after the alert, first
    * sample after the exemplar). A finite tolerance is REQUIRED for
    * liveness: with no sample ahead, a probe can only finalize once the
    * watermark proves none can arrive inside the tolerance window.
    *
    * Finalization logic per probe p (watermark wm): samples with ts ≤ wm
    * are FINAL (later arrivals are all > wm); if a final sample exists in
    * [p, wm], the smallest such ts decides — match if within tolerance,
    * else a proven null (future samples are > wm ≥ that ts > p+tol). With
    * no final sample ≥ p, the probe waits until wm ≥ p + tolerance, then
    * emits null. Samples ≤ wm are dropped after each pass (no pending or
    * future probe can match below them), so state is bounded by
    * rate × (tolerance + lateness). Equal-(key, ts) samples collapse to
    * the greatest value, mirroring the batch tieBreak.
    */
  def forward(events: Dataset[AsofEvent], toleranceMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[AsofOut] = {
    require(toleranceMs >= 0 && toleranceMs < Long.MaxValue / 2,
      "forward streaming as-of needs a finite tolerance for liveness")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("__et", timestamp_millis(col("ts_ms")))
      .withWatermark("__et", watermarkDelay)
      .as[AsofEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofFwdBuffer, AsofOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[AsofEvent], state: GroupState[AsofFwdBuffer]) =>
          val all = state.getOption.map(_.buf).getOrElse(Nil) ++ rows
          val wm = state.getCurrentWatermarkMs()
          val (samples, probes) = all.partition(_.side == 0)
          val (finalS, laterS) = samples.partition(_.ts_ms <= wm)
          // O((S+P) log S) per invocation, not probes × samples: sorted
          // distinct final timestamps + one binary search per probe, with
          // the greatest-value tie collapse precomputed per timestamp
          val tsArr = finalS.map(_.ts_ms).distinct.sorted.toArray
          val maxVal = finalS.groupBy(_.ts_ms)
            .map { case (t, xs) => t -> xs.map(_.value).max }
          def lowerBound(v: Long): Int = {
            val r = java.util.Arrays.binarySearch(tsArr, v)
            if (r >= 0) r else -(r + 1)
          }
          val out = scala.collection.mutable.Buffer.empty[AsofOut]
          val pending = scala.collection.mutable.Buffer.empty[AsofEvent]
          probes.foreach { p =>
            val idx = lowerBound(p.ts_ms)
            if (idx < tsArr.length) {
              val sTs = tsArr(idx)
              if (sTs - p.ts_ms <= toleranceMs)
                out += AsofOut(key, p.probe_id, p.ts_ms, Some(sTs),
                  Some(maxVal(sTs)))
              else
                out += AsofOut(key, p.probe_id, p.ts_ms, None, None)
            } else if (wm >= p.ts_ms + toleranceMs)
              out += AsofOut(key, p.probe_id, p.ts_ms, None, None)
            else pending += p
          }
          val keep = laterS ++ pending
          if (keep.isEmpty) state.remove()
          else {
            state.update(AsofFwdBuffer(keep))
            val wake = (laterS.map(_.ts_ms) ++
              pending.map(p => p.ts_ms + toleranceMs)).min
            state.setTimeoutTimestamp(math.max(wake, wm + 1))
          }
          out.iterator
      }
  }
}
