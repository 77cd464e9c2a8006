package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Mutable session accumulator carried in streaming state (top-level so the
  * state encoder's generated code can construct it).
  */
final case class SessionState(start: Long, end: Long, n: Long)

/** Structured Streaming operators over the events stream (north-star
  * extension; the reference is batch-only — its freshness/append semantics
  * map onto watermarks + dropDuplicatesWithinWatermark, SURVEY §2.8).
  *
  * Every transform here is a plain DataFrame→DataFrame function, so the same
  * logic runs in batch (driver correctness gate) and under `readStream`
  * (tested with file source + memory sink). State size is bounded by
  * watermarks everywhere — unbounded state is the streaming equivalent of an
  * unpartitioned shuffle at 100 TB.
  */
object EventStreams {

  /** File-source stream over a *directory* of event parquet files (the file
    * source tails directories — new files are new micro-batches), with the
    * same nanos→micros ts handling as graft.core.Tables.events.
    */
  def readEvents(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // a streaming source needs its schema up front: probe the directory with
    // a one-off batch read (metadata only, no data scan), then normalize ts
    // exactly like the batch loader (nanos-long vs micros-NTZ generations).
    // A stream routinely starts on a still-EMPTY landing directory (files
    // arrive later) — the probe then has nothing to infer from, so fall
    // back to the DECLARED current-generation schema (graft.core.Tables —
    // one source of truth; a legacy nanos-generation producer landing into
    // a dir that was empty at start is unsupported, it needs one probe
    // file). A MISSING directory stays a loud failure: swallowing it would
    // turn a typo'd path into a silently forever-empty stream
    val fileSchema =
      try spark.read.parquet(eventsDir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          val p = new org.apache.hadoop.fs.Path(eventsDir)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(p)) throw e
          graft.core.Tables.eventsDeclaredSchema
      }
    graft.core.Tables.normalizeEventTs(
      spark.readStream.schema(fileSchema).parquet(eventsDir))
  }

  /** Tumbling-window counts/sums per event type; late data bounded by the
    * watermark (append-mode compatible).
    */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window rates (1h window, 15m slide). */
  def slidingRates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Streaming dedup on event_id with watermark-bounded state — the
    * streaming twin of the reference's ingest dedup (D1).
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class SessionEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class UserSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  // state timestamps carried as epoch MICROS — getTime() alone would
  // truncate to ms and disagree with the batch twin's unix_micros gaps
  private def toMicros(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
  private def fromMicros(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * after `gapMs` of inactivity (event-time timeout). Custom state is the
    * (c) tier of the custom-operator ladder — used here because no built-in
    * operator expresses gap sessions.
    */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId,
              fromMicros(s.start), fromMicros(s.end), s.n))
          } else {
            val times = batch.map(e => toMicros(e.ts)).toSeq.sorted
            // phase 1: gap-merge the batch's (sorted) times into candidate
            // sessions — consecutive late events within gapUs become ONE
            // session, exactly as the batch twin's lag-gap-cumsum would
            val batchSessions = Seq.newBuilder[SessionState]
            var open: Option[SessionState] = None
            times.foreach { t =>
              open = open match {
                case Some(s) if t - s.end <= gapUs =>
                  Some(s.copy(end = t, n = s.n + 1))
                case Some(s) =>
                  batchSessions += s
                  Some(SessionState(t, t, 1))
                case None => Some(SessionState(t, t, 1))
              }
            }
            open.foreach(batchSessions += _)
            // phase 2: interval-merge with the carried open session — a late
            // chunk reaching within gapUs of the state's start extends it
            // backwards (and can bridge chunks), never emits spurious
            // singletons
            val all = (batchSessions.result() ++ state.getOption).sortBy(_.start)
            val merged = all.foldLeft(List.empty[SessionState]) {
              case (prev :: rest, s) if s.start - prev.end <= gapUs =>
                prev.copy(start = math.min(prev.start, s.start),
                  end = math.max(prev.end, s.end), n = prev.n + s.n) :: rest
              case (acc, s) => s :: acc
            }.reverse
            // everything but the latest session is closed; the latest stays
            // open under an event-time timeout
            val last = merged.last
            state.update(last)
            state.setTimeoutTimestamp((last.end + gapUs) / 1000L)
            merged.init.map(s =>
              UserSession(userId, fromMicros(s.start), fromMicros(s.end), s.n)).iterator
          }
      }
  }

  /** Watermarked stream-stream join: purchases joined to the same user's
    * views within `withinMs` BEFORE the purchase. Both sides watermarked so
    * state stays bounded: Spark drops view state older than the watermark
    * plus the interval bound.
    */
  def purchaseViewJoin(events: DataFrame, withinMs: Long): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "30 minutes")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "30 minutes")
    purchases.join(views,
      col("user_id") === col("v_user_id") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $withinMs MILLISECOND"))
      .select("user_id", "purchase_id", "purchase_ts", "view_id", "view_ts")
  }

  /** Stream-static enrichment: join the event stream to a dimension table
    * (broadcast — the static side is re-planned per micro-batch, and a
    * broadcast keeps every batch a map-only stage; a shuffled stream-static
    * join would re-shuffle each micro-batch). Left join: events without a
    * dimension row survive with nulls, the usual contract for late-arriving
    * dimensions. Stateless — needs no watermark.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  /** Streaming TEMPORAL enrichment — the streaming twin of the native
    * batch as-of join ([[graft.operators.AsOfJoin.joinAsOfNative]],
    * backward): the dimension is not a static table but a STREAM of
    * versioned updates (a CDC changelog), and every event enriches with
    * the latest version at-or-before its event time.
    *
    * Contract: `events` carries (key string, event_id long, ts long ≥ 0);
    * `dimUpdates` carries (key string, version_ts long ≥ 0, payload
    * string), per-key in non-decreasing version_ts order — the changelog
    * contract (a CDC stream is per-key ordered by construction). Events
    * may arrive in ANY order relative to each other and to versions.
    *
    * Semantics: each event is emitted on arrival with its current best
    * match (null-extended when none), and RE-emitted whenever a
    * later-arriving version changes its match — downstream
    * last-write-wins per event_id therefore converges to exactly the
    * batch as-of over the full data, which is what the spec pins across
    * a checkpoint restart. An event becomes FINAL once its key's version
    * high-water mark passes its timestamp (under the changelog contract
    * no future version can match it) and leaves the state — pending
    * state is bounded by how far events run ahead of their dimension,
    * not by stream length. Version history is retained per key; a
    * production deployment bounds it with the event-lateness watermark
    * (versions older than the bound compact to their last
    * representative), the same retention rule stream-stream joins apply.
    */
  def asOfEnrichStream(events: DataFrame, dimUpdates: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val evTagged = events.select(
      col("key").cast("string").as("k"), lit(true).as("is_event"),
      col("event_id").cast("long").as("event_id"),
      col("ts").cast("long").as("ev_ts"),
      lit(0L).as("v_ts"), lit(null).cast("string").as("payload"))
    val dimTagged = dimUpdates.select(
      col("key").cast("string").as("k"), lit(false).as("is_event"),
      lit(0L).as("event_id"), lit(0L).as("ev_ts"),
      col("version_ts").cast("long").as("v_ts"),
      col("payload").cast("string").as("payload"))
    // state: (sorted version history (ts, payload), pending events
    // (event_id, ts, last-emitted match; MinValue = never emitted,
    // -1 = emitted unmatched))
    evTagged.unionByName(dimTagged)
      .as[(String, Boolean, Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[
        (Seq[(Long, String)], Seq[(Long, Long, Long)]),
        (String, Long, Long, Option[Long], Option[String])](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (k: String, rows: Iterator[(String, Boolean, Long, Long, Long, String)],
            state: GroupState[(Seq[(Long, String)], Seq[(Long, Long, Long)])]) =>
          val (oldVersions, oldPending) =
            state.getOption.getOrElse((Seq.empty[(Long, String)], Seq.empty[(Long, Long, Long)]))
          val batch = rows.toSeq
          val versions = (oldVersions ++ batch.collect {
            case (_, false, _, _, vts, p) => (vts, p)
          }).sortBy(_._1) // stable: same-ts re-delivery keeps last arrival
          val hwm = versions.lastOption.map(_._1).getOrElse(Long.MinValue)
          val pending = oldPending ++ batch.collect {
            case (_, true, id, ts, _, _) => (id, ts, Long.MinValue)
          }
          val out = Seq.newBuilder[(String, Long, Long, Option[Long], Option[String])]
          val keep = Seq.newBuilder[(Long, Long, Long)]
          pending.foreach { case (id, ts, prev) =>
            val m = versions.foldLeft(Option.empty[(Long, String)]) {
              case (acc, v) => if (v._1 <= ts) Some(v) else acc
            }
            val mTs = m.map(_._1).getOrElse(-1L)
            if (mTs != prev)
              out += ((k, id, ts, m.map(_._1), m.map(_._2)))
            if (ts >= hwm) keep += ((id, ts, mTs)) // still overtakable
          }
          state.update((versions, keep.result()))
          out.result().iterator
      }
      .toDF("key", "event_id", "event_ts", "version_ts", "payload")
  }

  /** Streaming ingest into a medallion table: each micro-batch appends
    * through the TableFormat seam (schema evolution included) — the
    * streaming twin of graft.ingest.Ingestor. Caller starts/stops the query.
    */
  def sinkToTable(stream: DataFrame, format: graft.sources.TableFormat,
      table: String, checkpointDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        format.appendMergeSchema(batch.sparkSession, batch, table)
      }

  /** Idempotent micro-batch append: each batch writes to its OWN partition
    * directory (`__batch_id=<id>`) under dynamic partition overwrite, so a
    * replayed batch — Structured Streaming re-delivers the in-flight batch
    * after a crash, foreachBatch is at-least-once by contract — overwrites
    * its previous (possibly partial) output instead of appending a second
    * copy. This is the parquet-only form of the transactional-sink dedup
    * Delta does with a commit log: the partition path IS the commit key.
    * Readers take `spark.read.parquet(path)` and may drop `__batch_id`.
    */
  def idempotentAppend(batch: DataFrame, batchId: Long, path: String): Unit =
    // partitionOverwriteMode as a PER-WRITE option, never a session conf
    // flip: a set/restore around the write races with concurrent writers
    // on the same session (their unrelated overwrite could inherit dynamic
    // semantics, or lose its own setting to this write's restore)
    batch.withColumn("__batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id").parquet(path)

  /** [[sinkToTable]] with exactly-once output: the at-least-once replay of
    * foreachBatch is made idempotent by [[idempotentAppend]]'s
    * partition-per-batch overwrite. Caller starts/stops the query.
    */
  def sinkToPathExactlyOnce(stream: DataFrame, path: String,
      checkpointDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        idempotentAppend(batch, batchId, path)
      }

  /** Batch twin of sessionization (lag-gap-cumsum): same output for the
    * finite case; used by tests to cross-check the stateful path and by the
    * correctness gate as an oracle-friendly formulation.
    */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMs * 1000L, 1)
          .otherwise(0))
      .withColumn("session_no", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_no")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("session_no")
  }

  /** Streaming distinct-count per group via the oracle-exact md5 HLL
    * ([[graft.operators.HllMd5]]): each group carries a 1024-byte register
    * array in `mapGroupsWithState`, folds every micro-batch's keys into it
    * (register max — the same merge the batch sketch uses), and emits the
    * refreshed estimate each batch. Because the hash, registers, and
    * estimate dag are identical to the batch operator's, the stream's
    * final row per group equals [[distinctCountsHllBatch]] on the same
    * data to the LAST BIT — not "within sketch noise" (EventStreamsSpec
    * pins the double equality, including across a checkpoint restart).
    *
    * State is 1 KB per group forever — no watermark needed for
    * boundedness, which is the whole point of sketched streaming
    * distincts: exact streaming COUNT(DISTINCT) state grows with
    * cardinality and must be watermark-evicted; registers never grow.
    * Output mode: Update (every batch re-emits touched groups).
    */
  def distinctCountsHll(events: DataFrame, groupCol: String,
      keyCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import graft.operators.HllMd5
    events
      .select(col(groupCol).cast("string").as("g"),
        col(keyCol).cast("string").as("k"))
      .where(col("k").isNotNull)
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], (String, Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, String)], state: GroupState[Array[Byte]]) =>
          val regs = state.getOption.getOrElse(new Array[Byte](HllMd5.M))
          rows.foreach { case (_, k) =>
            val (idx, rho) = HllMd5.registerOf(k)
            if (rho > regs(idx)) regs(idx) = rho.toByte
          }
          state.update(regs)
          val (mUsed, vZero, est) = HllMd5.estimateScalar(regs)
          (g, mUsed, vZero, est)
      }
      .toDF(groupCol, "m_used", "v_zero", "hll_estimate")
  }

  /** Batch twin of [[distinctCountsHll]] — the distributed register
    * build + estimate over the same columns, bit-equal to the stream's
    * final state and SQL-replayable (the q225 gate's oracle).
    */
  def distinctCountsHllBatch(events: DataFrame, groupCol: String,
      keyCol: String): DataFrame = {
    import graft.operators.HllMd5
    val keyed = events
      .select(col(groupCol).cast("string").as(groupCol),
        col(keyCol).cast("string").as("k"))
    HllMd5.estimate(HllMd5.sketch(keyed, "k", Seq(groupCol)), Seq(groupCol))
  }

  /** Streaming bottom-k (KMV) distinct sketch per group — the set-operation
    * counterpart of [[distinctCountsHll]]: state is the k smallest DISTINCT
    * 60-bit md5 hashes seen for the group (a sorted long array, ≤ 8k bytes
    * forever — checkpoint-friendly exactly like the HLL registers), folded
    * per micro-batch with the same bounded-insert the batch aggregate
    * ([[graft.expressions.KmvAgg]]) uses. Emits the refreshed
    * (group, n_mins, kmv_estimate) each batch; because hash family, k-th
    * minimum selection, and the (k-1)/tau estimate dag are identical to
    * [[graft.operators.KmvSketch.estimate]], the final row per group
    * equals the batch read TO THE BIT (EventStreamsSpec pins this across
    * a checkpoint restart). Unlike HLL registers, the recovered state also
    * remains a valid sketch for UNION/JACCARD math against any other
    * sketch — streamed sketches and batch sketches interoperate.
    */
  def distinctCountsKmv(events: DataFrame, groupCol: String,
      keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2 (the estimator reads the k-th minimum), got $k")
    val spark = events.sparkSession
    import spark.implicits._
    val kC = (k - 1).toDouble * graft.operators.KmvSketch.HashSpace
    events
      .select(col(groupCol).cast("string").as("g"),
        col(keyCol).cast("string").as("k"))
      .where(col("k").isNotNull)
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, String)], state: GroupState[Array[Long]]) =>
          val set = scala.collection.mutable.TreeSet.empty[Long]
          state.getOption.foreach(_.foreach(set.add))
          rows.foreach { case (_, key) =>
            val h = graft.expressions.MinHashSigMd5.h60(key)
            // bounded insert: skip hashes past the current k-th minimum
            if (set.size < k) set.add(h)
            else if (h < set.last && set.add(h)) set.remove(set.last)
          }
          val arr = set.toArray // ascending
          state.update(arr)
          val nMins = arr.length
          val est =
            if (nMins < k) nMins.toDouble else kC / arr.last.toDouble
          (g, nMins.toLong, est)
      }
      .toDF(groupCol, "n_mins", "kmv_estimate")
  }

  /** Batch twin of [[distinctCountsKmv]] — the native one-pass aggregate
    * sketch + estimate over the same columns, bit-equal to the stream's
    * final state and SQL-replayable (the q233 gate's oracle).
    */
  def distinctCountsKmvBatch(events: DataFrame, groupCol: String,
      keyCol: String, k: Int): DataFrame = {
    import graft.operators.KmvSketch
    val keyed = events
      .select(col(groupCol).cast("string").as(groupCol),
        col(keyCol).cast("string").as("k"))
    KmvSketch.estimate(
      KmvSketch.sketchAgg(keyed, "k", groupCol, k), groupCol, k)
  }

  /** Streaming count-min frequency sketch per group — the frequency leg
    * of the streaming sketch trio ([[distinctCountsHll]] cardinality,
    * [[distinctCountsKmv]] set overlap, this for per-key counts): state
    * is the `depth × width` md5-parity counter matrix of
    * [[graft.operators.CmsMd5]] (16 KB at width 512 — fixed forever, the
    * checkpoint-friendly contract), bumped per micro-batch row. Counter
    * updates are pure sums, so arrival order and micro-batch boundaries
    * CANNOT change the final state — the recovered sketch equals the
    * batch aggregate ([[graft.expressions.CmsMd5Agg]]) element for
    * element (EventStreamsSpec pins this across a checkpoint restart),
    * and stays valid for further merge/probe math. Emits the refreshed
    * (group, n_rows, counters) each batch.
    */
  def freqSketchCms(events: DataFrame, groupCol: String, keyCol: String,
      width: Int): DataFrame = {
    import graft.operators.CmsMd5
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(groupCol).cast("string").as("g"),
        col(keyCol).cast("string").as("k"))
      .where(col("k").isNotNull)
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Long, Seq[Long])](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, String)], state: GroupState[Array[Long]]) =>
          val counts = state.getOption.getOrElse(new Array[Long](CmsMd5.Depth * width))
          rows.foreach { case (_, key) => CmsMd5.addKey(counts, width, key) }
          state.update(counts)
          // every row adds depth increments; row 0's sum is the row count
          (g, counts.view.slice(0, width).sum, counts.toSeq)
      }
      .toDF(groupCol, "n_rows", "counters")
  }

  /** Batch twin of [[freqSketchCms]] — the native one-pass aggregate over
    * the same columns, bit-equal to the stream's final state and
    * bucket-for-bucket SQL-replayable (the q236 gate's oracle).
    */
  def freqSketchCmsBatch(events: DataFrame, groupCol: String, keyCol: String,
      width: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val keyed = events
      .select(col(groupCol).cast("string").as(groupCol),
        col(keyCol).cast("string").as("k"))
      .where(col("k").isNotNull)
    keyed.groupBy(groupCol)
      .agg(ColumnBridge.column(
        graft.expressions.CmsMd5Agg(
          ColumnBridge.expression(col("k")), width)
          .toAggregateExpression()).as("counters"))
      .select(col(groupCol),
        aggregate(slice(col("counters"), 1, width), lit(0L), _ + _).as("n_rows"),
        col("counters"))
  }

  /** Streaming fixed-bin histogram sketch per group — the QUANTILE leg
    * completing the streaming sketch family (HLL cardinality, KMV set
    * overlap, CMS frequency, this for percentile monitoring): state is
    * the nBins-long count vector of
    * [[graft.operators.HistogramSketch]]'s bins, bumped per micro-batch
    * row with the scalar twin of the batch binning expression. Counts
    * are pure sums, so the recovered state equals the batch sketch bin
    * for bin across any micro-batch split or checkpoint restart
    * (EventStreamsSpec), and stays mergeable/quantile-readable with any
    * batch-built histogram. Emits (group, n_rows, counts) each batch.
    */
  def histogramSketchStream(events: DataFrame, groupCol: String,
      valueCol: String, lo: Double, hi: Double, nBins: Int): DataFrame = {
    import graft.operators.HistogramSketch
    require(nBins >= 1 && hi > lo, "need hi > lo and nBins >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull && !isnan(col("v")))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Long, Seq[Long])](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Double)], state: GroupState[Array[Long]]) =>
          val counts = state.getOption.getOrElse(new Array[Long](nBins))
          rows.foreach { case (_, v) =>
            counts(HistogramSketch.binOfScalar(v, lo, hi, nBins)) += 1L
          }
          state.update(counts)
          (g, counts.sum, counts.toSeq)
      }
      .toDF(groupCol, "n_rows", "counts")
  }

  /** Batch twin of [[histogramSketchStream]] — the same zero-filled
    * per-group count vector from [[graft.operators.HistogramSketch]]'s
    * relational sketch, bit-equal to the stream's final state.
    */
  def histogramSketchStreamBatch(events: DataFrame, groupCol: String,
      valueCol: String, lo: Double, hi: Double, nBins: Int): DataFrame = {
    import graft.operators.HistogramSketch
    val sk = HistogramSketch.sketch(
      events.select(col(groupCol).cast("string").as(groupCol), col(valueCol)),
      groupCol, valueCol, lo, hi, nBins)
    sk.groupBy(groupCol)
      .agg(map_from_entries(collect_list(struct(col("bin"), col("cnt"))))
        .as("m"))
      .select(col(groupCol),
        transform(sequence(lit(0), lit(nBins - 1)),
          i => coalesce(element_at(col("m"), i), lit(0L))).as("counts"))
      .select(col(groupCol),
        aggregate(col("counts"), lit(0L), _ + _).as("n_rows"), col("counts"))
  }

  /** Watermark-lateness audit over a RECORDED stream: replay the arrival
    * order and flag every event whose event time trails the running
    * maximum seen before it by more than `allowedLatenessUs` — exactly the
    * rows a live watermark of that bound would have dropped. This is the
    * calibration tool for choosing `withWatermark` bounds
    * ([[tumblingCounts]]/[[dedupWithinWatermark]]): run it over yesterday's
    * log at candidate bounds, read the drop rate per stream.
    *
    * `arrivalCol` must be a total arrival order (a log sequence number);
    * `eventTimeUs` is event time in epoch micros (a long — convert
    * timestamps with `unix_micros`). The running max is
    * [[graft.operators.Packing.withGlobalRunningMax]]'s two-phase sharded
    * pass, NOT a global window — the audit scales like any other corpus
    * scan. Output: every input row plus `watermark_us` (exclusive running
    * max, NULL on the global first arrival), `lateness_us` (how far behind
    * the watermark, 0 when on time) and `is_late`.
    */
  def latenessAudit(events: DataFrame, arrivalCol: String,
      eventTimeUs: String, allowedLatenessUs: Long): DataFrame = {
    require(allowedLatenessUs >= 0,
      s"allowedLatenessUs must be >= 0, got $allowedLatenessUs")
    graft.operators.Packing.withGlobalRunningMax(
        events, Seq(arrivalCol), eventTimeUs, out = "watermark_us")
      .withColumn("lateness_us",
        greatest(coalesce(col("watermark_us") - col(eventTimeUs), lit(0L)),
          lit(0L)))
      .withColumn("is_late", col("lateness_us") > allowedLatenessUs)
  }
}
