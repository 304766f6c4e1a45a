package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.streaming.Streaming

/** Streaming-only semantics (SURVEY §2.9) driven by MemoryStream —
  * watermark late-data drops, stateful dedup, session merging, and
  * arbitrary per-key state. These have no batch oracle; the batch
  * forms of the windowed aggregates are oracle-checked separately.
  */
/** Top-level so Spark can synthesize an Encoder (inner classes can't
  * be encoded for typed Dataset operations). */
case class Ev(ts: Timestamp, user_id: Long, event_id: Long, value: Double)

/** transformWithState processor (Spark 4 arbitrary-state API — the
  * successor to flatMapGroupsWithState): per-user running event total
  * in a ValueState, emitted once per batch. */
class RunningTotalProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, (Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}
  @transient private var total: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Ev],
      tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long)] = {
    val c = (if (total.exists()) total.get() else 0L) + rows.size
    total.update(c)
    Iterator((key, c))
  }
}

/** Event-time session closer: counts a user's events, (re)arms a timer
  * at last-event-time + 1 h on every batch, and emits the closed
  * session from handleExpiredTimer once the WATERMARK passes the gap —
  * the timer-driven flavor of session windowing (state that must fire
  * WITHOUT further input for its key).
  */
class SessionCloseProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, (Long, Long)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode,
    TimerValues, TTLConfig, ValueState}
  private val GapMs = 3600 * 1000L
  @transient private var nEvents: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    nEvents = getHandle.getValueState[Long]("n",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Ev],
      tv: TimerValues): Iterator[(Long, Long)] = {
    var n = if (nEvents.exists()) nEvents.get() else 0L
    var maxTs = Long.MinValue
    rows.foreach { e => n += 1; maxTs = math.max(maxTs, e.ts.getTime) }
    nEvents.update(n)
    // one armed timer per key: re-arm at the new last-seen event time
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(maxTs + GapMs)
    Iterator.empty
  }
  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[(Long, Long)] = {
    val n = if (nEvents.exists()) nEvents.get() else 0L
    nEvents.clear()
    Iterator((key, n))
  }
}

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  private var qn = 0
  private def nextName(): String = { qn += 1; s"stream_sink_$qn" }

  test("tumbling window with watermark drops late rows in append mode") {
    val in = MemoryStream[Ev](spark)
    val name = nextName()
    val q = Streaming.tumblingHourly(in.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Ev(t("2024-01-01 10:05:00"), 1, 1, 1.0),
        Ev(t("2024-01-01 10:20:00"), 1, 2, 2.0),
        Ev(t("2024-01-01 13:00:00"), 1, 3, 3.0))
      q.processAllAvailable() // watermark → 12:00; [10:00,11:00) finalizes
      in.addData(
        Ev(t("2024-01-01 10:40:00"), 1, 4, 100.0), // LATE: behind watermark
        Ev(t("2024-01-01 15:00:00"), 1, 5, 5.0))
      q.processAllAvailable() // watermark → 14:00; [13:00,14:00) finalizes
      val rows = spark.table(name)
        .select(col("window_start").cast("string"), col("n"), col("total"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", 2L, 3.0), // late 100.0 NOT included
        ("2024-01-01 13:00:00", 1L, 3.0)))
    } finally q.stop()
  }

  test("session windows merge events within the gap across batches") {
    val in = MemoryStream[Ev](spark)
    val name = nextName()
    val q = Streaming.sessions(in.toDF().withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Ev(t("2024-01-01 10:00:00"), 1, 1, 1.0),
        Ev(t("2024-01-01 10:20:00"), 1, 2, 1.0), // same session (gap 20m)
        Ev(t("2024-01-01 11:30:00"), 1, 3, 1.0), // new session (gap 70m)
        Ev(t("2024-01-01 10:10:00"), 2, 4, 1.0))
      in.addData(Ev(t("2024-01-01 20:00:00"), 9, 9, 1.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table(name)
        .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains((1L, "2024-01-01 10:00:00", 2L)))
      assert(rows.contains((1L, "2024-01-01 11:30:00", 1L)))
      assert(rows.contains((2L, "2024-01-01 10:10:00", 1L)))
    } finally q.stop()
  }

  test("sliding windows assign each event to 4 overlapping windows") {
    val in = MemoryStream[Ev](spark)
    val name = nextName()
    val q = Streaming.slidingHourly(in.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Ev(t("2024-01-01 10:20:00"), 1, 1, 1.0))
      in.addData(Ev(t("2024-01-01 14:00:00"), 1, 2, 1.0)) // advance watermark
      q.processAllAvailable()
      val starts = spark.table(name)
        .select(col("window_start").cast("string"), col("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // event at 10:20 belongs to the 1h windows starting 09:30..10:15
      assert(starts == Set(
        ("2024-01-01 09:30:00", 1L), ("2024-01-01 09:45:00", 1L),
        ("2024-01-01 10:00:00", 1L), ("2024-01-01 10:15:00", 1L)))
    } finally q.stop()
  }

  test("file-source stream + AvailableNow + checkpoint: each month file processed once") {
    // the reference's calendar-driven batching (spot_manager.py:154-183
    // launches a run per month; pipeline skips already-produced months)
    // IS a file-source stream with Trigger.AvailableNow: drop a new
    // month's file in the directory, run once, checkpoint remembers
    // what was already processed — restarts reprocess NOTHING
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val src = java.nio.file.Files.createTempDirectory("graft_fsrc_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val name = nextName()
    val schema = StructType(Seq(StructField("month", IntegerType),
      StructField("v", DoubleType)))
    def writeMonth(m: Int): Unit =
      Seq((m, m * 1.5), (m, m * 2.5)).toDF("month", "v")
        .coalesce(1).write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .groupBy(col("month")).agg(sum(col("v")).as("total"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    writeMonth(1)
    runOnce()
    writeMonth(2) // a new month lands
    runOnce()     // restart from checkpoint: only month 2 is new input
    val totals = spark.table(name)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // month 1 was NOT re-read (complete mode state carries it; its
    // total would double to 8.0 if the file were reprocessed)
    assert(totals == Map(1 -> 4.0, 2 -> 8.0), totals.toString)
  }

  test("foreachBatch sink sees each micro-batch exactly once with its batch id") {
    // the production sink pattern for the reference's per-month file
    // emission (precipitation_pipeline.py:123-144): each micro-batch
    // arrives as a plain DataFrame + monotone batch id, so any batch
    // writer (hive-partitioned parquet, JDBC, ...) plugs in unchanged
    val in = MemoryStream[Ev](spark)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = in.toDF()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        seen.synchronized { seen += ((id, batch.count())) }
        ()
      }
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Ev(t("2024-01-01 10:00:00"), 1, 1, 1.0),
        Ev(t("2024-01-01 10:01:00"), 1, 2, 1.0))
      q.processAllAvailable()
      in.addData(Ev(t("2024-01-01 10:02:00"), 2, 3, 1.0))
      q.processAllAvailable()
      val byId = seen.synchronized(seen.toList).toMap
      assert(byId(0L) == 2L && byId(1L) == 1L, byId.toString)
    } finally q.stop()
  }

  test("stream-stream join matches purchases to views within the time bound") {
    val views = MemoryStream[Ev](spark)
    val purchases = MemoryStream[Ev](spark)
    val name = nextName()
    val q = Streaming.viewPurchaseJoin(
      views.toDF().withWatermark("ts", "1 hour"),
      purchases.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(
        Ev(t("2024-01-01 10:00:00"), 1, 10, 1.0),
        Ev(t("2024-01-01 09:00:00"), 2, 11, 1.0))
      purchases.addData(
        Ev(t("2024-01-01 10:10:00"), 1, 100, 1.0), // 10m after view → match
        Ev(t("2024-01-01 10:30:00"), 2, 101, 1.0)) // view 90m earlier → no match
      // advance both watermarks so results emit in append mode
      views.addData(Ev(t("2024-01-01 14:00:00"), 9, 12, 1.0))
      purchases.addData(Ev(t("2024-01-01 14:00:00"), 9, 102, 1.0))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select(col("purchase_id"), col("user_id"), col("view_ts").cast("string"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(rows.contains((100L, 1L, "2024-01-01 10:00:00")))
      assert(!rows.exists(_._1 == 101L)) // stale view never joins
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join releases NULL rows only after the watermark proves no match") {
    val views = MemoryStream[Ev](spark)
    val purchases = MemoryStream[Ev](spark)
    val name = nextName()
    val q = Streaming.viewPurchaseJoinOuter(
      views.toDF().withWatermark("ts", "1 hour"),
      purchases.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(
        Ev(t("2024-01-01 10:00:00"), 1, 10, 1.0),
        Ev(t("2024-01-01 09:00:00"), 2, 11, 1.0))
      purchases.addData(
        Ev(t("2024-01-01 10:10:00"), 1, 100, 1.0), // 10m after view → match
        Ev(t("2024-01-01 10:30:00"), 2, 101, 1.0)) // view 90m earlier → NULL pad
      q.processAllAvailable()
      def rows() = spark.table(name)
        .select(col("purchase_id"),
          coalesce(col("view_ts").cast("string"), lit("NONE")))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // the watermark has not passed 11:00 yet: purchase 101's NULL
      // row MUST be withheld (a view could still arrive); the matched
      // row may already stream through
      assert(!rows().exists(_._1 == 101L),
        s"NULL row released before the watermark proved it: ${rows()}")
      // advance both watermarks past every horizon → exactly one
      // matched row and exactly one NULL-padded row
      views.addData(Ev(t("2024-01-01 14:00:00"), 9, 12, 1.0))
      purchases.addData(Ev(t("2024-01-01 14:00:00"), 9, 102, 1.0))
      q.processAllAvailable()
      views.addData(Ev(t("2024-01-01 18:00:00"), 8, 13, 1.0))
      purchases.addData(Ev(t("2024-01-01 18:00:00"), 8, 103, 1.0))
      q.processAllAvailable()
      val r = rows()
      assert(r.contains((100L, "2024-01-01 10:00:00")), s"$r")
      assert(r.contains((101L, "NONE")), s"$r")
      assert(r.count(_._1 == 101L) == 1, s"NULL row must emit exactly once: $r")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark keeps one row per event_id") {
    val in = MemoryStream[Ev](spark)
    val name = nextName()
    val q = in.toDF().withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Ev(t("2024-01-01 10:00:00"), 1, 100, 1.0),
        Ev(t("2024-01-01 10:01:00"), 1, 100, 1.0)) // dup in-batch
      q.processAllAvailable()
      in.addData(Ev(t("2024-01-01 10:02:00"), 1, 100, 1.0)) // dup cross-batch
      in.addData(Ev(t("2024-01-01 10:03:00"), 1, 200, 1.0))
      q.processAllAvailable()
      val ids = spark.table(name).select(col("event_id"))
        .collect().map(_.getLong(0)).toSeq
      assert(ids.count(_ == 100L) == 1 && ids.count(_ == 200L) == 1)
    } finally q.stop()
  }

  test("transformWithState (RocksDB store) carries per-user totals across batches") {
    // transformWithState requires the RocksDB state store provider;
    // scoped to this query and restored after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev](spark)
      val name = nextName()
      val counted = in.toDS().groupByKey(_.user_id)
        .transformWithState(new RunningTotalProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append)
        .toDF("user_id", "running")
      val q = counted.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        in.addData(Ev(t("2024-01-01 10:00:00"), 1, 1, 1.0),
          Ev(t("2024-01-01 10:01:00"), 1, 2, 1.0),
          Ev(t("2024-01-01 10:02:00"), 2, 3, 1.0))
        q.processAllAvailable()
        in.addData(Ev(t("2024-01-01 11:00:00"), 1, 4, 1.0))
        q.processAllAvailable()
        val rows = spark.table(name)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(rows.count { case (u, c) => u == 1L && c == 2L } == 1) // batch 1
        assert(rows.count { case (u, c) => u == 1L && c == 3L } == 1) // batch 2: state carried
        assert(rows.count { case (u, c) => u == 2L && c == 1L } == 1)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("monthlyFileSink lands each batch as hive (year,month) partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft_msink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_msink_ckpt").toString
    val in = MemoryStream[Ev](spark)
    val q = Streaming.monthlyFileSink(in.toDF(), out, ckpt)
    try {
      in.addData(Ev(t("2024-01-10 10:00:00"), 1, 1, 1.0),
        Ev(t("2024-02-05 09:00:00"), 1, 2, 2.0))
      q.processAllAvailable()
      in.addData(Ev(t("2024-02-20 12:00:00"), 2, 3, 3.0)) // same month, new batch
      q.processAllAvailable()
      val back = spark.read.parquet(out)
      assert(back.count() == 3)
      // hive layout: month partitions accumulate across batches
      val perMonth = back.groupBy(col("year"), col("month")).count()
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(perMonth == Map((2024, 1) -> 1L, (2024, 2) -> 2L))
      val yearDirs = new java.io.File(out).listFiles.filter(_.isDirectory).map(_.getName)
      assert(yearDirs.toSeq == Seq("year=2024"))
      // clean stop + restart from the same checkpoint: committed
      // batches are NOT re-run (no duplicates), new data still lands
      q.stop()
      val q2 = Streaming.monthlyFileSink(in.toDF(), out, ckpt)
      try {
        in.addData(Ev(t("2024-03-01 08:00:00"), 3, 4, 4.0))
        q2.processAllAvailable()
        val again = spark.read.parquet(out)
        assert(again.count() == 4)
        assert(again.select(col("event_id")).distinct().count() == 4)
      } finally q2.stop()
    } finally {
      q.stop()
      graft.sources.IO.rmTree(out); graft.sources.IO.rmTree(ckpt)
    }
  }

  test("shardedCollectionSink: bounded document parts land across micro-batches") {
    val out = java.nio.file.Files.createTempDirectory("graft_shsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_shsink_ckpt").toString
    val in = MemoryStream[Ev](spark)
    // feature = a one-field JSON object; order = event_id (unique within
    // the month); maxPerDoc = 2 forces sharding inside every batch
    val feats = in.toDF()
      .withColumn("year", year(col("ts"))).withColumn("month", month(col("ts")))
      .select(col("year"), col("month"), col("event_id"),
        concat(lit("{\"id\":"), col("event_id"), lit("}")).as("feature"))
    val q = graft.streaming.Streaming.shardedCollectionSink(
      feats, "feature", "event_id", 2, out, ckpt)
    try {
      // batch 0: five January events -> shards 0,1,2 (2+2+1 features)
      in.addData((1L to 5L).map(i =>
        Ev(t(s"2024-01-0$i 10:00:00"), 1, i, i.toDouble)): _*)
      q.processAllAvailable()
      // batch 1: three more January events + one February -> the month
      // keeps growing but every NEW part stays bounded
      in.addData(Ev(t("2024-01-20 10:00:00"), 1, 6, 6.0),
        Ev(t("2024-01-21 10:00:00"), 1, 7, 7.0),
        Ev(t("2024-01-22 10:00:00"), 1, 8, 8.0),
        Ev(t("2024-02-01 10:00:00"), 2, 9, 9.0))
      q.processAllAvailable()
      val back = spark.read.parquet(out)
      val docs = back.select(col("year"), col("month"), col("batch_id"),
        col("shard"), col("collection")).collect()
      // every part is a well-formed FeatureCollection with <= 2 features
      docs.foreach { r =>
        val c = r.getAs[String]("collection")
        assert(c.startsWith("{\"type\":\"FeatureCollection\",\"features\":[") &&
          c.endsWith("]}"), c)
        val n = "\\{\"id\":\\d+\\}".r.findAllIn(c).length
        assert(n >= 1 && n <= 2, s"part exceeds maxPerDoc: $c")
      }
      // all 9 features present exactly once across all parts
      val ids = docs.flatMap(r => "\\d+".r.findAllIn(
        r.getAs[String]("collection")).map(_.toLong)).sorted
      assert(ids.toSeq == (1L to 9L), ids.mkString(","))
      // shard indices are contiguous from 0 within each (month, batch)
      docs.groupBy(r => (r.getInt(0), r.getInt(1), r.getLong(2))).foreach {
        case (_, part) =>
          val shards = part.map(_.getInt(3)).sorted.toSeq
          assert(shards == (0 until shards.length), shards.mkString(","))
      }
      // January accumulated parts from BOTH batches under one partition
      val janBatches = docs.filter(r => r.getInt(1) == 1).map(_.getLong(2)).distinct
      assert(janBatches.sorted.toSeq == Seq(0L, 1L))
    } finally {
      q.stop()
      graft.sources.IO.rmTree(out); graft.sources.IO.rmTree(ckpt)
    }
  }

  test("sharded sink idempotent variant: a replayed batch overwrites its own parts") {
    val out = java.nio.file.Files.createTempDirectory("graft_shidem").toString
    try {
      def feats(ids: Long*) = ids.map(i =>
          (2024, 1, i, s"""{"id":$i}""")).toDF("year", "month", "event_id", "feature")
      graft.streaming.Streaming.writeShardedBatch(
        feats(1L, 2L, 3L), 0L, "feature", "event_id", 2, out)
      graft.streaming.Streaming.writeShardedBatch(
        feats(4L, 5L), 1L, "feature", "event_id", 2, out)
      assert(spark.read.parquet(out).count() == 3) // shards: 2 + 1
      // crash-replay of batch 0 must be a no-op in effect
      graft.streaming.Streaming.writeShardedBatch(
        feats(1L, 2L, 3L), 0L, "feature", "event_id", 2, out)
      val after = spark.read.parquet(out)
      assert(after.count() == 3)
      val ids = after.collect().flatMap(r => "\\d+".r.findAllIn(
        r.getAs[String]("collection")).map(_.toLong)).sorted
      assert(ids.toSeq == (1L to 5L), ids.mkString(","))
    } finally graft.sources.IO.rmTree(out)
  }

  test("idempotent sink: a REPLAYED batch overwrites itself — no duplicates") {
    val out = java.nio.file.Files.createTempDirectory("graft_idemp").toString
    try {
      val b0 = Seq(Ev(t("2024-01-10 10:00:00"), 1, 1, 1.0),
        Ev(t("2024-02-05 09:00:00"), 1, 2, 2.0)).toDF()
      val b1 = Seq(Ev(t("2024-02-20 12:00:00"), 2, 3, 3.0)).toDF()
      Streaming.writeBatchIdempotent(b0, 0L, out)
      Streaming.writeBatchIdempotent(b1, 1L, out)
      val before = spark.read.parquet(out)
      assert(before.count() == 3)
      // crash-replay of batch 0: the re-run write must be a no-op in
      // effect — same rows, no duplicates, batch 1 untouched
      Streaming.writeBatchIdempotent(b0, 0L, out)
      val after = spark.read.parquet(out)
      assert(after.count() == 3)
      assert(after.select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
        == Seq(1L, 2L, 3L))
      // and the streaming wrapper drives the same writer end-to-end
      val ckpt = java.nio.file.Files.createTempDirectory("graft_idemp_ckpt").toString
      val in = MemoryStream[Ev](spark)
      val q = Streaming.monthlyFileSinkIdempotent(in.toDF(), s"$out.stream", ckpt)
      try {
        in.addData(Ev(t("2024-03-01 08:00:00"), 3, 4, 4.0))
        q.processAllAvailable()
        assert(spark.read.parquet(s"$out.stream").count() == 1)
      } finally { q.stop(); graft.sources.IO.rmTree(s"$out.stream"); graft.sources.IO.rmTree(ckpt) }
    } finally graft.sources.IO.rmTree(out)
  }

  test("transformWithState event-time TIMERS close sessions when the watermark passes") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev](spark)
      val name = nextName()
      val closed = in.toDS().withWatermark("ts", "1 hour")
        .groupByKey(_.user_id)
        .transformWithState(new SessionCloseProcessor,
          org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append)
        .toDF("user_id", "n_events")
      val q = closed.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        // sessions: user 1 (2 events, last 10:05), user 2 (1 event, 10:10)
        in.addData(Ev(t("2024-01-01 10:00:00"), 1, 1, 1.0),
          Ev(t("2024-01-01 10:05:00"), 1, 2, 1.0),
          Ev(t("2024-01-01 10:10:00"), 2, 3, 1.0))
        q.processAllAvailable()
        assert(spark.table(name).isEmpty) // nothing closed yet
        // u3@13:00 advances the watermark to 12:00 at END of this batch
        in.addData(Ev(t("2024-01-01 13:00:00"), 3, 4, 1.0))
        q.processAllAvailable()
        // next batch evaluates timers against watermark 12:00:
        // u1's 11:05 and u2's 11:10 fire; u3's 14:00 does not
        in.addData(Ev(t("2024-01-01 13:30:00"), 3, 5, 1.0))
        q.processAllAvailable()
        val rows = spark.table(name)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(rows == Set((1L, 2L), (2L, 1L)), rows)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("flatMapGroupsWithState carries per-user running counts across batches") {
    val in = MemoryStream[Ev](spark)
    val name = nextName()
    val counted = in.toDS().groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + evs.size
          state.update(total)
          Iterator((user, total))
      }.toDF("user_id", "running")
    val q = counted.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(Ev(t("2024-01-01 10:00:00"), 1, 1, 1.0),
        Ev(t("2024-01-01 10:01:00"), 1, 2, 1.0),
        Ev(t("2024-01-01 10:02:00"), 2, 3, 1.0))
      q.processAllAvailable()
      in.addData(Ev(t("2024-01-01 11:00:00"), 1, 4, 1.0))
      q.processAllAvailable()
      val byBatch = spark.table(name)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(byBatch.count { case (u, c) => u == 1L && c == 2L } == 1) // batch 1
      assert(byBatch.count { case (u, c) => u == 1L && c == 3L } == 1) // batch 2: state carried
      assert(byBatch.count { case (u, c) => u == 2L && c == 1L } == 1)
    } finally q.stop()
  }
}
