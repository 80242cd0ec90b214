package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("hourlyCounts aggregates tumbling windows over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[Event]
    src.addData(
      Event(1, Timestamp.valueOf("2024-01-01 10:05:00"), 1, "click", 1.0),
      Event(2, Timestamp.valueOf("2024-01-01 10:55:00"), 1, "click", 2.0),
      Event(3, Timestamp.valueOf("2024-01-01 11:05:00"), 2, "view", 3.0),
    )
    val q = EventStreams.hourlyCounts(src.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("hourly").collect()
        .map(r => (r.getAs[Timestamp]("hour").toString, r.getAs[String]("event_type"), r.getAs[Long]("cnt")))
        .toSet
      assert(rows === Set(
        ("2024-01-01 10:00:00.0", "click", 2L),
        ("2024-01-01 11:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("streaming exact dedup accumulates state correctly across micro-batches") {
    // the q77 shape fed batch-by-batch: min-id and copy counts must
    // reflect ALL batches, including a later batch bringing a smaller
    // id for an already-seen text (state update, not just insert)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = MemoryStream[(Long, String)]
    val stream = src.toDF().toDF("doc_id", "text")
      .groupBy(xxhash64(col("text")).as("__th"), length(col("text")).as("__tl"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("copies"))
    val q = stream.writeStream.format("memory").queryName("dedup_state")
      .outputMode("complete").start()
    try {
      src.addData((10L, "aaa"), (11L, "bbb"))
      q.processAllAvailable()
      src.addData((5L, "aaa"), (12L, "ccc"), (13L, "aaa"))
      q.processAllAvailable()
      val rows = spark.table("dedup_state")
        .select("keep_doc_id", "copies")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // "aaa": ids 10,5,13 across batches → min 5, copies 3
      assert(rows === Map(5L -> 3L, 11L -> 1L, 12L -> 1L))
    } finally q.stop()
  }

  test("stream-static anti join drops already-present keys across micro-batches") {
    // the q96 shape: a static key set filters the stream before the
    // stateful min-id aggregation; a text present in the static corpus
    // must never reach the state store, whichever batch it arrives in
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val existing = Seq("old1", "old2").toDF("text")
      .select(xxhash64(col("text")).as("__th"), length(col("text")).as("__tl"))
    val src = MemoryStream[(Long, String)]
    val stream = src.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), xxhash64(col("text")).as("__th"), length(col("text")).as("__tl"))
      .join(existing, Seq("__th", "__tl"), "left_anti")
      .groupBy("__th", "__tl")
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("copies"))
    val q = stream.writeStream.format("memory").queryName("incdedup_state")
      .outputMode("complete").start()
    try {
      src.addData((10L, "old1"), (11L, "new1"))
      q.processAllAvailable()
      src.addData((12L, "old2"), (13L, "new1"), (14L, "new2"))
      q.processAllAvailable()
      val rows = spark.table("incdedup_state")
        .select("keep_doc_id", "copies")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // old1/old2 never enter state; new1 seen twice keeps min id 11
      assert(rows === Map(11L -> 2L, 14L -> 1L))
    } finally q.stop()
  }

  test("sessionize closes a session when the gap exceeds the threshold") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[Event]
    // user 1: events at 10:00, 10:10 (same session), then 11:00 (> 30 min gap → closes first)
    src.addData(
      Event(1, ts(0), 1, "a", 0.0),
      Event(2, ts(10), 1, "a", 0.0))
    val q = EventStreams.sessionize(src.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0) // still open
      src.addData(Event(3, Timestamp.valueOf("2024-01-01 11:00:00"), 1, "a", 0.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").collect()
      assert(closed.length === 1)
      val s = closed.head
      assert(s.getAs[Long]("n_events") === 2)
      assert(s.getAs[Long]("session_end_us") - s.getAs[Long]("session_start_us") === 10L * 60 * 1000000)
    } finally q.stop()
  }

  test("watermark drops events later than the 2h bound") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(src.toDF())
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    try {
      // advance event time far enough that 10:xx windows close …
      src.addData(Event(1, Timestamp.valueOf("2024-01-01 10:05:00"), 1, "click", 1.0))
      q.processAllAvailable()
      src.addData(Event(2, Timestamp.valueOf("2024-01-01 15:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // … then send an event 5 hours late: behind the watermark → dropped
      src.addData(Event(3, Timestamp.valueOf("2024-01-01 10:10:00"), 1, "click", 1.0))
      q.processAllAvailable()
      src.addData(Event(4, Timestamp.valueOf("2024-01-01 19:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val tenOclock = spark.table("late").collect()
        .filter(_.getAs[Timestamp]("hour").toString.startsWith("2024-01-01 10"))
      assert(tenOclock.forall(_.getAs[Long]("cnt") === 1L)) // late event never counted
    } finally q.stop()
  }

  test("q324's batch audit predicts the structured-streaming watermark drop") {
    // replay q324's type-b fixture (hwm reaches 06:20, then an event
    // stamped 06:09 arrives → late by 60s; a 06:10 event is exactly AT
    // the watermark and must survive) through a real 10-minute
    // withWatermark aggregation on 1-second windows: the dropped set
    // must be exactly the rows the batch audit counts as late.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 06:$min%02d:00")
    val src = MemoryStream[Event]
    val agg = src.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 second"))
      .count()
    val q = agg.writeStream.format("memory").queryName("wm_audit")
      .outputMode("append").start()
    try {
      // arrival order = the audit's event_id order, one micro-batch
      // each so the watermark advances exactly like the running max
      for ((m, id) <- Seq(0 -> 1L, 20 -> 2L, 9 -> 3L, 10 -> 4L, 25 -> 5L, 40 -> 6L))
        { src.addData(Event(id, t(m), 1L, "b", 1.0)); q.processAllAvailable() }
      val emitted = spark.table("wm_audit").collect()
        .map(_.getStruct(0).getTimestamp(0)).toSet
      assert(!emitted.contains(t(9)), "the 60s-late event must be dropped")
      assert(emitted.contains(t(10)), "the exactly-at-watermark event must survive")
      assert(Set(0, 20, 25).forall(m => emitted.contains(t(m))))
    } finally q.stop()
  }

  test("ingestMerge upserts each micro-batch into the parquet table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val table = s"$dir/table"
    val src = s"$dir/incoming"
    val ckpt = s"$dir/ckpt"
    new java.io.File(src).mkdirs()
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "v", "x").write.parquet(table)
    val q = EventStreams.ingestMerge(spark, src, table, Seq("id"), ckpt)
    try {
      Seq((2L, "B", 99.0), (3L, "c", 30.0)).toDF("id", "v", "x")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      val out = spark.read.parquet(table).orderBy("id").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSeq
      assert(out === Seq((1L, "a"), (2L, "B"), (3L, "c")))
    } finally q.stop()
  }

  /** relative file path → (length, mtime) for every file under root */
  private def snapshot(root: String): Map[String, (Long, Long)] = {
    val base = java.nio.file.Paths.get(root)
    val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
    java.nio.file.Files.walk(base).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        val f = p.toFile
        out(base.relativize(p).toString) = (f.length, f.lastModified)
      }
    }
    out.toMap
  }

  test("ingestMerge rewrites only the bucket partitions its keys touch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream2").toString
    val table = s"$dir/table"
    val src = s"$dir/incoming"
    val ckpt = s"$dir/ckpt"
    new java.io.File(src).mkdirs()
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "v", "x").write.parquet(table)
    val q = EventStreams.ingestMerge(spark, src, table, Seq("id"), ckpt, nBuckets = 8)
    try {
      // batch 1: migrates the table into the bucketed layout + merges
      Seq((2L, "B", 99.0), (3L, "c", 30.0)).toDF("id", "v", "x")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      val before = snapshot(table)
      // batch 2 updates key 3 only → only key 3's bucket dir may change
      Seq((3L, "C", 31.0)).toDF("id", "v", "x").write.mode("append").parquet(src)
      q.processAllAvailable()
      val after = snapshot(table)
      val b3 = Seq(3L).toDF("id")
        .select(pmod(xxhash64(col("id")), lit(8)).cast("int")).head().getInt(0)
      val changed = (before.keySet ++ after.keySet).filter(p => before.get(p) != after.get(p))
      assert(changed.nonEmpty)
      assert(changed.forall(_.contains(s"__bucket=$b3")), s"unexpectedly changed: $changed")
      val out = spark.read.parquet(table).orderBy("id").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSeq
      assert(out === Seq((1L, "a"), (2L, "B"), (3L, "C")))
    } finally q.stop()
  }
}
