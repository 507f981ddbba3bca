package graft

import graft.engine.Extractor
import graft.gen.SyntheticCorpus
import graft.streaming.StreamJobs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming surface: the same kernel behind readStream/writeStream must
  * produce the same bytes as the batch path. */
class StreamingSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  test("streaming: memory-stream extract matches the scalar kernel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 60L).map(SyntheticCorpus.row(_))
    val stream = MemoryStream[graft.model.PageRow]
    val q = StreamJobs.extractStream(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("extract_stream")
      .outputMode("append").start()
    try {
      stream.addData(rows.take(30))
      q.processAllAvailable()
      stream.addData(rows.drop(30))
      q.processAllAvailable()
      val got = spark.table("extract_stream")
        .select("url", "text", "outcome").collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
      assert(got.size == 60)
      rows.foreach { p =>
        val e = Extractor.extract(p)
        assert(got(p.url) == ((e.text, e.outcome)), s"stream mismatch ${p.url}")
      }
    } finally q.stop()
  }

  test("streaming: watermarked windowed metrics aggregate per outcome") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[graft.model.PageRow]
    val metrics = StreamJobs.windowedMetrics(
      StreamJobs.extractStream(stream.toDS()))
    val q = metrics.writeStream.format("memory").queryName("metrics_stream")
      .outputMode("complete").start()
    try {
      stream.addData((0L until 40L).map(SyntheticCorpus.row(_)))
      q.processAllAvailable()
      val rows = spark.table("metrics_stream").collect()
      assert(rows.nonEmpty)
      val total = rows.map(_.getLong(2)).sum
      assert(total == 40)
    } finally q.stop()
  }

  test("streaming: stateful exact-dedup keeps first-seen across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def page(url: String, body: String) = graft.model.PageRow(
      url, new java.sql.Timestamp(0L),
      s"<html><body><p>$body</p></body></html>"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8), null, "eng")
    val dupBody = "the quick brown fox jumps over the lazy dog again and again"
    val stream = MemoryStream[graft.model.PageRow]
    val q = StreamJobs.streamingExactDedup(
        StreamJobs.extractStream(stream.toDS()))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // batch 1: two duplicates of one doc + one unique
      stream.addData(Seq(page("https://t.test/b", dupBody),
        page("https://t.test/a", dupBody),
        page("https://t.test/u", "completely different unique content here words")))
      q.processAllAvailable()
      // batch 2: another duplicate arrives later — keeper must not change
      stream.addData(Seq(page("https://t.test/z", dupBody)))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val dupRows = rows.filter(_._2 == "https://t.test/a")
      // keeper = lexicographically first of batch 1, stable across batches
      assert(dupRows.map(_._3).sorted.toSeq == Seq(1L, 2L))
      assert(rows.exists(r => r._2 == "https://t.test/u" && r._3 == 0L))
      assert(!rows.exists(_._2 == "https://t.test/z"))
    } finally q.stop()
  }

  test("streaming: passage dedup owner is stable across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamJobs.streamingPassageDedup(stream.toDS(), windowWords = 4)
      .writeStream.format("memory").queryName("passage_stream")
      .outputMode("append").start()
    try {
      // batch 1: docs 5 and 2 share passage "p q r s"; within-batch
      // ownership must go to the LOWEST (doc, pos), not arrival order
      stream.addData(Seq(
        (5L, "p q r s a b c d"),
        (2L, "x x x x p q r s")))
      q.processAllAvailable()
      // batch 2: the same passage arrives again — owner must not change
      stream.addData(Seq((9L, "p q r s")))
      q.processAllAvailable()
      val rows = spark.table("passage_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      val pqrs = rows.filter(r => r._2 == 2L && r._3 == 1)
      assert(pqrs.map(_._4).sorted.toSeq == Seq(1L, 2L)) // dup counts grow
      assert(!rows.exists(_._2 == 9L)) // late arrival never owns
      // unique passages own themselves with zero dups
      assert(rows.exists(r => r._2 == 5L && r._3 == 1 && r._4 == 0L))
      assert(rows.exists(r => r._2 == 2L && r._3 == 0 && r._4 == 0L))
    } finally q.stop()
  }

  test("streaming: stream-static decontamination matches the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val gram8 = "one two three four five six seven eight"
    val docRows = Seq(
      (1L, s"lead in words $gram8 trailing tail"),
      (2L, "nothing shared here in this entirely different document text"),
      (3L, s"another carrier with $gram8 inside and $gram8 twice"))
    // static benchmark side: distinct gram hashes of the bench text (the
    // broadcast model table)
    val bench = Seq((99L, s"eval prompt $gram8 answer")).toDF("doc_id", "text")
    val benchGrams = bench
      .select(expr("filter(split(text, ' '), x -> x != '')").as("ws"))
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 7), i -> md5(array_join(slice(ws, i, 8), ' ')))"))
        .as("gh")).distinct()
    val stream = MemoryStream[(Long, String)]
    // stateless map → plain append mode, no state store at all
    val q = StreamJobs.streamingDecontaminate(stream.toDS(), benchGrams)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").start()
    try {
      stream.addData(docRows.take(2))
      q.processAllAvailable()
      stream.addData(docRows.drop(2))
      q.processAllAvailable()
      val all = spark.table("decon_stream").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(all.keySet == Set(1L, 2L, 3L)) // every doc scored, 0-hit incl.
      val got = all.filter(_._2 > 0L)
      // batch reference over the same union
      val batch = graft.ops.CorpusStats.decontaminate(
          docRows.toDF("doc_id", "text"), "doc_id", "text", bench, "text")
        .filter(col("contaminated")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == batch)
      assert(got.keySet == Set(1L, 3L) && !got.contains(2L))
    } finally q.stop()
  }

  test("streaming: sessionize matches the batch window across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // user 1: events at 0,10,70,75 min (gap 30 → sessions 1,1,2,2)
    // user 2: events at 5, then 200 min (→ sessions 1, 2); the 200-min
    // event arrives in the SECOND micro-batch — state must carry over
    val batch1 = Seq((1L, 10L, ts(0)), (1L, 11L, ts(10)), (2L, 20L, ts(5)))
    val batch2 = Seq((1L, 12L, ts(70)), (1L, 13L, ts(75)), (2L, 21L, ts(200)))
    val stream = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = StreamJobs.streamingSessionize(stream.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
      val got = spark.table("sess_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = graft.ops.Events.sessionize(
          (batch1 ++ batch2).toDF("user_id", "event_id", "ts"), gapSec = 1800)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == batch, s"streaming $got vs batch $batch")
      assert(got((2L, 21L)) == 2L) // cross-batch gap opened a new session
    } finally q.stop()
  }

  test("streaming: revisit typing matches the batch operator across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-02-$d%02d 00:00:00")
    // url x: h@d1 (response), h@d2 (revisit→d1), h2@d3 (new response),
    // h@d4 in the SECOND batch — must revisit d1 via the state store,
    // not restart a lineage
    val batch1 = Seq(("x", ts(1), "h"), ("x", ts(2), "h"), ("x", ts(3), "h2"),
      ("y", ts(1), "h"))
    // the duplicated ("y", ts(1), "h") row (a replayed log segment)
    // must type `response` in BOTH engines — every row at the minimum
    // timestamp is a response, even across batches
    val batch2 = Seq(("x", ts(4), "h"), ("y", ts(5), "h3"),
      ("y", ts(1), "h"))
    val stream = MemoryStream[(String, java.sql.Timestamp, String)]
    val q = StreamJobs.streamingRevisits(stream.toDS())
      .writeStream.format("memory").queryName("revisit_stream")
      .outputMode("append").start()
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
      val got = spark.table("revisit_stream").collect()
        .map(r => (r.getString(0), r.getTimestamp(1)) ->
          (r.getString(3), Option(r.getTimestamp(4)))).toMap
      val batch = graft.ops.Snapshots.revisits(
          (batch1 ++ batch2).toDF("u", "t", "d"), "u", "t", "d")
        .collect().map(r => (r.getString(0), r.getTimestamp(1)) ->
          (r.getString(3), Option(r.getTimestamp(4)))).toMap
      assert(got == batch, s"streaming $got vs batch $batch")
      assert(got(("x", ts(4))) == (("revisit", Some(ts(1))))) // cross-batch
    } finally q.stop()
  }

  test("streaming: file-source query is exactly-once across restarts") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ck = s"$base/ck"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    def writeBatch(range: Range, name: String): Unit =
      range.map(i => SyntheticCorpus.row(i.toLong)).toDS()
        .coalesce(1).write.mode("append").parquet(inDir)
    writeBatch(0 until 30, "b1")
    val q1 = StreamJobs.fileExtractQuery(spark, inDir, outDir, ck)
    q1.processAllAvailable(); q1.stop()
    writeBatch(30 until 50, "b2")
    val q2 = StreamJobs.fileExtractQuery(spark, inDir, outDir, ck)
    q2.processAllAvailable(); q2.stop()
    val out = spark.read.parquet(outDir)
    assert(out.count() == 50) // batch 1 not reprocessed after restart
    assert(out.select("url").distinct().count() == 50)
  }

  test("streaming: stateful passage-dedup state survives checkpoint restart") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_stream_state").toString
    def startQ(in: String, out: String, ck: String) =
      StreamJobs.streamingPassageDedup(
          spark.readStream.schema("_1 LONG, _2 STRING").parquet(in)
            .as[(Long, String)], windowWords = 4)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).outputMode("append").start()
    val b1 = Seq((5L, "p q r s a b c d"), (2L, "x x x x p q r s"))
    val b2 = Seq((9L, "p q r s"), (7L, "a b c d a b c d"))
    def feed(in: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(in)

    // killed-and-restarted run: q1 stops (the "kill") between batches;
    // q2 resumes from the same checkpoint dir
    val inA = s"$base/in_a"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inA))
    feed(inA, b1)
    val q1 = startQ(inA, s"$base/out_a", s"$base/ck_a")
    q1.processAllAvailable(); q1.stop()
    feed(inA, b2)
    val q2 = startQ(inA, s"$base/out_a", s"$base/ck_a")
    q2.processAllAvailable(); q2.stop()

    // uninterrupted twin: same two micro-batches, one query lifetime
    val inB = s"$base/in_b"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inB))
    feed(inB, b1)
    val qU = startQ(inB, s"$base/out_b", s"$base/ck_b")
    qU.processAllAvailable()
    feed(inB, b2)
    qU.processAllAvailable(); qU.stop()

    def rows(out: String) = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(identity).toSeq
    val restarted = rows(s"$base/out_a")
    assert(restarted == rows(s"$base/out_b"),
      "restarted output diverged from the uninterrupted run")
    // state carried over the restart: doc 9's batch-2 sighting of
    // "p q r s" bumps the PRE-KILL owner (doc 2, pos 1) to dups=2 — a
    // lost state store would re-own it to (9, 0) with dups=0
    assert(restarted.exists(r => r._2 == 2L && r._3 == 1 && r._4 == 2L),
      restarted.toString)
    assert(!restarted.exists(_._2 == 9L), restarted.toString)
  }

  test("streaming security: adversarial watch-dir configurations rejected") {
    import java.nio.file.{Files, Paths}
    import graft.streaming.StreamSecurity.validateWatchDirs
    val base = Files.createTempDirectory("graft_sec").toString
    val in = s"$base/in"; Files.createDirectories(Paths.get(in))
    def rejected(inD: String, outD: String, ckD: String): String =
      intercept[IllegalArgumentException] {
        validateWatchDirs(inD, outD, ckD)
      }.getMessage
    // watch loop: output (or checkpoint) inside the watched input dir —
    // every committed micro-batch file would be re-ingested
    assert(rejected(in, s"$in/out", s"$base/ck").contains("re-ingested"))
    assert(rejected(in, s"$base/out", s"$in/ck").contains("re-ingested"))
    // `..` traversal must not defeat the containment check
    assert(rejected(in, s"$base/x/../in/out", s"$base/ck")
      .contains("re-ingested"))
    // bidirectional: input inside the output dir is also comingling
    assert(rejected(s"$base/in", base, s"$base/ck").contains("comingle"))
    // symlinked watch root redirects every read outside the tree
    val elsewhere = Files.createTempDirectory("graft_sec_target")
    val link = Paths.get(s"$base/link_in")
    Files.createSymbolicLink(link, elsewhere)
    assert(rejected(link.toString, s"$base/out", s"$base/ck")
      .toLowerCase.contains("symlink"))
    // missing input dir
    assert(rejected(s"$base/absent", s"$base/out", s"$base/ck")
      .contains("does not exist"))
    // a clean configuration (not-yet-existing out/ck) validates fine
    validateWatchDirs(in, s"$base/out", s"$base/ck")
    // remote-scheme URIs pass through (no local symlink semantics)
    validateWatchDirs("s3a://bucket/in", "s3a://bucket/out",
      "s3a://bucket/ck")
    // a colon-bearing LOCAL name ('data:absent_in') is not a remote
    // scheme — it must be validated as a local path, not silently
    // skipped (here: it fails the exists check instead of bypassing all
    // symlink/watch-loop validation)
    assert(rejected("data:absent_in", s"$base/out", s"$base/ck")
      .contains("does not exist"))
    // ...and an absolute colon-bearing output dir inside the watched
    // root is still caught as a watch loop
    assert(rejected(in, s"$in/data:out", s"$base/ck")
      .contains("re-ingested"))
    // symlink/.. traversal: 'link/../out' must resolve THROUGH the
    // link (the OS walk), not lexically collapse to base/out — lexical
    // normalize-first would approve a sink that really lands inside
    // the watched input dir
    val linkIn = Paths.get(s"$base/lk")
    Files.createSymbolicLink(linkIn, Paths.get(s"$in/sub").toAbsolutePath)
    Files.createDirectories(Paths.get(s"$in/sub"))
    assert(rejected(in, s"$base/lk/../out", s"$base/ck")
      .contains("re-ingested"))
    // URI schemes are case-insensitive: an uppercase FILE: spelling is
    // the same working local config, not a nonexistent relative path
    validateWatchDirs(s"FILE:$in", s"$base/out", s"$base/ck")
    assert(rejected(s"FILE:$in", s"FILE:$in/out", s"$base/ck")
      .contains("re-ingested"))
  }

  test("streaming: recipe twin — typed verdicts, cross-batch keep-first") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good1 = "the quick brown fox jumps over a lazy dog of winter today"
    val good2 = "in spring the garden grows with many bright flowers and sunshine everywhere"
    val stream = MemoryStream[(Long, String)]
    val q = StreamJobs.streamingRecipe(stream.toDS())
      .writeStream.format("memory").queryName("recipe_stream")
      .outputMode("append").start()
    try {
      // batch 1: arrival order must NOT matter — the higher id arrives
      // first but the lower id wins keep-first within the batch
      stream.addData(Seq((3L, good1), (1L, good1), (2L, "too short")))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate + a fresh kept doc + a poison
      // null-text row (must be REJECTED, never become a state keeper)
      stream.addData(Seq((5L, good1), (4L, good2), (6L, null: String)))
      q.processAllAvailable()
      val v = spark.table("recipe_stream").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(v == Map(
        1L -> "kept",
        2L -> "rejected:too_few_words",
        3L -> "duplicate_of:1",
        4L -> "kept",
        5L -> "duplicate_of:1",
        6L -> "rejected:null_text"), v)
      // batch equivalence: the streamed survivors equal the batch
      // recipe stages' survivors over the same union
      val docs = Seq((1L, good1), (2L, "too short"), (3L, good1),
        (4L, good2), (5L, good1)).toDF("doc_id", "text")
      val kept = graft.ops.CorpusStats.qualityFilter(docs, "doc_id", "text")
        .filter(org.apache.spark.sql.functions.col("kept")).select("doc_id")
      val keepers = graft.ops.Dedup.exact(
          docs.join(kept, Seq("doc_id"), "left_semi"), "doc_id", "text")
        .select(org.apache.spark.sql.functions.col("keep_id"))
        .as[Long].collect().toSet
      assert(v.collect { case (id, "kept") => id }.toSet == keepers)
    } finally q.stop()
  }

  test("streaming: gopher rules run unchanged on a stream (stateless op)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the rule bundle is one narrow projection — it must compose onto a
    // streaming DF with no changes, no state, and batch-equal verdicts
    val rows = Seq((1L, ("the data " * 25).trim), (2L, "short text"),
      (3L, ("data " * 50).trim))
    val batch = graft.ops.CorpusStats
      .gopherRules(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    val stream = MemoryStream[(Long, String)]
    val q = graft.ops.CorpusStats
      .gopherRules(stream.toDS().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    try {
      stream.addData(rows)
      q.processAllAvailable()
      val got = spark.table("gopher_stream").collect()
        .map(r => r.getLong(0) -> r.getString(6)).toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming: frozen-model tier apply is batch-equivalent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // three fluency levels (the tiers unit fixture's shape) — train the
    // model + thresholds OFFLINE on this corpus, then stream the same
    // docs through the frozen artifact and expect the batch verdicts
    val docRows = Seq(
      (1L, "q w e r t"), (2L, "z x c v b"),
      (3L, "c c c"), (4L, "c c c"),
      (5L, "e e e e e"), (6L, "e e e e e"))
    val docsDf = docRows.toDF("doc_id", "text")
    val (model, tTail, tMid) =
      graft.ops.Lm.exportTierModel(docsDf, "doc_id", "text")
    val batch = graft.ops.Lm.qualityTiers(docsDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    val stream = MemoryStream[(Long, String)]
    val q = StreamJobs.streamingTierApply(stream.toDS(), model, tTail, tMid)
      .writeStream.format("memory").queryName("tier_stream")
      .outputMode("append").start()
    try {
      stream.addData(docRows.take(3))
      q.processAllAvailable()
      // unseen-at-train-time text in a later batch: all-zero counts →
      // rock-bottom score → 'tail' (the only semantic a frozen model
      // can give unseen bigrams), never a crash
      stream.addData(docRows.drop(3) :+ (7L, "totally unseen words here"))
      q.processAllAvailable()
      val got = spark.table("tier_stream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      assert(got.size == 7)
      docRows.map(_._1).foreach { id =>
        assert(got(id) == batch(id), s"stream/batch verdict drift for $id")
      }
      assert(got(7L) == ((0L, "tail")))
    } finally q.stop()
  }
}
