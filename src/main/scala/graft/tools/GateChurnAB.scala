package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B for the st18 trigger question, two regimes:
  *
  *  1. REPLAY cadence (all files pre-staged): the TTL'd gate replay,
  *     unthrottled vs `Trigger.ProcessingTime(200ms)` — measures wall +
  *     total/empty batch counts per leg. Finding (SOAK_r13b): zero empty
  *     batches either way (settlement stops the query before the first
  *     post-data batch), so the throttle only adds alignment waste —
  *     the gate stays unthrottled.
  *  2. LIVE-GAP linger: a one-batch gate left RUNNING for a fixed
  *     window with no further input — the regime the deployment note's
  *     trigger advice is for. ProcessingTime-mode TWS reports
  *     shouldRunAnotherBatch = true unconditionally, so the unthrottled
  *     engine loops EMPTY micro-batches back-to-back; each is a full
  *     RocksDB snapshot+commit (~330ms at this state size — the loop is
  *     self-limited by commit cost, so sub-commit-cost intervals like
  *     200ms change nothing). The throttled leg runs a 2s trigger —
  *     an ingest-cadence pace — cutting the commit churn ~5×; at a real
  *     30s cadence the same mechanism cuts it ~100×.
  *
  * scripts/run.sh graft.tools.GateChurnAB [outJson] [sfDir]
  */
object GateChurnAB {
  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r13b.json")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // empty-batch spam must not fall out of the progress ring buffer
      .config("spark.sql.streaming.numRecentProgressUpdates", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def leg(throttled: Boolean): (Long, Double, Int, Int) = {
      val t0 = System.nanoTime()
      val (flagged, prog) = graft.streaming.StreamReplay.soakNearDup(
        spark, dir, chunks = 8, ttlMillis = Some(3600L * 1000),
        throttled = throttled)
      val secs = (System.nanoTime() - t0) / 1e9
      (flagged, secs, prog.size, prog.count(_.numInputRows == 0L))
    }
    leg(throttled = true) // warm the JVM/codegen once
    val legs = Seq(false, true).map { th =>
      val runs = (1 to 2).map(_ => leg(th))
      val best = runs.minBy(_._2)
      require(runs.map(_._1).distinct.size == 1,
        s"flagged-count must not depend on the trigger: ${runs.map(_._1)}")
      th -> (best, runs.map(_._2))
    }.toMap
    val (bu, wallsU) = legs(false); val (bt, wallsT) = legs(true)
    require(bu._1 == bt._1,
      s"throttled and unthrottled legs disagree on flags: ${bu._1} vs ${bt._1}")
    val lingerU = linger(spark, trigger = None)
    val lingerT = linger(spark,
      trigger = Some(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("2 seconds")))
    val json =
      s"""{"op":"st18_trigger_ab","sf_dir":"$dir","chunks":8,
         |"docs_flagged":${bu._1},
         |"replay_unthrottled":{"best_secs":${f"${bu._2}%.2f"},"walls":[${wallsU.map(w => f"$w%.2f").mkString(",")}],"batches":${bu._3},"empty_batches":${bu._4}},
         |"replay_throttled_200ms":{"best_secs":${f"${bt._2}%.2f"},"walls":[${wallsT.map(w => f"$w%.2f").mkString(",")}],"batches":${bt._3},"empty_batches":${bt._4}},
         |"linger_window_secs":$LingerSecs,
         |"linger_unthrottled_empty_batches":$lingerU,
         |"linger_throttled_2s_empty_batches":$lingerT}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(json)
    spark.stop()
  }

  private val LingerSecs = 5

  /** The live-gap probe: one data batch through the TTL'd gate, then the
    * query LINGERS with no input for [[LingerSecs]]; returns how many
    * empty micro-batches the engine committed during the gap. */
  private def linger(outer: SparkSession,
      trigger: Option[org.apache.spark.sql.streaming.Trigger]): Long = {
    val s = outer.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.streaming.numRecentProgressUpdates", "2000")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = s.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val name = s"gatechurn_${trigger.isDefined}"
    // tracked: each leg otherwise abandons a RocksDB checkpoint dir under
    // tmpdir — repeated A/B runs accumulate unbounded SST/commit-log state
    val ckpt = java.nio.file.Files.createTempDirectory("gatechurn-ckpt").toString
    graft.Scratch.track(ckpt)
    val w = graft.streaming.DocStreams.nearDupFlagsTtl(docs, 3600L * 1000)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
    val q = trigger.fold(w)(w.trigger).start()
    try {
      in.addData(Seq(1L -> "alpha beta gamma delta epsilon zeta"))
      val deadline = System.currentTimeMillis() + 60000
      while (s.table(name).count() < 4 &&
          System.currentTimeMillis() < deadline) {
        q.exception.foreach(throw _); Thread.sleep(20)
      }
      val before = q.recentProgress.count(_.numInputRows == 0L)
      Thread.sleep(LingerSecs * 1000L)
      q.recentProgress.count(_.numInputRows == 0L) - before
    } finally q.stop()
  }
}
