package graft

/** Shared helpers for the bench/verify/soak tooling — single definitions
  * for idioms that were drifting into per-file copies (scratch placement,
  * /proc/stat telemetry, JSON escaping), so a fix lands everywhere at once.
  */
object Scratch {
  /** tmpfs-backed temp dir when /dev/shm is writable — this box's shared
    * disk has multi-second I/O-wait spikes that swamp engine measurements
    * — else the default tmp location. */
  def tempDir(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, prefix)
    else java.nio.file.Files.createTempDirectory(prefix)
  }

  /** Dirs registered here are deleted by ONE JVM shutdown hook — the
    * cleanup contract for session-scoped derived layouts (bucketed /
    * partitioned scratch): they must never accumulate across processes. */
  private val tracked = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tracked.forEach { d =>
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
        catch { case _: Throwable => () }
      }))
  }
  def track(dir: String): Unit = { hook; tracked.add(dir); () }
  def untrack(dir: String): Unit = { tracked.remove(dir); () }
}

/** Box-contention telemetry from /proc/stat: this box has long windows of
  * 30-80% system / up-to-25% hypervisor-steal CPU where wall-clock
  * throughput measures the hypervisor, not the engine. Recording these
  * percentages next to every throughput sample makes a contaminated
  * window legible in the artifact.
  */
object CpuStat {
  /** (totalTicks, systemTicks, stealTicks) from the aggregate cpu line;
    * None when /proc/stat is unavailable (non-Linux). */
  def ticks(): Option[(Long, Long, Long)] = try {
    val src = scala.io.Source.fromFile("/proc/stat")
    val p = try src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
      finally src.close()
    Some((p.sum, p(2) + p.lift(5).getOrElse(0L) + p.lift(6).getOrElse(0L),
      p.lift(7).getOrElse(0L)))
  } catch { case _: Throwable => None }

  /** (stealPct, sysPct) over the interval between two tick snapshots,
    * rounded to 0.1; (-1, -1) when either snapshot is missing. */
  def pct(before: Option[(Long, Long, Long)],
          after: Option[(Long, Long, Long)]): (Double, Double) =
    (after, before) match {
      case (Some((t1, s1, st1)), Some((t0, s0, st0))) if t1 > t0 =>
        val d = (t1 - t0).toDouble
        (math.round((st1 - st0) / d * 1000) / 10.0,
         math.round((s1 - s0) / d * 1000) / 10.0)
      case _ => (-1.0, -1.0)
    }
}

/** Host-speed calibration: a FIXED pure-JVM CPU microbenchmark (no Spark,
  * no I/O) sampled inside every bench window, so round-over-round drift is
  * a NUMBER in the artifact (`calibration_cur / calibration_prev`) instead
  * of a per-query narrative. Three rounds running (r13, r15→r16 twice) the
  * bench adjudication argued "uniform host drift" from untouched-path
  * movers; this pins the same conclusion mechanically. The work is one
  * MD5 block + one 21-bit morton interleave per iteration — the engine's
  * own hot primitives (signature hashing, z-order keys), single-threaded
  * so the figure tracks per-core speed, which is what uniform drift
  * scales.
  */
object Calibration {
  private val Iters = 200000

  /** ops/s over the fixed loop; ~100-200 ms per sample on this box.
    * A short untimed warmup absorbs first-call JIT so early samples
    * aren't biased slow. */
  def sample(): Long = {
    burn(20000) // untimed JIT warmup
    val t0 = System.nanoTime()
    val h = burn(Iters)
    val sec = (System.nanoTime() - t0) / 1e9
    // the fold result escapes via an impossible branch so the loop
    // cannot be dead-code-eliminated
    if (h == Long.MinValue) System.err.println("calibration blackhole")
    math.round(Iters / sec)
  }

  private def burn(iters: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](64)
    var h = 0L
    var i = 0
    while (i < iters) {
      buf(i % 64) = (i ^ (i >> 8)).toByte
      val d = md.digest(buf)
      h = h * 31 + d(0) + (d(15) << 8)
      // 21-bit morton spread (the MortonKey shape): deterministic integer
      // bit work alongside the hash block
      var v = (i & 0x1fffff).toLong
      v = (v | (v << 20)) & 0x000001FFC00003FFL
      v = (v | (v << 10)) & 0x0007E007C0000FFFL
      v = (v | (v << 4)) & 0x00786070C0380F03L
      h ^= v
      i += 1
    }
    h
  }
}

object JsonEscape {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero a round's correctness. */
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

/** Cache hygiene shared by every iterative operator that checkpoints
  * per-round iterates (PageRank, connected components, the pruned CDC
  * apply's changeset): release a superseded `localCheckpoint`'s blocks
  * EAGERLY instead of waiting for the ContextCleaner — accumulated dead
  * blocks were measured (SOAK_r13/SOAK_r14b) as a 2.9–11.3 s fresh-JVM
  * wall spread on identical PageRank code before the eager release. */
object CacheOps {
  /** Drop the persisted blocks behind a `localCheckpoint`'d frame once
    * nothing downstream can reference them. The checkpoint Dataset is a
    * LogicalRDD over the persisted internal RDD, so the unpersist is
    * exact — no global persistent-RDD sweeps that could hit someone
    * else's cache. A non-checkpoint frame is a no-op. */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Materialize a BOUNDED final frame eagerly and release the upstream
    * staged frames it was derived from (r20): entries that cut corpus-
    * sized intermediates (shingle/signature/token tables) and return a
    * tiny audit row/histogram were leaking every cut for the rest of the
    * session — one bench run re-invokes entries 3–6×, and the r20
    * intermediate bench caught d08 at 17 s under the late noop pass vs
    * 1.4 s in a fresh JVM (same code): pure accumulated-dead-block cost,
    * the SOAK_r13/r14b ballast effect showing up INSIDE a bench session.
    * Use ONLY for bounded results (audit rows, histograms, top-k) —
    * for corpus-sized outputs the eager cut would double-materialize. */
  def sealAndRelease(result: org.apache.spark.sql.DataFrame,
      stages: org.apache.spark.sql.DataFrame*): org.apache.spark.sql.DataFrame = {
    val out = result.localCheckpoint()
    stages.foreach(unpersistLocalCheckpoint)
    out
  }
}

/** Per-round staging for ITERATIVE operators (PageRank, connected
  * components): materialize the iterate and truncate its lineage.
  *
  * Default = `localCheckpoint()` — blocks on executor-local storage, the
  * fastest cut and the right call on local[32]. On a 1000-executor
  * cluster with preemption that default is FRAGILE: a truncated lineage
  * cannot be recomputed, so one lost executor kills a 30-round iterate
  * mid-flight (Spark's own WARN on unpersist says as much). Deployments
  * opt into RELIABLE checkpoints with
  *
  *   spark.conf.set("spark.graft.checkpoint.reliable", "true")
  *   spark.sparkContext.setCheckpointDir("hdfs://.../ckpt")
  *
  * and every stage() lands on fault-tolerant storage instead — same
  * results (pinned by spec), executor loss recovers by re-reading the
  * checkpoint files. File cleanup follows Spark's standard policy
  * (`spark.cleaner.referenceTracking.cleanCheckpoints` or app teardown).
  * Session-scoped flag, so one reliable deployment never flips a
  * co-resident session's staging.
  */
object Checkpoints {
  val ReliableKey = "spark.graft.checkpoint.reliable"

  def stage(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sp = df.sparkSession
    // An unparseable value fails LOUD: silently mapping "1"/"ture" to
    // false would degrade to the fragile local mode the flag exists to
    // escape — the operator believes checkpoints are reliable while one
    // preempted executor can still kill a 30-round iterate
    val raw = sp.conf.get(ReliableKey, "false")
    val reliable =
      try raw.toBoolean
      catch { case _: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"$ReliableKey must be true or false, got '$raw'")
      }
    if (reliable) {
      require(sp.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true requires sparkContext.setCheckpointDir(...)")
      df.checkpoint()
    } else df.localCheckpoint()
  }
}

/** Overlap two INDEPENDENT eager materializations (guide §2.6: actions
  * are only sequential because the driver calls them sequentially).
  * Entries whose plans take two localCheckpoint cuts with no data
  * dependency between them (d08's pair sets, the recall audits' truth
  * vs graph sides) submit both jobs at once so the second backfills the
  * first's straggler tail. Exceptions propagate like the sequential
  * form: BOTH sides are awaited to completion first (a failed fa must
  * not leave fb's Spark job running concurrently with the caller's
  * error-path cleanup), then the first failure in argument order is
  * rethrown and the other side's result (or failure) is dropped. No
  * timeout: a slow-but-correct job at larger scale must behave like the
  * sequential form, not die at an arbitrary wall cap (the r19 advisor's
  * ask on both counts).
  */
object Par {
  def both[A, B](fa: => A, fb: => B): (A, B) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    import scala.util.Try
    implicit val ec: ExecutionContext = ExecutionContext.global
    val f1 = Future(Try(fa))
    val f2 = Future(Try(fb))
    val r1 = Await.result(f1, Duration.Inf)
    val r2 = Await.result(f2, Duration.Inf)
    (r1.get, r2.get)
  }
}
