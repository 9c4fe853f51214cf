package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 depth soaks for the r14 surface additions that shipped with
  * gate-scale evidence only (VERDICT r14 "Next round" #3):
  *
  *   - `t16` phrase search: the positional posting-list intersection at
  *     1×/10×/30× generated corpora (ScaleProbe's sf0.1-shaped docs —
  *     both query terms are in its vocab). The claim under test: the
  *     checkpointed postings frame is TERM-sized (Σ tf of the two query
  *     terms, ~6% of the token stream on this vocab — recorded next to
  *     the corpus token count), the join carries only those rows, and
  *     the wall is scan-dominated → exponent ~1, no pair-space cliff.
  *
  *   - `st22` versionDiff: two committed versions of a BUCKETED snapshot
  *     store (applyChangesetBucketed, 32 buckets) at 2M/8M/32M keys with
  *     a 1/256 changeset between them; the diff measured through the
  *     catalog-table path (zero-Exchange SMJ — shuffle_mb is the
  *     witness) vs the plain-file path (one Exchange per side), results
  *     asserted identical and changeset-sized before timings are
  *     trusted. Exponent expected ~1 in store size (the co-located
  *     scan IS the cost), with the bucketed path strictly cheaper and
  *     shuffle-free.
  *
  *   - `x04` sketch merge: the store-once/merge-forever deployment shape
  *     over 5 langs × 160 sources = 800 stored shard sketches (160
  *     shards per merge — the "100+ shards" ask) at 10M/40M/160M token
  *     volumes. Per volume: the per-shard HLL table is built and STORED
  *     once (the amortized cost, recorded), then the cross-shard
  *     cardinality question is answered two ways — merging the stored
  *     sketches vs re-scanning raw tokens exactly. The claim: merge wall
  *     tracks the SKETCH TABLE (constant 800 rows → exponent ~0), the
  *     re-scan grows with data; estimates stay inside x04's 5% envelope
  *     at every volume (asserted, not assumed).
  *
  * Usage: scripts/run.sh graft.tools.DepthSoak15 [outJson] [legs…]
  * (legs ⊆ {t16, st22, x04}; default all)
  */
object DepthSoak15 {

  // ScaleProbe owns the Run → JSON shape (adds peak_heap_mb vs the shape
  // SOAK_r15.json was first written with — additive, artifact-compatible)
  private def runJson(r: ScaleProbe.Run): String = ScaleProbe.runJson(r)

  private def expo(points: Seq[(Long, ScaleProbe.Run)]): String =
    if (points.size < 2) """"wall_exponent":"n/a""""
    else {
      val ratio = points.last._1.toDouble / points.head._1
      f""""wall_exponent":${math.log(points.last._2.secs / points.head._2.secs) /
        math.log(ratio)}%.2f"""
    }

  // --- leg 1: t16 phrase search at 1x/10x/30x ---

  private def t16Leg(s: SparkSession, mults: Seq[Int]): String = {
    val scratch = graft.Scratch.tempDir("graft-t16soak")
    try {
      val fn = graft.SparkEntry.queries("t16_phrase_search")
      val points = mults.map { m =>
        val d = scratch.resolve(s"x$m"); java.nio.file.Files.createDirectory(d)
        ScaleProbe.genDocs(s, 5000L * m).coalesce(1)
          .write.parquet(s"$d/documents.parquet")
        // the term-sized-postings claim, measured from the staged corpus:
        // posting rows = Σ tf("hash") + Σ tf("value") vs all tokens
        val toks = s.read.parquet(s"$d/documents.parquet")
          .select(explode(split(col("text"), " ")).as("w"))
        val Seq(postRows, allToks) = Seq(
          toks.filter(col("w").isin("hash", "value")).count(), toks.count())
        if (m == mults.head) { fn(s, d.toString).count(); () } // warm codegen
        val r = Seq(
          ScaleProbe.measure(s)(fn(s, d.toString).count()),
          ScaleProbe.measure(s)(fn(s, d.toString).count())).minBy(_.secs)
        println(f"t16 x$m: ${r.secs}%.2fs postings=$postRows/$allToks tokens")
        (5000L * m,
          s""""x$m":{"run":${runJson(r)},"postings_rows":$postRows,"corpus_tokens":$allToks}""",
          r)
      }
      s"""{"scales":${points.map(_._2).mkString("{", ",", "}")},
         |${expo(points.map(p => (p._1, p._3)))}}""".stripMargin.replace("\n", "")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(scratch.toFile)
  }

  // --- leg 2: st22 versionDiff at store depth ---

  /** Returns (pointJson, bucketedRun) — the leg's exponent series keeps
    * the measured Run instead of regex-parsing rounded seconds back out
    * of the JSON it was serialized into (the DepthSoak16 shape). */
  private def st22Point(s: SparkSession, users: Long): (String, ScaleProbe.Run) = {
    import graft.streaming.EventStreams
    val dir = graft.Scratch.tempDir("graft-st22soak").toString
    val prefix = s"graft_st22soak_$users"
    val buckets = 32
    try {
      // v1: every user seeded; v2: a 1/256 changeset (updates) plus a
      // 1/1024 tail of NEW users (the `added` class)
      val seed = s.range(users).select(col("id").as("user_id"),
        (pmod(xxhash64(col("id"), lit(9L)), lit(10000L)) / 100.0).as("value"))
      EventStreams.applyChangesetBucketed(seed, 1L, dir, prefix, buckets)
      val chg = s.range(users / 256).select((col("id") * 256).as("user_id"),
          (pmod(xxhash64(col("id"), lit(21L)), lit(10000L)) / 100.0).as("value"))
        .unionByName(s.range(users, users + users / 1024)
          .select(col("id").as("user_id"),
            (pmod(xxhash64(col("id"), lit(23L)), lit(10000L)) / 100.0).as("value")))
      EventStreams.applyChangesetBucketed(chg, 2L, dir, prefix, buckets)

      var truth: Array[String] = Array.empty
      val bucketed = ScaleProbe.measure(s) {
        val d = EventStreams.versionDiff(s, dir, 1L, 2L, Some(prefix))
          .orderBy(col("user_id")).collect()
        truth = d.map(_.toString); d.length.toLong
      }
      val plain = ScaleProbe.measure(s) {
        val d = EventStreams.versionDiff(s, dir, 1L, 2L, None)
          .orderBy(col("user_id")).collect().map(_.toString)
        require(d.sameElements(truth), "plain diff diverged from bucketed")
        d.length.toLong
      }
      // changeset-sized, not store-sized: updates + adds exactly
      require(bucketed.rows == users / 256 + users / 1024,
        s"diff row count ${bucketed.rows} != ${users / 256 + users / 1024}")
      println(f"st22 $users: bucketed ${bucketed.secs}%.2fs " +
        f"(shuffle ${bucketed.shuffleMb}MB) plain ${plain.secs}%.2fs " +
        f"(shuffle ${plain.shuffleMb}MB)")
      (s"""{"store_rows":$users,"diff_rows":${bucketed.rows},
          |"bucketed_smj":${runJson(bucketed)},"plain_files":${runJson(plain)}}"""
        .stripMargin.replace("\n", ""), bucketed)
    } finally {
      Seq(1L, 2L).foreach(v => s.sql(s"DROP TABLE IF EXISTS ${prefix}_v$v"))
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      catch { case _: java.io.IOException => () }
    }
  }

  private def st22Leg(s: SparkSession, targets: Seq[Long]): String = {
    st22Point(s, 200000L) // warm the apply/diff code paths
    val points = targets.map(u => u -> st22Point(s, u))
    // exponent from the BUCKETED path (the deployment one)
    val runs = points.map { case (u, (_, run)) => (u, run) }
    s"""{"targets":${points.map { case (u, (j, _)) => s""""$u":$j""" }
        .mkString("{", ",", "}")},${expo(runs)}}"""
  }

  // --- leg 2b: st23 RTBF delete at store depth ---

  /** The delete apply's 100 TB claim, measured: tombstones are broadcast-
    * sized by nature, so [[graft.streaming.EventStreams.applyDeletesBucketed]]
    * costs the same O(store) scan+rewrite residual as any merge apply —
    * the delete should time ≈ the merge at every depth, never worse by a
    * join blowup. Asserted before timing is trusted: the surviving count
    * is exactly store − tombstones, and versionDiff reports exactly the
    * tombstoned keys as `removed` (the class st22's scaladoc reserves for
    * delete-bearing stores). */
  /** Returns (pointJson, deleteRun) — same keep-the-Run shape as st22. */
  private def st23Point(s: SparkSession, users: Long): (String, ScaleProbe.Run) = {
    import graft.streaming.EventStreams
    val dir = graft.Scratch.tempDir("graft-st23soak").toString
    val prefix = s"graft_st23soak_$users"
    val buckets = 32
    try {
      val seed = s.range(users).select(col("id").as("user_id"),
        (pmod(xxhash64(col("id"), lit(9L)), lit(10000L)) / 100.0).as("value"))
      EventStreams.applyChangesetBucketed(seed, 1L, dir, prefix, buckets)
      // baseline residual: an ordinary merge apply of a 1/256 changeset
      val chg = s.range(users / 256).select((col("id") * 256).as("user_id"),
        (pmod(xxhash64(col("id"), lit(21L)), lit(10000L)) / 100.0).as("value"))
      val merge = ScaleProbe.measure(s) {
        EventStreams.applyChangesetBucketed(chg, 2L, dir, prefix, buckets); 1L
      }
      // the RTBF delete: 1/1024 of users tombstoned
      val tomb = s.range(users / 1024)
        .select((col("id") * 1024 + 1).as("user_id"), lit(0.0).as("value"))
      val del = ScaleProbe.measure(s) {
        EventStreams.applyDeletesBucketed(tomb, 3L, dir, prefix, buckets); 1L
      }
      val survivors = s.read.parquet(s"$dir/v3").count()
      require(survivors == users - users / 1024,
        s"delete survivors $survivors != ${users - users / 1024}")
      val removed = EventStreams.versionDiff(s, dir, 2L, 3L, Some(prefix))
        .groupBy(col("change")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      require(removed.get("removed").contains(users / 1024) &&
        removed.size == 1,
        s"diff classes $removed != {removed -> ${users / 1024}}")
      println(f"st23 $users: merge ${merge.secs}%.2fs delete ${del.secs}%.2fs")
      (s"""{"store_rows":$users,"tombstones":${users / 1024},
          |"merge_apply":${runJson(merge)},"delete_apply":${runJson(del)}}"""
        .stripMargin.replace("\n", ""), del)
    } finally {
      Seq(1L, 2L, 3L).foreach(v => s.sql(s"DROP TABLE IF EXISTS ${prefix}_v$v"))
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      catch { case _: java.io.IOException => () }
    }
  }

  private def st23Leg(s: SparkSession, targets: Seq[Long]): String = {
    st23Point(s, 200000L) // warm
    val points = targets.map(u => u -> st23Point(s, u))
    val runs = points.map { case (u, (_, run)) => (u, run) }
    s"""{"targets":${points.map { case (u, (j, _)) => s""""$u":$j""" }
        .mkString("{", ",", "}")},${expo(runs)}}"""
  }

  // --- leg 3: x04 merge over 160 shards per lang ---

  /** Returns (pointJson, (mergeRun, rescanRun)). */
  private def x04Point(s: SparkSession, tokens: Long,
      shards: Int): (String, (ScaleProbe.Run, ScaleProbe.Run)) = {
    val dir = graft.Scratch.tempDir("graft-x04soak").toString
    try {
      val vocab = math.max(tokens / 50, 1000L)
      s.range(tokens).select(
          pmod(col("id"), lit(5L)).as("lang"),
          concat(lit("src"), pmod(xxhash64(col("id"), lit(3L)),
            lit(shards.toLong))).as("source"),
          concat(lit("t"), pmod(xxhash64(col("id"), lit(7L)), lit(vocab))).as("tok"))
        .write.parquet(s"$dir/tokens")
      val raw = s.read.parquet(s"$dir/tokens")
      // store-once: the per-shard sketch table (the amortized build cost)
      val build = ScaleProbe.measure(s) {
        raw.groupBy(col("lang"), col("source"))
          .agg(expr("hll_sketch_agg(tok, 12)").as("sk"))
          .write.parquet(s"$dir/sketches"); shards.toLong
      }
      val sk = s.read.parquet(s"$dir/sketches")
      var est: Map[Long, Double] = Map.empty
      // merge-forever: the cross-shard question answered from sketches
      val merge = ScaleProbe.measure(s) {
        val m = sk.groupBy(col("lang"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
            count(lit(1)).as("n_shards")).collect()
        require(m.forall(_.getLong(2) >= 100), "each merge must span 100+ shards")
        est = m.map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap // hll_sketch_estimate is BIGINT
        m.length.toLong
      }
      // the alternative the sketch store kills: exact re-scan of raw data
      val rescan = ScaleProbe.measure(s) {
        val ex = raw.groupBy(col("lang"))
          .agg(countDistinct(col("tok")).as("n")).collect()
        ex.foreach { r => // x04's 5% envelope, asserted at depth
          val (e, n) = (est(r.getLong(0)), r.getLong(1))
          require(math.abs(e - n) <= math.max(1.0, n * 0.05),
            s"lang ${r.getLong(0)}: estimate $e outside 5% of exact $n")
        }
        ex.length.toLong
      }
      println(f"x04 $tokens tokens: build ${build.secs}%.2fs " +
        f"merge ${merge.secs}%.2fs rescan ${rescan.secs}%.2fs")
      (s"""{"tokens":$tokens,"shards_per_lang":$shards,
          |"sketch_build_store":${runJson(build)},"merge_from_store":${runJson(merge)},
          |"exact_rescan":${runJson(rescan)}}""".stripMargin.replace("\n", ""),
        (merge, rescan))
    } finally {
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      catch { case _: java.io.IOException => () }
    }
  }

  private def x04Leg(s: SparkSession, volumes: Seq[Long]): String = {
    x04Point(s, 1000000L, 160) // warm
    val points = volumes.map(v => v -> x04Point(s, v, 160))
    val mergeExp = expo(points.map { case (v, (_, (m, _))) => (v, m) })
      .replace("wall_exponent", "merge_wall_exponent")
    val rescanExp = expo(points.map { case (v, (_, (_, r))) => (v, r) })
      .replace("wall_exponent", "rescan_wall_exponent")
    s"""{"volumes":${points.map { case (v, (j, _)) => s""""$v":$j""" }
        .mkString("{", ",", "}")},$mergeExp,$rescanExp}"""
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r15.json")
    val legs = { val l = args.drop(1).toSet; if (l.isEmpty) Set("t16", "st22", "x04") else l }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val parts = Seq(
      "t16_phrase_search" -> (() => t16Leg(spark, Seq(1, 10, 30))),
      "st22_version_diff" -> (() => st22Leg(spark, Seq(2000000L, 8000000L, 32000000L))),
      "st23_cdc_delete" -> (() => st23Leg(spark, Seq(2000000L, 8000000L, 32000000L))),
      "x04_sketch_merge" -> (() => x04Leg(spark, Seq(10000000L, 40000000L, 160000000L)))
    ).collect { case (name, mk) if legs.exists(name.startsWith) =>
      val j = mk(); println(s"$name done"); s""""$name":$j"""
    }
    val out = parts.mkString(
      """{"method":"min-of-2 reps per point after a warm run; wall_exponent = log(t_hi/t_lo)/log(scale_hi/scale_lo); every timed leg's result is asserted (t16: postings counted; st22: bucketed == plain == changeset-sized; x04: estimates inside the 5% envelope) before its timing is trusted",""",
      ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), out)
    println(out.take(4000))
    spark.stop()
  }
}
