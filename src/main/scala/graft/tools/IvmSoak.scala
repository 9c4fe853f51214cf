package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures q45's join-view IVM claim at scale: refreshing the
  * maintained view from its deltas vs recomputing the join, as the fact
  * table grows. Two scenarios per target:
  *
  *   - `fact_delta` (the common deployment case — new orders arrive,
  *     the dim is stable): refresh = stored view partials + one
  *     agg(ΔA ⋈ dim) with ΔA broadcast. NO fact scan at all — the
  *     refresh should be FLAT in target size; the full recompute's
  *     O(target) join keeps growing. This gap is the measurement.
  *   - `both_deltas` (dim rows changed too): the decomposition adds
  *     agg(A_old ⋈ ΔB), which scans the fact once (no shuffle — ΔB is
  *     broadcast; selective hash probe, most rows drop). The honest
  *     O(target) residual of two-sided IVM on an unindexed fact —
  *     bounded by scan bandwidth, not by the join's shuffle; a fact
  *     BUCKETED by the dim key turns it into a touched-bucket read when
  *     the dim delta clusters (the st21 regime), and a table format's
  *     join index removes it entirely.
  *
  * All inputs read from parquet (the deployment shape — the refresh's
  * advantage must survive real scan costs, not ride cached frames);
  * V_old is the stored tiny partial-aggregate table, written once per
  * target. Money is integer cents, so refresh ≡ recompute exactly —
  * every leg's 5-row result is asserted identical across legs before
  * its timing is trusted.
  *
  * Usage: scripts/run.sh graft.tools.IvmSoak [outJson] [targets…]
  */
object IvmSoak {

  private val Segments = 5
  private val DeltaDiv = 256L // ~1/256 of each side changes

  private def runJson(r: ScaleProbe.Run): String =
    f"""{"seconds":${r.secs}%.2f,"shuffle_mb":${r.shuffleMb},
       |"steal_pct":${r.stealPct},"sys_pct":${r.sysPct}}"""
      .stripMargin.replace("\n", "")

  /** Per-segment partial aggregate of a joined slice. */
  private def segAgg(o: DataFrame, c: DataFrame): DataFrame =
    o.join(c, col("cust") === col("c_id"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))

  private def mergePartials(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("seg"))
      .agg(sum(col("n")).as("n"), sum(col("c")).as("c"))

  private def point(s: SparkSession, target: Long): String = {
    val dims = math.max(target / 64, 100000L)
    val dir = graft.Scratch.tempDir("graft-ivm").toString
    try {
      // deterministic synthetic inputs, written to parquet
      s.range(target).select(col("id").as("o_id"),
          pmod(xxhash64(col("id"), lit(3L)), lit(dims)).as("cust"),
          pmod(xxhash64(col("id"), lit(5L)), lit(100000L)).as("cents"))
        .write.parquet(s"$dir/fact")
      s.range(dims).select(col("id").as("c_id"),
          concat(lit("seg_"), pmod(col("id"), lit(Segments.toLong))).as("seg"))
        .write.parquet(s"$dir/dim")
      // deltas: fresh ids above the base key space (inserts — disjoint
      // from the base, like q45's hash slices partition its inputs)
      s.range(target, target + target / DeltaDiv).select(col("id").as("o_id"),
          pmod(xxhash64(col("id"), lit(3L)), lit(dims)).as("cust"),
          pmod(xxhash64(col("id"), lit(5L)), lit(100000L)).as("cents"))
        .write.parquet(s"$dir/deltaA")
      s.range(dims, dims + dims / DeltaDiv).select(col("id").as("c_id"),
          concat(lit("seg_"), pmod(col("id"), lit(Segments.toLong))).as("seg"))
        .write.parquet(s"$dir/deltaB")
      // ΔB customers need fact rows to matter: retarget a 1/DeltaDiv
      // slice of the fact at the new customers (same parquet-read
      // shape; applied in both legs identically via this stored view)
      val fact = s.read.parquet(s"$dir/fact")
        .withColumn("cust",
          when(pmod(col("o_id"), lit(DeltaDiv)) === 0,
            lit(dims) + pmod(col("o_id"), lit(math.max(dims / DeltaDiv, 1L))))
            .otherwise(col("cust")))
      val dim = s.read.parquet(s"$dir/dim")
      val dA = s.read.parquet(s"$dir/deltaA")
      val dB = s.read.parquet(s"$dir/deltaB")
      // the stored view state (deployment: maintained table)
      segAgg(fact, dim).coalesce(1).write.parquet(s"$dir/vOld")
      val vOld = s.read.parquet(s"$dir/vOld")

      def check(df: DataFrame, label: String, against: Array[String]): Unit = {
        val got = df.orderBy(col("seg")).collect().map(_.toString)
        require(against.isEmpty || got.sameElements(against),
          s"$label diverged from recompute")
      }
      var truthA: Array[String] = Array.empty
      var truthB: Array[String] = Array.empty

      // scenario 1: fact delta only
      val fullA = ScaleProbe.measure(s) {
        val r = segAgg(fact.unionByName(dA), dim)
        truthA = r.orderBy(col("seg")).collect().map(_.toString); truthA.length.toLong
      }
      val refreshA = ScaleProbe.measure(s) {
        val r = mergePartials(vOld, segAgg(broadcast(dA), dim))
        check(r, "refreshA", truthA); 1L
      }
      // scenario 2: both sides carry deltas
      val fullB = ScaleProbe.measure(s) {
        val r = segAgg(fact.unionByName(dA), dim.unionByName(dB))
        truthB = r.orderBy(col("seg")).collect().map(_.toString); truthB.length.toLong
      }
      val refreshB = ScaleProbe.measure(s) {
        val r = mergePartials(vOld,
          segAgg(broadcast(dA), dim.unionByName(dB)),
          segAgg(fact, broadcast(dB)))
        check(r, "refreshB", truthB); 1L
      }
      f"""{"fact_rows":$target,"dim_rows":$dims,
         |"delta_fact_rows":${target / DeltaDiv},"delta_dim_rows":${dims / DeltaDiv},
         |"fact_delta":{"full":${runJson(fullA)},"refresh":${runJson(refreshA)}},
         |"both_deltas":{"full":${runJson(fullB)},"refresh":${runJson(refreshB)}}}"""
        .stripMargin.replace("\n", "")
    } finally {
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      catch { case _: java.io.IOException => () }
    }
  }

  /** The clustered-dim-delta leg — the hedge in q45's adjudication
    * ("a fact bucketed by the dim key turns the A_old⋈ΔB scan into a
    * touched-bucket read when the dim delta clusters"), measured. The
    * fact is stored BUCKETED by `cust` (32 buckets); ΔB's new customer
    * ids are chosen to hash into buckets {0,1} only (a hot tenant's
    * re-keying — the st21 regime), and the retargeted fact rows point at
    * them. inc2 runs twice: a full scan of the bucketed table vs a read
    * of ONLY the touched buckets' files (the suffix-derived file-level
    * pruning the pruned CDC apply uses — Spark's own bucket pruning
    * needs literal key predicates, which a changeset join doesn't have).
    * Results asserted identical before timings are trusted. */
  private def clusteredLeg(s: SparkSession, target: Long): String =
    clusteredLegImpl(s, target, wide = false)

  /** The WIDE-ROW rerun of the clustered leg (VERDICT r14 ask #4): SOAK_r14d
    * measured the touched-bucket read winning only ~10–20% on the narrow
    * 3-column fact and hedged "bucket pruning pays in proportion to row
    * WIDTH". Here the fact carries a documents-style text column (~100
    * vocab words ≈ 550 chars) and the maintained view READS it (per-seg
    * sum of text length next to the cents sum — a token-stat view), so
    * the inc2 term is byte-bound: reading 2/32 touched buckets cuts 16×
    * the bytes where the narrow leg only cut codegen-cheap rows. Without
    * the view reading the column, parquet column pruning would erase the
    * width effect — that is the point: width pays exactly when the view
    * materializes wide columns. Results asserted identical before
    * timings are trusted. */
  private def wideClusteredLeg(s: SparkSession, target: Long): String =
    clusteredLegImpl(s, target, wide = true)

  /** One body for the narrow and wide clustered legs — the shared logic
    * (ΔB construction, retargeting join, bucketed layout, touched-bucket
    * file listing, truth assertion) must not fork into two copies that
    * can silently diverge between the legs the artifact compares. `wide`
    * adds the text payload column, makes the view read it, and reports
    * bytes on disk. */
  private def clusteredLegImpl(s: SparkSession, target: Long,
      wide: Boolean): String = {
    val buckets = 32
    val dims = math.max(target / 64, 100000L)
    val tag = if (wide) "ivmwide" else "ivmclu"
    val dir = graft.Scratch.tempDir(s"graft-$tag").toString
    val factTable = s"graft_${tag}_fact_$target"
    val vocabArr = array(Seq("a", "agg", "batch", "big", "column", "customer",
      "data", "dup", "fast", "filter", "group", "hash", "join", "key", "line",
      "merge", "order", "part", "query", "row", "scan", "slow", "small",
      "sort", "spark", "stream", "table", "the", "value", "vector", "window")
      .map(lit(_)): _*)
    try {
      // ΔB: new customer ids hashing into buckets {0,1} of 32
      val m = math.max(dims / DeltaDiv, 32L)
      val dB = s.range(dims, dims * 4)
        .filter(pmod(hash(col("id")), lit(buckets)) < 2)
        .limit(m.toInt)
        .select(col("id").as("c_id"),
          concat(lit("seg_"), pmod(col("id"), lit(Segments.toLong))).as("seg"))
        .localCheckpoint()
      // index the clustered ids so retargeting is a deterministic join
      val idx = dB.select(col("c_id"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("c_id"))) - 1).cast("long").as("ix"))
        .localCheckpoint()
      val nIdx = idx.count()
      val narrowBase = s.range(target).select(col("id").as("o_id"),
        pmod(xxhash64(col("id"), lit(3L)), lit(dims)).as("cust0"),
        pmod(xxhash64(col("id"), lit(5L)), lit(100000L)).as("cents"),
        when(pmod(col("id"), lit(DeltaDiv)) === 0,
          pmod(col("id"), lit(nIdx))).otherwise(lit(-1L)).as("ix"))
      // the wide payload: ~100 vocab words per row, xxhash-derived
      val base = if (!wide) narrowBase else narrowBase
        .withColumn("text", concat_ws(" ", transform(
          sequence(lit(1), lit(100)), j => element_at(vocabArr,
            (pmod(xxhash64(col("o_id"), j.cast("long"), lit(11L)),
              lit(31L)) + 1).cast("int")))))
      val factCols = Seq(col("o_id"),
        coalesce(col("c_id"), col("cust0")).as("cust"), col("cents")) ++
        (if (wide) Seq(col("text")) else Nil)
      base.join(broadcast(idx), Seq("ix"), "left")
        .select(factCols: _*)
        .repartition(buckets, col("cust"))
        .write.bucketBy(buckets, "cust").sortBy("cust")
        .option("path", s"$dir/fact_b").mode("overwrite")
        .saveAsTable(factTable)
      val fact = s.table(factTable)
      // wide: the view READS the text column (per-seg total chars) — the
      // byte-bound term the leg exists to measure
      def view(o: DataFrame, c: DataFrame): DataFrame =
        if (wide)
          o.join(c, col("cust") === col("c_id"))
            .groupBy(col("seg"))
            .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"),
              sum(length(col("text"))).as("chars"))
        else segAgg(o, c)
      var truth: Array[String] = Array.empty
      val full = ScaleProbe.measure(s) {
        truth = view(fact, broadcast(dB)).orderBy(col("seg"))
          .collect().map(_.toString); truth.length.toLong
      }
      // touched-bucket read: ΔB's buckets → the files carrying them
      val pruned = ScaleProbe.measure(s) {
        val touched = dB
          .select(pmod(hash(col("c_id")), lit(buckets)).as("b"))
          .distinct().collect().map(_.getInt(0)).toSet
        val fs = new org.apache.hadoop.fs.Path(s"$dir/fact_b")
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val files = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$dir/fact_b")).toSeq
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
          .collect { case st => st.getPath.getName match {
            case graft.streaming.EventStreams.BucketFileId(id)
              if touched.contains(id.toInt) => Some(st.getPath.toString)
            case _ => None
          }}.flatten
        val got = view(s.read.parquet(files: _*), broadcast(dB))
          .orderBy(col("seg")).collect().map(_.toString)
        require(got.sameElements(truth), s"pruned $tag inc2 diverged from full scan")
        files.size.toLong
      }
      val bytesField = if (wide)
        s""""fact_bytes_on_disk":${org.apache.commons.io.FileUtils
          .sizeOfDirectory(new java.io.File(s"$dir/fact_b"))},"""
      else ""
      f"""{"fact_rows":$target,$bytesField"delta_dim_rows":$nIdx,
         |"touched_buckets":2,
         |"inc2_full_scan":${runJson(full)},"inc2_pruned_read":${runJson(pruned)}}"""
        .stripMargin.replace("\n", "")
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $factTable")
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      catch { case _: java.io.IOException => () }
    }
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r14d.json")
    // "wide" selects the wide-row clustered leg only (SOAK_r15b)
    val wide = args.drop(1).contains("wide")
    val targets = {
      val t = args.drop(1).flatMap(_.toLongOption).toSeq
      if (t.nonEmpty) t else if (wide) Seq(16000000L, 64000000L)
      else Seq(4000000L, 16000000L, 64000000L)
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = if (wide) {
      wideClusteredLeg(spark, 1000000L) // warm codegen/classloading
      println("warmup done")
      targets.map { t =>
        val c = wideClusteredLeg(spark, t)
        println(s"wide clustered $t done")
        s""""$t":$c"""
      }.mkString(
        s"""{"op":"ivm_dim_delta_clustered_wide","delta_fraction":"1/$DeltaDiv","targets":{""",
        ",", "}}")
    } else {
      // warmup: the first measured job in a fresh JVM otherwise pays
      // classloading + codegen compilation (measured: a 4M 'full' leg
      // reading slower than the 16M one)
      point(spark, 1000000L)
      println("warmup done")
      targets.map { t =>
        val p = point(spark, t)
        println(s"target $t done")
        s""""$t":$p"""
      }.mkString(
        s"""{"op":"ivm_join_refresh","delta_fraction":"1/$DeltaDiv","targets":{"""
          .stripMargin.replace("\n", ""),
        ",", "},") +
        targets.drop(1).map { t => // clustered leg on the larger targets
          val c = clusteredLeg(spark, t)
          println(s"clustered $t done")
          s""""$t":$c"""
        }.mkString(""""dim_delta_clustered":{""", ",", "}}")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), out)
    println(out)
    spark.stop()
  }
}
