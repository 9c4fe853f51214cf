package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 scale probe for the fuzzy-vocabulary family (VERDICT r9
  * "Next round" #1): d16's within-length-bucket ALL-PAIRS vs d17's
  * deletion-neighborhood (SymSpell) blocking, measured at 1×/10×/30×
  * VOCABULARY on a synthesized Zipf corpus — the axis that matters here
  * is distinct-token count, which the sf corpora (and ScaleProbe's
  * 31-word generator) hold constant, so this family needs its own
  * generator rather than a ScaleProbe family row.
  *
  * Generator: vocabulary of `2000·m` candidate tokens — deterministic
  * xxhash-derived strings, lengths 4–12 — with seeded typo structure
  * (every 11th rank is a 1-char substitution of its predecessor, every
  * 11th+3 a 2-char substitution: real lev ≤ 2 pairs at every scale, the
  * workload's whole point). Documents draw 50 tokens each with
  * log-uniform rank (≈ Zipf(1) frequencies); docs scale with vocabulary
  * so per-token corpus frequencies stay shape-stable.
  *
  * Per scale it records, for BOTH operators: wall secs (min of 2),
  * shuffle MB, peak heap, steal/sys CPU, output rows — plus the
  * candidate-pair PREDICTORS computed from the realized vocabulary:
  * d16's Σ over length buckets |V_la|·(Σ_{lb∈[la,la+2]}|V_lb|) ordered
  * pairs (the levenshtein evaluations the length-block join generates)
  * and d17's Σ over variant buckets C(|bucket|,2) (pre-dedup candidate
  * emissions). Exponent = log(t_hi/t_lo)/log(m_hi/m_lo) over the two
  * largest feasible scales — the d16 number is the quadratic story told
  * by measurement; the d17 number is the fix.
  *
  * Usage: scripts/run.sh graft.tools.FuzzyProbe [outJson] [mults...]
  */
object FuzzyProbe {

  /** documents.parquet shape for a vocabulary-scaled Zipf corpus. */
  def genDocs(s: SparkSession, vocabSize: Long): DataFrame = {
    // candidate vocabulary: rank → token. Mutation ranks copy their
    // predecessor with 1 or 2 substituted characters (positions and
    // replacement chars hash-derived; a replacement colliding with the
    // original just yields a closer pair — harmless for a workload).
    val vocab = s.range(vocabSize)
      .withColumn("muts", expr(
        "case when id % 11 = 5 and id > 0 then 1 " +
          "when id % 11 = 8 and id > 0 then 2 else 0 end"))
      .withColumn("src", expr("if(muts > 0, id - 1, id)"))
      .withColumn("len", expr("cast(4 + pmod(xxhash64(src, 3), 9) as int)"))
      .withColumn("p1", expr("cast(1 + pmod(xxhash64(id, 13), len) as int)"))
      .withColumn("p2", expr("cast(1 + pmod(xxhash64(id, 17), len) as int)"))
      .select(col("id").as("rank"), expr(
        "concat_ws('', transform(sequence(1, len), j -> chr(97 + pmod(" +
          "if((muts >= 1 and j = p1) or (muts = 2 and j = p2), " +
          "xxhash64(id, cast(j as bigint), 31), " +
          "xxhash64(src, cast(j as bigint), 29)), 26))))").as("tok"))
    // documents: 50 draws each, rank = floor(V^u) - 1 (log-uniform → the
    // Zipf(1)-shaped frequency profile a real vocabulary has)
    val nDocs = math.max(vocabSize / 4, 32)
    val draws = s.range(nDocs)
      .repartition(s.sparkContext.defaultParallelism, col("id"))
      .select(col("id").as("doc_id"), explode(sequence(lit(1), lit(50))).as("j"))
      .withColumn("u", pmod(xxhash64(col("doc_id"), col("j"), lit(7L)), lit(1000000L)) / 1000000.0)
      .withColumn("rank", expr(s"cast(floor(power($vocabSize, u)) as bigint) - 1"))
    draws.join(broadcast(vocab), Seq("rank"))
      .groupBy(col("doc_id")).agg(concat_ws(" ", collect_list(col("tok"))).as("text"))
  }

  /** d16 predictor: ordered length-blocked candidate pairs from the
    * realized vocabulary — Σ_la [ C(|V_la|,2) + |V_la|·(|V_la+1| + |V_la+2|) ]. */
  private def d16Pred(vocab: DataFrame): Long = {
    val hist = vocab.groupBy(length(col("tok")).as("len"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    hist.map { case (l, c) =>
      c * (c - 1) / 2 + c * (hist.getOrElse(l + 1, 0L) + hist.getOrElse(l + 2, 0L))
    }.sum
  }

  /** d17 predictor: Σ over ≤2-deletion variant buckets C(|bucket|,2) —
    * the pre-dedup candidate emissions the bucket join generates. */
  private def d17Pred(vocab: DataFrame): Long = {
    val dels = "if(length(tok) = 0, array(), transform(sequence(1, length(tok)), " +
      "i -> concat(substr(tok, 1, i - 1), substr(tok, i + 1))))"
    vocab.select(explode(expr(s"array_distinct(concat(array(tok), $dels, " +
        s"flatten(transform($dels, y -> if(length(y) = 0, array(), " +
        "transform(sequence(1, length(y)), i -> concat(substr(y, 1, i - 1), substr(y, i + 1))))))))")).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2"))).head().getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("SOAK_r10.json")
    val multArgs = args.drop(1).filter(_.forall(_.isDigit))
    val mults = if (multArgs.nonEmpty) multArgs.map(_.toInt).toSeq else Seq(1, 10, 30)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scratch = graft.Scratch.tempDir("fuzzyprobe")
    try {
      val dirs = mults.map { m =>
        val d = scratch.resolve(s"x$m"); java.nio.file.Files.createDirectory(d)
        genDocs(spark, 2000L * m).coalesce(1).write.parquet(s"$d/documents.parquet")
        m -> d.toString
      }
      // realized vocabulary stats per scale (the generator's candidate V
      // over-counts: low ranks draw with prob ~1, the tail thins)
      val stats = dirs.map { case (m, d) =>
        val vocab = graft.Tables.documents(spark, d)
          .select(explode(split(col("text"), " ")).as("tok")).distinct()
        (m, vocab.count(), d16Pred(vocab), d17Pred(vocab))
      }
      stats.foreach { case (m, v, p16, p17) =>
        println(s"x$m: realized_vocab=$v d16_pred_pairs=$p16 d17_pred_candidates=$p17") }

      val fams = Seq("d16_fuzzy_vocab", "d17_fuzzy_vocab_blocked")
      // warm codegen on the smallest corpus
      fams.foreach(f => graft.SparkEntry.queries(f)(spark, dirs.head._2).count())
      // the d11-soak asymmetry pattern: where the candidate explosion IS
      // the thing being measured, the predictor is the measurement — a
      // scale whose predicted candidates exceed the cap is recorded
      // predicted-only instead of burning a quadratic run (d16 at 30×
      // predicts ~6.5e8 levenshtein evaluations; its 1×→10× exponent and
      // the predictor curve already tell the story)
      val PredCap = 100000000L
      val results = fams.map { f =>
        val perScale = dirs.map { case (m, dir) =>
          val pred = stats.find(_._1 == m).map(s => if (f.startsWith("d16")) s._3 else s._4).get
          if (pred > PredCap) { println(s"$f x$m SKIPPED (pred=$pred)"); (m, None) }
          else {
            val fn = graft.SparkEntry.queries(f)
            val r = Seq(ScaleProbe.measure(spark)(fn(spark, dir).count()),
              ScaleProbe.measure(spark)(fn(spark, dir).count())).minBy(_.secs)
            println(f"$f x$m: ${r.secs}%.2fs shuffle=${r.shuffleMb}MB rows=${r.rows}")
            (m, Some(r))
          }
        }
        val run = perScale.collect { case (m, Some(r)) => (m, r) }
        val expo =
          if (run.size >= 2) {
            val (lo, hi) = (run.takeRight(2).head, run.last)
            f""""wall_exponent":${math.log(hi._2.secs / lo._2.secs) / math.log(hi._1.toDouble / lo._1)}%.2f"""
          } else """"wall_exponent":"n/a""""
        val scalesJson = perScale.map {
          case (m, Some(r)) => f""""x$m":{"seconds":${r.secs}%.2f,"shuffle_mb":${r.shuffleMb},"peak_heap_mb":${r.peakHeapMb},"steal_pct":${r.stealPct},"sys_pct":${r.sysPct},"rows":${r.rows}}"""
          case (m, None) => s""""x$m":"skipped: predicted candidates exceed $PredCap""""
        }.mkString("{", ",", "}")
        f -> s"""{"scales":$scalesJson,$expo}"""
      }
      val statsJson = stats.map { case (m, v, p16, p17) =>
        s""""x$m":{"realized_vocab":$v,"d16_pred_pairs":$p16,"d17_pred_candidates":$p17}"""
      }.mkString("{", ",", "}")
      val json = s"""{"multipliers":${mults.mkString("[", ",", "]")},
        |"base_shape":"2000 candidate tokens / 500 docs x 50 Zipf(1) draws per 1x; every 11th rank a 1-sub typo of its predecessor, every 11th+3 a 2-sub",
        |"vocab_stats":$statsJson,
        |"families":${results.map { case (f, j) => s""""$f":$j""" }.mkString("{", ",", "}")},
        |"method":"wall_exponent = log(t_hi/t_lo)/log(m_hi/m_lo) over the two largest feasible vocabulary scales; d16_pred_pairs = ordered length-blocked pair count Sum_la[C(V_la,2) + V_la*(V_la+1 + V_la+2)] from the realized vocab; d17_pred_candidates = Sum over <=2-deletion variant buckets C(bucket,2) pre-dedup"}"""
        .stripMargin.replace("\n", "")
      val w = new java.io.PrintWriter(new java.io.File(outJson),
        java.nio.charset.StandardCharsets.UTF_8)
      try w.println(json) finally w.close()
      println(s"FUZZY PROBE OK -> $outJson")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(scratch.toFile)
      spark.stop()
    }
  }
}
