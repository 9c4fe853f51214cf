package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** CROSS-ENTRY consistency invariants — the r16 lesson, systematized.
  *
  * Twin-derivation gating (engine vs DuckDB oracle) has exactly one blind
  * spot: a bug MIRRORED into its own oracle is invisible to hash parity.
  * Round 16 hit it twice — q38's merge insert-key collision and s05's ADC
  * positional misalignment both stayed hash-green for sixteen rounds
  * because each query's oracle reproduced the same mistake. What caught
  * q38 was an INDEPENDENT invariant: q39's recompute oracle contradicted
  * the state q38's output implied. This spec makes that method permanent:
  * every test asserts an invariant between entries that share a domain
  * but derive INDEPENDENTLY (different algorithm, different code path, or
  * a plain-Scala reimplementation on the driver), so a mirrored bug in
  * any one entry breaks an equation the other side of which it cannot
  * also corrupt. Reference anchor: validate.py:66-91's
  * outer-join-both-directions discipline — independent derivations, not
  * twins.
  *
  * Each test's doc names the mirrored-bug class it would catch.
  */
class CrossEntryConsistencySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("cross-entry-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** Gate scale — the same corpus CORRECTNESS_r{N} runs on. */
  private val dir = "/root/testdata/sf0.01"

  private def q(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, dir)

  // ---- plain-Scala reimplementations (the independent side) ----------

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /** Embedding vectors as double arrays, collected once. */
  private lazy val vecs: Map[Long, Array[Double]] =
    graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).iterator.map(_.toDouble).toArray).toMap

  /** Exact cosine, replicating the engine's accumulation order
    * (left-to-right double adds after the float→double cast) so the
    * comparison is bit-exact, not tolerance-based. */
  private def exactCos(a: Long, b: Long): Double = {
    val va = vecs(a); val vb = vecs(b)
    var dotAB = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < va.length) {
      dotAB += va(i) * vb(i); na += va(i) * va(i); nb += vb(i) * vb(i)
      i += 1
    }
    dotAB / math.sqrt(na * nb)
  }

  private def sim4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private def rank6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  private def annRows(name: String): Array[(Long, Int, Long, Double)] =
    q(name).collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

  /** s01's per-query neighbor set and its k-th (weakest admitted) exact
    * rank key — the brute-force universe the ANN variants are audited
    * against. */
  private lazy val bruteTopK: Map[Long, (Set[Long], Long)] =
    annRows("s01_knn_brute").groupBy(_._1).map { case (qid, rows) =>
      val ns = rows.map(_._3).toSet
      qid -> (ns, rows.map(t => rank6(exactCos(qid, t._3))).min)
    }

  // ---- ANN family vs the brute-force baseline ------------------------

  test("I1: every ANN-reported similarity equals the exact cosine, recomputed off-engine") {
    // Mirrored-bug class: a candidate/score misalignment reproduced in
    // the oracle — exactly s05's r16 ADC bug, where shifted partial
    // distances picked wrong neighbors and the oracle, joining on the
    // same mis-keyed table, agreed. The reported `sim` is documented as
    // the exact cosine of (qid, neighbor); recomputing it from the raw
    // parquet floats in plain Scala (no Catalyst, no graft_dot, no
    // oracle) pins that claim independently of both gate sides.
    for (name <- Seq("s02_knn_lsh", "s03_knn_ivf", "s04_knn_ivf_multiprobe", "s05_knn_ivfpq")) {
      val rows = annRows(name)
      assert(rows.nonEmpty, s"$name returned no rows")
      rows.foreach { case (qid, rk, n, sim) =>
        assert(sim === sim4(exactCos(qid, n)),
          s"$name ($qid, rk=$rk): reported sim $sim != exact ${sim4(exactCos(qid, n))}")
      }
    }
  }

  test("I2: no ANN variant invents a neighbor better than brute force's k-th") {
    // Mirrored-bug class: an ANN path scoring phantom candidates (wrong
    // vector joined to an id, a corpus row duplicated into a cell). A
    // reported neighbor ABSENT from s01's top-10 must have an exact rank
    // key <= s01's weakest admitted key — brute force is exhaustive, so
    // anything strictly better is in its list (ties may legitimately
    // fall out on the smaller-vec_id tiebreak). Recall can lose; it can
    // never invent.
    for (name <- Seq("s02_knn_lsh", "s03_knn_ivf", "s04_knn_ivf_multiprobe", "s05_knn_ivfpq")) {
      annRows(name).foreach { case (qid, rk, n, _) =>
        val (ns, kthKey) = bruteTopK(qid)
        if (!ns.contains(n))
          assert(rank6(exactCos(qid, n)) <= kthKey,
            s"$name invented ($qid, rk=$rk, $n): exact key ${rank6(exactCos(qid, n))} " +
              s"beats brute k-th $kthKey yet is absent from s01's top-10")
      }
    }
  }

  test("I3: multiprobe (s04) dominates single-probe (s03) rank-for-rank") {
    // Mirrored-bug class: the probe ranking picking the WRONG runner-up
    // cell (or dropping the primary cell) while its oracle mirrors the
    // same cell choice. Theorem: s04's candidate set (2 nearest cells)
    // is a superset of s03's (the nearest cell), so at every rank r the
    // r-th best exact similarity over the superset is >= the subset's.
    val s3 = annRows("s03_knn_ivf").map(t => (t._1, t._2) -> t._3).toMap
    val s4 = annRows("s04_knn_ivf_multiprobe").map(t => (t._1, t._2) -> t._3).toMap
    assert(s3.nonEmpty && s4.nonEmpty)
    s3.foreach { case ((qid, rk), n3) =>
      val n4 = s4.get((qid, rk))
      assert(n4.isDefined, s"s04 missing ($qid, rk=$rk) that s03 has — candidate superset violated")
      assert(rank6(exactCos(qid, n4.get)) >= rank6(exactCos(qid, n3)),
        s"s04 ($qid, rk=$rk) exact key < s03's — superset top-k cannot be worse")
    }
  }

  // ---- dedup family ---------------------------------------------------

  test("I4: identical-shingle-set pairs are NEVER lost by d02's LSH banding") {
    // Mirrored-bug class: a band hash computed over the wrong columns or
    // a broken bucket join, reproduced in d02's generated minhash CTEs.
    // Theorem: equal shingle sets => equal 16 minhashes => equal 4 band
    // hashes => the pair shares every bucket, so it MUST appear in the
    // candidate list (gate corpora run uncapped). The sf0.01 corpus has
    // no identical-set pairs, so the theorem is exercised on a planted
    // corpus: exact copies, a reordered-shingle copy (same SET), a near
    // dup and noise — the ground-truth side derived in plain Scala.
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),            // exact copy of 1
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),  // superset (near dup)
      (4L, "one two three four five six seven"),
      (5L, "one two three four five six seven"),              // exact copy of 4
      (6L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    // ground truth in plain Scala: pairs with IDENTICAL 3-gram shingle sets
    val sets = docs.collect().map { r =>
      val tk = r.getString(1).split(" ", -1)
      r.getLong(0) -> tk.sliding(3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val identical = for {
      (a, sa) <- sets; (b, sb) <- sets if a < b && sa == sb
    } yield (a, b)
    assert(identical.toSet === Set((1L, 2L), (4L, 5L)), "planted corpus lost its design")
    val candidates = DedupQueries.pairsFromBands(
        DedupQueries.lshBands(DedupQueries.shingles(docs)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    identical.foreach { p =>
      assert(candidates.contains(p),
        s"exact-duplicate pair $p missing from LSH candidates — banding broke recall=1 on identity")
    }
  }

  test("I5: d08's recall audit counters equal arithmetic over d02 and d04's own outputs") {
    // Mirrored-bug class: the audit drifting from the listings it claims
    // to audit (different shingle source, different threshold) with its
    // oracle drifting in lockstep. n_candidates must equal |d02|,
    // n_exact |d04|, n_hit |d04 ∩ d02|, recall the rounded ratio —
    // computed here from the two listing queries' actual outputs.
    val d02 = q("d02_minhash_lsh").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d04 = q("d04_ngram_jaccard").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = q("d08_lsh_recall").collect()
    assert(a.length === 1)
    val row = a.head
    assert(row.getAs[Long]("n_candidates") === d02.size.toLong)
    assert(row.getAs[Long]("n_exact") === d04.size.toLong)
    val hit = d04.count(d02.contains).toLong
    assert(row.getAs[Long]("n_hit") === hit)
    val recall = if (d04.isEmpty) 0.0
                 else math.floor(hit.toDouble / d04.size * 10000 + 0.5) / 10000
    assert(row.getAs[Double]("recall") === recall)
    assert(d04.nonEmpty && d02.nonEmpty, "gate corpus lost its near-dup population")
  }

  test("I6: d07's distributed clustering equals a driver-side union-find over d02's pairs") {
    // Mirrored-bug class: a pointer-jumping/label-propagation bug (e.g.
    // a jump step that strands a chain) mirrored by d07's generated
    // recursive oracle. Union-find on the collected pair list is a
    // different algorithm on a different runtime — their agreement on
    // every (doc_id, cluster_id) is the invariant.
    val pairs = q("d02_minhash_lsh").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.map(n => n -> find(n)).toMap
    val got = q("d07_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  // ---- CDC / IVM ------------------------------------------------------

  test("I7: the aggregate recomputed from q38b's post-merge state equals q39b's maintained one") {
    // Mirrored-bug class: THE r16 q38 bug — a merge insert re-key
    // colliding with a live target key, mirrored into q38's own oracle
    // and invisible to hash parity; q39's independently-derived
    // recompute oracle was what contradicted it. Permanent form: rebuild
    // the per-status aggregate from q38b's OUTPUT rows (status recovered
    // by joining each row's source key back to orders) and require exact
    // equality with q39b's base+delta maintenance. A key collision
    // drops/duplicates a row on one side of this equation only.
    val ord = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"))
    val maxKey = graft.Tables.orders(spark, dir)
      .agg(max(col("o_orderkey"))).head().getLong(0)
    val merged = q("q38b_merge_bucketed")
    val srcKey = when(col("action") === "inserted", col("key") - maxKey - 1)
      .otherwise(col("key"))
    val joined = merged.withColumn("sk", srcKey)
      .join(ord.select(col("o_orderkey").as("sk"), col("o_orderstatus").as("status")), Seq("sk"))
    // every output row must resolve to exactly one source order — a
    // collision (two source rows folding into one output key) breaks this
    assert(joined.count() === merged.count(),
      "a merged row's source key did not resolve 1:1 against orders — re-key collision")
    val recomputed = joined.groupBy(col("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("totalprice") * 100 + 0.5).cast("long")).as("sum_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val maintained = q("q39b_incremental_bucketed")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(recomputed === maintained)
  }

  // ---- streaming gate vs batch blocking -------------------------------

  test("I8: st16's streaming admissions equal d02's batch blocking rule, rebuilt in-spec") {
    // Mirrored-bug class: the stream's min-owner state logic and its
    // oracle (generated from the same CTE skeleton) agreeing on a wrong
    // rule — e.g. owner updated non-monotonically. Here the batch rule
    // is rebuilt directly from the shared band rows: a doc is near-dup
    // iff some band bucket has a smaller owner. The stream path
    // (transformWithState, micro-batches, state store) shares none of
    // that execution.
    val bands = DedupQueries.lshBands(
      DedupQueries.shingles(graft.Tables.documents(spark, dir)))
    val own = bands.groupBy(col("band"), col("h")).agg(min(col("doc_id")).as("owner"))
    val flagged = bands.join(own, Seq("band", "h"))
      .filter(col("doc_id") > col("owner"))
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val expected = graft.Tables.documents(spark, dir).select(col("doc_id"))
      .collect().map(_.getLong(0))
      .map(id => id -> (if (flagged(id)) 1L else 0L)).toMap
    val got = q("st16_neardup_ingest").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(flagged.nonEmpty, "gate corpus lost its near-dup population")
  }

  // ---- sketches --------------------------------------------------------

  test("I9: x04's sharded-merge estimate is merge-invariant and its exact twin matches plain Scala") {
    // Mirrored-bug class: THE r16 x04 bug — engine and oracle comparing
    // sketches against UNLIKE populations (raw-split vs normalized
    // tokens), mirrored so the bound check stayed green while measuring
    // the wrong thing. Two independent legs: (a) the per-lang exact
    // distinct-token count recomputed in plain Scala off the parquet,
    // (b) the HLL merge theorem — union of per-(lang, source) sketches
    // must estimate EXACTLY like one whole-lang sketch (register-max
    // merge is lossless), so a mis-merge shows as inequality.
    val exactScala: Map[String, Long] = graft.Tables.documents(spark, dir)
      .select(col("lang"), col("text")).collect()
      .flatMap { r =>
        r.getString(1).toLowerCase.split("[ \\t\\n\\u000B\\f\\r]+")
          .filter(_.nonEmpty).map(t => (r.getString(0), t))
      }.groupBy(_._1).map { case (l, ts) => l -> ts.map(_._2).distinct.length.toLong }
    val out = q("x04_sketch_merge").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out.keySet === exactScala.keySet)
    exactScala.foreach { case (lang, n) =>
      assert(out(lang)._1 === n, s"x04 n_tokens_exact($lang) != plain-Scala distinct count")
    }
    // merge invariance on the same staged token stream x04 uses
    val tk = graft.Tables.documents(spark, dir)
      .select(col("lang"), col("source"),
        explode(split(lower(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val mergedEst = tk.groupBy(col("lang"), col("source"))
      .agg(expr("hll_sketch_agg(tok, 12)").as("sk"))
      .groupBy(col("lang"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wholeEst = tk.groupBy(col("lang"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(tok, 12))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mergedEst === wholeEst, "HLL shard-union estimate != whole-corpus estimate")
    // and the published bound verdicts must be the arithmetic they claim
    mergedEst.foreach { case (lang, est) =>
      val n = exactScala(lang)
      val bound = math.max(1L, math.floor(n * 0.05).toLong)
      assert(out(lang)._3 === (math.abs(est - n) <= bound),
        s"x04 within_bound($lang) inconsistent with |est-exact| vs bound")
    }
  }

  // ---- spatial kNN: approximate vs exact -------------------------------

  test("I11: exact ring-kNN (p05b) dominates the one-probe form (p05) rank-for-rank") {
    // Mirrored-bug class: a ring-expansion settle condition that stops
    // too early (margin arithmetic off by one cell) while p05b's
    // brute-force oracle shares the same quantized coordinates. Theorems
    // between the two ENTRIES: (a) exact top-k distance at rank r can
    // never exceed the 3x3-probe form's at the same rank; (b) any p05
    // neighbor strictly closer than p05b's k-th must appear in p05b's
    // list (the exact list contains everything strictly better than its
    // own k-th); (c) where p05's k-th already settles inside the 3x3
    // margin, the two lists agree exactly — on this cloud (~44
    // points/cell >> k) that is every query, so (c) is the strong form
    // and (a)/(b) keep the test honest if the cloud ever changes.
    def rows(name: String): Map[(Long, Int), (Long, Long)] =
      q(name).collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val approx = rows("p05_spatial_knn")
    val exact = rows("p05b_spatial_knn_ring")
    assert(approx.nonEmpty && exact.nonEmpty)
    val kthExact: Map[Long, Long] = exact.groupBy(_._1._1)
      .map { case (qid, m) => qid -> m.values.map(_._2).max }
    approx.foreach { case ((qid, rk), (n, d2)) =>
      exact.get((qid, rk)).foreach { case (_, ed2) =>
        assert(ed2 <= d2, s"p05b ($qid, rk=$rk) d2 $ed2 > p05's $d2 — exact lost to approximate")
      }
      val kth = kthExact.get(qid)
      assert(kth.isDefined, s"p05b returned no rows for query $qid that p05 covers")
      if (d2 < kth.get) {
        val inExact = exact.exists { case ((q2, _), (n2, _)) => q2 == qid && n2 == n }
        assert(inExact, s"p05 ($qid, $n, d2=$d2) beats p05b's k-th yet absent from exact list")
      }
    }
    // strong form: this cloud settles every query at radius 1, so the
    // lists must be IDENTICAL — a divergence means the settle condition
    // or the probe geometry drifted
    assert(approx === exact,
      "p05 and p05b diverge on a cloud where the 3x3 probe is provably exact")
  }

  test("I12: c17's decontaminated buckets equal plain-Scala eviction over d02's pairs") {
    // Mirrored-bug class: c17's adjacency wiring (join direction, the
    // exactly-one-side-is-train rule, the quarantine bucket fold) drifting
    // while its oracle — generated from the same minhash CTE skeleton —
    // drifts in lockstep. Rebuild driver-side: the md5 split rule in
    // plain Scala, adjacency from d02's OWN output, quarantine = train
    // docs with a candidate pair into val/test, then bucket counts and
    // char sums from the collected corpus. (The split thresholds are the
    // engine's shared literals by design — what this catches is the
    // EVICTION algebra, which is where a silent drift would live.)
    val pairs = q("d02_minhash_lsh").collect().map(r => (r.getLong(0), r.getLong(1)))
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def split(id: Long): String = {
      val h = md5hex(id.toString).substring(0, 2)
      if (h <= "cb") "train" else if (h <= "e5") "val" else "test"
    }
    val contaminated = pairs.flatMap { case (a, b) =>
      (split(a) == "train", split(b) == "train") match {
        case (true, false) => Some(a)
        case (false, true) => Some(b)
        case _ => None // within-train dups are d01/d02's business; val-test pairs aren't leakage
      }
    }.toSet
    val expected = docs.toSeq.map { case (id, chars) =>
      val bucket = if (split(id) == "train" && contaminated(id)) "quarantined" else split(id)
      (bucket, chars)
    }.groupBy(_._1).map { case (b, rows) => (b, rows.size.toLong, rows.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val got = q("c17_decontaminated_split").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(got === expected)
    assert(contaminated.nonEmpty, "gate corpus lost its cross-split near-dup population")
  }

  test("I13: native session_window (a09) refines lag/cumsum sessionization (a03) exactly") {
    // Mirrored-bug class: the two sessionizers drifting together with
    // their generated oracles (both SQL twins restate each engine rule).
    // They are DIFFERENT ALGORITHMS — windowed lag + running sum vs
    // Catalyst's session-window merge — with one declared tie difference:
    // a03 splits on gap > 30min, a09 on gap >= 30min, and a09's
    // session_end is last-event + gap. Theorems for ANY corpus: a09's
    // sessions REFINE a03's (a09 splits at least as often), so every a09
    // session sits inside one a03 session of the same user, and per-user
    // event/purchase totals are conserved. On a corpus with no exact-30min
    // gap (this one: equal session counts), refinement collapses to exact
    // equality — starts equal, n_events equal, a03.end == a09.end - gap.
    val gapUs = 1800000000L
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val a03 = q("a03_sessionize").collect().map(r => (r.getLong(0),
      micros(r.getAs[java.sql.Timestamp]("session_start")),
      micros(r.getAs[java.sql.Timestamp]("session_end")),
      r.getAs[Long]("n_events")))
    val a09 = q("a09_session_window").collect().map(r => (r.getLong(0),
      micros(r.getAs[java.sql.Timestamp]("session_start")),
      micros(r.getAs[java.sql.Timestamp]("session_end")),
      r.getAs[Long]("n_events")))
    assert(a03.nonEmpty && a09.nonEmpty)
    val a03ByUser = a03.groupBy(_._1); val a09ByUser = a09.groupBy(_._1)
    assert(a03ByUser.keySet === a09ByUser.keySet)
    a09ByUser.foreach { case (u, sessions) =>
      val coarse = a03ByUser(u)
      // conservation: same events, just possibly regrouped
      assert(sessions.map(_._4).sum === coarse.map(_._4).sum, s"user $u event total")
      // containment: each fine session inside exactly one coarse session
      sessions.foreach { case (_, st, en, _) =>
        val lastEvent = en - gapUs // a09 end = last event + gap
        assert(coarse.count(c => c._2 <= st && lastEvent <= c._3) === 1,
          s"user $u a09 session [$st, $lastEvent] not contained in one a03 session")
      }
      // strong form where the tie rule provably never fired
      if (sessions.length == coarse.length) {
        sessions.sortBy(_._2).zip(coarse.sortBy(_._2)).foreach { case (f, c) =>
          assert(f._2 == c._2 && f._3 - gapUs == c._3 && f._4 == c._4,
            s"user $u sessions diverge with equal counts: $f vs $c")
        }
      }
    }
  }

  // ---- end-to-end curation pipeline ------------------------------------

  test("I10: c16's fused pipeline equals a plain-Scala stage-by-stage recompute") {
    // Mirrored-bug class: a shared literal or expression wrong in BOTH
    // the fused query and its oracle (the same md5/conv/priority-key SQL
    // is generated into the oracle strings). The driver-side rebuild
    // uses MessageDigest, Long.parseLong and java.lang arithmetic — no
    // Catalyst, no DuckDB — composing the documented stages: exact-dedup
    // keepers (min doc_id per text hash) -> token-count gate (>= 20) ->
    // sequential-Poisson top-10 per source ordered by (u+1)/max(chars,1).
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val keepers = docs.groupBy(t => md5hex(t._2)).values.map { g =>
      val keep = g.minBy(_._1)
      val nTokens = g.map(_._2.split(" ", -1).length).min
      (keep._1, keep._3, g.map(_._4).min, nTokens)
    }.filter(_._4 >= 20)
    val expected = keepers.toSeq.map { case (id, source, nChars, nTokens) =>
      val u = java.lang.Long.parseLong(md5hex(id.toString).substring(0, 12), 16)
      val skey = (u + 1).toDouble / math.max(nChars, 1L)
      (source, skey, id, nTokens)
    }.groupBy(_._1).toSeq.flatMap { case (source, rows) =>
      rows.sortBy(t => (t._2, t._3)).take(10).zipWithIndex.map {
        case ((_, _, id, nTokens), i) => (source, i + 1, id, nTokens.toLong)
      }
    }.sortBy(t => (t._1, t._2))
    val got = q("c16_curation_e2e").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3).toLong)).toSeq
    assert(got === expected)
  }

  // ---- graph family (r18: previously twin-oracle-only) -----------------

  test("I14: g01's triangle census equals a driver-side census over s06's edge list") {
    // Mirrored-bug class: an orientation or tie mistake in the
    // degree-oriented wedge join (triangleCensus) reproduced in g01's
    // unrolled oracle SQL — both sides would over/under-count the same
    // wedges. The driver rebuild uses adjacency SETS and intersection
    // counting (a different algorithm: every triangle found 3x and
    // divided out, no orientation anywhere), over the (qid, neighbor)
    // pairs the s06 gate entry itself returns.
    val raw = q("s06_knn_join").select(col("qid"), col("neighbor"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = raw.filter(t => t._1 != t._2)
      .map(t => (math.min(t._1, t._2), math.max(t._1, t._2))).distinct
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val nVertices = adj.size.toLong
    val nEdges = edges.length.toLong
    val nWedges = adj.valuesIterator.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val tri3 = edges.iterator.map { case (a, b) => (adj(a) intersect adj(b)).size.toLong }.sum
    assert(tri3 % 3 === 0L, s"triangle triple-count $tri3 not divisible by 3")
    val g = q("g01_knn_triangles").head()
    assert(g.getAs[Long]("n_vertices") === nVertices)
    assert(g.getAs[Long]("n_edges") === nEdges)
    assert(g.getAs[Long]("n_wedges") === nWedges)
    assert(g.getAs[Long]("n_triangles") === tri3 / 3,
      s"engine triangles ${g.getAs[Long]("n_triangles")} != driver ${tri3 / 3}")
  }

  /** Plain-Scala quantized PageRank — mirrors GraphQueries.pagerank's
    * documented arithmetic exactly (integer micro-units, integral floor
    * shares, the two floor-quantized double multiplies), but as a driver
    * loop over collected rows: no joins, no Catalyst, no DuckDB. */
  private def pagerankScala(verts: Seq[Long], edges: Seq[(Long, Long)],
      redistribute: Boolean, iters: Int = 8, damping: Double = 0.85): Map[Long, Long] = {
    val scale = graft.operators.GraphQueries.RankScale
    val n = verts.size.toLong
    val odeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val dangling = verts.filterNot(odeg.contains)
    var rq: Map[Long, Long] = verts.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) => in(d) += rq(s) / odeg(s) }
      val dmass = if (redistribute) dangling.iterator.map(rq).sum else 0L
      rq = verts.map { v =>
        val mm = in(v) + (if (redistribute) dmass / n else 0L)
        v -> (math.floor((1.0 - damping) * scale.toDouble / n).toLong +
          math.floor(damping * mm.toDouble).toLong)
      }.toMap
    }
    rq
  }

  test("I15: g02/g02b PageRank equals a plain-Scala quantized power iteration") {
    // Mirrored-bug class: a wrong constant, a mis-keyed join, or a
    // dangling-mass slip in the iterate that g02's unrolled-CTE oracle
    // (generated from the same formulation) reproduces verbatim. The
    // driver loop shares only the documented arithmetic — the exact
    // integers after 8 iterations must agree, and the dangling
    // redistribution must be exactly the g02b-minus-g02 difference.
    val verts = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    val edges = q("s06_knn_join").select(col("qid"), col("neighbor"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def top20(m: Map[Long, Long]): Seq[(Long, Long)] =
      m.toSeq.sortBy { case (vx, rq) => (-rq, vx) }.take(20)
    val gotAlpha = q("g02_pagerank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val gotFull = q("g02b_pagerank_full").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotAlpha === top20(pagerankScala(verts, edges, redistribute = false)),
      "g02 alpha-only ranks diverge from the driver-side power iteration")
    assert(gotFull === top20(pagerankScala(verts, edges, redistribute = true)),
      "g02b full ranks diverge from the driver-side power iteration")
  }

  // ---- retrieval family ------------------------------------------------

  test("I16: t13's BM25 scores recomputed in plain Scala, corpus scalars tied to t03") {
    // Mirrored-bug class: a shared Okapi-formula slip (swapped k1/b
    // placement, df off-by-one) generated into both t13's query and its
    // oracle SQL. The driver rebuild tokenizes with split(" ", -1) and
    // scores with java.lang.Math — and its corpus token total must also
    // equal the sum of t03's per-source n_tokens, tying the two entries'
    // token accounting together.
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val toks = docs.map { case (id, text) => (id, text.split(" ", -1)) }
    val nDocs = toks.length.toLong
    val totalTokens = toks.iterator.map(_._2.length.toLong).sum
    val t03Total = q("t03_token_count").collect().map(_.getAs[Long]("n_tokens")).sum
    assert(totalTokens === t03Total,
      s"driver token total $totalTokens != t03's corpus sum $t03Total")
    val avgdl = totalTokens.toDouble / nDocs
    val (k1, b) = (1.2, 0.75)
    val expected = graft.operators.TextQueries.DefaultBm25Terms.flatMap { term =>
      val tf = toks.map { case (id, w) => (id, w.length, w.count(_ == term)) }
        .filter(_._3 > 0)
      val df = tf.length.toLong
      tf.map { case (id, dl, f) =>
        val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
        val s = idf * (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * dl / avgdl))
        (term, id, f.toLong, math.floor(s * 1e6 + 0.5) / 1e6)
      }.sortBy { case (_, id, _, s) => (-s, id) }.take(5).zipWithIndex.map {
        case ((t, id, f, s), i) => (t, i + 1, id, f, s)
      }
    }.sortBy(t => (t._1, t._2))
    val got = q("t13_bm25").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === expected)
  }

  // ---- SCD2 family -----------------------------------------------------

  test("I17: a08's SCD2 intervals equal a driver-side interval builder") {
    // Mirrored-bug class: a window-frame or tie-order mistake (lag vs
    // lead, ts-only ordering) mirrored into a08's oracle SQL. The driver
    // rebuild walks each user's sorted event list imperatively: open a
    // version on state CHANGE, close it at the next change, flag the last
    // open — no window functions on either side of the comparison.
    val evs = graft.Tables.events(spark, dir)
      .filter(col("user_id") % 50 === 0)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(t => (t._2.getTime, t._3))
      val changes = ordered.foldLeft(Vector.empty[(String, java.sql.Timestamp)]) {
        case (acc, (_, ts, _, tpe)) =>
          if (acc.nonEmpty && acc.last._1 == tpe) acc else acc :+ (tpe, ts)
      }
      changes.zipWithIndex.map { case ((state, from), i) =>
        val to = if (i + 1 < changes.length) changes(i + 1)._2 else null
        (u, i + 1, state, from, to, if (to == null) 1 else 0)
      }
    }.sortBy(t => (t._1, t._2))
    val got = q("a08_scd2").collect().map(r => (r.getLong(0), r.getInt(1),
      r.getString(2), r.getTimestamp(3), r.getTimestamp(4),
      r.getInt(5))).toSeq
    assert(got === expected)
  }

  // ---- media family ----------------------------------------------------

  test("I18: m02's decoded-media aggregates equal a pixel-level recompute, no codec") {
    // Mirrored-bug class: a feature/checksum slip shared by the pipeline
    // and the checked-in golden (the golden is GENERATED by the pipeline,
    // so alone it pins only drift, not correctness). The rebuild derives
    // every image group's aggregates straight from the documented pixel
    // formula (b<<16 | ((7b)&0xff)<<8 | (13b)&0xff over the text bytes)
    // and the text groups' from the stub polynomial — never running the
    // PNG/BMP encoder or javax decode, so an encode/decode asymmetry or
    // feature bug cannot cancel out. (Encode→decode pixel fidelity itself
    // is pinned separately in MultimodalSpec.) The planted ;undecoded
    // groups carry container-derived values (encoder-dependent), so for
    // them the rebuild checks memberships and counts only.
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse(""), r.getString(2)))
    def payload(text: String) = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def stubChecksum(p: Array[Byte]): Long = {
      var h = 5381L; var i = 0
      while (i < p.length) { h = (h * 33 + (p(i) & 0xff)) % 2147483647L; i += 1 }
      h
    }
    def stubF0(p: Array[Byte]): Long = {
      var f = 0L; var i = 0
      while (i < p.length) { if (i % 8 == 0) f = (f * 31 + (p(i) & 0xff)) % 2147483647L; i += 1 }
      f
    }
    def pixelChecksum(text: String): Long = {
      val p = payload(text)
      var h = 5381L; var i = 0
      while (i < 256) {
        val b = if (p.isEmpty) 0 else p(i % p.length) & 0xff
        val rgb = (b << 16) | (((b * 7) & 0xff) << 8) | ((b * 13) & 0xff)
        h = (h * 33 + rgb) % 2147483647L
        i += 1
      }
      h
    }
    // expected groups: text (stub over utf-8), image/{png,bmp} (pixel
    // recompute; every 67th id corrupt -> its own ;undecoded group)
    val expected = scala.collection.mutable.Map.empty[(String, String), (Long, Long, Long, Long)]
    def add(kind: String, source: String, bytes: Long, f0: Long, ck: Long): Unit = {
      val k = (kind, source)
      val (n0, b0, f00, c0) = expected.getOrElse(k, (0L, 0L, 0L, Long.MaxValue))
      expected(k) = (n0 + 1, b0 + bytes, f00 + f0, math.min(c0, ck))
    }
    docs.foreach { case (id, text, source) =>
      val p = payload(text)
      add("text", source, p.length.toLong, stubF0(p), stubChecksum(p))
      val imgKind = if (id % 2 == 0) "image/png" else "image/bmp"
      if (id % 67 == 0) add(imgKind + ";undecoded", source, 0L, 0L, 0L) // counts only
      else add(imgKind, source, 16L * 16L * 3L, 16L, pixelChecksum(text))
    }
    val got = q("m02_media_features").collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet === expected.keySet.toSet, "m02 group membership diverged")
    expected.foreach { case (k @ (kind, _), (n, bytes, f0, ck)) =>
      val (gn, gb, gf, gc) = got(k)
      assert(gn === n, s"$k n_items $gn != $n")
      if (!kind.endsWith(";undecoded")) {
        assert(gb === bytes, s"$k total_bytes $gb != $bytes")
        assert(gf === f0, s"$k f0_sum $gf != $f0")
        assert(gc === ck, s"$k min_checksum $gc != $ck")
      }
    }
  }

  test("I19: m04's audio aggregates equal a sample-level recompute, no codec") {
    // Mirrored-bug class: same as I18 for the AUDIO leg — the golden is
    // generated by the pipeline, so a WAV encode/decode asymmetry or a
    // feature-band slip shared with it stays invisible. The rebuild
    // derives every clip's samples straight from the documented sawtooth
    // formula over the text bytes (never running the WAV encoder or
    // javax.sound decode; PCM16 round-trip fidelity is pinned separately
    // in MultimodalSpec) and folds the documented feature bands in plain
    // Scala; the text group's stub bands likewise.
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    def payload(text: String) = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def stubBand(p: Array[Byte], band: Int): Long = {
      var f = 0L; var i = 0
      while (i < p.length) {
        if (i % 8 == band) f = (f * 31 + (p(i) & 0xff)) % 2147483647L
        i += 1
      }
      f
    }
    // (frames, zc, peak, n_bytes) of the synthesized clip for one doc —
    // the audioFromDocs sample formula + the AudioCodec feature folds,
    // both re-derived here from their documented arithmetic
    def clipStats(id: Long, text: String): (Long, Long, Long, Long) = {
      val p = payload(text)
      val n = 400 + (id % 7).toInt * 100
      var prev = 0; var zc = 0L; var peak = 0L
      var i = 0
      while (i < n) {
        val b = if (p.isEmpty) 0 else p(i % p.length) & 0xff
        val v = (((b * 257) - 32768) * (if ((i / 8) % 2 == 0) 1 else -1) / 2).toShort.toInt
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && ((prev < 0 && v >= 0) || (prev >= 0 && v < 0))) zc += 1
        prev = v; i += 1
      }
      (n.toLong, zc, peak, n.toLong * 2)
    }
    var (aN, aBytes, aFrames, aZc, aPeak) = (0L, 0L, 0L, 0L, 0L)
    var (tN, tBytes, tFrames, tZc, tPeak) = (0L, 0L, 0L, 0L, 0L)
    var undecoded = 0L
    docs.foreach { case (id, text) =>
      val p = payload(text)
      // text kind: stub bands (frames band 2, peak band 5, zc band 6)
      tN += 1; tBytes += p.length
      tFrames += stubBand(p, 2); tZc += stubBand(p, 6)
      tPeak = math.max(tPeak, stubBand(p, 5))
      if (id % 67 == 0) undecoded += 1
      else {
        val (frames, zc, peak, bytes) = clipStats(id, text)
        aN += 1; aBytes += bytes; aFrames += frames; aZc += zc
        aPeak = math.max(aPeak, peak)
      }
    }
    val got = q("m04_audio_features").collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet === Set("text", "audio/wav", "audio/wav;undecoded"))
    assert(got("audio/wav") === ((aN, aBytes, aFrames, aZc, aPeak)),
      s"audio/wav group ${got("audio/wav")} != recomputed ${(aN, aBytes, aFrames, aZc, aPeak)}")
    assert(got("text") === ((tN, tBytes, tFrames, tZc, tPeak)),
      s"text group ${got("text")} != recomputed ${(tN, tBytes, tFrames, tZc, tPeak)}")
    assert(got("audio/wav;undecoded")._1 === undecoded)
  }

  test("I20: m03's frame-sampling aggregates equal a frame-level recompute, no codec") {
    // Mirrored-bug class: same as I18/I19 for the FRAME-SAMPLING leg —
    // a slip in the uniform temporal pick rule (i*total/n), the
    // byte-span stub boundaries, or the pixel checksum that the
    // generated golden would reproduce. The rebuild derives every GIF
    // frame's gray pixels from the documented formula ((b + f*31)&0xff
    // over (i + f*7)-strided text bytes; gray g decodes to rgb g*0x010101)
    // and re-applies the pick rule and span arithmetic in plain Scala —
    // never running the GIF encoder or javax decode (multi-frame
    // round-trip fidelity is pinned separately in MultimodalSpec).
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    def payload(text: String) = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def stubChecksum(p: Array[Byte]): Long = {
      var h = 5381L; var i = 0
      while (i < p.length) { h = (h * 33 + (p(i) & 0xff)) % 2147483647L; i += 1 }
      h
    }
    // (frame_idx, n_bytes, checksum) rows for one doc, both legs
    def frameRows(id: Long, text: String): Seq[(Int, Long, Long)] = {
      val p = payload(text)
      val len = p.length
      // text leg: payload split into 4 equal byte spans (the stub path)
      val spans = (0 until 4).map { i =>
        val from = (len.toLong * i / 4).toInt
        val until = (len.toLong * (i + 1) / 4).toInt
        val span = java.util.Arrays.copyOfRange(p, from, until)
        (i, span.length.toLong, stubChecksum(span))
      }
      // gif leg, corrupt sample (every 67th id, matching m02/m04's
      // planting): the payload is truncated to its first 8 container
      // bytes, which for ANY conforming encoder of an 8x8 animated GIF
      // are format-MANDATED, not encoder-chosen — the GIF89a signature
      // plus the logical-screen width (8, little-endian). decode fails,
      // so the byte-span stub emits 4 two-byte spans of that header.
      val frames = if (id % 67 == 0) {
        val hdr = "GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
          Array[Byte](8, 0)
        (0 until 4).map { i =>
          val span = java.util.Arrays.copyOfRange(hdr, i * 2, i * 2 + 2)
          (i, span.length.toLong, stubChecksum(span))
        }
      } else {
        // gif leg: 2..6 gray 8x8 frames, uniform temporal picks, pixel
        // checksum over gray-rendered rgb (g, g, g)
        val side = 8
        val nFrames = 2 + (id % 5).toInt
        val picks = if (nFrames <= 4) 0 until nFrames
                    else (0 until 4).map(i => i * nFrames / 4)
        picks.map { f =>
          var h = 5381L; var i = 0
          while (i < side * side) {
            val b = if (p.isEmpty) 0 else p((i + f * 7) % p.length) & 0xff
            val g = (b + f * 31) & 0xff
            h = (h * 33 + g * 0x010101) % 2147483647L
            i += 1
          }
          (f, (side * side).toLong, h)
        }
      }
      spans ++ frames
    }
    val expected = docs.flatMap { case (id, text) => frameRows(id, text) }
      .groupBy(_._1).toSeq.map { case (fi, rows) =>
        (fi, rows.length.toLong, rows.map(_._2).sum, rows.map(_._3).sum)
      }.sortBy(_._1)
    val got = q("m03_frame_sample").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }
}
