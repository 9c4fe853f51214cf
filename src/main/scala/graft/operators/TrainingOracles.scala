package graft.operators

/** DuckDB oracle twins for the dedup / similarity / text / multimodal
  * packs. The md5-salted hashing scheme is chosen precisely because
  * Spark and DuckDB md5() agree byte-for-byte (lowercase hex of UTF-8),
  * so even MinHash/SimHash have true oracles. Repetitive SQL (16 minhash
  * columns, 16 simhash bits) is generated.
  */
object TrainingOracles {

  private val hexHigh = "('8','9','a','b','c','d','e','f')"

  // ---- d02 minhash ----
  private val mhCols = (0 until 16)
    .map(i => s"min(md5('$i:' || s)) AS mh$i").mkString(",\n    ")
  private val bandRows = (0 until 4).map { b =>
    val cols = (0 until 4).map(r => s"mh${b * 4 + r}").mkString(" || '|' || ")
    s"SELECT doc_id, $b AS band, md5($cols) AS h FROM sig"
  }.mkString("\n  UNION ALL\n  ")

  // private[graft]: the st16 streaming ingest-gate oracle reuses these
  // exact signature CTEs — stream ≡ batch blocking is the claim under test
  private[graft] val minhashCte =
    s"""w AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len(w) - 1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM w),
       |sig AS (
       |  SELECT doc_id,
       |    $mhCols
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandRows),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id)""".stripMargin

  private val minhashSql =
    s"""WITH $minhashCte
       |SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin

  /** d07: transitive closure by recursive CTE — exact on the oracle's small
    * graph; the engine's pointer-jumping label propagation is the scale
    * path for the same fixpoint. */
  private val dedupClustersSql =
    s"""WITH RECURSIVE $minhashCte,
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach(u, v) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u)
       |SELECT u AS doc_id, least(u, min(v)) AS cluster_id
       |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin

  // ---- d03 simhash (16-bit) / d09 (64-bit) ----
  // bit 63 term is ${1L << 63} = -9223372036854775808, the two's-complement
  // sign bit — both engines agree on the BIGINT value. 16-bit keeps the
  // round-1 per-bit-salt family; the 64-bit family is nibble-indexed
  // (bit j = high bit of nibble j%32 of digest j/32) so a token costs
  // 2 md5 calls, not 64 — mirrored exactly in the engine.
  private def simhashCteBits(bits: Int): String = {
    val voteCols =
      if (bits <= 16)
        (0 until bits).map(j =>
          s"sum(CASE WHEN substring(md5('$j:' || tok), 1, 1) IN $hexHigh THEN 1 ELSE -1 END) AS v$j")
          .mkString(",\n    ")
      else
        (0 until bits).map(j =>
          s"sum(CASE WHEN substring(md5('g${j / 32}:' || tok), ${j % 32 + 1}, 1) IN $hexHigh THEN 1 ELSE -1 END) AS v$j")
          .mkString(",\n    ")
    val bitSum = (0 until bits)
      .map(j => s"(CASE WHEN v$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
       |  FROM documents),
       |v AS (
       |  SELECT doc_id,
       |    $voteCols
       |  FROM tok GROUP BY doc_id),
       |sim AS (
       |  SELECT doc_id, CAST($bitSum AS BIGINT) AS simhash FROM v)""".stripMargin
  }
  private val simhashCte = simhashCteBits(16)

  private val simhashSql =
    s"""$simhashCte
       |SELECT doc_id, simhash FROM sim ORDER BY doc_id""".stripMargin

  /** d06: all-pairs over the tiny signature table is fine for the oracle
    * (the engine's banded join is the scale path, not a semantics change). */
  private def simhashPairsSqlBits(bits: Int): String =
    s"""${simhashCteBits(bits)}
       |SELECT CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming,
       |  count(*) AS n_pairs
       |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |GROUP BY 1 ORDER BY hamming""".stripMargin
  private val simhashPairsSql = simhashPairsSqlBits(16)

  /** d13: the capped variant's oracle must REPLICATE the banding (the
    * uncapped d06/d09 oracles go all-pairs, which a bucket cap cannot
    * express): band values via the same arithmetic-shift+mask math as
    * the engine (sign-extension is masked off identically in both), a
    * HAVING cap on bucket occupancy, candidate pairs only within kept
    * buckets, pair-level DISTINCT, hamming verify. So the cap SEMANTICS
    * are hash-checked end-to-end, not just spec-asserted. */
  private def simhashCappedSql(bits: Int, bands: Int, bandBits: Int,
      cap: Int): String = {
    val mask = (1L << bandBits) - 1
    s"""${simhashCteBits(bits)},
       |banded AS (
       |  SELECT doc_id, simhash, m AS band, (simhash >> (${bandBits} * m)) & $mask AS bv
       |  FROM sim, (SELECT unnest(range(0, $bands)) AS m)),
       |keep AS (
       |  SELECT band, bv FROM banded GROUP BY band, bv
       |  HAVING count(*) BETWEEN 2 AND $cap),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
       |    a.simhash AS sa, b.simhash AS sb
       |  FROM banded a
       |  JOIN keep k ON k.band = a.band AND k.bv = a.bv
       |  JOIN banded b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
       |SELECT CAST(bit_count(xor(sa, sb)) AS INT) AS hamming,
       |  count(*) AS n_pairs
       |FROM cand WHERE bit_count(xor(sa, sb)) <= ${bands - 1}
       |GROUP BY 1 ORDER BY hamming""".stripMargin
  }

  // ---- shared embedding prelude ----
  private val embPrelude =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (
      |  SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM e)""".stripMargin

  /** axis-aligned sign bucket — bit j from v[j+1] (1-based lists). */
  private def bucketExprBits(bits: Int): String = (0 until bits)
    .map(j => s"(CASE WHEN v[${j + 1}] > 0.0 THEN ${1L << j} ELSE 0 END)")
    .mkString(" + ")
  private val bucketExpr = bucketExprBits(8)

  /** s06d/s07 shared build: the TWO-LEVEL IVF membership in SQL — 16
    * seed centroids, 4 anchors (lowest cids), seed/fine centroids grouped
    * under their nearest anchor, every point probing only its anchor's
    * group in BOTH assignment rounds (seed assign → quantized Lloyd →
    * final). row_number rk=1 ≡ the engine's min(struct(d2, cid)). */
  /** ONE definition of the nearest-centroid ranking arithmetic — the
    * squared-L2 via the dot-product expansion, centroid id as the
    * deterministic tie-break (≡ the engine's min(struct(d2, cid))). Every
    * assignment round in the hier/ivf/pq preludes ranks with THIS string,
    * so a fix to the expansion or the tie-break lands everywhere at once
    * instead of across ten hand-copied ORDER BY clauses. */
  private def d2Rank(ptNorm: String, ptV: String, centV: String,
      centId: String): String =
    s"""$ptNorm + list_dot_product($centV, $centV)
       |        - 2.0 * list_dot_product($ptV, $centV), $centId""".stripMargin

  private val hierCellsPrelude =
    s"""$embPrelude,
       |seeds AS (
       |  SELECT vec_id AS cid, v AS cv FROM n ORDER BY vec_id LIMIT 16),
       |an0 AS (SELECT cid AS acid, cv AS acv FROM seeds ORDER BY cid LIMIT 4),
       |s2a AS (
       |  SELECT cid, cv, acid FROM (
       |    SELECT s.cid, s.cv, a.acid,
       |      row_number() OVER (PARTITION BY s.cid ORDER BY
       |        ${d2Rank("list_dot_product(s.cv, s.cv)", "s.cv", "a.acv", "a.acid")}) AS rk
       |    FROM seeds s CROSS JOIN an0 a) t WHERE rk = 1),
       |p0 AS (
       |  SELECT vec_id, v, n2, acid FROM (
       |    SELECT n.vec_id, n.v, n.n2, a.acid,
       |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |        ${d2Rank("n.n2", "n.v", "a.acv", "a.acid")}) AS rk
       |    FROM n CROSS JOIN an0 a) t WHERE rk = 1),
       |a0 AS (
       |  SELECT vec_id, v, cid FROM (
       |    SELECT p.vec_id, p.v, s.cid,
       |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |        ${d2Rank("p.n2", "p.v", "s.cv", "s.cid")}) AS rk
       |    FROM p0 p JOIN s2a s ON p.acid = s.acid) t WHERE rk = 1),
       |dims AS (
       |  SELECT cid, d['dim'] AS dim,
       |    CAST(floor(d['x'] * 1048576.0 + 0.5) AS BIGINT) AS xi
       |  FROM (SELECT cid, unnest(list_transform(range(1, len(v) + 1),
       |          i -> struct_pack(dim := i, x := v[i]))) AS d FROM a0)),
       |cm AS (
       |  SELECT cid, dim, CAST(sum(xi) AS DOUBLE) / count(*) / 1048576.0 AS m
       |  FROM dims GROUP BY cid, dim),
       |cents AS (
       |  SELECT cid, list(m ORDER BY dim) AS cv FROM cm GROUP BY cid),
       |an1 AS (SELECT cid AS acid, cv AS acv FROM cents ORDER BY cid LIMIT 4),
       |c2a AS (
       |  SELECT cid, cv, acid FROM (
       |    SELECT c.cid, c.cv, a.acid,
       |      row_number() OVER (PARTITION BY c.cid ORDER BY
       |        ${d2Rank("list_dot_product(c.cv, c.cv)", "c.cv", "a.acv", "a.acid")}) AS rk
       |    FROM cents c CROSS JOIN an1 a) t WHERE rk = 1),
       |p1 AS (
       |  SELECT vec_id, v, n2, acid FROM (
       |    SELECT n.vec_id, n.v, n.n2, a.acid,
       |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |        ${d2Rank("n.n2", "n.v", "a.acv", "a.acid")}) AS rk
       |    FROM n CROSS JOIN an1 a) t WHERE rk = 1),
       |cells AS (
       |  SELECT vec_id, v, n2, cell FROM (
       |    SELECT p.vec_id, p.v, p.n2, c.cid AS cell,
       |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |        ${d2Rank("p.n2", "p.v", "c.cv", "c.cid")}) AS rk
       |    FROM p1 p JOIN c2a c ON p.acid = c.acid) t WHERE rk = 1)""".stripMargin

  /** s06d: the two-level membership + the s06c within-cell kNN tail. */
  private val s06dSql =
    s"""$hierCellsPrelude,
       |sc AS (
       |  SELECT q.vec_id AS qid, n.vec_id,
       |    list_dot_product(q.v, n.v) / sqrt(q.n2 * n.n2) AS cosr,
       |    CAST(floor(list_dot_product(q.v, n.v) / sqrt(q.n2 * n.n2) * 1e6 + 0.5) AS BIGINT) AS cos
       |  FROM cells n JOIN cells q
       |    ON n.cell = q.cell AND n.vec_id != q.vec_id),
       |r AS (
       |  SELECT qid, vec_id, cosr,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
       |  FROM sc)
       |SELECT qid, rk, vec_id AS neighbor,
       |  floor(cosr * 1e4 + 0.5) / 1e4 AS sim
       |FROM r WHERE rk <= 3 ORDER BY qid, rk""".stripMargin

  /** g02 twin: kNN edges as in the s06 template, then `iters` PageRank
    * steps unrolled as chained CTEs. All rank arithmetic is quantized
    * BIGINT (exact `//` contributions, exact sums, floor-quantized
    * teleport/damping scalars) so the unrolled SQL reproduces the
    * engine's iterate bit-for-bit. */
  private def pagerankSql(iters: Int, full: Boolean = false): String = {
    // full form: per step, the previous ranks' dangling mass (vertices
    // absent from od) sums exactly and spreads as `dmass // n_v` extra
    // in-mass — mirrors the engine's broadcast 1-row aggregate
    val steps = (1 to iters).map { i =>
      val dangCte = if (full)
        s"""d$i AS (
           |  SELECT CAST(coalesce(sum(r.rq), 0) AS BIGINT) AS dmass
           |  FROM r${i - 1} r LEFT JOIN od ON r.vx = od.src
           |  WHERE od.src IS NULL),
           |""".stripMargin
      else ""
      val dangJoin = if (full) s" CROSS JOIN d$i dd" else ""
      val massExpr = if (full) "(coalesce(s.m, 0) + dd.dmass // nv.n_v)"
        else "coalesce(s.m, 0)"
      s"""${dangCte}r$i AS (
         |  SELECT v.vx,
         |    CAST(floor((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
         |         * 1000000000000.0 / nv.n_v) AS BIGINT)
         |    + CAST(floor(CAST(0.85 AS DOUBLE) * $massExpr) AS BIGINT) AS rq
         |  FROM verts v CROSS JOIN nv$dangJoin
         |  LEFT JOIN (
         |    SELECT ed.dst, CAST(sum(r.rq // ed.odeg) AS BIGINT) AS m
         |    FROM ed JOIN r${i - 1} r ON ed.src = r.vx GROUP BY ed.dst) s
         |  ON v.vx = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""$embPrelude,
       |nb AS (SELECT vec_id, v, n2, $bucketExpr AS bucket FROM n),
       |sc AS (
       |  SELECT q.vec_id AS qid, n.vec_id,
       |    CAST(floor(list_dot_product(q.v, n.v) / sqrt(q.n2 * n.n2) * 1e6 + 0.5) AS BIGINT) AS cos
       |  FROM nb n JOIN nb q ON n.vec_id != q.vec_id AND n.bucket = q.bucket),
       |r AS (
       |  SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
       |  FROM sc),
       |edg AS (SELECT qid AS src, vec_id AS dst FROM r WHERE rk <= 3),
       |od AS (SELECT src, count(*) AS odeg FROM edg GROUP BY src),
       |ed AS (SELECT edg.src, edg.dst, od.odeg FROM edg JOIN od USING (src)),
       |verts AS (SELECT vec_id AS vx FROM e),
       |nv AS (SELECT count(*) AS n_v FROM verts),
       |r0 AS (SELECT vx, 1000000000000 // n_v AS rq FROM verts CROSS JOIN nv),
       |$steps
       |SELECT vx, rq AS rank_q FROM r$iters
       |ORDER BY rq DESC, vx LIMIT 20""".stripMargin
  }

  private def knnSql(useBucket: Boolean, k: Int,
                     queryPred: String = "vec_id < 10",
                     bits: Int = 8): String = {
    val bucketCol = if (useBucket) s", ${bucketExprBits(bits)} AS bucket" else ""
    val bucketJoin = if (useBucket) "AND n.bucket = q.qbucket" else ""
    val qBucket = if (useBucket) ", bucket AS qbucket" else ""
    s"""$embPrelude,
       |nb AS (
       |  SELECT vec_id, v, n2$bucketCol FROM n),
       |q AS (
       |  SELECT vec_id AS qid, v AS qv, n2 AS qn2$qBucket FROM nb WHERE $queryPred),
       |sc AS (
       |  SELECT qid, n.vec_id, list_dot_product(qv, n.v) / sqrt(qn2 * n.n2) AS cosr,
       |    CAST(floor(list_dot_product(qv, n.v) / sqrt(qn2 * n.n2) * 1e6 + 0.5) AS BIGINT) AS cos
       |  FROM nb n JOIN q ON n.vec_id != q.qid $bucketJoin),
       |r AS (
       |  SELECT qid, vec_id, cosr,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
       |  FROM sc)
       |SELECT qid, rk, vec_id AS neighbor, floor(cosr * 1e4 + 0.5) / 1e4 AS sim
       |FROM r WHERE rk <= $k ORDER BY qid, rk""".stripMargin
  }

  /** s03/s04: the full IVF build re-expressed in SQL — seed pick,
    * assignment by (d2, cid) window, QUANTIZED-integer-sum Lloyd means
    * (exactly the engine's arithmetic — see SimilarityQueries.s03 for why
    * that makes the centroids engine- and partitioning-invariant),
    * re-assignment, NPROBE-cell probe, cosine re-rank. */
  private def ivfSql(nProbe: Int): String = ivfSqlTemplate.replace("NPROBE", nProbe.toString)

  /** The shared IVF build through cell membership — consumed by the
    * s03/s04 ANN template and the d10 SemDeDup oracle (mirrors the Spark
    * side's shared `ivfRanked`). */
  private val ivfCellsPrelude =
    s"""$embPrelude,
       |seeds AS (
       |  SELECT vec_id AS cid, v AS cv FROM n ORDER BY vec_id LIMIT 16),
       |a0 AS (
       |  SELECT n.vec_id, n.v, n.cid FROM (
       |    SELECT n.vec_id, n.v, s.cid,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ${d2Rank("n.n2", "n.v", "s.cv", "s.cid")}) AS rk
       |    FROM n CROSS JOIN seeds s) n WHERE rk = 1),
       |dims AS (
       |  SELECT cid, d['dim'] AS dim,
       |    CAST(floor(d['x'] * 1048576.0 + 0.5) AS BIGINT) AS xi
       |  FROM (SELECT cid, unnest(list_transform(range(1, len(v) + 1),
       |          i -> struct_pack(dim := i, x := v[i]))) AS d FROM a0)),
       |cm AS (
       |  SELECT cid, dim, CAST(sum(xi) AS DOUBLE) / count(*) / 1048576.0 AS m
       |  FROM dims GROUP BY cid, dim),
       |cents AS (
       |  SELECT cid, list(m ORDER BY dim) AS cv FROM cm GROUP BY cid),
       |fr AS (
       |  SELECT n.vec_id, n.v, n.n2, c.cid,
       |    row_number() OVER (PARTITION BY n.vec_id
       |      ORDER BY ${d2Rank("n.n2", "n.v", "c.cv", "c.cid")}) AS rk
       |  FROM n CROSS JOIN cents c),
       |cells AS (
       |  SELECT vec_id, v, n2, cid AS cell FROM fr WHERE rk = 1)""".stripMargin

  private val ivfSqlTemplate =
    s"""$ivfCellsPrelude,
       |q AS (
       |  SELECT vec_id AS qid, v AS qv, n2 AS qn2, cid AS qcell
       |  FROM fr WHERE rk <= NPROBE AND vec_id < 10),
       |sc AS (
       |  SELECT qid, c.vec_id,
       |    list_dot_product(qv, c.v) / sqrt(qn2 * c.n2) AS cosr,
       |    CAST(floor(list_dot_product(qv, c.v) / sqrt(qn2 * c.n2) * 1e6 + 0.5) AS BIGINT) AS cos
       |  FROM cells c JOIN q ON c.cell = q.qcell AND c.vec_id != q.qid),
       |r AS (
       |  SELECT qid, vec_id, cosr,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
       |  FROM sc)
       |SELECT qid, rk, vec_id AS neighbor, floor(cosr * 1e4 + 0.5) / 1e4 AS sim
       |FROM r WHERE rk <= 5 ORDER BY qid, rk""".stripMargin

  /** s05's oracle: the full IVF-PQ pipeline in SQL — per-subspace seed →
    * integer-quantized Lloyd step → densified codeword ids → encode →
    * per-query integer partial-distance table → exact-integer ADC sum →
    * top-20 candidates → exact cosine re-rank. Mirrors the Spark side
    * expression for expression (list_dot_product ≡ graft_dot: same
    * left-to-right double accumulation; ADC terms quantized ×2^20 to
    * BIGINT so the 4-term sum is associative in both engines). */
  private val ivfpqSql =
    s"""$ivfCellsPrelude,
       |ms AS (SELECT unnest(range(0, 4)) AS m),
       |sub AS (
       |  SELECT vec_id, m, list_slice(v, m*16 + 1, m*16 + 16) AS sv FROM n, ms),
       |pseed AS (
       |  SELECT m, vec_id AS scid, list_slice(v, m*16 + 1, m*16 + 16) AS scv
       |  FROM (SELECT vec_id, v FROM n ORDER BY vec_id LIMIT 8), ms),
       |a0p AS (
       |  SELECT vec_id, m, sv, scid FROM (
       |    SELECT s.vec_id, s.m, s.sv, p.scid,
       |      row_number() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY ${d2Rank("list_dot_product(s.sv, s.sv)", "s.sv", "p.scv", "p.scid")}) AS rk
       |    FROM sub s JOIN pseed p ON s.m = p.m) WHERE rk = 1),
       |pdim AS (
       |  SELECT m, scid, d['dim'] AS dim,
       |    CAST(floor(d['x'] * 1048576.0 + 0.5) AS BIGINT) AS xi
       |  FROM (SELECT m, scid, unnest(list_transform(range(1, len(sv) + 1),
       |          i -> struct_pack(dim := i, x := sv[i]))) AS d FROM a0p)),
       |pcm AS (
       |  SELECT m, scid, dim, CAST(sum(xi) AS DOUBLE) / count(*) / 1048576.0 AS mu
       |  FROM pdim GROUP BY m, scid, dim),
       |cb AS (
       |  SELECT m, scid, list(mu ORDER BY dim) AS cv FROM pcm GROUP BY m, scid),
       |cbx AS (
       |  SELECT m, scid, cv,
       |    row_number() OVER (PARTITION BY m ORDER BY scid) - 1 AS cix FROM cb),
       |enc AS (
       |  SELECT vec_id, m, cix FROM (
       |    SELECT s.vec_id, s.m, c.cix,
       |      row_number() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY ${d2Rank("list_dot_product(s.sv, s.sv)", "s.sv", "c.cv", "c.scid")}) AS rk
       |    FROM sub s JOIN cbx c ON s.m = c.m) WHERE rk = 1),
       |q AS (
       |  SELECT vec_id AS qid, v AS qv, n2 AS qn2, cid AS qcell
       |  FROM fr WHERE rk = 1 AND vec_id < 10),
       |qsub AS (
       |  SELECT qid, m, list_slice(qv, m*16 + 1, m*16 + 16) AS qsv FROM q, ms),
       |pd AS (
       |  SELECT qs.qid, c.m * 8 + c.cix AS idx,
       |    CAST(floor((list_dot_product(qs.qsv, qs.qsv) + list_dot_product(c.cv, c.cv)
       |      - 2.0 * list_dot_product(qs.qsv, c.cv)) * 1048576.0 + 0.5) AS BIGINT) AS pdq
       |  FROM qsub qs JOIN cbx c ON qs.m = c.m),
       |adc AS (
       |  SELECT q.qid, cl.vec_id, CAST(sum(p.pdq) AS BIGINT) AS adist
       |  FROM cells cl
       |  JOIN q ON cl.cell = q.qcell AND cl.vec_id != q.qid
       |  JOIN enc e2 ON e2.vec_id = cl.vec_id
       |  JOIN pd p ON p.qid = q.qid AND p.idx = e2.m * 8 + e2.cix
       |  GROUP BY q.qid, cl.vec_id),
       |cand AS (
       |  SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS crk
       |  FROM adc),
       |rr AS (
       |  SELECT c.qid, c.vec_id,
       |    list_dot_product(q.qv, cl.v) / sqrt(q.qn2 * cl.n2) AS cosr,
       |    CAST(floor(list_dot_product(q.qv, cl.v) / sqrt(q.qn2 * cl.n2) * 1e6 + 0.5) AS BIGINT) AS cos
       |  FROM cand c JOIN q ON c.qid = q.qid
       |  JOIN cells cl ON cl.vec_id = c.vec_id
       |  WHERE c.crk <= 20),
       |r AS (
       |  SELECT qid, vec_id, cosr,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
       |  FROM rr)
       |SELECT qid, rk, vec_id AS neighbor, floor(cosr * 1e4 + 0.5) / 1e4 AS sim
       |FROM r WHERE rk <= 5 ORDER BY qid, rk""".stripMargin

  /** The s07-family recall audit over a cell-membership prelude (which
    * must define CTEs `n` — vectors with norms — and `cells`): within-
    * cell top-3 graph edges vs the unblocked brute-force top-3, recall
    * as exact integer counts. `queryMod` is the engine's query-sample
    * knob: both sides audit only vec_id ≡ 0 mod m (m=1 → every query),
    * the neighbor side always the full corpus. */
  private def recallAuditSql(prelude: String, queryMod: Int): String = {
    val qs = if (queryMod == 1) "" else s" AND q.vec_id % $queryMod = 0"
    s"""$prelude,
       |asc0 AS (
       |  SELECT q.vec_id AS qid, n.vec_id,
       |    CAST(floor(list_dot_product(q.v, n.v) / sqrt(q.n2 * n.n2) * 1e6 + 0.5) AS BIGINT) AS cos
       |  FROM cells n JOIN cells q
       |    ON n.cell = q.cell AND n.vec_id != q.vec_id$qs),
       |approx AS (
       |  SELECT qid, vec_id AS neighbor FROM (
       |    SELECT qid, vec_id,
       |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
       |    FROM asc0) t WHERE rk <= 3),
       |tsc AS (
       |  SELECT q.vec_id AS qid, n.vec_id,
       |    CAST(floor(list_dot_product(q.v, n.v) / sqrt(q.n2 * n.n2) * 1e6 + 0.5) AS BIGINT) AS cos
       |  FROM n JOIN n q ON n.vec_id != q.vec_id$qs),
       |truth AS (
       |  SELECT qid, vec_id AS neighbor FROM (
       |    SELECT qid, vec_id,
       |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
       |    FROM tsc) t WHERE rk <= 3),
       |hit AS (
       |  SELECT truth.qid FROM truth JOIN approx
       |    ON truth.qid = approx.qid AND truth.neighbor = approx.neighbor)
       |SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
       |  (SELECT CAST(count(*) AS BIGINT) FROM approx) AS n_approx,
       |  (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_hit,
       |  CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 0.0
       |       ELSE floor((SELECT count(*) FROM hit)::DOUBLE /
       |            (SELECT count(*) FROM truth) * 10000 + 0.5) / 10000
       |  END AS recall""".stripMargin
  }

  private val t17Sql: String =
    """WITH ranked AS (
      |  SELECT lang, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS cnt
      |  FROM documents),
      |med AS (SELECT lang, n_chars AS med FROM ranked WHERE rn = (cnt+1)//2),
      |dev AS (
      |  SELECT d.lang, d.doc_id, d.n_chars, abs(d.n_chars - m.med) AS dv
      |  FROM documents d JOIN med m ON d.lang = m.lang),
      |rdev AS (
      |  SELECT lang, dv,
      |    row_number() OVER (PARTITION BY lang ORDER BY dv, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS cnt
      |  FROM dev),
      |mad AS (SELECT lang, dv AS mad FROM rdev WHERE rn = (cnt+1)//2)
      |SELECT d.lang, d.doc_id, d.n_chars, d.dv
      |FROM dev d JOIN mad m ON d.lang = m.lang
      |WHERE d.dv > 2 * m.mad
      |ORDER BY d.lang, d.doc_id""".stripMargin

  // d04/d14/d15/t11 share ONE 3-shingle candidate space: a single
  // definition (the minhashCte discipline) so the jaccard/containment
  // family's shingle eligibility cannot silently desynchronize across
  // hand-copied preludes.
  private val shingleCte =
    """w AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh0 AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |  FROM w)""".stripMargin

  private val shingleExCte =
    s"""$shingleCte,
       |ex AS (SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM sh0)""".stripMargin

  // d16/d17 share ONE SQL value: d17's claim is that deletion-neighborhood
  // blocking is LOSSLESS for lev <= 2 — the listing must be identical to
  // d16's, only the candidate space differs. A single val makes that
  // identity structural (two hand-copied literals could silently drift,
  // degrading the losslessness pin to an unchecked assertion) — the
  // t17Sql / q38Sql sharing discipline.
  private val fuzzyVocabSql =
    """WITH v AS (
      |  SELECT tok, count(*) AS n, length(tok) AS len FROM (
      |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok),
      |b AS (SELECT tok, n, len, unnest([len - 2, len - 1, len]) AS bkt FROM v)
      |SELECT a.tok AS tok_a, b.tok AS tok_b,
      |  levenshtein(a.tok, b.tok) AS dist, a.n AS na, b.n AS nb
      |FROM v a JOIN b ON a.len = b.bkt
      | AND (a.len < b.len OR (a.len = b.len AND a.tok < b.tok))
      |WHERE levenshtein(a.tok, b.tok) <= 2
      |ORDER BY tok_a, tok_b""".stripMargin

  val all: Map[String, String] = Map(
    // t16: the same positional posting-list intersection, in SQL —
    // generate_subscripts gives 1-based positions where posexplode is
    // 0-based, but adjacency (pos+1) is shift-invariant
    "t16_phrase_search" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents)
        |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occ
        |FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |WHERE a.w = 'hash' AND b.w = 'value'
        |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin,
    // t17/t17b: identical lower-median selection (rank ⌊(n+1)/2⌋) — exact
    // BIGINT medians, no interpolation. t17b finds the same medians by
    // histogram running-count selection; one oracle proves sort-window
    // and histogram selection are the same statistic
    "t17b_outlier_mad_hist" -> t17Sql,
    "t17_outlier_mad" -> t17Sql,
    "s03_knn_ivf" -> ivfSql(1),
    "s04_knn_ivf_multiprobe" -> ivfSql(2),
    "s05_knn_ivfpq" -> ivfpqSql,
    // same cells as s03; drop policy = lower-id neighbor at cos >= 0.4
    // (d05's threshold + rounding convention; blocking is the difference)
    "d10_semdedup" ->
      s"""$ivfCellsPrelude,
         |d AS (
         |  SELECT DISTINCT b.vec_id AS dropped_id
         |  FROM cells a JOIN cells b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE floor(list_dot_product(a.v, b.v) / sqrt(a.n2 * b.n2) * 1e4 + 0.5) / 1e4 >= 0.4)
         |SELECT c.vec_id, c.cell,
         |  CASE WHEN d.dropped_id IS NULL THEN 1 ELSE 0 END AS kept
         |FROM cells c LEFT JOIN d ON c.vec_id = d.dropped_id
         |ORDER BY c.vec_id""".stripMargin,
    // s06c: kNN-graph on the same IVF cells d10 blocks on — the prelude
    // replicates the engine's build (seeds, quantized Lloyd step,
    // re-assignment), then within-cell candidates rank by the s01/s06
    // round-then-tiebreak discipline.
    "s06c_knn_ivf_graph" ->
      s"""$ivfCellsPrelude,
         |sc AS (
         |  SELECT q.vec_id AS qid, n.vec_id,
         |    list_dot_product(q.v, n.v) / sqrt(q.n2 * n.n2) AS cosr,
         |    CAST(floor(list_dot_product(q.v, n.v) / sqrt(q.n2 * n.n2) * 1e6 + 0.5) AS BIGINT) AS cos
         |  FROM cells n JOIN cells q
         |    ON n.cell = q.cell AND n.vec_id != q.vec_id),
         |r AS (
         |  SELECT qid, vec_id, cosr,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
         |  FROM sc)
         |SELECT qid, rk, vec_id AS neighbor,
         |  floor(cosr * 1e4 + 0.5) / 1e4 AS sim
         |FROM r WHERE rk <= 3 ORDER BY qid, rk""".stripMargin,
    // s06d: the TWO-LEVEL assignment replicated choice-for-choice — 4
    // anchor centroids (lowest cids), seed/fine centroids grouped under
    // their nearest anchor, each point probing only its anchor's group,
    // in BOTH assignment rounds (seed assign → quantized Lloyd → final).
    // row_number rk=1 here ≡ the engine's min(struct(d2, cid)) arg-min.
    "s06d_knn_ivf_hier" -> s06dSql,
    // c17: d02's banding CTE + c02's split expression; quarantine =
    // train docs adjacent (candidate pair) to any val/test doc.
    "c17_decontaminated_split" ->
      s"""WITH $minhashCte,
         |sp AS (
         |  SELECT doc_id, n_chars,
         |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'cb' THEN 'train'
         |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'e5' THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |adj AS (
         |  SELECT p.doc_a, p.doc_b, a.split AS sa, b.split AS sb
         |  FROM pairs p
         |  JOIN sp a ON p.doc_a = a.doc_id
         |  JOIN sp b ON p.doc_b = b.doc_id),
         |cont AS (
         |  SELECT doc_a AS doc_id FROM adj WHERE sa = 'train' AND sb != 'train'
         |  UNION
         |  SELECT doc_b FROM adj WHERE sb = 'train' AND sa != 'train'),
         |f AS (
         |  SELECT CASE WHEN sp.split = 'train' AND cont.doc_id IS NOT NULL
         |              THEN 'quarantined' ELSE sp.split END AS bucket, n_chars
         |  FROM sp LEFT JOIN cont ON sp.doc_id = cont.doc_id)
         |SELECT bucket, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM f GROUP BY bucket ORDER BY bucket""".stripMargin,
    // e04: 64-bit sign signature via the d09 bit-63 two's-complement
    // convention; hamming = bit_count(xor) — exact integers both sides;
    // rank windows carry the e03 round-6 discipline.
    "e04_signbit_recall" ->
      s"""$embPrelude,
         |sb AS (
         |  SELECT vec_id, v, n2,
         |    CAST(${bucketExprBits(64)} AS BIGINT) AS sig FROM n),
         |q AS (
         |  SELECT vec_id AS qid, v AS qv, n2 AS qn2, sig AS qsig
         |  FROM sb WHERE vec_id < 10),
         |sc AS (
         |  SELECT qid, s.vec_id,
         |    CAST(floor(list_dot_product(qv, s.v) / sqrt(qn2 * s.n2) * 1e6 + 0.5) AS BIGINT) AS cosf,
         |    bit_count(xor(s.sig, qsig)) AS ham
         |  FROM sb s JOIN q ON s.vec_id != q.qid),
         |r AS (
         |  SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY cosf DESC, vec_id) AS rkf,
         |    row_number() OVER (PARTITION BY qid ORDER BY ham ASC, vec_id) AS rkh
         |  FROM sc)
         |SELECT qid,
         |  CAST(sum(CASE WHEN rkf <= 5 AND rkh <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  floor(sum(CASE WHEN rkf <= 5 AND rkh <= 5 THEN 1 ELSE 0 END) / 5.0 * 1e4 + 0.5) / 1e4
         |    AS recall
         |FROM r GROUP BY qid ORDER BY qid""".stripMargin,
    // s07b: identical audit against the FLAT-assignment cells (the s03/
    // d10/s06c build) — the (s07, s07b) pair separates blocking loss
    // from hierarchy routing loss.
    "s07b_flat_knn_recall" -> recallAuditSql(ivfCellsPrelude, queryMod = 1),
    // s07: the s06d membership build verbatim, its within-cell top-3
    // edges vs the unblocked brute-force top-3 — recall as exact counts.
    "s07_hier_knn_recall" -> recallAuditSql(hierCellsPrelude, queryMod = 1),
    // s07c: s07 on the 1-in-5 query sample — the audit form a deployment
    // runs; the sample predicate restricts the QUERY side of both truth
    // and graph edges, mirroring the engine's queryMod knob exactly.
    "s07c_hier_knn_recall_sampled" -> recallAuditSql(hierCellsPrelude, queryMod = 5),

    "d01_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keeper""".stripMargin,

    // exact: grouping key IS the gram; len<40 docs excluded on both sides
    "d11_shared_passages" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 40) AS gram
        |  FROM documents,
        |       LATERAL unnest(generate_series(1, len(text) - 39)) AS t(i)
        |  WHERE len(text) >= 40)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |GROUP BY doc_a, doc_b
        |ORDER BY doc_a, doc_b""".stripMargin,

    // d11 with the posting-size cap: grams shared by more than 64 docs are
    // excluded from pair generation (the boilerplate hot-tail guard)
    "d12_shared_passages_capped" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 40) AS gram
        |  FROM documents,
        |       LATERAL unnest(generate_series(1, len(text) - 39)) AS t(i)
        |  WHERE len(text) >= 40),
        |keep AS (
        |  SELECT gram FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 64)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |WHERE a.gram IN (SELECT gram FROM keep)
        |GROUP BY doc_a, doc_b
        |ORDER BY doc_a, doc_b""".stripMargin,

    "d02_minhash_lsh" -> minhashSql,

    "d03_simhash" -> simhashSql,

    "d06_simhash_pairs" -> simhashPairsSql,
    "d09_simhash64_pairs" -> simhashPairsSqlBits(64),
    "d13_simhash64_capped" -> simhashCappedSql(64, 4, 16, 256),

    "d07_dedup_clusters" -> dedupClustersSql,

    "d08_lsh_recall" ->
      s"""WITH $minhashCte,
         |jsh AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    range(1, len(w) - 1),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
         |  FROM w),
         |jex AS (SELECT doc_id, unnest(sh) AS s, len(sh) AS n FROM jsh),
         |exact AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM jex a JOIN jex b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |  HAVING floor(count(*)::DOUBLE /
         |    (any_value(a.n) + any_value(b.n) - count(*)) * 10000 + 0.5) / 10000 >= 0.6),
         |hit AS (
         |  SELECT exact.doc_a FROM exact JOIN pairs
         |    ON exact.doc_a = pairs.doc_a AND exact.doc_b = pairs.doc_b)
         |SELECT
         |  (SELECT count(*) FROM exact) AS n_exact,
         |  (SELECT count(*) FROM pairs) AS n_candidates,
         |  (SELECT count(*) FROM hit) AS n_hit,
         |  CASE WHEN (SELECT count(*) FROM exact) = 0 THEN 0.0
         |       ELSE floor((SELECT count(*) FROM hit)::DOUBLE /
         |         (SELECT count(*) FROM exact) * 10000 + 0.5) / 10000
         |  END AS recall""".stripMargin,

    "e02_centroid_sim" ->
      """WITH e AS (
        |  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |dm AS (
        |  SELECT label, s['d'] AS d, s['qx'] AS qx FROM (
        |    SELECT label, unnest(list_transform(range(1, len(v) + 1),
        |      i -> struct_pack(d := i, qx := CAST(floor(v[i] * 1024.0 + 0.5) AS BIGINT)))) AS s
        |    FROM e)),
        |c AS (
        |  SELECT label, d, CAST(sum(qx) AS BIGINT) AS sx FROM dm GROUP BY label, d),
        |n AS (
        |  SELECT label, sum(CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT)) AS n2
        |  FROM c GROUP BY label),
        |p AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |    sum(CAST(a.sx AS HUGEINT) * CAST(b.sx AS HUGEINT)) AS dq
        |  FROM c a JOIN c b ON a.d = b.d AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT label_a, label_b,
        |  floor(CAST(dq AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS cos
        |FROM p JOIN n na ON p.label_a = na.label JOIN n nb ON p.label_b = nb.label
        |ORDER BY label_a, label_b""".stripMargin,
    "e01_embedding_quantize" ->
      s"""$embPrelude,
         |sc AS (
         |  SELECT vec_id, v, n2,
         |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale0
         |  FROM n)
         |SELECT vec_id, len(v) AS dim,
         |  floor(sqrt(n2) * 1e4 + 0.5) / 1e4 AS l2,
         |  floor(scale0 * 1e4 + 0.5) / 1e4 AS scale,
         |  CASE WHEN scale0 = 0 THEN 0
         |       ELSE CAST(list_sum(list_transform(v, x -> floor(x / scale0 + 0.5))) AS BIGINT)
         |  END AS q_sum
         |FROM sc ORDER BY vec_id""".stripMargin,

    "d04_ngram_jaccard" ->
      s"""WITH $shingleExCte,
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    floor(count(*)::DOUBLE /
        |      (any_value(a.n) + any_value(b.n) - count(*)) * 10000 + 0.5) / 10000 AS jaccard
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, jaccard FROM pairs
        |WHERE jaccard >= 0.6 ORDER BY doc_a, doc_b""".stripMargin,

    "d05_embed_neardup" ->
      s"""$embPrelude,
         |nb AS (
         |  SELECT vec_id, v, n2, $bucketExpr AS bucket FROM n)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  floor(list_dot_product(a.v, b.v) / sqrt(a.n2 * b.n2) * 1e4 + 0.5) / 1e4 AS cos
         |FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE floor(list_dot_product(a.v, b.v) / sqrt(a.n2 * b.n2) * 1e4 + 0.5) / 1e4 >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    "s01_knn_brute" -> knnSql(useBucket = false, k = 10),
    "s02_knn_lsh" -> knnSql(useBucket = true, k = 5),
    // s06: the kNN-graph — every vector is a query (same template, the
    // query predicate widens to the whole corpus, k = 3). s06b is the
    // 12-bit wide-bucket form: the corpus-size-dependent scale knob,
    // probe-measured (SOAK_r09b) to restore linear candidate growth.
    "s06_knn_join" -> knnSql(useBucket = true, k = 3, queryPred = "TRUE"),
    // e03: both rankings from one scored row set; the 6-decimal rounds
    // happen before both rank windows, same as s01/s06.
    "e03_matryoshka_recall" ->
      s"""$embPrelude,
         |t AS (
         |  SELECT vec_id, v, n2, v[1:16] AS v16,
         |    list_dot_product(v[1:16], v[1:16]) AS n16 FROM n
         |  WHERE list_dot_product(v[1:16], v[1:16]) > 0),
         |q AS (
         |  SELECT vec_id AS qid, v AS qv, n2 AS qn2, v16 AS qv16, n16 AS qn16
         |  FROM t WHERE vec_id < 10),
         |sc AS (
         |  SELECT qid, t.vec_id,
         |    CAST(floor(list_dot_product(qv, t.v) / sqrt(qn2 * t.n2) * 1e6 + 0.5) AS BIGINT) AS cosf,
         |    CAST(floor(list_dot_product(qv16, t.v16) / sqrt(qn16 * t.n16) * 1e6 + 0.5) AS BIGINT) AS cost
         |  FROM t JOIN q ON t.vec_id != q.qid),
         |r AS (
         |  SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY cosf DESC, vec_id) AS rkf,
         |    row_number() OVER (PARTITION BY qid ORDER BY cost DESC, vec_id) AS rkt
         |  FROM sc)
         |SELECT qid,
         |  CAST(sum(CASE WHEN rkf <= 5 AND rkt <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  floor(sum(CASE WHEN rkf <= 5 AND rkt <= 5 THEN 1 ELSE 0 END) / 5.0 * 1e4 + 0.5) / 1e4
         |    AS recall
         |FROM r GROUP BY qid ORDER BY qid""".stripMargin,
    // d16: levenshtein agrees between engines (classic unit-cost DP);
    // the length-bucket explode and (len, token) pair dedup mirror the
    // engine exactly.
    "d16_fuzzy_vocab" -> fuzzyVocabSql,
    // d17: SAME oracle as d16 STRUCTURALLY (one shared val) — deletion-
    // neighborhood blocking is lossless for lev <= 2, so the listing is
    // identical; only the candidate space differs. The shared SQL IS the
    // claim.
    "d17_fuzzy_vocab_blocked" -> fuzzyVocabSql,
    // d15: d14 with the posting cap replicated — the pair space is
    // restricted to shingles shared by <= 64 docs; denominators stay the
    // full per-doc counts, exactly as the engine declares.
    "d15_containment_capped" ->
      s"""WITH $shingleExCte,
        |keep AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= 64),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN keep USING (s) JOIN ex b
        |    ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |bd AS (
        |  SELECT doc_a AS contained, doc_b AS container,
        |    floor(inter / na * 10000 + 0.5) / 10000 AS containment FROM pairs
        |  UNION ALL
        |  SELECT doc_b, doc_a,
        |    floor(inter / nb * 10000 + 0.5) / 10000 FROM pairs)
        |SELECT contained, container, containment FROM bd
        |WHERE containment >= 0.8 ORDER BY contained, container""".stripMargin,
    // d14: d04's pair derivation, both containment directions from the
    // single unordered pair row.
    "d14_containment" ->
      s"""WITH $shingleExCte,
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |bd AS (
        |  SELECT doc_a AS contained, doc_b AS container,
        |    floor(inter / na * 10000 + 0.5) / 10000 AS containment FROM pairs
        |  UNION ALL
        |  SELECT doc_b, doc_a,
        |    floor(inter / nb * 10000 + 0.5) / 10000 FROM pairs)
        |SELECT contained, container, containment FROM bd
        |WHERE containment >= 0.8 ORDER BY contained, container""".stripMargin,
    // g02: same s06 edge derivation, then 8 UNROLLED PageRank iterations
    // (generated below) on quantized-integer rank mass — exact integer
    // sums make the iterate identical across engines; see
    // GraphQueries.RankScale for why doubles can't carry iterated rank.
    "g02_pagerank" -> pagerankSql(iters = 8),
    "g02b_pagerank_full" -> pagerankSql(iters = 8, full = true),
    // g01: the s06 edge derivation (same bucket/round/rank discipline)
    // feeds a degree-oriented triangle count — orientation, wedge
    // ordering, and the closing-edge EXISTS mirror the engine exactly.
    "g01_knn_triangles" ->
      s"""$embPrelude,
         |nb AS (SELECT vec_id, v, n2, $bucketExpr AS bucket FROM n),
         |sc AS (
         |  SELECT q.vec_id AS qid, n.vec_id,
         |    CAST(floor(list_dot_product(q.v, n.v) / sqrt(q.n2 * n.n2) * 1e6 + 0.5) AS BIGINT) AS cos
         |  FROM nb n JOIN nb q ON n.vec_id != q.vec_id AND n.bucket = q.bucket),
         |r AS (
         |  SELECT qid, vec_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
         |  FROM sc),
         |ed AS (
         |  SELECT DISTINCT least(qid, vec_id) AS a, greatest(qid, vec_id) AS b
         |  FROM r WHERE rk <= 3),
         |dg AS (
         |  SELECT vx, count(*) AS deg FROM (
         |    SELECT a AS vx FROM ed UNION ALL SELECT b AS vx FROM ed)
         |  GROUP BY vx),
         |orient AS (
         |  SELECT
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND ed.a < ed.b)
         |         THEN ed.a ELSE ed.b END AS src,
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND ed.a < ed.b)
         |         THEN ed.b ELSE ed.a END AS dst,
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND ed.a < ed.b)
         |         THEN db.deg ELSE da.deg END AS ddeg
         |  FROM ed JOIN dg da ON ed.a = da.vx JOIN dg db ON ed.b = db.vx),
         |wg AS (
         |  SELECT e1.dst AS x, e2.dst AS y
         |  FROM orient e1 JOIN orient e2 ON e1.src = e2.src
         |   AND (e1.ddeg < e2.ddeg OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))),
         |tri AS (
         |  SELECT count(*) AS n_triangles FROM wg
         |  WHERE EXISTS (SELECT 1 FROM orient o WHERE o.src = wg.x AND o.dst = wg.y)),
         |stats AS (
         |  SELECT count(*) AS n_vertices,
         |    CAST(sum(CAST(deg * (deg - 1) / 2 AS BIGINT)) AS BIGINT) AS n_wedges
         |  FROM dg),
         |ne AS (SELECT count(*) AS n_edges FROM ed)
         |SELECT stats.n_vertices, ne.n_edges, stats.n_wedges, tri.n_triangles,
         |  CASE WHEN stats.n_wedges = 0 THEN 0.0
         |       ELSE floor(3.0 * tri.n_triangles / stats.n_wedges * 1e4 + 0.5) / 1e4
         |  END AS gcc
         |FROM stats CROSS JOIN ne CROSS JOIN tri""".stripMargin,
    "s06b_knn_join_wide" -> knnSql(useBucket = true, k = 3, queryPred = "TRUE", bits = 12),

    "t01_lang_id" ->
      """WITH d AS (
        |  SELECT lang,
        |    CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS INTEGER) AS s_en,
        |    CAST((length(text) - length(replace(text, ' query ', ''))) / 7 AS INTEGER) AS s_q,
        |    CAST((length(text) - length(replace(text, ' join ', ''))) / 6 AS INTEGER) AS s_j
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN s_en >= s_q AND s_en >= s_j THEN 'en'
        |       WHEN s_q >= s_j THEN 'qry' ELSE 'jon' END AS predicted,
        |  count(*) AS n
        |FROM d GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,

    "t02_quality_score" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the','a','of','and','to','in'))) AS n_stop,
        |    length(text) AS n_chars2
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  floor(n_stop / n_tokens * 10000 + 0.5) / 10000 AS stop_ratio,
        |  floor((n_chars2 - n_tokens + 1) / n_tokens * 10000 + 0.5) / 10000 AS mean_tok_len,
        |  floor((least(n_tokens / 100.0, 1.0) * 0.5 +
        |         (floor(n_stop / n_tokens * 10000 + 0.5) / 10000) * 0.3 +
        |         least((floor((n_chars2 - n_tokens + 1) / n_tokens * 10000 + 0.5) / 10000) / 10.0, 1.0) * 0.2)
        |        * 10000 + 0.5) / 10000 AS quality
        |FROM d ORDER BY doc_id""".stripMargin,

    "t08_quality_bins" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the','a','of','and','to','in'))) AS n_stop,
        |    length(text) AS n_chars2
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, n_tokens,
        |    floor((least(n_tokens / 100.0, 1.0) * 0.5 +
        |           (floor(n_stop / n_tokens * 10000 + 0.5) / 10000) * 0.3 +
        |           least((floor((n_chars2 - n_tokens + 1) / n_tokens * 10000 + 0.5) / 10000) / 10.0, 1.0) * 0.2)
        |          * 10000 + 0.5) / 10000 AS quality
        |  FROM d),
        |b AS (
        |  SELECT n_tokens, quality,
        |    -- NULLS FIRST: the engine's qb=-1 bucket sorts null-quality
        |    -- docs before every real score; DuckDB's default is NULLS LAST
        |    ntile(10) OVER (ORDER BY quality NULLS FIRST, doc_id) AS decile
        |  FROM q)
        |SELECT decile, count(*) AS n_docs,
        |  min(quality) AS min_q, max(quality) AS max_q,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM b GROUP BY decile ORDER BY decile""".stripMargin,

    // t11: same distinct-3-shingle construction as the minhash CTE;
    // "recycled" = the shingle's min owning doc_id is smaller
    "t11_novelty" ->
      s"""WITH $shingleCte,
        |sh AS (SELECT doc_id, unnest(sh) AS s FROM sh0),
        |own AS (SELECT s, min(doc_id) AS owner FROM sh GROUP BY s)
        |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN own.owner < sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_recycled,
        |  floor(CAST(sum(CASE WHEN own.owner < sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) * 1e4 + 0.5) / 1e4 AS recycled_ratio
        |FROM sh JOIN own USING (s)
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,

    // t12: Spark's sum(when)/count division is exact-integer-operand
    // double division, so hapax_ratio is bit-identical; zipf_slope goes
    // through regr_slope in both engines with the same ln() inputs and
    // the floor-based 4-decimal rounding absorbing algorithmic last-ulp
    // differences in the aggregate.
    // t13: mirrors the engine's expression tree exactly (same literal
    // constants 2.2 / 1.2 / 0.25 / 0.75, same association order), with
    // the 6-decimal floor-round applied BEFORE the rank window so the
    // (score desc, doc_id) order can't diverge on last-ulp ln noise.
    // t14: integral inverse-probability rarity — exact integer floor
    // division everywhere, so the two engines agree bit-for-bit.
    // t15: lift in 1e4 fixed-point BIGINT floor-division on both engines
    // (the t14 log-free discipline); support floor c_ab >= 5; total order
    // (lift desc, bg asc) is unique so the LIMIT is stable
    "t15_collocations" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS u FROM uni),
        |w AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg0 AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS bg FROM w),
        |bgc AS (
        |  SELECT bg, CAST(count(*) AS BIGINT) AS c_ab FROM bg0
        |  GROUP BY 1 HAVING count(*) >= 5),
        |j AS (
        |  SELECT bg, c_ab, a.c AS c_a, b.c AS c_b FROM bgc
        |  JOIN uni a ON a.tok = string_split(bg, ' ')[1]
        |  JOIN uni b ON b.tok = string_split(bg, ' ')[2])
        |SELECT bg, c_ab, c_a, c_b,
        |  (c_ab * u * 10000) // (c_a * c_b) AS lift_e4
        |FROM j, tot ORDER BY lift_e4 DESC, bg LIMIT 30""".stripMargin,
    "t14_rarity_score" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |v AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM v),
        |r AS (
        |  SELECT doc_id, t // c AS r
        |  FROM tk JOIN v USING (tok) CROSS JOIN tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |  CAST(sum(r) AS BIGINT) AS rarity,
        |  CAST(sum(r) // count(*) AS BIGINT) AS mean_rarity
        |FROM r GROUP BY doc_id
        |ORDER BY rarity DESC, doc_id LIMIT 20""".stripMargin,
    "t13_bm25" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |dd AS (SELECT doc_id, len(w) AS dl, w FROM d),
        |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dd),
        |ex AS (SELECT doc_id, dl, unnest(w) AS term FROM dd),
        |tf AS (
        |  SELECT term, doc_id, dl, count(*) AS tf FROM ex
        |  WHERE term IN ('join', 'stream', 'vector')
        |  GROUP BY 1, 2, 3),
        |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT tf.term, tf.doc_id, tf.tf,
        |    floor(ln((st.n_docs - dfr.df + 0.5) / (dfr.df + 0.5) + 1.0)
        |      * (tf.tf * 2.2)
        |      / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))
        |      * 1e6 + 0.5) / 1e6 AS score
        |  FROM tf JOIN dfr USING (term) CROSS JOIN st),
        |r AS (
        |  SELECT term, doc_id, tf, score,
        |    row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rk
        |  FROM sc)
        |SELECT term, rk, doc_id, tf, score FROM r
        |WHERE rk <= 5 ORDER BY term, rk""".stripMargin,

    "t12_lexical_zipf" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (
        |  SELECT lang, tok, count(*) AS f FROM tok GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, f,
        |    row_number() OVER (PARTITION BY lang ORDER BY f DESC, tok) AS rk
        |  FROM tf),
        |q AS (
        |  SELECT lang, f,
        |    CASE WHEN rk <= 50
        |         THEN CAST(floor(ln(f) * 1e6 + 0.5) AS BIGINT) END AS lf,
        |    CASE WHEN rk <= 50
        |         THEN CAST(floor(ln(rk) * 1e6 + 0.5) AS BIGINT) END AS lr
        |  FROM r),
        |m AS (
        |  SELECT lang, count(*) AS vocab,
        |    floor(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1.0 / count(*) * 1e4 + 0.5) / 1e4
        |      AS hapax_ratio,
        |    CAST(count(lr) AS BIGINT) AS k,
        |    CAST(sum(lr) AS BIGINT) AS sx, CAST(sum(lf) AS BIGINT) AS sy,
        |    CAST(sum(lr*lr) AS BIGINT) AS sxx, CAST(sum(lr*lf) AS BIGINT) AS sxy
        |  FROM q GROUP BY lang)
        |-- the engine's exact-integer slope: one double division of BIGINT
        |-- moment sums (regr_slope's internal double accumulation order
        |-- differs between engines)
        |SELECT lang, vocab, hapax_ratio,
        |  CASE WHEN k*sxx - sx*sx = 0 THEN NULL
        |       ELSE floor(CAST(k*sxy - sx*sy AS DOUBLE) /
        |                  CAST(k*sxx - sx*sx AS DOUBLE) * 1e4 + 0.5) / 1e4
        |  END AS zipf_slope
        |FROM m ORDER BY lang""".stripMargin,

    "t09_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
        |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total FROM cnt),
        |lp AS (
        |  SELECT doc_id, CAST(floor(ln(cnt / n_total) * 1e6 + 0.5) AS BIGINT) AS lp_q
        |  FROM tok JOIN cnt USING (tok) CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  floor(CAST(sum(lp_q) AS DOUBLE) / count(*) / 1e6 * 1e4 + 0.5) / 1e4 AS avg_logprob
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t03_token_count" ->
      """WITH tok AS (
        |  SELECT source, doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents)
        |SELECT source, count(*) AS n_tokens,
        |  count(DISTINCT tok) AS n_distinct,
        |  count(DISTINCT doc_id) AS n_docs,
        |  floor(count(*) / count(DISTINCT doc_id) * 10000 + 0.5) / 10000
        |    AS tokens_per_doc
        |FROM tok GROUP BY source ORDER BY source""".stripMargin,

    "t04_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m01_media_meta" ->
      """SELECT source, count(*) AS n_items,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  min(md5(text)) AS min_checksum
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "t05_regex_tokens" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0) AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_subword,
        |  CAST(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$'))) AS INT) AS n_numeric,
        |  CAST(len(list_filter(toks, x -> regexp_matches(x, '^[^A-Za-z0-9]$'))) AS INT) AS n_punct
        |FROM t ORDER BY doc_id""".stripMargin,

    "t06_rolling_fingerprint" ->
      """SELECT doc_id,
        |  list_min([md5(substring(text, CAST(i AS INT), 8))
        |            for i in range(1, greatest(length(text) - 7, 1) + 1)]) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // ---- x01-x03: sketch entries, gated via exact twin + envelope ----
    // The sketch VALUES are impl-defined (Spark HLL++/GK/DataSketches ≠
    // DuckDB's), so the oracle emits the EXACT side — which both engines
    // compute identically — plus literal TRUE for each within_bound
    // boolean the engine derives from sketch vs exact. A sketch outside
    // its published envelope flips a boolean and fails the row hash.
    "x01_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp_exact,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part_exact,
        |  TRUE AS supp_within_bound,
        |  TRUE AS part_within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // exact twin = the element at rank ceil(q*n) (discrete quantile — a
    // raw parquet double, no interpolation arithmetic to diverge on)
    "x02_approx_quantiles" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice) AS rk,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rk = CAST(ceil(n * 0.5) AS BIGINT)
        |           THEN o_totalprice END) AS p50_exact,
        |  max(CASE WHEN rk = CAST(ceil(n * 0.99) AS BIGINT)
        |           THEN o_totalprice END) AS p99_exact,
        |  TRUE AS p50_within_bound,
        |  TRUE AS p99_within_bound
        |FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "x03_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+')) AS tok
        |  FROM documents),
        |cnt AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS exact_count
        |  FROM toks WHERE len(tok) > 0 GROUP BY tok)
        |SELECT tok AS token, exact_count, TRUE AS within_bound
        |FROM cnt ORDER BY exact_count DESC, tok LIMIT 20""".stripMargin,
    // x04: the exact distinct count + shard count are the hash-stable
    // twin; within_bound is the sketch-merge guarantee the engine gates
    "x04_sketch_merge" ->
      """WITH tok AS (
        |  SELECT lang, source,
        |    unnest(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+')) AS tok
        |  FROM documents)
        |SELECT lang,
        |  CAST(count(DISTINCT tok) AS BIGINT) AS n_tokens_exact,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_shards,
        |  TRUE AS within_bound
        |FROM tok WHERE len(tok) > 0 GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
