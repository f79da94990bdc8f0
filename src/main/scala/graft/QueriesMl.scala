package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed model-fitting primitives (north-star extension): the
  * closed-form regressions a feature platform runs INSIDE the engine
  * instead of collecting to a driver-side solver. Everything reduces to
  * sufficient statistics — one map-side-combined aggregation pass over
  * the fact table, then a constant-size solve expressed in the plan —
  * so the shape is a single shuffle of ~10 longs per group at any data
  * scale (the dq6 exact-moments discipline: quantize to integers,
  * accumulate Long sums, ONE double combination in an expression shape
  * both engines evaluate identically — never float accumulation, whose
  * partition order would unpin the oracle hash).
  */
object QueriesMl {

  /** The shared quantization (dq6's grains): quantity in units,
    * extendedprice in TENS of dollars, discount in percent. Long
    * bounds: Σy² ≤ rows·(1.1e4)² ≈ rows·1.2e8 — exact to sf100 with
    * ~100× headroom. Regression coefficients are ON the quantized
    * columns (the documented semantic; both engines quantize alike).
    */
  private def quantized(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_returnflag"),
      floor(col("l_quantity")).cast("long").as("x1"),
      floor(col("l_discount") * 100).cast("long").as("x2"),
      floor(col("l_extendedprice") / 10).cast("long").as("y"))

  /** Per-group sufficient statistics for [1, x1, x2] → y: the ten
    * exact Long moments of the normal equations.
    */
  private def moments(df: DataFrame): DataFrame =
    df.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("x1") * col("x1")).as("q1"),
      sum(col("x1") * col("x2")).as("p12"),
      sum(col("x2") * col("x2")).as("q2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("y")).as("p1y"),
      sum(col("x2") * col("y")).as("p2y"),
      sum(col("y") * col("y")).as("qy"))

  /** The 3×3 Cramer solve over the moment columns, as SQL text shared
    * verbatim with the oracle — same parse tree, same IEEE operand
    * order, bit-equal coefficients on both engines. `lam` is the ridge
    * penalty added to the x1/x2 diagonal (never the intercept), scaled
    * by n so the path is sample-size-invariant; lam=0 is OLS.
    *
    * A = [[n, s1, s2], [s1, q1+λn, p12], [s2, p12, q2+λn]], c = [sy,
    * p1y, p2y]; det expansion along the first row.
    */
  private def solveSql(lam: String): Map[String, String] =
    solveSqlOn(identity, lam)

  /** The four Cramer determinants alone (det, det0, det1, det2) — the
    * expensive texts, split out so ml3 can materialize each ONCE as a
    * named column instead of repeating the full expansion inside every
    * guarded beta (the codegen-size fix: the beta layer then divides
    * two short column refs).
    */
  private def detSqlOn(c: String => String,
      lam: String): Map[String, String] = {
    val n = s"CAST(${c("n")} AS DOUBLE)"
    val (s1, s2) =
      (s"CAST(${c("s1")} AS DOUBLE)", s"CAST(${c("s2")} AS DOUBLE)")
    val q1 = s"(CAST(${c("q1")} AS DOUBLE) + $lam * $n)"
    val q2 = s"(CAST(${c("q2")} AS DOUBLE) + $lam * $n)"
    val p12 = s"CAST(${c("p12")} AS DOUBLE)"
    val (sy, p1y, p2y) =
      (s"CAST(${c("sy")} AS DOUBLE)", s"CAST(${c("p1y")} AS DOUBLE)",
        s"CAST(${c("p2y")} AS DOUBLE)")
    val det = s"($n * ($q1 * $q2 - $p12 * $p12)" +
      s" - $s1 * ($s1 * $q2 - $p12 * $s2)" +
      s" + $s2 * ($s1 * $p12 - $q1 * $s2))"
    val det0 = s"($sy * ($q1 * $q2 - $p12 * $p12)" +
      s" - $s1 * ($p1y * $q2 - $p12 * $p2y)" +
      s" + $s2 * ($p1y * $p12 - $q1 * $p2y))"
    val det1 = s"($n * ($p1y * $q2 - $p2y * $p12)" +
      s" - $sy * ($s1 * $q2 - $p12 * $s2)" +
      s" + $s2 * ($s1 * $p2y - $p1y * $s2))"
    val det2 = s"($n * ($q1 * $p2y - $p12 * $p1y)" +
      s" - $s1 * ($s1 * $p2y - $p1y * $s2)" +
      s" + $sy * ($s1 * $p12 - $q1 * $s2))"
    Map("det" -> det, "det0" -> det0, "det1" -> det1, "det2" -> det2)
  }

  /** [[solveSql]] with the moment columns addressed through a renamer
    * (`c("n")` → the SQL reference for that moment) — what lets ml3
    * run the SAME solve text against per-fold TRAIN moments (`tn_0`,
    * `ts1_0`, …) without restating the Cramer expansion.
    */
  private def solveSqlOn(c: String => String,
      lam: String): Map[String, String] = {
    val dets = detSqlOn(c, lam)
    val (det, det0, det1, det2) =
      (dets("det"), dets("det0"), dets("det1"), dets("det2"))
    val n = s"CAST(${c("n")} AS DOUBLE)"
    val (sy, p1y, p2y) =
      (s"CAST(${c("sy")} AS DOUBLE)", s"CAST(${c("p1y")} AS DOUBLE)",
        s"CAST(${c("p2y")} AS DOUBLE)")
    // Singular-matrix guard: a degenerate group (n = 1, or collinear
    // x1/x2) has det = 0 and an unguarded Cramer solve emits ±Inf/NaN
    // betas, which would make the verify hash fragile on degenerate
    // fixtures. The defined fallback is the intercept-only fit
    // (b0 = ȳ, b1 = b2 = 0) — the least-squares solution restricted to
    // the constant model, which is always well-posed for n ≥ 1.
    // What the guard covers, precisely (ADVICE r14): the moments are
    // exact Long sums (order-independent — never float accumulation),
    // cast to double once and combined through this ONE shared
    // expression tree, so det is a deterministic function of the
    // group's rows and identical on both engines; a group that is
    // exactly singular in the quantized integer space evaluates to det
    // = 0.0 when its products stay within double precision (|moment
    // products| < 2^53 — MlSpec pins n = 1 and exactly-collinear
    // fixtures). NOT covered: a NEAR-singular group (det = tiny
    // nonzero) takes the Cramer branch and yields huge, ill-conditioned
    // betas — identically on both engines (the hash still matches), but
    // numerically meaningless; and exact singularity whose integer
    // moments exceed 2^53 may round to a tiny nonzero det, landing in
    // the same ill-conditioned branch. A production fit would gate on a
    // relative det threshold; kept exact here because any epsilon
    // choice is arbitrary and the quantized grains keep real data far
    // from the knife edge.
    def guarded(bi: String, fallback: String): String =
      s"(CASE WHEN $det <> 0.0 THEN ($bi / $det) ELSE $fallback END)"
    Map("b0" -> guarded(det0, s"($sy / $n)"),
      "b1" -> guarded(det1, "0.0"),
      "b2" -> guarded(det2, "0.0"),
      "sy" -> sy, "p1y" -> p1y, "p2y" -> p2y, "n" -> n)
  }

  /** R² from the same moments: SSE = qy − b0·sy − b1·p1y − b2·p2y,
    * SST = qy − sy²/n (exact Long qy widened once).
    */
  private def r2Sql(f: Map[String, String]): String = {
    val qy = "CAST(qy AS DOUBLE)"
    val sse = s"($qy - ${f("b0")} * ${f("sy")} - ${f("b1")} * " +
      s"${f("p1y")} - ${f("b2")} * ${f("p2y")})"
    val sst = s"($qy - ${f("sy")} * ${f("sy")} / ${f("n")})"
    // constant-y group: SST = 0 and the intercept fits perfectly —
    // define R² = 1 rather than emit 0/0 NaN
    s"(CASE WHEN $sst > 0.0 THEN 1.0 - $sse / $sst ELSE 1.0 END)"
  }

  /** The ridge path's λ grid (documented in ml2's output): 0 is the
    * OLS corner, then three decades.
    */
  private val RidgeLams = Seq("0.0", "0.1", "1.0", "10.0")

  /** Held-out SSE of the fit (b0, b1, b2) against a fold's moments,
    * expanded so it needs ONLY the fold's exact sufficient statistics
    * (never the rows): Σ(y − b0 − b1x1 − b2x2)² = qy + b0²n + b1²q1 +
    * b2²q2 + 2(b0b1s1 + b0b2s2 + b1b2p12) − 2(b0sy + b1p1y + b2p2y).
    * `b0/b1/b2` are expected to be COLUMN references (computed once in
    * a prior projection), so the text stays small.
    */
  private def sseSqlOn(c: String => String, b0: String, b1: String,
      b2: String): String = {
    def v(nm: String) = s"CAST(${c(nm)} AS DOUBLE)"
    s"(${v("qy")} + $b0 * $b0 * ${v("n")} + $b1 * $b1 * ${v("q1")}" +
      s" + $b2 * $b2 * ${v("q2")}" +
      s" + 2 * ($b0 * $b1 * ${v("s1")} + $b0 * $b2 * ${v("s2")}" +
      s" + $b1 * $b2 * ${v("p12")})" +
      s" - 2 * ($b0 * ${v("sy")} + $b1 * ${v("p1y")}" +
      s" + $b2 * ${v("p2y")}))"
  }

  /** ml3's FULL shared SQL — one text, run verbatim by Spark (over the
    * registered `lineitem` view) and by the DuckDB oracle, so every
    * double on both sides comes from the identical expression tree.
    * K-FOLD CROSS-VALIDATED ridge from ONE data pass: fold membership
    * is `l_orderkey % 5`, the `m` CTE accumulates all 5×10 per-fold
    * moments as conditional EXACT Long sums in a single map-side-
    * combined aggregate (50 longs total — the whole CV state), train
    * moments for fold k are `total − fold_k` (leave-one-fold-out is
    * SUBTRACTION on sufficient statistics — no second scan, ever),
    * each (λ, fold) solve is the shared Cramer text, held-out SSE
    * comes from the fold's own moments via [[sseSqlOn]], and the CV
    * score chains the 5 fold SSEs in FIXED order (bit-deterministic —
    * never an aggregate over doubles whose partition order could move
    * the sum). At 100 TB: a 4-point regularization path × 5-fold CV =
    * one aggregation pass + constant-size arithmetic, where a naive
    * CV refits 20 times over 20 rescans.
    */
  private[graft] def ml3Sql: String = {
    val moms = Seq("n" -> "1", "s1" -> "x1", "s2" -> "x2",
      "q1" -> "x1 * x1", "p12" -> "x1 * x2", "q2" -> "x2 * x2",
      "sy" -> "y", "p1y" -> "x1 * y", "p2y" -> "x2 * y", "qy" -> "y * y")
    val folds = 0 until 5
    val mCols = folds.flatMap(k => moms.map { case (nm, ex) =>
      s"sum(CASE WHEN fold = $k THEN $ex ELSE 0 END) AS ${nm}_$k" })
    def tot(nm: String) =
      folds.map(j => s"${nm}_$j").mkString("(", " + ", ")")
    val tCols = folds.flatMap(k => moms.map { case (nm, _) =>
      s"(${tot(nm)} - ${nm}_$k) AS t${nm}_$k" })
    val lams = RidgeLams.zipWithIndex
    // determinant layer: each Cramer expansion is materialized ONCE as
    // a named column; the beta layer then divides two short refs — the
    // difference between ~150 KB and ~50 KB of generated expressions
    // (whole-stage codegen compile time is the floor of this query)
    val dCols = lams.flatMap { case (lam, li) =>
      folds.flatMap { k =>
        val dets = detSqlOn(nm => s"t${nm}_$k", lam)
        Seq("det", "det0", "det1", "det2").map(dn =>
          s"${dets(dn)} AS ${dn}_${li}_$k")
      }
    }
    val bCols = lams.flatMap { case (_, li) =>
      folds.flatMap { k =>
        def beta(i: Int, fallback: String) =
          s"(CASE WHEN det_${li}_$k <> 0.0 " +
            s"THEN (det${i}_${li}_$k / det_${li}_$k) " +
            s"ELSE $fallback END) AS b${i}_${li}_$k"
        Seq(
          beta(0, s"(CAST(tsy_$k AS DOUBLE) / CAST(tn_$k AS DOUBLE))"),
          beta(1, "0.0"), beta(2, "0.0"))
      }
    }
    val eCols = lams.flatMap { case (_, li) =>
      folds.map { k =>
        sseSqlOn(nm => s"${nm}_$k", s"b0_${li}_$k", s"b1_${li}_$k",
          s"b2_${li}_$k") + s" AS sse_${li}_$k"
      }
    }
    // ONE pass for all λ arms: a UNION ALL of per-λ SELECTs would
    // re-inline the whole CTE chain per arm (Spark plans WITH by
    // inlining — 4 redundant scans); instead the single-row `e` is
    // cross-joined with a 4-row λ table and the chain picked by CASE
    val ltRows = lams.map { case (lam, li) =>
      s"SELECT $li AS li, CAST($lam AS DOUBLE) AS lambda"
    }.mkString("\nUNION ALL\n")
    val chainCase = "(CASE lt.li " + lams.map { case (_, li) =>
      val chain = folds.tail.foldLeft(s"sse_${li}_0")(
        (acc, k) => s"($acc + sse_${li}_$k)")
      s"WHEN $li THEN $chain"
    }.mkString(" ") + " END)"
    val arms =
      s"SELECT lt.lambda, " +
        s"round($chainCase / CAST(${tot("n")} AS DOUBLE), 6) AS cv_mse, " +
        s"CAST(${tot("n")} AS BIGINT) AS n_total " +
        s"FROM e CROSS JOIN lt"
    s"""WITH base AS (SELECT CAST(l_orderkey % 5 AS BIGINT) AS fold,
       |    CAST(floor(l_quantity) AS BIGINT) AS x1,
       |    CAST(floor(l_discount * 100) AS BIGINT) AS x2,
       |    CAST(floor(l_extendedprice / 10) AS BIGINT) AS y
       |  FROM lineitem),
       |m AS (SELECT
       |    ${mCols.mkString(",\n    ")}
       |  FROM base),
       |t AS (SELECT *,
       |    ${tCols.mkString(",\n    ")}
       |  FROM m),
       |dt AS (SELECT *,
       |    ${dCols.mkString(",\n    ")}
       |  FROM t),
       |b AS (SELECT *,
       |    ${bCols.mkString(",\n    ")}
       |  FROM dt),
       |e AS (SELECT *,
       |    ${eCols.mkString(",\n    ")}
       |  FROM b),
       |lt AS ($ltRows),
       |c AS ($arms)
       |SELECT lambda, cv_mse, n_total,
       |  CAST(row_number() OVER (ORDER BY cv_mse, lambda) AS BIGINT)
       |    AS rank_cv
       |FROM c""".stripMargin
  }

  /** ml4's shared SQL body (everything AFTER the `ml4_cells` relation):
    * GRADIENT-BOOSTED DEPTH-1 STUMPS, squared loss, learning rate 0.5,
    * three rounds — fit entirely in the plan over the (x1, x2) CELL
    * GRID (≤ 51×11 cells: quantity units × discount percent), which is
    * the whole sufficient statistic for stump ensembles on quantized
    * features. The bit-determinism discipline that makes this
    * oracle-hashable: every cross-cell aggregation sums EXACT LONGS
    * (per-region conditional n/Σy), and doubles appear only in
    * constant-size FIXED-ORDER expressions — residual sums decompose
    * as Σ_regions (Σy_region − n_region · F_region) over the ≤ 2^r
    * piecewise-constant regions of the ensemble, never as a float sum
    * over data rows or cells whose order an engine could change. The
    * greedy split argmax (gain = RsumL²/nL + RsumR²/nR over the 59
    * candidate thresholds) and the leaf values are therefore identical
    * doubles on both engines. Spark binds `ml4_cells` to a cached
    * 561-row frame (lineitem scanned ONCE); the oracle binds it to a
    * CTE over raw lineitem. At 100 TB: one groupBy over the fact
    * table, then constant-size arithmetic — the tree ensemble never
    * rescans.
    *
    * Returned as NAMED PARTS: the oracle assembles them into one CTE
    * chain; Spark evaluates the same texts in four staged plans
    * (cached single-row views aliased back under the CTE names), so
    * the optimizer never analyzes one giant nested tree — the staging
    * is a pure plan-size fix, every expression string is shared.
    */
  private[graft] def ml4Parts: Map[String, String] = {
    def D(x: String) = s"CAST($x AS DOUBLE)"
    val thrRows = ((1 to 49).map(t => s"SELECT 1 AS f, $t AS t") ++
      (0 to 9).map(t => s"SELECT 2 AS f, $t AS t"))
      .mkString("\nUNION ALL\n")
    val f0 = s"(${D("st")} / ${D("nt")})"
    // round 1: one region (the whole table), candidate sums are plain
    val cand1 =
      """SELECT thr.f, thr.t,
        |    CAST(sum(CASE WHEN (CASE WHEN thr.f = 1 THEN c.x1
        |      ELSE c.x2 END) <= thr.t THEN c.n ELSE 0 END) AS BIGINT)
        |      AS nl,
        |    CAST(sum(CASE WHEN (CASE WHEN thr.f = 1 THEN c.x1
        |      ELSE c.x2 END) <= thr.t THEN c.sy ELSE 0 END) AS BIGINT)
        |      AS syl
        |  FROM ml4_cells c CROSS JOIN thr GROUP BY thr.f, thr.t"""
        .stripMargin
    val b1RsumL = s"(${D("syl")} - ${D("nl")} * $f0)"
    val b1RsumR = s"((${D("st")} - ${D("syl")}) - (${D("nt")} - ${D("nl")}) * $f0)"
    // argmax as ORDER BY + LIMIT 1 (TakeOrdered — no all-to-one window
    // shuffle), totally ordered by (gain DESC, f, t) so both engines
    // pick the identical split
    def best(rsumL: String, rsumR: String, nl: String, nt: String,
        keep: String): String =
      s"""SELECT * FROM (SELECT $keep,
         |    (0.5 * $rsumL / ${D(nl)}) AS vl,
         |    (0.5 * $rsumR / (${D(nt)} - ${D(nl)})) AS vr,
         |    ($rsumL * $rsumL / ${D(nl)} +
         |      $rsumR * $rsumR / (${D(nt)} - ${D(nl)})) AS gain
         |  FROM src WHERE $nl > 0 AND $nl < $nt)
         |ORDER BY gain DESC, f, t LIMIT 1""".stripMargin
    val best1 = best(b1RsumL, b1RsumR, "nl", "nt",
      "f, t, nt, st, qt").replace("FROM src", "FROM cand1 CROSS JOIN g")
    // round 2: two regions (sides of stump 1); region membership and
    // per-region conditional Long sums
    val in1 = "(CASE WHEN b.f1 = 1 THEN c.x1 ELSE c.x2 END) <= b.t1"
    val xf = "(CASE WHEN thr.f = 1 THEN c.x1 ELSE c.x2 END)"
    def csum(cond: String, v: String, as: String) =
      s"CAST(sum(CASE WHEN $cond THEN $v ELSE 0 END) AS BIGINT) AS $as"
    val cand2 =
      s"""SELECT thr.f, thr.t, b.f1, b.t1, b.vl1, b.vr1, b.nt, b.st,
         |    b.qt,
         |    ${csum(s"$in1 AND $xf <= thr.t", "c.n", "n0l")},
         |    ${csum(s"$in1 AND $xf <= thr.t", "c.sy", "sy0l")},
         |    ${csum(s"NOT ($in1) AND $xf <= thr.t", "c.n", "n1l")},
         |    ${csum(s"NOT ($in1) AND $xf <= thr.t", "c.sy", "sy1l")},
         |    ${csum(in1, "c.n", "nr0")},
         |    ${csum(in1, "c.sy", "syr0")}
         |  FROM ml4_cells c
         |    CROSS JOIN (SELECT f AS f1, t AS t1, vl AS vl1, vr AS vr1,
         |      nt, st, qt FROM best1) b
         |    CROSS JOIN thr
         |  GROUP BY thr.f, thr.t, b.f1, b.t1, b.vl1, b.vr1, b.nt,
         |    b.st, b.qt""".stripMargin
    val (fA, fB) = (s"($f0 + vl1)", s"($f0 + vr1)") // F after round 1
    val b2RsumL = s"((${D("sy0l")} - ${D("n0l")} * $fA)" +
      s" + (${D("sy1l")} - ${D("n1l")} * $fB))"
    val b2RsumR = s"(((${D("syr0")} - ${D("sy0l")})" +
      s" - (${D("nr0")} - ${D("n0l")}) * $fA)" +
      s" + (((${D("st")} - ${D("syr0")}) - ${D("sy1l")})" +
      s" - ((${D("nt")} - ${D("nr0")}) - ${D("n1l")}) * $fB))"
    val best2 = best(b2RsumL, b2RsumR, "(n0l + n1l)", "nt",
      "f, t, f1, t1, vl1, vr1, nt, st, qt")
      .replace("FROM src", "FROM cand2")
    // round 3: four regions (stump 1 × stump 2)
    val in1b = "(CASE WHEN b.f1 = 1 THEN c.x1 ELSE c.x2 END) <= b.t1"
    val in2b = "(CASE WHEN b.f2 = 1 THEN c.x1 ELSE c.x2 END) <= b.t2"
    val regs = Seq(("00", s"$in1b AND $in2b"),
      ("01", s"$in1b AND NOT ($in2b)"),
      ("10", s"NOT ($in1b) AND $in2b"),
      ("11", s"NOT ($in1b) AND NOT ($in2b)"))
    val cand3Sums = regs.flatMap { case (r, cond) => Seq(
      csum(s"$cond AND $xf <= thr.t", "c.n", s"nl$r"),
      csum(s"$cond AND $xf <= thr.t", "c.sy", s"syl$r"),
      csum(cond, "c.n", s"nr$r"),
      csum(cond, "c.sy", s"syr$r"))
    }
    val carry2 = "f1, t1, vl1, vr1, f2, t2, vl2, vr2, nt, st, qt"
    val cand3 =
      s"""SELECT thr.f, thr.t, b.f1, b.t1, b.vl1, b.vr1, b.f2, b.t2,
         |    b.vl2, b.vr2, b.nt, b.st, b.qt,
         |    ${cand3Sums.mkString(",\n    ")}
         |  FROM ml4_cells c
         |    CROSS JOIN (SELECT f AS f2, t AS t2, vl AS vl2, vr AS vr2,
         |      f1, t1, vl1, vr1, nt, st, qt FROM best2) b
         |    CROSS JOIN thr
         |  GROUP BY thr.f, thr.t, b.f1, b.t1, b.vl1, b.vr1, b.f2,
         |    b.t2, b.vl2, b.vr2, b.nt, b.st, b.qt""".stripMargin
    // F after round 2 per region: + vl1/vr1 by stump-1 side, + vl2/vr2
    // by stump-2 side
    def f2of(r: String) = {
      val s1 = if (r(0) == '0') "vl1" else "vr1"
      val s2 = if (r(1) == '0') "vl2" else "vr2"
      s"($f0 + $s1 + $s2)"
    }
    val b3RsumL = regs.map { case (r, _) =>
      s"(${D(s"syl$r")} - ${D(s"nl$r")} * ${f2of(r)})"
    }.mkString("(", " + ", ")")
    val b3RsumR = regs.map { case (r, _) =>
      s"((${D(s"syr$r")} - ${D(s"syl$r")})" +
        s" - (${D(s"nr$r")} - ${D(s"nl$r")}) * ${f2of(r)})"
    }.mkString("(", " + ", ")")
    val nl3 = regs.map { case (r, _) => s"nl$r" }.mkString("(", " + ", ")")
    val best3 = best(b3RsumL, b3RsumR, nl3, "nt",
      s"f, t, $carry2").replace("FROM src", "FROM cand3")
    // final fit: eight regions, SSE from exact per-region (n, Σy) and
    // the global Σy² — a fixed-order 8-term combination
    val in3b = "(CASE WHEN b.f3 = 1 THEN c.x1 ELSE c.x2 END) <= b.t3"
    val regs3 = for (a <- Seq("0", "1"); bb <- Seq("0", "1");
        cc <- Seq("0", "1")) yield {
      val cond = Seq(
        if (a == "0") in1b else s"NOT ($in1b)",
        if (bb == "0") in2b else s"NOT ($in2b)",
        if (cc == "0") in3b else s"NOT ($in3b)").mkString("(", ") AND (", ")")
      (s"$a$bb$cc", cond)
    }
    val finSums = regs3.flatMap { case (r, cond) => Seq(
      csum(cond, "c.n", s"fn$r"), csum(cond, "c.sy", s"fsy$r")) }
    def f3of(r: String) = {
      val s1 = if (r(0) == '0') "vl1" else "vr1"
      val s2 = if (r(1) == '0') "vl2" else "vr2"
      val s3 = if (r(2) == '0') "vl3" else "vr3"
      s"($f0 + $s1 + $s2 + $s3)"
    }
    val sse = s"(${D("qt")} - " +
      regs3.map { case (r, _) =>
        s"(2 * ${f3of(r)} * ${D(s"fsy$r")}" +
          s" - ${f3of(r)} * ${f3of(r)} * ${D(s"fn$r")})"
      }.mkString("(", " + ", ")") + ")"
    val sst = s"(${D("qt")} - ${D("st")} * ${D("st")} / ${D("nt")})"
    val fin =
      s"""SELECT b.*, ${finSums.mkString(",\n    ")}
         |  FROM ml4_cells c
         |    CROSS JOIN (SELECT f AS f3, t AS t3, vl AS vl3, vr AS vr3,
         |      $carry2 FROM best3) b
         |  GROUP BY b.f3, b.t3, b.vl3, b.vr3, b.f1, b.t1, b.vl1,
         |    b.vr1, b.f2, b.t2, b.vl2, b.vr2, b.nt, b.st, b.qt"""
        .stripMargin
    def pick(c1: String, c2: String, c3: String) =
      s"(CASE rt.r WHEN 1 THEN $c1 WHEN 2 THEN $c2 ELSE $c3 END)"
    val gSql = "SELECT CAST(sum(n) AS BIGINT) AS nt, " +
      "CAST(sum(sy) AS BIGINT) AS st, " +
      "CAST(sum(qy) AS BIGINT) AS qt FROM ml4_cells"
    val finalSelect =
      s"""rt AS (SELECT 1 AS r UNION ALL SELECT 2 UNION ALL SELECT 3)
         |SELECT CAST(rt.r AS BIGINT) AS round,
         |  CAST(${pick("f1", "f2", "f3")} AS BIGINT) AS feature,
         |  CAST(${pick("t1", "t2", "t3")} AS BIGINT) AS threshold,
         |  round(${pick("vl1", "vl2", "vl3")}, 6) AS leaf_left,
         |  round(${pick("vr1", "vr2", "vr3")}, 6) AS leaf_right,
         |  round(1.0 - $sse / $sst, 6) AS r2_final
         |FROM fin CROSS JOIN rt""".stripMargin
    Map("thr" -> thrRows, "g" -> gSql, "cand1" -> cand1,
      "best1" -> best1, "cand2" -> cand2, "best2" -> best2,
      "cand3" -> cand3, "best3" -> best3, "fin" -> fin,
      "final" -> finalSelect)
  }

  /** The cells relation both engines bind `ml4_cells` to: the exact
    * (x1, x2) grid with n/Σy/Σy² Longs.
    */
  private[graft] val ml4CellsSql: String =
    """SELECT CAST(floor(l_quantity) AS BIGINT) AS x1,
      |  CAST(floor(l_discount * 100) AS BIGINT) AS x2,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(floor(l_extendedprice / 10) AS BIGINT))
      |    AS BIGINT) AS sy,
      |  CAST(sum(CAST(floor(l_extendedprice / 10) AS BIGINT) *
      |    CAST(floor(l_extendedprice / 10) AS BIGINT)) AS BIGINT) AS qy
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Grouped closed-form OLS — y ≈ b0 + b1·quantity + b2·discount per
    // returnflag, fit ENTIRELY in the plan: one exact-moment pass
    // (map-side combine, ten longs per group) and a Cramer solve in
    // the projection. No iterations, no driver linear algebra, no
    // collect — the one-aggregation shape that fits a regression per
    // group over a 100 TB fact table as cheaply as a groupBy count.
    // Coefficients/R² round 6dp at output only; everything upstream is
    // exact integers, so both engines solve from bit-identical doubles.
    "ml1_ols" -> ((s, d) => {
      val f = solveSql("0.0")
      moments(quantized(s, d)).selectExpr(
        "l_returnflag", "n",
        s"round(${f("b0")}, 6) AS beta0",
        s"round(${f("b1")}, 6) AS beta1",
        s"round(${f("b2")}, 6) AS beta2",
        s"round(${r2Sql(f)}, 6) AS r2")
    }),

    // Ridge regularization path over the SAME sufficient statistics:
    // the moment pass happens ONCE and each λ is just another constant
    // solve in the projection — the reason closed-form paths are
    // near-free in-engine (a λ grid costs zero extra data passes,
    // where an iterative solver would rescan per λ). λ scales with n
    // (penalty on the mean Gram), never the intercept.
    "ml2_ridge_path" -> ((s, d) => {
      val m = moments(quantized(s, d))
      RidgeLams.map { lam =>
        val f = solveSql(lam)
        m.selectExpr("l_returnflag",
          s"CAST($lam AS DOUBLE) AS lambda",
          s"round(${f("b0")}, 6) AS beta0",
          s"round(${f("b1")}, 6) AS beta1",
          s"round(${f("b2")}, 6) AS beta2")
      }.reduce(_ unionAll _)
    }),

    // K-FOLD CROSS-VALIDATED ridge (model SELECTION in-engine, not
    // just fitting): 5 orderkey-hash folds, leave-one-fold-out train
    // moments by SUBTRACTION on the exact sufficient statistics, the
    // shared Cramer solve per (λ, fold), held-out SSE from each fold's
    // own moments, CV score as a fixed-order chain of the 5 fold SSEs
    // (bit-deterministic; no double aggregation). ONE data pass fits
    // and scores the whole λ grid — see [[ml3Sql]]. Both engines run
    // the identical SQL text.
    "ml3_cv_ridge" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(ml3Sql)
    }),

    // GRADIENT-BOOSTED STUMPS (three rounds, lr 0.5, squared loss):
    // greedy split search over 59 thresholds per round, leaf values,
    // and final R² — all from the quantized (quantity, discount) cell
    // grid, lineitem scanned ONCE into a cached 561-row frame. Every
    // cross-cell sum is an exact conditional Long per ensemble region;
    // doubles live only in fixed-order constant-size expressions, so
    // the model is bit-identical on both engines (see [[ml4Parts]]).
    "ml4_boost_stumps" -> ((s, d) => {
      val p = ml4Parts
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      // the grid is ≤ 561 rows: one cached partition, so every staged
      // job downstream schedules 1-2 tasks instead of 32 empty ones
      s.sql(ml4CellsSql).coalesce(1).cache()
        .createOrReplaceTempView("ml4_cells")
      // Staged evaluation of the SAME texts the oracle chains as CTEs.
      // Each stage's output is ONE ROW of model scalars (the boosting
      // state), re-bound as a literal relation for the next stage —
      // BIT-exact (the collected doubles go back in as values, never
      // through text) and constant-size on the driver (this is model
      // state, not data). Without this, the one-text form inlines a
      // 400+-operator tree whose analysis/codegen dwarfs the compute
      // (3.8 s for a 561-row grid); staged it is the cells pass plus
      // four trivial jobs.
      def stage(sql: String, view: String): Unit = {
        val df = s.sql(sql)
        s.createDataFrame(java.util.Arrays.asList(df.collect(): _*),
          df.schema).createOrReplaceTempView(view)
      }
      // OPT r18 (guide §1.2 step 2): the 59-row threshold relation was
      // re-parsed and re-analyzed as a 59-branch UNION ALL CTE inside
      // every stage (3×). Bind it once as a literal-rows view — the
      // same rows the oracle's `thr` CTE enumerates; stage plans shrink
      // and the analysis cost is paid once.
      import scala.jdk.CollectionConverters._
      s.createDataFrame(
        ((1 to 49).map(t => org.apache.spark.sql.Row(1, t)) ++
          (0 to 9).map(t => org.apache.spark.sql.Row(2, t))).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("f",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("t",
            org.apache.spark.sql.types.IntegerType, nullable = false))))
        .createOrReplaceTempView("ml4_thr")
      stage(s"WITH thr AS (SELECT * FROM ml4_thr), g AS (${p("g")}), " +
        s"cand1 AS (${p("cand1")}) SELECT * FROM (${p("best1")})",
        "ml4_b1")
      stage(s"WITH thr AS (SELECT * FROM ml4_thr), " +
        s"best1 AS (SELECT * FROM ml4_b1), " +
        s"cand2 AS (${p("cand2")}) SELECT * FROM (${p("best2")})",
        "ml4_b2")
      stage(s"WITH thr AS (SELECT * FROM ml4_thr), " +
        s"best2 AS (SELECT * FROM ml4_b2), " +
        s"cand3 AS (${p("cand3")}) SELECT * FROM (${p("best3")})",
        "ml4_b3")
      s.sql(s"WITH best3 AS (SELECT * FROM ml4_b3), " +
        s"fin AS (${p("fin")}), ${p("final")}")
    })
  )

  /** One moments CTE shared by both oracles — the Spark-side agg
    * mirrored column-for-column, then the IDENTICAL solve text.
    */
  private val momentsCte: String =
    """m AS (SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n,
      |  sum(x1) AS s1, sum(x2) AS s2,
      |  sum(x1 * x1) AS q1, sum(x1 * x2) AS p12, sum(x2 * x2) AS q2,
      |  sum(y) AS sy, sum(x1 * y) AS p1y, sum(x2 * y) AS p2y,
      |  sum(y * y) AS qy
      |FROM (SELECT l_returnflag,
      |    CAST(floor(l_quantity) AS BIGINT) AS x1,
      |    CAST(floor(l_discount * 100) AS BIGINT) AS x2,
      |    CAST(floor(l_extendedprice / 10) AS BIGINT) AS y
      |  FROM lineitem)
      |GROUP BY l_returnflag)""".stripMargin

  def oracle: Map[String, String] = {
    val f0 = solveSql("0.0")
    val ridgeArms = RidgeLams.map { lam =>
      val f = solveSql(lam)
      s"""SELECT l_returnflag, CAST($lam AS DOUBLE) AS lambda,
         |  round(${f("b0")}, 6) AS beta0,
         |  round(${f("b1")}, 6) AS beta1,
         |  round(${f("b2")}, 6) AS beta2 FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    Map(
      "ml1_ols" ->
        s"""WITH $momentsCte
           |SELECT l_returnflag, n,
           |  round(${f0("b0")}, 6) AS beta0,
           |  round(${f0("b1")}, 6) AS beta1,
           |  round(${f0("b2")}, 6) AS beta2,
           |  round(${r2Sql(f0)}, 6) AS r2
           |FROM m""".stripMargin,
      "ml2_ridge_path" ->
        s"""WITH $momentsCte
           |$ridgeArms""".stripMargin,
      // the SAME text Spark executes — the strongest oracle form
      "ml3_cv_ridge" -> ml3Sql,
      // identical part texts chained as one CTE tree; ml4_cells bound
      // over raw lineitem where Spark binds the cached cells frame
      "ml4_boost_stumps" -> {
        val p = ml4Parts
        s"WITH ml4_cells AS ($ml4CellsSql),\n" +
          s"thr AS (${p("thr")}),\ng AS (${p("g")}),\n" +
          s"cand1 AS (${p("cand1")}),\nbest1 AS (${p("best1")}),\n" +
          s"cand2 AS (${p("cand2")}),\nbest2 AS (${p("best2")}),\n" +
          s"cand3 AS (${p("cand3")}),\nbest3 AS (${p("best3")}),\n" +
          s"fin AS (${p("fin")}),\n${p("final")}"
      })
  }
}
