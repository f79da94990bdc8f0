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

  /** [[solveSql]] with the moment columns addressed through a renamer
    * (`c("n")` → the SQL reference for that moment) — what lets ml3
    * run the SAME solve text against per-fold TRAIN moments (`tn_0`,
    * `ts1_0`, …) without restating the Cramer expansion.
    */
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
      "ml3_cv_ridge" -> ml3Sql)
  }
}
