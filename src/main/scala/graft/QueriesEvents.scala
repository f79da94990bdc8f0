package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.RelationalOps
import graft.sources.Tables

/** Event-sequence analytics over `events` (north-star extension,
  * SURVEY.md §2.10): ordered funnels and cohort retention — the two
  * queries every behavioral pipeline runs, and good stress tests of
  * ordered-semantics correctness (a funnel stage counts only events
  * strictly AFTER the previous stage's first completion, not mere
  * co-occurrence).
  *
  * Scale notes: every stage is a per-user min aggregate (map-side
  * partials) followed by an equi-join on user_id — no windows over the
  * raw event stream, no self-join of events with events. Stage frames
  * shrink monotonically (funnel users ⊆ previous stage), so the join
  * right sides get cheaper as the funnel deepens.
  */
object QueriesEvents {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ordered view -> click -> purchase funnel with a 24-hour
    // conversion window per stage: one row of per-stage user counts,
    // each stage counting only events strictly after — and within 24
    // hours of — the user's first completion of the previous stage (an
    // unbounded funnel saturates on a dense event stream and
    // discriminates nothing; sf0.01: 150 -> 60 -> 25).
    "e1_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_type"), col("ts"))
      def stage(tpe: String, prev: DataFrame, prevTs: String,
          outTs: String): DataFrame =
        ev.filter(col("event_type") === tpe)
          .join(prev, "user_id")
          .filter(col("ts") > col(prevTs) &&
            col("ts") <= col(prevTs) + expr("INTERVAL 24 HOUR"))
          .groupBy("user_id").agg(min(col("ts")).as(outTs))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
      val c = stage("click", v, "v_ts", "c_ts")
      val p = stage("purchase", c, "c_ts", "p_ts")
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(broadcast(c.agg(count(lit(1)).as("n_click"))))
        .crossJoin(broadcast(p.agg(count(lit(1)).as("n_purchase"))))
    }),

    // Day-7 cohort retention: users grouped by first-activity day, a
    // cohort member is retained iff active again exactly 7 days later.
    "e2_retention" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
      val first = ev.groupBy("user_id")
        .agg(to_date(min(col("ts"))).as("cohort_day"))
      val active = ev.select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val retained = first.join(active, "user_id")
        .filter(col("day") === date_add(col("cohort_day"), 7))
        .groupBy("cohort_day").agg(count(lit(1)).as("retained"))
      first.groupBy("cohort_day").agg(count(lit(1)).as("cohort_size"))
        .join(retained, Seq("cohort_day"), "left")
        .select(col("cohort_day"), col("cohort_size"),
          coalesce(col("retained"), lit(0L)).as("retained"),
          round(coalesce(col("retained"), lit(0L)) /
            col("cohort_size").cast("double"), 6).as("retention_rate"))
    }),

    // First-order Markov transition matrix of the per-user event
    // stream: how often event type A is IMMEDIATELY followed by B in
    // the same user's timeline, with each transition's share of all
    // transitions (exact integer counts, one rounded output ratio).
    // Ordering ties broken by event_id (unique), so the lag is
    // deterministic under any partitioning. Shape: ONE window shuffle
    // by user_id + one tiny hash-agg — no event×event self-join; at
    // 100 TB this is the same movement as any per-user window.
    "e3_transitions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val win = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val tr = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(win))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      tr.crossJoin(broadcast(tr.agg(sum(col("n")).as("tot"))))
        .select(col("prev_type"), col("next_type"), col("n"),
          round(col("n").cast("double") / col("tot").cast("double"), 6)
            .as("share"))
    }),

    // Markov REMOVAL-EFFECT attribution — the data-driven alternative
    // to e4/e15's positional rules (Anderl et al. 2014's chain model):
    // user journeys (events up to and including the FIRST purchase)
    // become a first-order chain over states {(start), channels,
    // (conv), (null)}; each channel's credit is its REMOVAL EFFECT —
    // how much absorbing-conversion probability disappears when every
    // transition into that channel is redirected to (null). The
    // corpus cost is e3's shape (one user_id window + a bounded edge
    // count); everything after is value iteration on a ≤(types+3)²-row
    // matrix — 10 synchronous fixed-horizon rounds, all arms (base +
    // one per channel) carried in ONE frame with per-round lineage
    // cuts. Parity is by construction: transition probabilities are
    // exact-count ratios, every Σ P·v folds in sorted target order on
    // both engines, and the FIXED horizon makes convergence identical
    // rather than assumed. Removing paths can only lower a fixed-
    // horizon reach probability, so effects are ≥ 0 and the share
    // normalization is safe (zero-guarded like the d20 ratios).
    "e18_markov_attribution" -> ((s, d) => {
      val pe = markovEdges(s, d)
      val arms = pe.select(col("i")).filter(col("i") =!= "(start)")
        .distinct().select(col("i").as("arm"))
        .unionAll(pe.sparkSession.range(1)
          .select(lit("(base)").as("arm")))
      // per-arm rewrite: drop the removed state's outgoing edges,
      // redirect its incoming mass to (null) (≤2 merged terms — IEEE
      // addition of two operands is order-free)
      val ae = pe.crossJoin(broadcast(arms))
        .filter(col("i") =!= col("arm"))
        .select(col("arm"), col("i"),
          when(col("j") === col("arm"), lit("(null)"))
            .otherwise(col("j")).as("j"), col("p"))
        .groupBy("arm", "i", "j").agg(sum(col("p")).as("p"))
      // OPT r18 (guide §1.2 step 1 / §2.4): the value iteration used to
      // run as MarkovRounds sequential materialized rounds (join +
      // hash-agg + coalesce(1) + localCheckpoint each) — ~50 scheduled
      // jobs whose wall time was pure BSP-barrier floor on a ≤(arms·
      // edges)-row frame. The matrix is CONSTANT-SIZE (≤ (types+3)² per
      // arm), so the whole fixed-horizon iteration folds into ONE
      // projection: pack each arm's rewritten matrix into a single row
      // (targets j-ascending per source, sources i-ascending), then run
      // the 10 rounds as an `aggregate(sequence(...))` over a
      // state-value MAP. Fold order is IDENTICAL to the round form —
      // new v(i) = Σ_{j asc} p(i,j)·v(j), multiply-then-add per term —
      // so every intermediate double is bit-equal and the oracle hash
      // cannot move. One job instead of ~50; at 100 TB the corpus scan
      // (markovEdges) is untouched and the solve stops paying 10
      // scheduling barriers.
      val packed = ae
        .groupBy(col("arm"), col("i"))
        .agg(array_sort(collect_list(struct(col("j"), col("p"))))
          .as("tgts"))
        .groupBy(col("arm"))
        .agg(array_sort(collect_list(struct(col("i"), col("tgts"))))
          .as("srcs"))
      val one = packed.agg(
        array_sort(collect_list(struct(col("arm"), col("srcs"))))
          .as("arms"))
      val absorbing = map(lit("(conv)"), lit(1.0),
        lit("(null)"), lit(0.0))
      def vIter(srcs: Column): Column = {
        val v0 = map_concat(map_from_entries(transform(srcs,
          sc => struct(sc.getField("i"), lit(0.0)))), absorbing)
        aggregate(sequence(lit(1), lit(MarkovRounds)), v0, (acc, _) =>
          map_concat(map_from_entries(transform(srcs, sc =>
            struct(sc.getField("i"),
              aggregate(sc.getField("tgts"), lit(0.0), (a, t) =>
                a + t.getField("p") *
                  element_at(acc, t.getField("j")))))),
            absorbing))
      }
      val armVals = transform(col("arms"), a => struct(
        a.getField("arm").as("channel"),
        element_at(vIter(a.getField("srcs")), lit("(start)")).as("pr")))
      val withPb = one.select(armVals.as("avs"))
        .select(col("avs"),
          element_at(filter(col("avs"),
            x => x.getField("channel") === "(base)"), 1)
            .getField("pr").as("pb"))
      // channels stay in arm-ascending order (the arms array is sorted,
      // filter preserves order) — the SAME order the round form's
      // array_sort(struct(channel, eff)) fold used, so the total-effect
      // sum folds identical doubles in the identical order.
      val effs = transform(
        filter(col("avs"), x => x.getField("channel") =!= "(base)"),
        x => struct(x.getField("channel").as("channel"),
          x.getField("pr").as("pr"),
          when(col("pb") > 0.0,
            lit(1.0) - x.getField("pr") / col("pb"))
            .otherwise(lit(0.0)).as("eff")))
      val withTe = withPb.select(col("pb"), effs.as("effs"))
        .select(col("pb"), col("effs"),
          aggregate(col("effs"), lit(0.0),
            (a, x) => a + x.getField("eff")).as("te"))
      withTe
        .select(col("pb"), col("te"), explode(col("effs")).as("e"))
        .select(col("e.channel").as("channel"),
          round(col("pb"), 6).as("p_base"),
          round(col("e.pr"), 6).as("p_removed"),
          round(col("e.eff"), 6).as("removal_effect"),
          round(when(col("te") > 0.0, col("e.eff") / col("te"))
            .otherwise(lit(0.0)), 6).as("share"))
    }),

    // Last-touch attribution: each purchase is credited to the user's
    // most recent PRIOR non-purchase event, but only if it happened
    // within the 7-day lookback (older touches — and purchases with no
    // prior touch at all — land in the "(none)" bucket). The carried
    // touch is two last(...ignoreNulls) columns over the same strictly-
    // preceding frame — both pick the SAME row (same predicate), so
    // channel and touch-time stay consistent. Revenue sums in exact
    // cents with one rounded output division. Shape: ONE window
    // shuffle on user_id + a channel-sized hash agg — no purchase×
    // touch self-join, which at 100 TB is the difference between a
    // window pass and a blow-up.
    "e4_attribution" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val isTouch = col("event_type") =!= "purchase"
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"), col("value"))
        .withColumn("touch_ts",
          last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
        .withColumn("touch_ch",
          last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(
          when(col("touch_ts").isNotNull &&
              col("touch_ts") >= col("ts") - expr("INTERVAL 7 DAY"),
            col("touch_ch")).otherwise(lit("(none)")).as("channel"),
          floor(col("value") * lit(100)).cast("long").as("cents"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(col("cents")).cast("double") / lit(100.0), 2)
            .as("revenue"))
    }),

    // Conversion-latency histogram: hours from first view to the
    // (windowed) funnel purchase, for users who completed e1's full
    // view→click→purchase funnel — the "how fast do converters
    // convert" distribution that prices conversion windows. Latency is
    // an exact integer: truncated-second difference floor-divided into
    // hour buckets (identical truncation on both engines), bounded by
    // construction at 48h (two 24h stage windows). Same per-user min
    // aggregates + shrinking equi-joins as e1 — no event self-join.
    "e5_conversion_lag" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id"), col("event_type"), col("ts"))
      def stage(tpe: String, prev: DataFrame, prevTs: String,
          outTs: String): DataFrame =
        ev.filter(col("event_type") === tpe)
          .join(prev, "user_id")
          .filter(col("ts") > col(prevTs) &&
            col("ts") <= col(prevTs) + expr("INTERVAL 24 HOUR"))
          .groupBy("user_id").agg(min(col("ts")).as(outTs))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
      val p = stage("purchase", stage("click", v, "v_ts", "c_ts"),
        "c_ts", "p_ts")
      p.join(v, "user_id")
        .select(floor((unix_timestamp(col("p_ts")) -
          unix_timestamp(col("v_ts"))) / 3600L).cast("long")
          .as("lag_hours"))
        .groupBy("lag_hours").agg(count(lit(1)).as("n_users"))
    }),

    // Batch sessionization: split each user's timeline into sessions at
    // >30-minute silence gaps (the st3 session-window semantics, batch
    // form) — session id is the running count of gap-boundaries, so it
    // is stable under re-partitioning and appends-in-order. Shape: ONE
    // window shuffle on user_id carries both the lag and the running
    // sum (same partitioning, no second exchange), then a hash agg on
    // (user, session) — the linear per-user-stream movement; never an
    // event×event self-join. Ties in ts broken by event_id (unique) so
    // the lag is deterministic. Duration is an exact truncated-second
    // integer on both engines.
    "e6_sessionize" -> ((s, d) => {
      sessionized(s, d)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .select(col("user_id"), col("session_idx"), col("n_events"),
          col("session_start"), col("session_end"),
          (unix_timestamp(col("session_end")) -
            unix_timestamp(col("session_start"))).as("duration_s"))
    }),

    // Full cohort retention matrix — e2's single day-7 probe widened to
    // every (cohort_day, age) cell: users grouped by first-activity
    // day, counted on each later active day at age = day − cohort_day.
    // The (user, day) frame is already distinct, and age is a function
    // of (user, day), so the cell count is exactly "distinct users from
    // cohort c active at age a" with a plain count(*) — no
    // count-distinct Expand. Shape: one per-user min agg + one
    // equi-join on user_id + one (cohort, age)-sized hash agg; rates
    // are exact-rational divisions rounded at output.
    "e8_cohort_matrix" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val first = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      val size = first.groupBy("cohort_day")
        .agg(count(lit(1)).as("cohort_size"))
      first.join(ev, "user_id")
        .select(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("age"))
        .groupBy("cohort_day", "age").agg(count(lit(1)).as("n_active"))
        .join(size, Seq("cohort_day"))
        .select(col("cohort_day"), col("age"), col("n_active"),
          col("cohort_size"),
          round(col("n_active").cast("double") /
            col("cohort_size").cast("double"), 6).as("rate"))
    }),

    // Session path mining: the ordered event-type sequence of every e6
    // session, counted corpus-wide — the "what do journeys look like"
    // complement to e1's fixed funnel (e1 asks about ONE path; e7
    // surfaces which paths exist and how often). The path assembles
    // IN-ROW from a sorted struct collect (hour/event_id unique →
    // deterministic order, the centroidMeans discipline), so the whole
    // query is e6's single user_id shuffle + one path-sized hash agg +
    // a bounded top-20 — no sequence self-join at any scale.
    "e7_session_paths" -> ((s, d) => {
      val paths = sessionized(s, d)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(concat_ws(">", transform(
          array_sort(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))),
          x => x.getField("event_type"))).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      graft.operators.RelationalOps.topKGlobal(paths,
        Seq(col("n_sessions").desc, col("path").asc), 20)
    }),

    // Cohort LTV curves — e2's retention grid extended to REVENUE:
    // users cohorted by first-activity day, each purchase assigned an
    // AGE (days since cohort entry), and every (cohort, age) cell
    // reports the cohort's cumulative cents and per-user LTV so far.
    // The cumulative window runs over the (cohort × age) cell grid
    // (≤ ~900 rows at any data scale — ages and cohorts are bounded
    // by the calendar, not by events), after one exact-cents hash agg
    // and a broadcast cohort-size join. The spine explodes each
    // cohort's own max age so every prefix day gets a row even with
    // zero purchases (the LTV curve must be dense to chart).
    "e17_cohort_ltv" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      val cohort = ev.groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("c_day"))
      val sizes = cohort.groupBy("c_day")
        .agg(count(lit(1)).as("n_users"))
      val cells = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("day"),
          floor(col("value") * 100).cast("long").as("cents"))
        .join(cohort, Seq("user_id"))
        .groupBy(col("c_day"),
          datediff(col("day"), col("c_day")).cast("long").as("age"))
        .agg(sum(col("cents")).as("c"))
      val spine = cells.groupBy("c_day")
        .agg(max(col("age")).as("max_age"))
        .select(col("c_day"),
          explode(sequence(lit(0L), col("max_age"))).as("age"))
      val w = Window.partitionBy("c_day").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(cells, Seq("c_day", "age"), "left")
        .withColumn("cum_cents",
          sum(coalesce(col("c"), lit(0L))).over(w))
        .join(broadcast(sizes), Seq("c_day"))
        .select(col("c_day").as("cohort_day"), col("age"),
          col("n_users"), col("cum_cents"),
          round(col("cum_cents").cast("double") /
            col("n_users").cast("double"), 6).as("ltv_per_user"))
    }),

    // Last-touch attribution — the marketing-analytics op that assigns
    // every conversion to the campaign touch that "gets credit": each
    // purchase attributes to the user's LATEST click at-or-before it
    // (the j8 as-of machinery: one user_id shuffle, no range join),
    // valid only within a 7-day lookback tested in EXACT timestamp
    // arithmetic (ts <= c_ts + INTERVAL — never epoch() truncation,
    // whose second-boundary rounding differs across engines);
    // out-of-window or never-clicked purchases land in an explicit
    // 'unattributed' bucket so revenue always reconciles to the total.
    // Output: per click-day (or unattributed) conversion counts and
    // exact cents.
    "e15_last_touch_attribution" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          floor(col("value") * 100).cast("long").as("cents"))
      val wDedup = Window.partitionBy("user_id", "ts")
        .orderBy(col("event_id").desc)
      val clicks = ev.filter(col("event_type") === "click")
        .withColumn("rn", row_number().over(wDedup))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts"), col("ts").as("c_ts"))
      RelationalOps.asofJoin(purchases, clicks, Seq("user_id"), "ts",
          Seq("c_ts"))
        .withColumn("attributed", col("asof_c_ts").isNotNull &&
          col("ts").cast("timestamp") <=
            col("asof_c_ts").cast("timestamp") + expr("INTERVAL 7 DAY"))
        .withColumn("bucket", when(col("attributed"),
          date_format(col("asof_c_ts").cast("timestamp"), "yyyy-MM-dd"))
          .otherwise(lit("unattributed")))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("cents"))
    }),

    // Concentration (80/20) analysis — "how few users produce 80% of
    // events": users ranked by activity desc, one cumulative window,
    // and the smallest rank whose cumulative share clears 80% — with
    // the threshold tested as cum·100 ≥ total·80 in exact integers so
    // the cut cannot ulp-flip. O(users) after one agg; 1-row output.
    "e14_pareto80" -> ((s, d) => {
      // Rank + running event sum come straight off the SHARED
      // stacked-rank frame's f-metric slice (rfmRanked: rk = activity-
      // desc rank, cum = inclusive running freq sum, totals embedded) —
      // e14's former private prefix pass folded into e11's machinery
      // (VERDICT r15 #5). What remains is one filtered min-aggregate
      // over the materialized frame; the integer threshold test is
      // unchanged (cum·100 ≥ total·80, no ulp flips).
      val f = rfmRanked(s, d).filter(col("m") === "f")
      val tot = f.agg(max(col("n_total")).as("n_users"),
        max(col("total_f")).as("total_events"))
      val reach = f.filter(col("cum") * 100 >= col("total_f") * 80)
        .agg(min(col("rk")).as("k80"))
      tot.crossJoin(broadcast(reach))
        .select(col("n_users"), col("total_events"), col("k80"),
          round(col("k80").cast("double") /
            col("n_users").cast("double") * 100.0, 6)
            .as("pct_users_for_80pct"))
    }),

    // DAU/WAU stickiness (closing e12): per day, the exact distinct
    // actives that day (DAU) and over the trailing 7 days (WAU), and
    // the DAU/WAU stickiness ratio. Rolling DISTINCT does not compose
    // from daily distincts (a user active twice in the window must
    // count once), so each (user, day) activity SUPPORTS the 7
    // forward days it is visible to — an in-row explode of a 7-day
    // spine — and WAU is a plain distinct count per supported day.
    // Fan-out is exactly 7× the (user, day) DISTINCT frame (already
    // tiny relative to events), never 7× the event table; supported
    // days past the corpus edge are dropped on both engines.
    "e12_stickiness" -> ((s, d) => {
      val act = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val maxDay = act.agg(max(col("day")).as("d_max"))
      val dau = act.groupBy("day").agg(countDistinct("user_id").as("dau"))
      val wau = act
        .select(col("user_id"), explode(sequence(col("day"),
          date_add(col("day"), 6))).as("day"))
        .crossJoin(broadcast(maxDay))
        .filter(col("day") <= col("d_max"))
        .groupBy("day").agg(countDistinct("user_id").as("wau"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau").cast("double"), 6)
            .as("stickiness"))
    }),

    // Inter-purchase interval distribution (closing e16): the gap in
    // days between each user's consecutive purchases, reported as a
    // day-gap histogram with the cumulative share — the
    // repeat-purchase cadence behind retention economics (e17 prices
    // the cohorts; this measures the rhythm). One per-user lag window
    // over purchase days + a gap-sized agg; the cumulative window
    // sees the ≤ ~30-row gap histogram.
    "e16_interpurchase" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val gaps = p.withColumn("prev", lag(col("day"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(datediff(col("day"), col("prev")).cast("long")
          .as("gap_days"))
        .groupBy("gap_days").agg(count(lit(1)).as("n"))
      val tot = gaps.agg(sum(col("n")).as("total"))
      val wc = Window.orderBy("gap_days") // gap histogram, ~30 rows
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      gaps.crossJoin(broadcast(tot))
        .select(col("gap_days"), col("n"),
          round(sum(col("n")).over(wc).cast("double") /
            col("total").cast("double"), 6).as("cum_share"))
    }),

    // Growth accounting — per-day user lifecycle states: every active
    // (user, day) classified as NEW (first ever), RETAINED (also
    // active the previous day), RETURNING (gap 2–7 days) or
    // RESURRECTED (gap > 7) — the decomposition behind every "is
    // growth new users or reactivation" chart. One distinct
    // (user, day) reduction, one lag window per user, one
    // (day, state)-sized agg; all integer day arithmetic.
    "e13_lifecycle" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val act = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      act.withColumn("prev", lag(col("day"), 1).over(w))
        .withColumn("state",
          when(col("prev").isNull, lit("new"))
            .when(datediff(col("day"), col("prev")) === 1,
              lit("retained"))
            .when(datediff(col("day"), col("prev")) <= 7,
              lit("returning"))
            .otherwise(lit("resurrected")))
        .groupBy("day", "state")
        .agg(count(lit(1)).as("n_users"))
    }),

    // RFM segmentation — the classic customer-value grid: each user
    // scored 1–5 on Recency (latest activity), Frequency (event
    // count) and Monetary (total cents), quintiles over a TOTAL
    // order (metric desc, user_id tiebreak — ntile on a partial order
    // is nondeterministic across engines; both engines hand earlier
    // buckets the extra rows, so identical total orders give identical
    // buckets). Output is the 125-cell segment census. Each quintile
    // label is ntile's allocation formula applied to a DISTRIBUTED
    // rank (RelationalOps.globalRowNumber: range-partitioned
    // row_number + per-partition offsets) — three range-bucketed
    // passes over O(users), never a single-partition ntile window
    // (the r11 scale-killer list).
    "e11_rfm" -> ((s, d) => {
      // All three metric ranks ride the SHARED stacked-rank frame
      // (rfmRanked — one grouped distributed-prefix pipeline for the
      // whole family, built once and checkpointed; e14 reads the same
      // frame). rank within metric = (key asc, user_id asc) ≡ the
      // metric-desc ntile order; what remains per query is two
      // O(users) hash aggregates.
      rfmRanked(s, d)
        .withColumn("q",
          RelationalOps.ntileFromRank(col("rk"), col("n_total"), 5))
        .groupBy("user_id")
        .agg(max(when(col("m") === "r", col("q"))).as("r_q"),
          max(when(col("m") === "f", col("q"))).as("f_q"),
          max(when(col("m") === "m", col("q"))).as("m_q"))
        .groupBy("r_q", "f_q", "m_q")
        .agg(count(lit(1)).as("n_users"))
    }),

    // A/B experiment readout with CUPED variance reduction — the
    // experimentation-platform operator: users split into arms by a
    // seeded hash (x9's reproducible-assignment discipline, never
    // rand()), the post-period metric is adjusted by the pre-period
    // covariate (adj_i = post_i − θ·(pre_i − pre̅)), and θ =
    // cov(pre,post)/var(pre) comes from dq6's exact-moment discipline:
    // every sum (n, Σx, Σy, Σx², Σxy) is an exact BIGINT over
    // cents-quantized values, so both engines derive θ and the
    // adjusted means from IDENTICAL integers through an identical
    // fixed-order double expression — bit-equal before the rounding.
    // The arm-level adjusted mean needs NO per-user second pass:
    // mean_adj = Σpost/n − θ·(Σpre/n − Σpre_all/n_all), all from the
    // same aggregate rows. Shape: one per-user hash agg, then a 1-row
    // pooled-moment agg and a 2-row arm agg broadcast together —
    // nothing after the first shuffle is bigger than the arm count.
    // Long bound: Σxy ≈ users·(per-user cents)² — exact through sf1
    // at this event density; a 100 TB deployment quantizes to coarser
    // units exactly as dq6 documents.
    "e10_ab_cuped" -> ((s, d) => {
      val cut = lit("2024-01-16").cast("date")
      val ev = Tables.events(s, d).select(col("user_id"),
        to_date(col("ts")).as("day"),
        floor(col("value") * 100).cast("long").as("cents"))
      val users = ev.groupBy("user_id").agg(
        sum(when(col("day") < cut, col("cents")).otherwise(0L))
          .as("pre"),
        sum(when(col("day") >= cut, col("cents")).otherwise(0L))
          .as("post"))
        .withColumn("arm",
          when(graft.operators.TextOps.md5Prefix60(
            concat(lit("arm:"), col("user_id").cast("string"))) % 2
            === 0, lit("A")).otherwise(lit("B")))
      val pooled = users.agg(
        count(lit(1)).as("n_all"),
        sum(col("pre")).as("sx"), sum(col("post")).as("sy"),
        sum(col("pre") * col("pre")).as("sxx"),
        sum(col("pre") * col("post")).as("sxy"))
      val arms = users.groupBy("arm").agg(
        count(lit(1)).as("n_arm"),
        sum(col("pre")).as("sx_arm"), sum(col("post")).as("sy_arm"))
      val nD = col("n_all").cast("double")
      val theta =
        (nD * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
        (nD * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))
      val meanPreAll = col("sx").cast("double") / nD
      val meanPost = col("sy_arm").cast("double") / col("n_arm")
        .cast("double")
      val meanPreArm = col("sx_arm").cast("double") / col("n_arm")
        .cast("double")
      arms.crossJoin(broadcast(pooled))
        .select(col("arm"), col("n_arm"),
          round(meanPost / 100.0, 6).as("mean_post"),
          round((meanPost - theta * (meanPreArm - meanPreAll)) / 100.0, 6)
            .as("mean_adj"),
          round(theta, 6).as("theta"))
    }),

    // Kaplan–Meier survival over time-to-first-purchase WITH right
    // censoring — the concept e5's lag histogram cannot express: a
    // user who never purchased is not a missing row, they are evidence
    // that survival past their observation span is possible, and
    // dropping them biases conversion estimates downward. Each user
    // contributes T = days(first activity → first purchase) as an
    // event, or C = days(first activity → corpus end) as a censoring;
    // S(t) = Π_{i≤t}(1 − d_i/n_i) over the day spine. Shape: two
    // per-user hash aggs + a broadcast 1-row corpus-end probe reduce
    // events to ONE ROW PER USER, then the KM table lives on a ≤31-row
    // day spine — collected into a single row for the running product
    // (the ts8 discipline: a strict ordered fold both engines execute
    // identically on identically-sorted doubles, bit-equal before the
    // 6dp rounding; day-frame size is the fixed observation window,
    // never the corpus).
    "e9_survival" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), to_date(col("ts"))
          .as("day"))
      val entry = ev.groupBy("user_id").agg(min(col("day")).as("d0"))
      val purch = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("day")).as("dp"))
      val end = ev.agg(max(col("day")).as("d_end"))
      val users = entry
        .join(purch, Seq("user_id"), "left")
        .crossJoin(broadcast(end))
        .select(
          when(col("dp").isNotNull,
            datediff(col("dp"), col("d0")).cast("long"))
            .otherwise(datediff(col("d_end"), col("d0")).cast("long"))
            .as("t"),
          col("dp").isNotNull.as("is_event"))
      val total = users.agg(count(lit(1)).as("n_total"))
      val daily = users.groupBy("t")
        .agg(sum(when(col("is_event"), 1L).otherwise(0L)).as("d_t"),
          sum(when(col("is_event"), 0L).otherwise(1L)).as("c_t"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val atRisk = daily.crossJoin(broadcast(total))
        .withColumn("n_t",
          col("n_total") - (sum(col("d_t") + col("c_t")).over(w) -
            (col("d_t") + col("c_t"))))
      // one row holds the sorted day cells; s_t = ordered prefix fold
      val packed = atRisk.agg(array_sort(collect_list(struct(
        col("t"), col("d_t"), col("c_t"), col("n_t")))).as("cells"))
      packed
        .select(posexplode(col("cells")).as(Seq("pos", "cell")),
          col("cells"))
        .select(col("cell.t").as("t"), col("cell.d_t").as("d_t"),
          col("cell.c_t").as("c_t"), col("cell.n_t").as("n_t"),
          round(aggregate(slice(col("cells"), lit(1), col("pos") + 1),
            lit(1.0), (acc, x) => acc * (lit(1.0) -
              x.getField("d_t").cast("double") /
                x.getField("n_t").cast("double"))), 6).as("s_t"))
    })
  )

  /** The e11/e14 shared per-user activity frame (recency, frequency,
    * monetary), PERSISTED with the house idempotent-cache discipline
    * (CacheManager plan equality dedups re-invocations). Both queries
    * feed it through the range-partitioned rank machinery, whose
    * sample/offsets/main branches each re-execute their input lineage
    * — against the cache those branches read a materialized 1-row-per-
    * user frame instead of re-running the events aggregate. */
  private[graft] def rfmUsers(s: SparkSession, d: String): DataFrame = {
    val df = Tables.events(s, d)
      .groupBy("user_id")
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist()
    else df
  }

  /** (session, dir) memo of the ranked frame's eager localCheckpoint —
    * the QueriesDedup.memoChk discipline: CacheManager plan-equality
    * reuse would re-ANALYZE the window+broadcast pipeline per
    * consumer invocation; the checkpointed LogicalRDD shared by object
    * identity costs nothing to reference.
    */
  private val rankedMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      DataFrame]()

  /** The e11/e14 shared STACKED-RANK frame (VERDICT r15 #5 — fold
    * e14's separate prefix pass into e11's machinery): one
    * range-partitioned prefix pipeline ranks all three RFM metric
    * orders AND carries the f-metric's running event sum, so e11's
    * quintile labels and e14's Pareto reach both read a materialized
    * frame instead of each paying the sample/offsets/main branches of
    * their own rank pipeline per run. Columns: (user_id, m ∈ {r,f,m},
    * rk, cum, n_total, total_f) where rk is the 1-indexed rank within
    * metric m's descending order (user_id tiebreak) and cum is the
    * inclusive running sum of `freq` in that order (meaningful for
    * m='f', e14's cumulative-events curve; harmless for the others).
    */
  private[graft] def rfmRanked(s: SparkSession, d: String): DataFrame = {
    val key = (s, d)
    val existing = rankedMemo.get(key)
    if (existing != null) return existing
    val built = rfmRankedPlan(s, d).localCheckpoint()
    val prev = rankedMemo.putIfAbsent(key, built)
    if (prev == null) built
    else {
      built.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ =>
      }
      prev
    }
  }

  /** The raw (un-checkpointed) build pipeline of [[rfmRanked]] — split
    * out so PlanAuditSpec can pin the build's physical properties
    * (native-search bucketing, partitioned windows), which the
    * checkpoint hides from the consumers' plans.
    */
  private[graft] def rfmRankedPlan(s: SparkSession, d: String): DataFrame = {
    val users = rfmUsers(s, d)
    val n1 = users.agg(count(lit(1)).as("n_total"),
      sum(col("freq")).as("total_f"))
    val stacked = users.crossJoin(broadcast(n1)).select(
      col("user_id"), col("n_total"), col("total_f"),
      explode(array(
        struct(lit("r").as("m"),
          (-datediff(col("last_day"), lit("1992-01-01").cast("date")))
            .cast("long").as("key"), lit(0L).as("v")),
        struct(lit("f").as("m"), (-col("freq")).cast("long").as("key"),
          col("freq").cast("long").as("v")),
        struct(lit("m").as("m"), (-col("cents")).cast("long").as("key"),
          lit(0L).as("v")))).as("x"))
      .select(col("user_id"), col("n_total"), col("total_f"),
        col("x.m").as("m"), col("x.key").as("key"), col("x.v").as("v"))
    val nullAdd = (l: Column, o: Column) =>
      when(l.isNull, o).when(o.isNull, l).otherwise(l + o)
    RelationalOps.rangePrefixAggsBy(stacked, Seq("m"),
      Seq(col("key").asc, col("user_id").asc), col("key"),
      Seq(RelationalOps.PrefixSpec(lit(1L), sum, nullAdd, "rk",
          inclusive = true),
        RelationalOps.PrefixSpec(col("v"), sum, nullAdd, "cum",
          inclusive = true)))
  }

  /** e18's fixed value-iteration horizon (mirrored in the oracle). */
  private[graft] val MarkovRounds = 10

  /** e18's transition-probability edges (i, j, p): journeys truncate
    * at the user's first purchase (mapped to the absorbing `(conv)`;
    * journeys without one get a terminal `(null)` edge), `(start)`
    * prepends, and p = n_ij / n_i from exact counts. PERSISTED — the
    * arm derivation and the per-arm rewrite both consume it, and at
    * 100 TB this frame (≤ (types+2)² rows) is the entire residue of
    * the corpus scan.
    */
  private def markovEdges(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val rn = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"),
        col("event_id"))
      .withColumn("rn", row_number().over(w))
    val firstP = rn.groupBy("user_id").agg(
      min(when(col("event_type") === "purchase", col("rn"))).as("prn"),
      max(col("rn")).as("mxall"))
    val j = rn.join(firstP, Seq("user_id"))
      .withColumn("lastrn", coalesce(col("prn"), col("mxall")))
      .filter(col("rn") <= col("lastrn"))
      .select(col("user_id"),
        when(col("event_type") === "purchase", lit("(conv)"))
          .otherwise(col("event_type")).as("st"),
        col("rn"), col("lastrn"))
    val wf = Window.partitionBy("user_id").orderBy(col("rn"))
    val withPrev = j.withColumn("prev", lag(col("st"), 1).over(wf))
    val edges = withPrev.filter(col("prev").isNull)
      .select(lit("(start)").as("i"), col("st").as("j"))
      .unionAll(withPrev.filter(col("prev").isNotNull)
        .select(col("prev").as("i"), col("st").as("j")))
      .unionAll(withPrev
        .filter(col("rn") === col("lastrn") && col("st") =!= "(conv)")
        .select(col("st").as("i"), lit("(null)").as("j")))
    val n = edges.groupBy("i", "j").agg(count(lit(1)).as("nij"))
    val ni = n.groupBy("i").agg(sum(col("nij")).as("ni"))
    val df = n.join(ni, Seq("i"))
      .select(col("i"), col("j"),
        (col("nij").cast("double") / col("ni").cast("double")).as("p"))
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist()
    else df
  }

  /** This family's shared persisted caches (the QueriesDedup.sharedCaches
    * contract: name → builder, pre-built and timed separately by Bench
    * so per-query times are net of cache).
    */
  private[graft] def sharedCaches
      : Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "events.rfm_users" -> (rfmUsers _),
    "events.rfm_ranked" -> (rfmRanked _),
    "events.markov_edges" -> (markovEdges _))

  def unpersistAll(s: SparkSession, d: String): Unit = {
    rfmUsers(s, d).unpersist()
    Option(rankedMemo.remove((s, d))).foreach {
      _.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ =>
      }
    }
    markovEdges(s, d).unpersist()
  }

  /** The e6/e7 shared sessionization frame: gap>30min boundaries via
    * lag + running boundary count, both windows on ONE user_id
    * exchange (plan-guarded in PlanAuditSpec through e6).
    */
  private def sessionized(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val prevTs = lag(col("ts"), 1).over(w)
    val gapS = unix_timestamp(col("ts")) - unix_timestamp(prevTs)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("is_new",
        when(prevTs.isNull || gapS > 1800L, lit(1L)).otherwise(lit(0L)))
      .withColumn("session_idx", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def oracle: Map[String, String] = Map(
    // e12: same support-day explode (generate_series inclusive), same
    // corpus-edge cut, same distinct counts.
    "e12_stickiness" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |mx AS (SELECT max(day) AS d_max FROM act),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM act
        |  GROUP BY 1),
        |sup AS (SELECT user_id, CAST(unnest(generate_series(day,
        |    day + 6, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM act),
        |wau AS (SELECT s.day, count(DISTINCT s.user_id) AS wau
        |  FROM sup s, mx WHERE s.day <= mx.d_max GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau,
        |  round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6)
        |    AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.day""".stripMargin,
    // e16: same per-user lag over distinct purchase days, same gap
    // histogram and cumulative share.
    "e16_interpurchase" ->
      """WITH p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT CAST(date_diff('day', prev, day) AS BIGINT)
        |    AS gap_days
        |  FROM (SELECT day, lag(day) OVER (PARTITION BY user_id
        |      ORDER BY day) AS prev FROM p)
        |  WHERE prev IS NOT NULL),
        |h AS (SELECT gap_days, count(*) AS n FROM g GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM h)
        |SELECT gap_days, n,
        |  round(CAST(sum(n) OVER (ORDER BY gap_days
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS cum_share
        |FROM h, t""".stripMargin,
    // e17: same cohort assignment, cell grid, dense age spine
    // (generate_series per cohort) and cumulative window.
    "e17_cohort_ltv" ->
      """WITH co AS (SELECT user_id, CAST(min(ts) AS DATE) AS c_day
        |  FROM events GROUP BY 1),
        |sz AS (SELECT c_day, count(*) AS n_users FROM co GROUP BY 1),
        |cells AS (SELECT co.c_day,
        |    CAST(date_diff('day', co.c_day, CAST(e.ts AS DATE))
        |      AS BIGINT) AS age,
        |    CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT)
        |      AS c
        |  FROM events e JOIN co ON e.user_id = co.user_id
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2),
        |sp AS (SELECT c_day,
        |    unnest(range(0, max_age + 1)) AS age
        |  FROM (SELECT c_day, max(age) AS max_age FROM cells
        |    GROUP BY 1)),
        |cum AS (SELECT sp.c_day, CAST(sp.age AS BIGINT) AS age,
        |    CAST(sum(coalesce(cells.c, 0)) OVER (PARTITION BY sp.c_day
        |      ORDER BY sp.age
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_cents
        |  FROM sp LEFT JOIN cells
        |    ON sp.c_day = cells.c_day AND sp.age = cells.age)
        |SELECT cum.c_day AS cohort_day, cum.age, sz.n_users,
        |  cum.cum_cents,
        |  round(CAST(cum.cum_cents AS DOUBLE)
        |    / CAST(sz.n_users AS DOUBLE), 6) AS ltv_per_user
        |FROM cum JOIN sz ON cum.c_day = sz.c_day""".stripMargin,
    // e15: native ASOF (j8's proven twin of the union+window form) +
    // the identical exact-interval validity test and bucketing.
    "e15_last_touch_attribution" ->
      """WITH p AS (SELECT user_id, ts,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, ts AS c_ts FROM (
        |  SELECT user_id, ts, row_number() OVER (
        |    PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click') WHERE rn = 1),
        |j AS (SELECT p.user_id, p.ts, p.cents, c.c_ts
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND c.ts <= p.ts),
        |b AS (SELECT cents,
        |    CASE WHEN c_ts IS NOT NULL
        |        AND ts <= c_ts + INTERVAL 7 DAY
        |      THEN strftime(c_ts, '%Y-%m-%d')
        |      ELSE 'unattributed' END AS bucket
        |  FROM j)
        |SELECT bucket, count(*) AS n_purchases,
        |  CAST(sum(cents) AS BIGINT) AS cents
        |FROM b GROUP BY 1""".stripMargin,
    "e1_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.v_ts
        |        AND e.ts <= v.v_ts + INTERVAL 24 HOUR GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        |        AND e.ts <= c.c_ts + INTERVAL 24 HOUR GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click,
        |  (SELECT count(*) FROM p) AS n_purchase""".stripMargin,
    "e2_retention" ->
      """WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |      FROM events),
        |r AS (SELECT f.cohort_day, count(*) AS retained
        |      FROM f JOIN a ON f.user_id = a.user_id
        |      WHERE a.day = f.cohort_day + 7 GROUP BY 1),
        |c AS (SELECT cohort_day, count(*) AS cohort_size
        |      FROM f GROUP BY 1)
        |SELECT c.cohort_day, c.cohort_size,
        |  coalesce(r.retained, 0) AS retained,
        |  round(coalesce(r.retained, 0)
        |    / CAST(c.cohort_size AS DOUBLE), 6) AS retention_rate
        |FROM c LEFT JOIN r ON c.cohort_day = r.cohort_day""".stripMargin,
    "e3_transitions" ->
      """WITH tr AS (SELECT lag(event_type) OVER (PARTITION BY user_id
        |              ORDER BY ts, event_id) AS prev_type,
        |            event_type AS next_type
        |            FROM events),
        |t AS (SELECT prev_type, next_type, count(*) AS n FROM tr
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT sum(n) AS tot FROM t)
        |SELECT prev_type, next_type, n,
        |  round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
        |FROM t, tot""".stripMargin,
    // e18: the same journey truncation, edge counting and per-arm
    // rewrite, then MarkovRounds unrolled value-iteration CTEs. Every
    // v$r is MATERIALIZED (referenced by the next round's join AND
    // its absorbing carry — inlined, the chain re-expands 2^R times),
    // and every Σ P·v folds in ORDER BY target order, mirroring the
    // Spark side's sorted fold.
    "e18_markov_attribution" -> {
      val rounds = (1 to MarkovRounds).map { r =>
        s"""v$r AS MATERIALIZED (SELECT e.arm, e.i AS st,
           |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list(e.p * v.v ORDER BY e.j)), (a, b) -> a + b) AS v
           |  FROM ae e JOIN v${r - 1} v ON v.arm = e.arm AND v.st = e.j
           |  GROUP BY 1, 2
           |  UNION ALL
           |  SELECT arm, st, v FROM v${r - 1}
           |  WHERE st IN ('(conv)', '(null)'))""".stripMargin
      }.mkString(",\n")
      s"""WITH rn AS (SELECT user_id, event_type, ts, event_id,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn
         |  FROM events),
         |fp AS (SELECT user_id,
         |    min(CASE WHEN event_type = 'purchase' THEN rn END) AS prn,
         |    max(rn) AS mxall FROM rn GROUP BY user_id),
         |jj AS (SELECT r.user_id,
         |    CASE WHEN r.event_type = 'purchase' THEN '(conv)'
         |      ELSE r.event_type END AS st,
         |    r.rn, COALESCE(fp.prn, fp.mxall) AS lastrn
         |  FROM rn r JOIN fp ON fp.user_id = r.user_id
         |  WHERE r.rn <= COALESCE(fp.prn, fp.mxall)),
         |wp AS (SELECT user_id, st, rn, lastrn,
         |    lag(st) OVER (PARTITION BY user_id ORDER BY rn) AS prev
         |  FROM jj),
         |ed AS (SELECT '(start)' AS i, st AS j FROM wp WHERE prev IS NULL
         |  UNION ALL SELECT prev, st FROM wp WHERE prev IS NOT NULL
         |  UNION ALL SELECT st, '(null)' FROM wp
         |    WHERE rn = lastrn AND st <> '(conv)'),
         |n AS (SELECT i, j, count(*) AS nij FROM ed GROUP BY 1, 2),
         |ni AS (SELECT i, sum(nij) AS ni FROM n GROUP BY 1),
         |pe AS MATERIALIZED (SELECT n.i, n.j,
         |    CAST(nij AS DOUBLE) / CAST(ni.ni AS DOUBLE) AS p
         |  FROM n JOIN ni ON ni.i = n.i),
         |arms AS MATERIALIZED (SELECT DISTINCT i AS arm FROM pe
         |    WHERE i <> '(start)'
         |  UNION ALL SELECT '(base)'),
         |ae AS MATERIALIZED (SELECT arm, i,
         |    CASE WHEN j = arm THEN '(null)' ELSE j END AS j,
         |    sum(p) AS p
         |  FROM arms CROSS JOIN pe WHERE i <> arm GROUP BY 1, 2, 3),
         |v0 AS MATERIALIZED (SELECT arm, i AS st,
         |    CAST(0.0 AS DOUBLE) AS v
         |    FROM (SELECT DISTINCT arm, i FROM ae)
         |  UNION ALL SELECT arm, '(conv)', CAST(1.0 AS DOUBLE)
         |    FROM arms
         |  UNION ALL SELECT arm, '(null)', CAST(0.0 AS DOUBLE)
         |    FROM arms),
         |$rounds,
         |pb AS (SELECT v AS pb FROM v$MarkovRounds
         |  WHERE arm = '(base)' AND st = '(start)'),
         |re AS (SELECT arm AS channel, pb.pb, v AS pr,
         |    CASE WHEN pb.pb > 0.0 THEN 1.0 - v / pb.pb
         |      ELSE 0.0 END AS eff
         |  FROM v$MarkovRounds, pb
         |  WHERE arm <> '(base)' AND st = '(start)'),
         |tot AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(eff ORDER BY channel)), (a, b) -> a + b) AS te
         |  FROM re)
         |SELECT channel, round(pb, 6) AS p_base,
         |  round(pr, 6) AS p_removed,
         |  round(eff, 6) AS removal_effect,
         |  round(CASE WHEN te > 0.0 THEN eff / te ELSE 0.0 END, 6)
         |    AS share
         |FROM re, tot""".stripMargin
    },
    "e4_attribution" ->
      """WITH t AS (
        |  SELECT user_id, event_type, ts, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN ts END
        |      IGNORE NULLS) OVER w AS touch_ts,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |      THEN event_type END IGNORE NULLS) OVER w AS touch_ch
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p AS (
        |  SELECT CASE WHEN touch_ts IS NOT NULL
        |        AND touch_ts >= ts - INTERVAL 7 DAY
        |      THEN touch_ch ELSE '(none)' END AS channel,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM t WHERE event_type = 'purchase')
        |SELECT channel, count(*) AS n_purchases,
        |  round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS revenue
        |FROM p GROUP BY 1""".stripMargin,
    // Mirrors e5: e1's exact stage CTEs, then date_diff('second')
    // (truncated-second delta, = Spark's unix_timestamp difference)
    // floor-divided into hour buckets.
    "e5_conversion_lag" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.v_ts
        |        AND e.ts <= v.v_ts + INTERVAL 24 HOUR GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        |        AND e.ts <= c.c_ts + INTERVAL 24 HOUR GROUP BY 1)
        |SELECT date_diff('second', v.v_ts, p.p_ts) // 3600 AS lag_hours,
        |  count(*) AS n_users
        |FROM p JOIN v ON p.user_id = v.user_id
        |GROUP BY 1""".stripMargin,
    // Mirrors e6: lag + running-sum boundary count in one window chain,
    // date_diff('second') = Spark's truncated-second unix_timestamp
    // difference.
    "e6_sessionize" ->
      """WITH g AS (SELECT user_id, ts, event_id,
        |  date_diff('second',
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |    ts) AS gap_s
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |  sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS session_idx
        |  FROM g)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  date_diff('second', min(ts), max(ts)) AS duration_s
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "e8_cohort_matrix" ->
      """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |            FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
        |sz AS (SELECT cohort_day, count(*) AS cohort_size FROM f
        |       GROUP BY 1),
        |m AS (SELECT f.cohort_day,
        |      CAST(ev.day - f.cohort_day AS BIGINT) AS age,
        |      count(*) AS n_active
        |      FROM f JOIN ev ON f.user_id = ev.user_id
        |      GROUP BY 1, 2)
        |SELECT m.cohort_day, m.age, m.n_active, sz.cohort_size,
        |  round(CAST(m.n_active AS DOUBLE)
        |    / CAST(sz.cohort_size AS DOUBLE), 6) AS rate
        |FROM m JOIN sz ON m.cohort_day = sz.cohort_day""".stripMargin,
    // e7: e6's session CTEs carrying event_type, path via ordered list
    // aggregate, unique path string as the top-20 tiebreak
    "e7_session_paths" ->
      """WITH g AS (SELECT user_id, ts, event_id, event_type,
        |  date_diff('second',
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |    ts) AS gap_s
        |  FROM events),
        |s AS (SELECT user_id, ts, event_id, event_type,
        |  sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS session_idx
        |  FROM g),
        |p AS (SELECT user_id, session_idx,
        |    array_to_string(list(event_type ORDER BY ts, event_id), '>')
        |      AS path
        |  FROM s GROUP BY 1, 2),
        |c AS (SELECT path, count(*) AS n_sessions FROM p GROUP BY 1)
        |SELECT path, n_sessions FROM c
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    // e14: same integer-threshold cut.
    "e14_pareto80" ->
      """WITH ua AS (SELECT user_id, count(*) AS n FROM events
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |    count(*) AS n_users FROM ua),
        |r AS (SELECT user_id, n,
        |    CAST(row_number() OVER (ORDER BY n DESC, user_id)
        |      AS BIGINT) AS rk,
        |    CAST(sum(n) OVER (ORDER BY n DESC, user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM ua),
        |k AS (SELECT min(rk) AS k80 FROM r, t
        |  WHERE cum * 100 >= total * 80)
        |SELECT t.n_users, t.total AS total_events, k.k80,
        |  round(CAST(k.k80 AS DOUBLE) / CAST(t.n_users AS DOUBLE)
        |    * 100.0, 6) AS pct_users_for_80pct
        |FROM t, k""".stripMargin,
    // e13: same lag classification over the distinct activity grid.
    "e13_lifecycle" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |l AS (SELECT user_id, day,
        |    lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
        |  FROM act),
        |st AS (SELECT day,
        |    CASE WHEN prev IS NULL THEN 'new'
        |      WHEN day - prev = 1 THEN 'retained'
        |      WHEN day - prev <= 7 THEN 'returning'
        |      ELSE 'resurrected' END AS state
        |  FROM l)
        |SELECT day, state, count(*) AS n_users
        |FROM st GROUP BY 1, 2""".stripMargin,
    // e11: identical total orders feed ntile on both engines.
    "e11_rfm" ->
      """WITH u AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
        |    count(*) AS freq,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |s AS (SELECT user_id,
        |    CAST(ntile(5) OVER (ORDER BY last_day DESC, user_id)
        |      AS BIGINT) AS r_q,
        |    CAST(ntile(5) OVER (ORDER BY freq DESC, user_id)
        |      AS BIGINT) AS f_q,
        |    CAST(ntile(5) OVER (ORDER BY cents DESC, user_id)
        |      AS BIGINT) AS m_q
        |  FROM u)
        |SELECT r_q, f_q, m_q, count(*) AS n_users
        |FROM s GROUP BY 1, 2, 3""".stripMargin,
    // e10: identical exact-moment CUPED; every arithmetic step in the
    // same operand order over the same exact BIGINTs.
    "e10_ab_cuped" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |u AS (SELECT user_id,
        |    CAST(sum(CASE WHEN day < DATE '2024-01-16'
        |      THEN cents ELSE 0 END) AS BIGINT) AS pre,
        |    CAST(sum(CASE WHEN day >= DATE '2024-01-16'
        |      THEN cents ELSE 0 END) AS BIGINT) AS post
        |  FROM ev GROUP BY 1),
        |ua AS (SELECT *, CASE WHEN CAST(concat('0x',
        |      substr(md5(concat('arm:', CAST(user_id AS VARCHAR))),
        |      1, 15)) AS BIGINT) % 2 = 0
        |    THEN 'A' ELSE 'B' END AS arm FROM u),
        |p AS (SELECT count(*) AS n_all,
        |    CAST(sum(pre) AS BIGINT) AS sx,
        |    CAST(sum(post) AS BIGINT) AS sy,
        |    CAST(sum(pre * pre) AS BIGINT) AS sxx,
        |    CAST(sum(pre * post) AS BIGINT) AS sxy FROM ua),
        |a AS (SELECT arm, count(*) AS n_arm,
        |    CAST(sum(pre) AS BIGINT) AS sx_arm,
        |    CAST(sum(post) AS BIGINT) AS sy_arm FROM ua GROUP BY 1)
        |SELECT arm, n_arm,
        |  round((CAST(sy_arm AS DOUBLE) / CAST(n_arm AS DOUBLE))
        |    / 100.0, 6) AS mean_post,
        |  round((CAST(sy_arm AS DOUBLE) / CAST(n_arm AS DOUBLE)
        |    - ((CAST(n_all AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n_all AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |      * (CAST(sx_arm AS DOUBLE) / CAST(n_arm AS DOUBLE)
        |        - CAST(sx AS DOUBLE) / CAST(n_all AS DOUBLE)))
        |    / 100.0, 6) AS mean_adj,
        |  round((CAST(n_all AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n_all AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS theta
        |FROM a, p""".stripMargin,
    // e9: identical KM construction; the survival product is the same
    // ordered left fold over day-ascending factors (ts8 discipline).
    "e9_survival" ->
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS DATE) AS day
        |            FROM events),
        |en AS (SELECT user_id, min(day) AS d0 FROM ev GROUP BY 1),
        |pu AS (SELECT user_id, min(day) AS dp FROM ev
        |       WHERE event_type = 'purchase' GROUP BY 1),
        |ee AS (SELECT max(day) AS d_end FROM ev),
        |us AS (SELECT CASE WHEN pu.dp IS NOT NULL
        |      THEN CAST(date_diff('day', en.d0, pu.dp) AS BIGINT)
        |      ELSE CAST(date_diff('day', en.d0, ee.d_end) AS BIGINT)
        |      END AS t,
        |    pu.dp IS NOT NULL AS is_event
        |  FROM en LEFT JOIN pu USING (user_id), ee),
        |tt AS (SELECT count(*) AS n_total FROM us),
        |dl AS (SELECT t,
        |    CAST(sum(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d_t,
        |    CAST(sum(CASE WHEN is_event THEN 0 ELSE 1 END) AS BIGINT)
        |      AS c_t
        |  FROM us GROUP BY 1),
        |ar AS (SELECT t, d_t, c_t,
        |    n_total - CAST(sum(d_t + c_t) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) + (d_t + c_t) AS n_t
        |  FROM dl, tt),
        |pk AS (SELECT list(t ORDER BY t) AS ts,
        |    list(d_t ORDER BY t) AS ds, list(c_t ORDER BY t) AS cs,
        |    list(n_t ORDER BY t) AS ns FROM ar),
        |r AS (SELECT unnest(range(len(ts))) AS i, ts, ds, cs, ns FROM pk)
        |SELECT ts[i+1] AS t, ds[i+1] AS d_t, cs[i+1] AS c_t,
        |  ns[i+1] AS n_t,
        |  round(list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
        |    list_transform(range(i+1), j -> 1.0 -
        |      CAST(ds[j+1] AS DOUBLE) / CAST(ns[j+1] AS DOUBLE))),
        |    (a, x) -> a * x), 6) AS s_t
        |FROM r""".stripMargin
  )
}
