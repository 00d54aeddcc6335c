package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral path (funnel) analysis over the event stream: each user's
  * events collapse to one ordered initial-letter path string, and journey
  * questions become regexp tests on that string — the classic
  * sessionless funnel formulation (cf. MATCH_RECOGNIZE) that needs ONE
  * shuffle on user_id regardless of how many funnel steps are asked.
  */
object FunnelQueries extends QueryModule {

  /** q176: view→click→purchase funnel. Per user the path is built by
    * sorting (ts, initial) structs INSIDE the aggregate (array_sort after
    * collect_list — map-side combinable list, one exchange on user_id, no
    * window sort), so path construction is deterministic even under ties:
    * the initial participates in the sort key. (user_id, ts) is unique in
    * the data, so the oracle's ORDER BY ts, initial agrees. Funnel
    * membership is an ordered-subsequence regexp on the path — adding a
    * funnel step costs a regexp change, not another join or pass. */
  private def q176(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"user_id", $"ts",
        substring($"event_type", 1, 1).as("i"))
      .groupBy($"user_id")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(ts, i))), x -> x.i), '')")
        .as("path"))
      .groupBy(substring($"path", 1, 1).as("first_event"))
      .agg(count(lit(1)).as("n_users"),
        // strict funnel: the three steps CONSECUTIVE (no intervening events)
        sum($"path".contains("vcp").cast("long")).as("n_strict_vcp"),
        // early funnel: ordered subsequence within the first 10 events
        sum(substring($"path", 1, 10).rlike("v.*c.*p").cast("long"))
          .as("n_early_funnel"),
        round(avg(length($"path")), 2).as("avg_path_len"))
      .orderBy($"first_event")
  }
  private val q176Sql =
    """WITH paths AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, substr(event_type, 1, 1)) AS path
      |  FROM events GROUP BY user_id)
      |SELECT substr(path, 1, 1) AS first_event,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(CASE WHEN path LIKE '%vcp%' THEN 1 ELSE 0 END) AS BIGINT) AS n_strict_vcp,
      |  CAST(sum(CASE WHEN regexp_matches(substr(path, 1, 10), 'v.*c.*p') THEN 1 ELSE 0 END) AS BIGINT) AS n_early_funnel,
      |  round(avg(length(path)), 2) AS avg_path_len
      |FROM paths GROUP BY 1 ORDER BY 1""".stripMargin

  /** q188: last-touch revenue attribution — each purchase is credited to
    * the user's most recent PRECEDING view or click ("direct" when none),
    * then revenue rolls up per channel. The lookup is not a join: one
    * window pass per user carries the latest touch forward
    * (`last(..., ignoreNulls)` over UNBOUNDED..1 PRECEDING — the same
    * LOCF kernel as q99), so attribution costs exactly one exchange+sort
    * on user_id however long the touch history is. (ts, event_id) makes
    * the order total, so "most recent" is unambiguous under same-ts
    * ties. Money flows as LONG cents; the one division happens after the
    * exact sum. */
  private def q188(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id", $"ts", $"event_id", $"event_type",
        round($"value" * 100).cast("long").as("cents"))
      .withColumn("touch",
        last(when($"event_type" =!= "purchase", $"event_type"),
          ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .groupBy(coalesce($"touch", lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum($"cents") / 100.0, 2).as("revenue"))
      .orderBy($"channel")
  }
  private val q188Sql =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      |t AS (
      |  SELECT *, last_value(CASE WHEN event_type <> 'purchase'
      |      THEN event_type END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY tsu, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      |  FROM ev)
      |SELECT coalesce(touch, 'direct') AS channel,
      |  CAST(count(*) AS BIGINT) AS n_purchases,
      |  round(sum(cents) / 100.0, 2) AS revenue
      |FROM t WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1""".stripMargin

  private val mkIters = 16
  private val channels = Seq("click", "error", "signup", "view")

  /** q259: data-driven (Markov removal-effect) attribution — the upgrade
    * over q188's last-touch rule: build the first-order journey chain
    * start → channels → conv/null (journey = each user's events before
    * their first purchase, total-ordered by (ts, event_id)), estimate
    * transition probabilities as exact 1e8-scaled integer ratios (q121's
    * fixed-point idiom), then for each channel compute the chain's
    * conversion probability WITH THAT CHANNEL ABSORBED TO ZERO — the
    * removal effect (Anderl et al. 2016): how much conversion the channel
    * actually carries, counting multi-touch paths last-touch can't see.
    *
    * The data-sized work is one window pass per user plus a grouped
    * count; the transition matrix is ≤ (|channels|+1)·(|channels|+3)
    * cells — a FIXED-enum-bounded collect — and the 5 absorbing-chain
    * value iterations run on the driver in pure integer arithmetic
    * (sum-of-products then one `div 1e8` per state per round), which the
    * oracle replays as unrolled CTEs. 16 rounds bound path length; the
    * chain's spectral radius < 1 makes the truncation identical in both
    * engines (they run the SAME 16 rounds, so even pre-convergence state
    * hash-matches). */
  private def q259(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select($"user_id", $"event_type", $"ts", $"event_id")
    val r = ev.withColumn("rn",
      row_number().over(Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
    val fp = r.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"rn").as("fp"))
    val j = r.join(fp, Seq("user_id"), "left")
      .filter($"event_type" =!= "purchase" && ($"fp".isNull || $"rn" < $"fp"))
    val wj = Window.partitionBy($"user_id").orderBy($"rn")
    val steps = j.select(
      coalesce(lag($"event_type", 1).over(wj), lit("start")).as("a"),
      $"event_type".as("b"))
    val lastc = j.withColumn("rk", row_number().over(
        Window.partitionBy($"user_id").orderBy($"rn".desc)))
      .filter($"rk" === 1).select($"user_id", $"event_type".as("lastc"))
    val term = r.select($"user_id").distinct()
      .join(fp, Seq("user_id"), "left").join(lastc, Seq("user_id"), "left")
      .select(coalesce($"lastc", lit("start")).as("a"),
        when($"fp".isNotNull, "conv").otherwise("null").as("b"))
    val p = steps.union(term)
      .groupBy($"a", $"b").agg(count(lit(1)).as("n"))
      .withColumn("t", sum($"n").over(Window.partitionBy($"a")))
      .select($"a", $"b", expr("n * 100000000 div t").as("p"))
      .collect().map(row => (row.getString(0), row.getString(1)) -> row.getLong(2))
      .toMap
    val transients = "start" +: channels
    def pConv(removed: String): Long = {
      var v = transients.map(_ -> 0L).toMap
      for (_ <- 1 to mkIters) {
        v = transients.map { st =>
          st -> (if (st == removed) 0L
          else {
            val sum = ("conv" +: "null" +: transients).map { b =>
              val pv = p.getOrElse((st, b), 0L)
              val vb = if (b == "conv") 100000000L
                else if (b == "null" || b == removed) 0L
                else v(b)
              pv * vb
            }.sum
            sum / 100000000L
          })
        }.toMap
      }
      v("start")
    }
    val full = pConv("none")
    val rows = ("none" +: channels).map { c =>
      val pc = pConv(c)
      val ppm = if (full > 0) (full - pc) * 1000000L / full else 0L
      (c, pc, ppm)
    }
    rows.toDF("removed", "p_conv_scaled", "removal_ppm").orderBy($"removed")
  }
  private val q259Sql = {
    def chain(tag: String, removed: String): String = {
      val rmCase =
        if (removed.isEmpty) "" else s" WHEN p.b = '$removed' THEN 0"
      val guard = if (removed.isEmpty) "" else s" WHERE p.a <> '$removed'"
      val iters = (1 to mkIters).map { t =>
        s"""v$tag$t AS MATERIALIZED (SELECT p.a AS s, CAST(sum(p.p *
           |    CASE WHEN p.b = 'conv' THEN 100000000
           |         WHEN p.b = 'null' THEN 0$rmCase
           |         ELSE coalesce(v.v, 0) END) // 100000000 AS BIGINT) AS v
           |  FROM p LEFT JOIN v$tag${t - 1} v ON p.b = v.s$guard
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""v${tag}0 AS MATERIALIZED (SELECT unnest(['start','click','error','signup','view']) AS s,
         |  CAST(0 AS BIGINT) AS v),
         |$iters""".stripMargin
    }
    val chains = chain("n", "") +: channels.map(c => chain(c, c))
    val res = ("none" -> "n") +: channels.map(c => c -> c)
    val resSel = res.map { case (name, tag) =>
      s"SELECT '$name' AS removed, (SELECT v FROM v$tag$mkIters WHERE s = 'start') AS p_conv"
    }.mkString("\nUNION ALL\n")
    s"""WITH r AS (SELECT user_id, event_type, row_number() OVER (
       |    PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn
       |  FROM events),
       |fp AS (SELECT user_id,
       |    min(CASE WHEN event_type = 'purchase' THEN rn END) AS fp
       |  FROM r GROUP BY 1),
       |j AS (SELECT r.user_id, r.event_type, r.rn
       |  FROM r JOIN fp USING (user_id)
       |  WHERE r.event_type <> 'purchase' AND (fp.fp IS NULL OR r.rn < fp.fp)),
       |steps AS (SELECT coalesce(lag(event_type) OVER (
       |    PARTITION BY user_id ORDER BY rn), 'start') AS a, event_type AS b
       |  FROM j),
       |lastc AS (SELECT user_id, event_type AS lastc FROM (
       |  SELECT user_id, event_type, row_number() OVER (
       |    PARTITION BY user_id ORDER BY rn DESC) AS rk FROM j) t WHERE rk = 1),
       |term AS (SELECT coalesce(l.lastc, 'start') AS a,
       |    CASE WHEN fp.fp IS NOT NULL THEN 'conv' ELSE 'null' END AS b
       |  FROM fp LEFT JOIN lastc l USING (user_id)),
       |cnt AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM (
       |  SELECT a, b FROM steps UNION ALL SELECT a, b FROM term) e GROUP BY 1, 2),
       |tot AS (SELECT a, CAST(sum(n) AS BIGINT) AS t FROM cnt GROUP BY 1),
       |p AS MATERIALIZED (SELECT cnt.a, cnt.b,
       |    CAST(cnt.n * 100000000 // tot.t AS BIGINT) AS p
       |  FROM cnt JOIN tot USING (a)),
       |${chains.mkString(",\n")},
       |res AS MATERIALIZED ($resSel)
       |SELECT removed, p_conv AS p_conv_scaled,
       |  CASE WHEN (SELECT p_conv FROM res WHERE removed = 'none') > 0
       |    THEN CAST(((SELECT p_conv FROM res WHERE removed = 'none') - p_conv)
       |      * 1000000 // (SELECT p_conv FROM res WHERE removed = 'none') AS BIGINT)
       |    ELSE 0 END AS removal_ppm
       |FROM res ORDER BY removed""".stripMargin
  }

  /** q266: sequential-pattern support — for every ORDERED type-triple
    * (a → … → b → … → c, gaps allowed), the number of users whose event
    * history contains it as a subsequence, with the q131 trigram family
    * answering only the CONTIGUOUS version. Naive subsequence mining is
    * a C(len,3) positional join per user — hopeless on long histories;
    * the bounded formulation inverts it: the PATTERN space is the
    * |types|³ = 125 grid (enum-bounded, broadcast), each user collapses
    * to one path string (q176's one-shuffle construction), and support
    * is a regexp containment test per (user, pattern) — n·125 scans,
    * linear in users at any history length. Both engines run the same
    * 'a.*b.*c' initial-letter regexp; top-20 by (support DESC, pattern)
    * keeps the LIMIT engine-stable. */
  private def q266(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val paths = Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id",
        substring($"event_type", 1, 1).as("i"))
      .groupBy($"user_id")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(ts, event_id, i))), x -> x.i), '')")
        .as("path"))
    val letters = Seq("c", "e", "p", "s", "v")
    val pats = (for (a <- letters; b <- letters; c <- letters)
      yield (s"$a$b$c", s"$a.*$b.*$c")).toDF("pattern", "re")
    paths.crossJoin(broadcast(pats))
      .filter(expr("path rlike re"))
      .groupBy($"pattern").agg(count(lit(1)).as("support"))
      .orderBy($"support".desc, $"pattern")
      .limit(20)
  }
  private val q266Sql = {
    val letters = Seq("c", "e", "p", "s", "v")
    val rows = (for (a <- letters; b <- letters; c <- letters)
      yield s"('$a$b$c', '$a.*$b.*$c')").mkString(", ")
    s"""WITH paths AS (
       |  SELECT user_id, string_agg(substr(event_type, 1, 1), ''
       |      ORDER BY ts, event_id) AS path
       |  FROM events GROUP BY user_id),
       |pats(pattern, re) AS (VALUES $rows)
       |SELECT pattern, CAST(count(*) AS BIGINT) AS support
       |FROM paths CROSS JOIN pats
       |WHERE regexp_matches(path, re)
       |GROUP BY 1 ORDER BY support DESC, pattern LIMIT 20""".stripMargin
  }

  /** q284: token-bucket rate-limit replay — "which users would a
    * 5-burst / 1-per-10-min limiter have throttled", the admission
    * simulation an abuse/ingest team runs before turning a limiter on.
    * The recurrence (avail = min(5, avail + gap div 10min), admit if
    * avail > 0) is a per-user ORDERED fold that no window frame
    * expresses (the min-cap makes it non-associative), so this gate
    * exercises the remaining batch iteration shape:
    * `groupByKey(...).flatMapSortedGroups(ts, event_id)` — Spark sorts
    * each group WITHIN the exchange (secondary sort, no per-group
    * array materialization) and streams it through a typed fold;
    * per-user state is one long however long the history. Refill credit
    * is whole tokens per gap (integer div, both engines), ties on ts
    * break by event_id, and the oracle replays the identical recurrence
    * as a depth≈max-events-per-user recursive CTE. */
  private def q284(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"user_id", $"ts", $"event_id")
      .as[(Long, Long, Long)]
    ev.groupByKey(_._1)
      .flatMapSortedGroups($"ts", $"event_id") { (user: Long, it: Iterator[(Long, Long, Long)]) =>
        val st = graft.streaming.StreamingOps.foldBucketOrdered(
          graft.streaming.StreamingOps.bucketZero, it.map(_._2))
        Iterator((user, st.n, st.adm))
      }
      .toDF("user_id", "n_events", "n_admitted")
      .withColumn("n_rejected", $"n_events" - $"n_admitted")
      .orderBy($"user_id")
  }
  private val q284Sql =
    """WITH RECURSIVE
      |ser AS MATERIALIZED (SELECT user_id, epoch_ns(ts) AS ts, event_id,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_ns(ts), event_id) AS BIGINT) AS rn
      |  FROM events),
      |nn AS (SELECT user_id, max(rn) AS n_events FROM ser GROUP BY 1),
      |st(user_id, rn, avail, adm) AS (
      |  SELECT user_id, CAST(1 AS BIGINT), CAST(4 AS BIGINT),
      |    CAST(1 AS BIGINT) FROM ser WHERE rn = 1
      |  UNION ALL
      |  SELECT s.user_id, s.rn,
      |    CASE WHEN least(5, st.avail + (s.ts - p.ts) // 600000000000) > 0
      |      THEN least(5, st.avail + (s.ts - p.ts) // 600000000000) - 1
      |      ELSE least(5, st.avail + (s.ts - p.ts) // 600000000000) END,
      |    st.adm + CASE WHEN least(5, st.avail
      |        + (s.ts - p.ts) // 600000000000) > 0
      |      THEN 1 ELSE 0 END
      |  FROM st
      |  JOIN ser s ON s.user_id = st.user_id AND s.rn = st.rn + 1
      |  JOIN ser p ON p.user_id = st.user_id AND p.rn = st.rn)
      |SELECT st.user_id, nn.n_events, st.adm AS n_admitted,
      |  nn.n_events - st.adm AS n_rejected
      |FROM st JOIN nn ON st.user_id = nn.user_id AND st.rn = nn.n_events
      |ORDER BY st.user_id""".stripMargin

  /** q299: SHAPLEY-VALUE attribution — the game-theoretic completion of
    * the attribution triple (q188 last-touch, q259 Markov removal): each
    * channel's credit is its average marginal contribution to the
    * empirical coalition value v(S) = conversion rate (ppm, floor) of
    * journeys whose channel set is contained in S, averaged over all
    * orderings — the axiomatic answer to "which touchpoints earn the
    * conversion". v is a RATE, not a count, so it is NOT a sum of
    * unanimity games and the closed-form shortcut (credit/|C|) does not
    * apply: the full 2^n coalition enumeration with factorial weights
    * runs for real.
    *
    * Scale shape (the q259 bounded-state discipline): the data-sized work
    * is one window pass (first-purchase rank) plus one bit_or groupBy per
    * user — after that the state is ≤ 2^n = 16 coalition cells (n = the
    * FIXED 4-channel enum), collected bounded and expanded on the driver
    * in exact integer arithmetic. phi_num is in ppm × k!(n−1−k)! units
    * summed over subsets (dividing by n! = 24 is left to the reader
    * because Spark's `div` truncates toward zero while DuckDB's `//`
    * floors — on possibly-negative Shapley values the two would disagree;
    * the undivided sum is exact in both). Efficiency (Σ_i φ_i = n!·(v(N)
    * − v(∅))) holds exactly on the floored v because the identity is
    * linear in v — Round8PlanShapeSpec asserts it. Oracle: the identical
    * construction over generate_series(0,15) bitmasks. */
  private def q299(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val chBits = Seq("click" -> 1, "error" -> 2, "signup" -> 4, "view" -> 8)
    val n = chBits.size
    val ev = Tables.events(s, dir)
      .select($"user_id", $"event_type", $"ts", $"event_id")
    val r = ev.withColumn("rn",
      row_number().over(Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
    val fp = r.groupBy($"user_id").agg(
      min(when($"event_type" === "purchase", $"rn")).as("fp"))
    val j = r.join(fp, Seq("user_id"))
      .filter($"event_type" =!= "purchase" && ($"fp".isNull || $"rn" < $"fp"))
    val bit = chBits.tail.foldLeft(
        when($"event_type" === chBits.head._1, chBits.head._2)) {
      case (acc, (c, b)) => acc.when($"event_type" === c, b)
    }
    val masks = fp.join(
        j.groupBy($"user_id").agg(bit_or(bit).as("mask")),
        Seq("user_id"), "left")
      .select(coalesce($"mask", lit(0)).as("mask"),
        when($"fp".isNotNull, 1L).otherwise(0L).as("conv"))
    // ≤ 2^n = 16 cells — enum-bounded collect, never data-sized
    val cells = masks.groupBy($"mask")
      .agg(count(lit(1)).as("nj"), sum($"conv").as("nc"))
      .collect().map(row => (row.getInt(0), (row.getLong(1), row.getLong(2))))
    val full = (1 << n) - 1
    def v(sMask: Int): Long = {
      var nj = 0L; var nc = 0L
      cells.foreach { case (m, (j0, c0)) =>
        if ((m & ~sMask & full) == 0) { nj += j0; nc += c0 }
      }
      if (nj > 0) nc * 1000000L / nj else 0L
    }
    val vTab = (0 to full).map(v)
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)
    val rows = chBits.map { case (c, b) =>
      var phi = 0L
      (0 to full).foreach { sMask =>
        if ((sMask & b) == 0) {
          val k = Integer.bitCount(sMask)
          phi += fact(k) * fact(n - 1 - k) * (vTab(sMask | b) - vTab(sMask))
        }
      }
      (c, phi)
    }
    rows.toDF("channel", "phi_num").orderBy($"channel")
  }
  private val q299Sql =
    """WITH r AS (SELECT user_id, event_type, row_number() OVER (
      |    PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn
      |  FROM events),
      |fp AS (SELECT user_id,
      |    min(CASE WHEN event_type = 'purchase' THEN rn END) AS fp
      |  FROM r GROUP BY 1),
      |j AS (SELECT r.user_id, r.event_type
      |  FROM r JOIN fp USING (user_id)
      |  WHERE r.event_type <> 'purchase' AND (fp.fp IS NULL OR r.rn < fp.fp)),
      |um AS (SELECT fp.user_id, coalesce(m.mask, 0) AS mask,
      |    CASE WHEN fp.fp IS NOT NULL THEN 1 ELSE 0 END AS conv
      |  FROM fp LEFT JOIN (SELECT user_id,
      |      bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
      |        WHEN 'signup' THEN 4 ELSE 8 END) AS mask
      |    FROM j GROUP BY 1) m USING (user_id)),
      |sgrid AS (SELECT unnest(generate_series(0, 15)) AS s),
      |cv AS (SELECT g.s, CAST(count(u.user_id) AS BIGINT) AS nj,
      |    CAST(coalesce(sum(u.conv), 0) AS BIGINT) AS nc
      |  FROM sgrid g LEFT JOIN um u ON (u.mask & (15 - g.s)) = 0
      |  GROUP BY 1),
      |v AS (SELECT s,
      |    CASE WHEN nj > 0 THEN nc * 1000000 // nj ELSE 0 END AS v
      |  FROM cv),
      |ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
      |    ('signup', 4), ('view', 8)) AS t(channel, bit))
      |SELECT ch.channel,
      |  CAST(sum((CASE bit_count(s.s) WHEN 0 THEN 6 WHEN 1 THEN 2
      |      WHEN 2 THEN 2 ELSE 6 END) * (vi.v - vs.v)) AS BIGINT) AS phi_num
      |FROM ch
      |JOIN sgrid s ON (s.s & ch.bit) = 0
      |JOIN v vs ON vs.s = s.s
      |JOIN v vi ON vi.s = (s.s | ch.bit)
      |GROUP BY 1 ORDER BY channel""".stripMargin

  /** q332: MATCH_RECOGNIZE-style row-pattern matching — the Trino/Flink
    * `MATCH_RECOGNIZE (PATTERN (S C+ P) … ONE ROW PER MATCH, first match
    * per partition)` contract Spark has no operator for, over the event
    * stream: per user, the EARLIEST contiguous signup → click⁺ → purchase
    * episode, with the match measures (anchor signup time, click count,
    * converting purchase time, span). Instead of regex-matching a symbol
    * string (whose cross-engine capture semantics — Java backtracking vs
    * RE2 — are not a contract this engine should stand on), the pattern
    * is matched in RUN SPACE: maximal same-symbol runs via
    * gaps-and-islands, then the pattern becomes a fixed-width window over
    * the run sequence — `sym(r)=s ∧ sym(r+1)=c ∧ sym(r+2)=p` — which is
    * EXACTLY backtracking-free matching for any run-expressible pattern
    * (each `X+` consumes a maximal run by definition, so the earliest
    * match anchors at the LAST s of its run — the same answer a regex
    * engine gives for `sc+p`). Both engines replay the identical window
    * algebra; no regex engine is consulted anywhere.
    *
    * Scale shape: one exchange+sort on user_id feeds the row-level run
    * window, the run aggregation, and the run-sequence leads (same
    * partitioning throughout — Catalyst reuses the exchange); the match
    * filter and per-user earliest pick are bounded per user. The ts order
    * is made total with event_id (q188 convention), so run boundaries and
    * the anchor/converting rows are deterministic under same-µs ties. */
  private def q332(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val rows = Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("brk",
        when(lag($"event_type", 1).over(w).isNull ||
          lag($"event_type", 1).over(w) =!= $"event_type", 1L).otherwise(0L))
      .withColumn("run_id",
        sum($"brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val runs = rows.groupBy($"user_id", $"run_id")
      .agg(max($"event_type").as("sym"), // constant within a run
        count(lit(1)).as("n"),
        min(struct($"ts".as("t"), $"event_id".as("e"))).as("frst"),
        max(struct($"ts".as("t"), $"event_id".as("e"))).as("lst"))
    val rw = Window.partitionBy($"user_id").orderBy($"run_id")
    runs
      .withColumn("nx", lead(struct($"sym", $"n"), 1).over(rw))
      .withColumn("nx2", lead(struct($"sym", $"frst"), 2).over(rw))
      .filter($"sym" === "signup" && $"nx.sym" === "click" &&
        $"nx2.sym" === "purchase")
      .withColumn("pick", row_number().over(rw))
      .filter($"pick" === 1)
      .select($"user_id",
        expr("lst.t div 1000").as("signup_ts_us"),
        $"nx.n".as("n_clicks"),
        expr("nx2.frst.t div 1000").as("purchase_ts_us"),
        expr("(nx2.frst.t - lst.t) div 1000").as("span_us"))
      .orderBy($"user_id")
  }
  private val q332Sql =
    """WITH e AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id, event_type
      |  FROM events),
      |r0 AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
      |r1 AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
      |    ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING) AS run_id
      |  FROM r0),
      |runs AS (SELECT user_id, run_id, max(event_type) AS sym,
      |    count(*) AS n,
      |    min({'t': tsn, 'e': event_id}) AS frst,
      |    max({'t': tsn, 'e': event_id}) AS lst
      |  FROM r1 GROUP BY 1, 2),
      |sq AS (SELECT user_id, run_id, sym, n, frst, lst,
      |    lead(sym, 1) OVER rw AS sym1, lead(n, 1) OVER rw AS n1,
      |    lead(sym, 2) OVER rw AS sym2, lead(frst, 2) OVER rw AS frst2
      |  FROM runs WINDOW rw AS (PARTITION BY user_id ORDER BY run_id)),
      |m AS (SELECT user_id, run_id, lst, n1, frst2,
      |    row_number() OVER (PARTITION BY user_id ORDER BY run_id) AS pick
      |  FROM sq WHERE sym = 'signup' AND sym1 = 'click' AND sym2 = 'purchase')
      |SELECT user_id,
      |  (lst.t // 1000) AS signup_ts_us,
      |  CAST(n1 AS BIGINT) AS n_clicks,
      |  (frst2.t // 1000) AS purchase_ts_us,
      |  ((frst2.t - lst.t) // 1000) AS span_us
      |FROM m WHERE pick = 1 ORDER BY user_id""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q176_funnel_paths", q176, Some(q176Sql)),
    QueryDef("q188_attribution", q188, Some(q188Sql)),
    QueryDef("q259_markov_attribution", q259, Some(q259Sql)),
    QueryDef("q266_subsequence_support", q266, Some(q266Sql)),
    QueryDef("q284_token_bucket", q284, Some(q284Sql)),
    QueryDef("q285_token_bucket_stream", q285, Some(q284Sql)),
    QueryDef("q299_shapley_attribution", q299, Some(q299Sql)),
    QueryDef("q332_match_recognize", q332, Some(q332Sql)),
  )

  /** q285: the SAME token-bucket replay through a real FileStreamSource →
    * `transformWithState` → memory-sink streaming query, hash-gated
    * against q284's batch oracle — the q224/q233/q264 triple-path
    * discipline applied to the rate limiter: the batch sorted-group fold
    * and the streaming RocksDB-state processor share one fold function
    * ([[graft.streaming.StreamingOps.foldBucketOrdered]]), and this gate
    * pins the streaming exec to the recursive-CTE fixed point. */
  private def q285(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    val streamPath = {
      val f = new java.io.File(path)
      if (f.isDirectory) path
      else s"$dir/[${path.split('/').last.head}]${path.split('/').last.tail}"
    }
    val ev = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1000000")
      .parquet(streamPath)
      .select($"user_id",
        (unix_micros($"ts".cast("timestamp")) * 1000L).as("ts"),
        $"event_id")
      .as[(Long, Long, Long)]
    graft.streaming.StreamHarness.runChecked(
        graft.streaming.StreamingOps.rateLimitTws(ev).toDF(),
        "q285_sink_",
        org.apache.spark.sql.streaming.OutputMode.Update(),
        extraConfs = Map("spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) { q =>
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      require(dataBatches == 1,
        s"q285 expects ONE data micro-batch (the in-batch sort then sees " +
          s"each user's full history); got $dataBatches — raise maxFilesPerTrigger")
    }
      .select($"user_id", $"n_events", $"n_admitted",
        ($"n_events" - $"n_admitted").as("n_rejected"))
      .orderBy($"user_id")
  }
}
