package graft

import graft.queries.{Events, Relational, TextVec}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One dispatch entry point per logical query that owns multiple physical
  * forms (r12 verdict item 1): a caller asks for the QUERY; Exec picks the
  * fastest form whose validity bound holds and falls back — loudly LOGGED,
  * never loudly failed — to the declarative twin otherwise.
  *
  * Three kinds of physical form, ordered fastest-first per query:
  *  - columnar kernels (the q100+ seam): valid when the pruned input plans
  *    as a single columnar parquet scan, and — for the join kernels and
  *    set-census finales — when the build side sits inside the broadcast
  *    regime ([[graft.queries.Relational.withinBroadcastBound]], the same
  *    predicate the kernels' own `requireBuildBounded` gates enforce);
  *  - staged-layout kernels (q92+/q98/q99): valid only when the session
  *    has ALREADY staged the layout ([[Layouts]] cache probe) — the
  *    dispatcher never pays a staging job implicitly;
  *  - the declarative DataFrame form: always valid, always last. It is
  *    the 100 TB path by construction (shuffled joins, unbounded-vocab
  *    aggregation), so every fallback is a correct answer, not a degraded
  *    one.
  *
  * Plan-time bounds cannot see everything (a duplicate build PK, an
  * interner hitting its id cap, a mis-laid-out bucketed table only
  * surface while a kernel RUNS), so the dispatcher also treats a kernel's
  * own loud refusal — a [[graft.operators.KernelRefusal]] anywhere in the
  * cause chain, the seam's guard discipline — as "invalid form": it logs and
  * falls through to the next form. Kernel forms materialize eagerly
  * (their jobs run inside `run`), which is what makes catch-and-fallback
  * sound; any other exception type propagates untouched.
  *
  * Every dispatch path is hash-gated: SparkEntry's q115+ entries route
  * through [[run]] and share their targets' DuckDB oracles, and ExecSpec
  * pins dispatcher == declarative both when bounds hold (kernel chosen)
  * and when forced past them (fallback chosen).
  */
object Exec {

  /** A physical form: `valid` returns None when its bound holds for
    * (spark, dir), or Some(reason) to skip it without trying. `layout`
    * names the pay-once staging the form depends on (None for kernel /
    * declarative forms) — [[runFamily]] uses it to stage once per family
    * instead of per query.
    */
  final case class Form(
      name: String,
      run: (SparkSession, String) => DataFrame,
      valid: (SparkSession, String) => Option[String],
      layout: Option[String] = None)

  private val always: (SparkSession, String) => Option[String] = (_, _) => None

  /** Kernel-input check: the pruned frame must plan as one columnar scan
    * (planning only — no job runs). Covers vectorized-reader-off, nested/
    * unsupported schema, non-parquet sources.
    */
  private def columnarScanOf(df: (SparkSession, String) => DataFrame)
      : (SparkSession, String) => Option[String] =
    (s, d) =>
      try { graft.operators.ColumnarScan.soleColumnarScan(df(s, d)); None }
      catch { case e: Exception => Some(s"no columnar scan: ${e.getMessage.takeWhile(_ != '\n')}") }

  /** Broadcast-regime check for a kernel build side / set-census input. */
  private def bounded(df: (SparkSession, String) => DataFrame, what: String)
      : (SparkSession, String) => Option[String] =
    (s, d) =>
      if (Relational.withinBroadcastBound(df(s, d))) None
      else Some(s"$what exceeds the broadcast regime")

  private def both(a: (SparkSession, String) => Option[String],
      b: (SparkSession, String) => Option[String])
      : (SparkSession, String) => Option[String] =
    (s, d) => a(s, d).orElse(b(s, d))

  /** Staged-layout probe: valid only when the layout is already cached in
    * this session (the dispatcher never stages implicitly).
    */
  private def eventsLayoutStaged: (SparkSession, String) => Option[String] =
    (s, d) => if (Layouts.isEventsLayoutStaged(s, d)) None
      else Some("events layout not staged in this session")
  private def ordersLayoutStaged: (SparkSession, String) => Option[String] =
    (s, d) => if (Layouts.isOrdersLayoutStaged(s, d)) None
      else Some("orders layout not staged in this session")
  private def factsLayoutStaged: (SparkSession, String) => Option[String] =
    (s, d) => if (Layouts.isFactsLayoutStaged(s, d)) None
      else Some("fact layout not staged in this session")

  /** The registry: per logical query, forms ordered fastest-first — by
    * the RECORDED per-form medians in [[recordedMedianSec]], not by hand
    * (r13 verdict item 5): non-declarative forms sort ascending by their
    * measured steady-state time (unmeasured forms keep their written
    * position after the measured ones), and the declarative twin stays
    * last (always valid) regardless of its time, because it is the
    * fallback contract, not a speed claim. Every validity bound checks
    * the kernel's OWN exported input/build frame (`*KernelInput`/
    * `*KernelProbe`/`*KernelBuild` in the query objects) — one definition
    * for what the kernel scans and what the dispatcher validates, so the
    * two cannot drift (r13 review).
    */
  lazy val registry: Map[String, Seq[Form]] =
    writtenRegistry.map { case (q, forms) => q -> orderByMedian(forms) }

  /** Per-form steady-state medians (seconds at sf0.1) from the cleanest
    * final-HEAD bench window of record, tools/bench_full_r13g.json (0 est,
    * 0 suspect, floor probes 0.039–0.111 s) — each form's SparkEntry twin
    * entry measured under the full bench protocol. These order the
    * registry; they are provenance-pinned data, not tuning knobs: refresh
    * them when a new clean window shows a different ordering.
    */
  private[graft] val recordedMedianSec: Map[String, Double] = Map(
    "q1ColumnarKernel" -> 0.0790,            // q101_columnar_pricing
    "q1" -> 0.2114,                          // q1_pricing_agg
    "q2ColumnarKernel" -> 0.0781,            // q106_columnar_factjoin
    "q2FromFacts(bucketed)" -> 1.0202,       // q98_layout_factjoin
    "q2" -> 0.3935,                          // q2_join_broadcast
    "q3ColumnarKernel" -> 0.1097,            // q105_columnar_rangejoin
    "q3" -> 0.3608,                          // q3_range_join
    "q4ColumnarKernel" -> 0.0336,            // q109_columnar_semianti
    "q4" -> 0.1251,                          // q4_semi_anti
    "q5ColumnarKernel" -> 0.0571,            // q107_columnar_custtopk
    "q5From(bucketed)" -> 0.1688,            // q99_layout_topk
    "q5" -> 0.1972,                          // q5_rank_window
    "q6ColumnarKernel" -> 0.0660,            // q104_columnar_topk
    "q6" -> 0.1528,                          // q6_topk
    "q7ColumnarKernel" -> 0.0591,            // q108_columnar_rollup
    "q7" -> 0.2636,                          // q7_rollup
    "q9aColumnarKernel" -> 0.0381,           // q114_columnar_distinct
    "q9a" -> 0.1713,                         // q9a_distinct
    "q10ColumnarKernel" -> 0.0417,           // q110_columnar_json
    "q10" -> 0.1207,                         // q10_json
    "q11ColumnarKernel" -> 0.0493,           // q100_columnar_tumbling
    "q11" -> 0.1374,                         // q11_tumbling
    "q12FromColumnarSortedKernel" -> 0.0469, // q103_columnar_session
    "q12" -> 0.1198,                         // q12_session
    "q13FromColumnarSortedKernel" -> 0.0540, // q102_columnar_lag
    "q13" -> 0.2781,                         // q13_lag
    "q14ColumnarKernel" -> 0.0514,           // q113_columnar_dedup
    "q14" -> 0.0971,                         // q14_exact_dedup
    "q16ColumnarKernel" -> 0.0534,           // q111_columnar_cosine
    "q16" -> 0.2105,                         // q16_cosine_topk
    "q17ColumnarKernel" -> 0.0508,           // q112_columnar_tokens
    "q17" -> 0.1199,                         // q17_tokens
    "q21FromSortedKernel" -> 0.3076,         // q94_kernel_asof
    "q21" -> 0.3306,                         // q21_asof_join
    "q51FromSortedKernel" -> 0.1010,         // q95_kernel_funnel
    "q51" -> 0.2198,                         // q51_funnel
    "q70FromSortedKernel" -> 0.2245,         // q96_kernel_retention
    "q70" -> 0.2398,                         // q70_retention
    "q71FromSortedKernel" -> 0.3772,         // q97_kernel_transitions
    "q71" -> 0.3820)                         // q71_transitions

  /** Measured-ascending order over the non-declarative forms (stable:
    * unmeasured forms keep their written position, after every measured
    * one); the declarative twin stays last unconditionally.
    */
  private def orderByMedian(forms: Seq[Form]): Seq[Form] =
    forms.init.sortBy(f =>
      recordedMedianSec.getOrElse(f.name, Double.MaxValue)) :+ forms.last

  private val writtenRegistry: Map[String, Seq[Form]] = Map(
    "q1" -> Seq(
      Form("q1ColumnarKernel", Relational.q1ColumnarKernel,
        columnarScanOf(Relational.q1KernelInput)),
      Form("q1", Relational.q1, always)),
    "q2" -> Seq(
      Form("q2ColumnarKernel", Relational.q2ColumnarKernel,
        both(columnarScanOf(Relational.q2KernelProbe),
          bounded(Relational.q2KernelBuildBound, "orders build"))),
      // ordered ahead of the declarative twin DESPITE a slower sf0.1
      // median (the bucketed SMJ's 0.4–1.0 s vs declarative 0.39 s): the
      // two are only both reachable when the kernel's broadcast bound has
      // failed, i.e. orders no longer broadcasts — exactly the regime
      // where the declarative form degrades to a shuffled join and the
      // pre-paid co-located layout is the fast path. The sf0.1 medians
      // compare the layout against a broadcast join it never competes
      // with at scale.
      Form("q2FromFacts(bucketed)", (s, d) => {
        val (li, o) = Layouts.factsByOrderkeyStaged(s, d)
        Relational.q2FromFacts(li, o, s, d)
      }, factsLayoutStaged, layout = Some("facts")),
      Form("q2", Relational.q2, always)),
    "q3" -> Seq(
      Form("q3ColumnarKernel", Relational.q3ColumnarKernel,
        both(columnarScanOf(Relational.q3KernelProbe),
          bounded(Relational.q3KernelBuild, "orders build"))),
      Form("q3", Relational.q3, always)),
    "q4" -> Seq(
      Form("q4ColumnarKernel", Relational.q4ColumnarKernel,
        both(columnarScanOf(Relational.q4KernelProbe),
          bounded(Relational.q4KernelBuild, "orders build"))),
      Form("q4", Relational.q4, always)),
    "q5" -> Seq(
      Form("q5ColumnarKernel", Relational.q5ColumnarKernel,
        columnarScanOf(Relational.q5KernelInput)),
      Form("q5From(bucketed)",
        (s, d) => Relational.q5From(Layouts.ordersByCustkeyStaged(s, d)),
        ordersLayoutStaged, layout = Some("orders")),
      Form("q5", Relational.q5, always)),
    "q6" -> Seq(
      Form("q6ColumnarKernel", Relational.q6ColumnarKernel,
        columnarScanOf(Relational.q6KernelInput)),
      Form("q6", Relational.q6, always)),
    "q7" -> Seq(
      Form("q7ColumnarKernel", Relational.q7ColumnarKernel,
        columnarScanOf(Relational.q7KernelInput)),
      Form("q7", Relational.q7, always)),
    "q9a" -> Seq(
      // the kernel self-tiers its finale (tree-merge vs distributed
      // distinct) on the same bound, so it is valid whenever the scan is
      Form("q9aColumnarKernel", Events.q9aColumnarKernel,
        columnarScanOf(Events.q9aKernelInput)),
      Form("q9a", Events.q9a, always)),
    "q10" -> Seq(
      Form("q10ColumnarKernel", Events.q10ColumnarKernel,
        columnarScanOf(Events.q10KernelInput)),
      Form("q10", Events.q10, always)),
    "q11" -> Seq(
      Form("q11ColumnarKernel", Events.q11ColumnarKernel,
        columnarScanOf(Events.q11KernelInput)),
      Form("q11", Events.q11, always)),
    "q12" -> Seq(
      Form("q12FromColumnarSortedKernel",
        (s, d) => Events.q12FromColumnarSortedKernel(Layouts.eventsByUserStaged(s, d)),
        eventsLayoutStaged, layout = Some("events")),
      Form("q12", Events.q12, always)),
    "q13" -> Seq(
      Form("q13FromColumnarSortedKernel",
        (s, d) => Events.q13FromColumnarSortedKernel(Layouts.eventsByUserStaged(s, d)),
        eventsLayoutStaged, layout = Some("events")),
      Form("q13", Events.q13, always)),
    "q14" -> Seq(
      Form("q14ColumnarKernel", TextVec.q14ColumnarKernel,
        columnarScanOf(TextVec.docsTextInput)),
      Form("q14", TextVec.q14, always)),
    "q16" -> Seq(
      Form("q16ColumnarKernel", TextVec.q16ColumnarKernel,
        both(columnarScanOf(TextVec.q16KernelInput),
          bounded(TextVec.q16QueryFrame, "query-vector side"))),
      // the staged IVFADC deployment path at its exactness-pinned
      // operating point (all cells probed, everything re-ranked == exact
      // q16 — the q136 pin). Unmeasured in the medians table, so ordering
      // places it between the kernel and the declarative twin; its
      // deployment value is the pruned-scan shape at (nprobe ≪ cells,
      // rerank ≪ N), not this full-probe speed.
      Form("q16AnnStagedExact",
        (s, d) => graft.queries.Pipeline.q136(s, d),
        (s, d) => if (graft.queries.Pipeline.isAnnIndexStaged(s, d)) None
          else Some("ANN index not staged in this session"),
        layout = Some("ann")),
      Form("q16", TextVec.q16, always)),
    "q17" -> Seq(
      Form("q17ColumnarKernel", TextVec.q17ColumnarKernel,
        columnarScanOf(TextVec.docsTextInput)),
      Form("q17", TextVec.q17, always)),
    "q21" -> Seq(
      Form("q21FromSortedKernel",
        (s, d) => Events.q21FromSortedKernel(Layouts.eventsByUserStaged(s, d)),
        eventsLayoutStaged, layout = Some("events")),
      Form("q21", Events.q21, always)),
    "q51" -> Seq(
      Form("q51FromSortedKernel",
        (s, d) => Events.q51FromSortedKernel(Layouts.eventsByUserStaged(s, d)),
        eventsLayoutStaged, layout = Some("events")),
      Form("q51", Events.q51, always)),
    "q70" -> Seq(
      Form("q70FromSortedKernel",
        (s, d) => Events.q70FromSortedKernel(Layouts.eventsByUserStaged(s, d)),
        eventsLayoutStaged, layout = Some("events")),
      Form("q70", Events.q70, always)),
    "q71" -> Seq(
      Form("q71FromSortedKernel",
        (s, d) => Events.q71FromSortedKernel(Layouts.eventsByUserStaged(s, d)),
        eventsLayoutStaged, layout = Some("events")),
      Form("q71", Events.q71, always)))

  /** True when `t` or anything in its cause chain is the seam's loud-guard
    * type (kernels throw [[graft.operators.KernelRefusal]] directly on the
    * driver and wrapped in SparkException from inside tasks). The dedicated
    * type — not any IllegalStateException — is what gets caught: Spark
    * internals also throw bare ISE (stopped SparkContext, codegen state
    * errors), and swallowing those into a silent fallback would bury the
    * real failure under a slower re-run (r13 advice).
    */
  private[graft] def isLoudRefusal(t: Throwable): Boolean = {
    var c: Throwable = t
    var depth = 0
    while (c != null && depth < 16) {
      if (c.isInstanceOf[graft.operators.KernelRefusal]) return true
      c = c.getCause; depth += 1
    }
    false
  }

  /** Dispatch `query`: first form whose bound holds runs; a form that
    * refuses at runtime (loud-guard exception) logs and falls through.
    * Returns the chosen form's name with the result.
    */
  def runNamed(spark: SparkSession, dir: String, query: String): (String, DataFrame) = {
    val forms = registry.getOrElse(query, throw new IllegalArgumentException(
      s"Exec: unknown query '$query' (known: ${registry.keys.toSeq.sorted.mkString(", ")})"))
    forms.init.foreach { f =>
      f.valid(spark, dir) match {
        case Some(reason) =>
          System.err.println(s"[exec] $query: skipping ${f.name} — $reason")
        case None =>
          try return (f.name, f.run(spark, dir))
          catch {
            case e: Throwable if isLoudRefusal(e) =>
              System.err.println(s"[exec] $query: ${f.name} refused at runtime — " +
                s"${Option(e.getMessage).getOrElse(e.toString).takeWhile(_ != '\n')}; falling back")
          }
      }
    }
    val last = forms.last
    (last.name, last.run(spark, dir))
  }

  def run(spark: SparkSession, dir: String, query: String): DataFrame =
    runNamed(spark, dir, query)._2

  /** The staging job behind each [[Form.layout]] tag — the SAME memoized
    * entry points a user stages through, so a family-staged layout is
    * indistinguishable from an explicitly staged one.
    */
  private val layoutStagers: Map[String, (SparkSession, String) => Unit] = Map(
    "events" -> ((s, d) => { Layouts.eventsByUserCached(s, d); () }),
    "orders" -> ((s, d) => { Layouts.ordersByCustkeyCached(s, d); () }),
    "facts"  -> ((s, d) => { Layouts.factsByOrderkeyCached(s, d); () }),
    "ann"    -> ((s, d) => { graft.queries.Pipeline.stageAnnIndex(s, d); () }))

  /** Amortized family dispatch (r13 verdict item 5): when a caller asks
    * for several queries AT ONCE, a layout used by ≥ `stageThreshold` of
    * them is staged ONCE up front — explicitly and logged, the one
    * deliberate exception to "the dispatcher never stages" (the caller's
    * batch request IS the opt-in; the amortization math is the layout's
    * whole point, tools/bench_bucketed_latest.json) — and every query
    * then routes through [[runNamed]] as usual. Layouts below the
    * threshold are left unstaged: one query never justifies a staging job
    * it could have run declaratively. Returns (query, chosenForm, result)
    * in request order.
    */
  def runFamily(spark: SparkSession, dir: String, queries: Seq[String],
      stageThreshold: Int = 2): Seq[(String, String, DataFrame)] = {
    val unknown = queries.filterNot(registry.contains)
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      s"Exec.runFamily: unknown queries ${unknown.mkString(", ")} " +
      s"(known: ${registry.keys.toSeq.sorted.mkString(", ")})")
    // A query wants a layout only when that layout's form would actually
    // be CHOSEN once staged — i.e. every form ordered ahead of it is
    // currently invalid (plan-time checks only, no jobs). Without this,
    // Seq("q16", "q16") would train and stage the whole ANN index for two
    // queries the columnar kernel then answers anyway (r14 review).
    val wanted = queries
      .flatMap { q =>
        val forms = registry(q)
        forms.zipWithIndex.collectFirst {
          case (f, i) if f.layout.isDefined &&
            forms.take(i).forall(_.valid(spark, dir).isDefined) => f.layout.get
        }
      }
      .groupBy(identity).view.mapValues(_.size).toMap
    for ((tag, n) <- wanted.toSeq.sortBy(_._1); if n >= stageThreshold) {
      val t = System.nanoTime()
      layoutStagers(tag)(spark, dir)
      System.err.println(f"[exec] runFamily: staged '$tag' layout once for " +
        f"$n queries in ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    queries.map { q =>
      val (form, df) = runNamed(spark, dir, q)
      (q, form, df)
    }
  }
}
