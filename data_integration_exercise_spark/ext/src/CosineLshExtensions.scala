// Catalyst extension: rewrite `cosine_sim(a, b) >= tau` filters over inner
// joins into LSH-bucketed equi-joins (SURVEY.md §4 "showcase" row / §14).
//
// What it does, end to end:
//   1. injectFunction registers a `cosine_sim(array, array)` SQL function as
//      a RuntimeReplaceable marker expression whose replacement is the pure
//      declarative cosine (zip_with/aggregate HOFs — whole-stage codegen,
//      no UDF).
//   2. injectResolutionRule installs CosineLshJoinRewrite: when a resolved
//      plan contains Filter(... cosine_sim(a, b) >= tau ..., Join(l, r,
//      Inner, cond)) with `a` from one side and `b` from the other, it
//      explodes each side into 8 banded sign-random-hyperplane LSH keys
//      (8 bands × 4 bits, band index packed into the key) and conjoins
//      `band(a) = band(b)` into the join condition — turning a quadratic
//      theta-join (BroadcastNestedLoop/Cartesian at scale) into a
//      hash-partitioned equi-join; the original cosine filter stays as
//      the exact re-rank on the band-colliding candidates, and a final
//      Distinct collapses pairs that matched in several bands.
//
// Semantics: the rewritten query returns the DISTINCT pairs that (a) share
// at least one LSH band AND (b) pass the exact cosine threshold — the
// standard candidate-generation + exact-re-rank contract of every LSH path
// in the Python package (sim_ann_lsh, _lsh_threshold_pairs); like those, it
// assumes set semantics on the matched pairs. It is opt-in THREE times: the
// session must be built with this extension, the query must use the
// cosine_sim function, and spark.dies.lsh.rewrite.enabled must be set to
// true (default false since round 11 — without it cosine_sim stays a plain
// exact function and plans are untouched).
//
// Hyperplanes are hash-derived (h_k[i] = ±1 from the parity of
// murmur3(k, i)), so the bucket expression is deterministic, dimension-
// agnostic, and identical across sessions — the same discipline as the
// Python package's hash-derived randomness.
package dies.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

object Templates {
  private def subst(sql: String, subs: Map[String, Expression]): Expression =
    CatalystSqlParser.parseExpression(sql).transformUp {
      case UnresolvedAttribute(parts)
          if parts.length == 1 && subs.contains(parts.head) =>
        subs(parts.head)
      // inside a lambda body the parser wraps EVERY single-part identifier
      // as a lambda-variable candidate; placeholder names land here
      case UnresolvedNamedLambdaVariable(parts)
          if parts.length == 1 && subs.contains(parts.head) =>
        subs(parts.head)
    }

  /** Exact cosine similarity as declarative HOFs (codegen'd, no UDF). */
  def cosine(a: Expression, b: Expression): Expression = subst(
    """aggregate(zip_with(__A__, __B__, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)
       / (sqrt(aggregate(__A__, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
          * sqrt(aggregate(__B__, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))""",
    Map("__A__" -> a, "__B__" -> b))

  /** Banded sign-random-hyperplane LSH keys: `bands` bands × `rows` bits,
   *  the band index packed into the key (key = band·2^rows + bucket),
   *  hyperplane h_{b,k}[i] = ±1 from the parity of hash(b·rows + k, i).
   *  Deterministic and dimension-agnostic; a pair is a candidate iff it
   *  shares ≥1 of the `bands` keys (OR-of-bands — the recall lever
   *  single-bucket LSH lacks). */
  def bandArray(v: Expression, bands: Int, rows: Int): Expression = subst(
    s"""transform(sequence(0, ${bands - 1}), b ->
         b * ${1L << rows}L + aggregate(sequence(0, ${rows - 1}), 0L, (acc, k) ->
           acc * 2L + IF(
             aggregate(
               zip_with(__V__, sequence(0, size(__V__) - 1),
                 (x, i) -> CAST(x AS DOUBLE)
                           * IF(pmod(hash(b * $rows + k, i), 2) = 0, 1D, -1D)),
               0D, (acc2, x2) -> acc2 + x2) >= 0D, 1L, 0L)))""",
    Map("__V__" -> v))
}

/** Marker expression for the analyzer: survives analysis as-is (so the
 *  rewrite rule can pattern-match it), and the optimizer's
 *  ReplaceExpressions swaps in the declarative cosine for execution. */
case class CosineSim(a: Expression, b: Expression, replacement: Expression)
    extends RuntimeReplaceable
    with InheritAnalysisRules {
  def this(a: Expression, b: Expression) = this(a, b, Templates.cosine(a, b))
  override def parameters: Seq[Expression] = Seq(a, b)
  override def prettyName: String = "cosine_sim"
  override protected def withNewChildInternal(newChild: Expression): CosineSim =
    copy(replacement = newChild)
}

object CosineLshJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  private val BAND_L = "__lsh_band_l"
  private val BAND_R = "__lsh_band_r"

  /** The a/b sides of the marker, recovered from its RESOLVED replacement
   *  tree (the `parameters` copies stay unresolved — only the replacement
   *  participates in analysis). */
  private def sides(cs: CosineSim): Option[(Expression, Expression)] =
    cs.replacement match {
      case Divide(ArrayAggregate(ZipWith(ra, rb, _), _, _, _), _, _) =>
        Some((ra, rb))
      case _ => None
    }

  private def isCosinePred(e: Expression): Boolean = e match {
    case GreaterThanOrEqual(_: CosineSim, rhs) => rhs.foldable
    case GreaterThan(_: CosineSim, rhs) => rhs.foldable
    case LessThanOrEqual(rhs, _: CosineSim) => rhs.foldable
    case LessThan(rhs, _: CosineSim) => rhs.foldable
    case _ => false
  }

  private def cosineConjunct(cond: Expression): Option[(CosineSim, Expression)] =
    splitConjunctivePredicates(cond).collectFirst {
      case GreaterThanOrEqual(cs: CosineSim, rhs) if rhs.foldable => (cs, rhs)
      case GreaterThan(cs: CosineSim, rhs) if rhs.foldable => (cs, rhs)
      case LessThanOrEqual(rhs, cs: CosineSim) if rhs.foldable => (cs, rhs)
      case LessThan(rhs, cs: CosineSim) if rhs.foldable => (cs, rhs)
    }

  /** τ-floor guard (VERDICT r11 item 7): banding fires only when the
   *  foldable threshold evaluates to a number ≥ the configured floor.
   *  Band-collision probability falls with τ (≈0.75 recall at τ=0.35
   *  under 8×4, collapsing toward 0 as τ→0), so an opt-in session must
   *  not silently run a recall-collapsing threshold — below the floor
   *  the exact naive plan stands. Unevaluable thresholds don't rewrite.
   *  A MALFORMED conf value must not fail analysis for every cosine
   *  query (ADVICE r12 item 2): an unparsable OR non-finite string
   *  ("NaN"/"Infinity" parse via toDouble but would make every floor
   *  comparison false, silently disabling banding session-wide) falls
   *  back to the 0.2 default, keeping the rule a pure optimization that
   *  can only choose between two correct plans, never throw. */
  private def minTauConf: Double =
    scala.util.Try(
      conf.getConfString("spark.dies.lsh.minThreshold", "0.2").toDouble
    ).filter(java.lang.Double.isFinite(_)).getOrElse(0.2)

  private def clearsTauFloor(rhs: Expression): Boolean =
    rhs.eval(null) match {
      case n: java.lang.Number => n.doubleValue() >= minTauConf
      case d: org.apache.spark.sql.types.Decimal =>
        d.toDouble >= minTauConf
      case _ => false
    }

  private def alreadyBucketed(j: Join): Boolean =
    j.left.output.exists(_.name == BAND_L) ||
      j.right.output.exists(_.name == BAND_R)

  /** Band geometry is session-tunable (plan_lsh_band_geometry on a sample
   *  is the table to read before picking): defaults are the 8×4 config.
   *  Same malformed-conf rule as minTauConf: an unparsable or
   *  non-positive value falls back to the default instead of throwing
   *  during analysis for every cosine query. */
  private def bandsConf: Int =
    scala.util.Try(
      conf.getConfString("spark.dies.lsh.bands", "8").toInt
    ).filter(_ > 0).getOrElse(8)
  private def rowsConf: Int =
    scala.util.Try(
      conf.getConfString("spark.dies.lsh.rowsPerBand", "4").toInt
    ).filter(_ > 0).getOrElse(4)

  /** Explode `plan` on the banded LSH keys of `v`; the key attribute is
   *  pre-resolved so the join condition can reference it directly. */
  private def banded(
      plan: LogicalPlan, v: Expression, name: String
  ): (LogicalPlan, Attribute) = {
    val attr = AttributeReference(
      name, org.apache.spark.sql.types.LongType, nullable = true)()
    val gen = Generate(
      Explode(Templates.bandArray(v, bandsConf, rowsConf)),
      unrequiredChildIndex = Nil,
      outer = false,
      qualifier = None,
      generatorOutput = Seq(attr),
      child = plan)
    (gen, attr)
  }

  /** Build the banded rewrite if `cond` carries a sides-separable cosine
   *  threshold: Distinct(Project(out, Filter(cond, Join(bandedL, bandedR,
   *  jc AND bandL = bandR)))) — the join prunes to band collisions, the
   *  filter is the exact re-rank, Distinct collapses multi-band hits. */
  private def rewrite(
      out: Seq[Attribute], cond: Expression, l: LogicalPlan, r: LogicalPlan,
      jc: Option[Expression], hint: JoinHint
  ): Option[LogicalPlan] =
    cosineConjunct(cond).collect {
      case (cs, rhs) if clearsTauFloor(rhs) => cs
    }.flatMap(sides).flatMap { case (va, vb) =>
      val aL = va.references.subsetOf(l.outputSet) &&
        vb.references.subsetOf(r.outputSet)
      val aR = va.references.subsetOf(r.outputSet) &&
        vb.references.subsetOf(l.outputSet)
      if (!aL && !aR) None
      else {
        val (lv, rv) = if (aL) (va, vb) else (vb, va)
        val (gl, al) = banded(l, lv, BAND_L)
        val (gr, ar) = banded(r, rv, BAND_R)
        val eq = EqualTo(al, ar)
        val newJoin =
          Join(gl, gr, Inner, Some(jc.map(And(_, eq)).getOrElse(eq)), hint)
        Some(Distinct(Project(out, Filter(cond, newJoin))))
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // OPT-IN (default false, ADVICE r10): the rewrite trades exactness for
    // scale — it drops true pairs the band geometry misses (recall ≈ 0.75
    // at τ=0.35 under the default 8×4 config, lower at lower thresholds)
    // and injects Distinct (bag→set on the matched pairs). A session must
    // explicitly accept that contract; a function spelled `cosine_sim`
    // reads as exact, so exact is what an unconfigured session gets.
    if (!conf.getConfString("spark.dies.lsh.rewrite.enabled", "false").toBoolean) {
      return plan
    }
    plan.resolveOperatorsUp {
      // cosine threshold as a filter over an inner join
      case f @ Filter(cond, j @ Join(l, r, Inner, jc, hint))
          if f.resolved && !alreadyBucketed(j) =>
        rewrite(f.output, cond, l, r, jc, hint).getOrElse(f)
      // cosine threshold written directly in the join condition: the
      // non-cosine conjuncts keep keying the join (+ the band equality),
      // the full original condition becomes the post-join exact re-rank
      case j @ Join(l, r, Inner, Some(cond), hint)
          if j.resolved && !alreadyBucketed(j) =>
        val residue =
          splitConjunctivePredicates(cond).filterNot(isCosinePred)
        rewrite(j.output, cond, l, r, residue.reduceOption(And), hint)
          .getOrElse(j)
    }
  }
}

/** Second rule from the same jar (VERDICT r10 item 8): rewrite
 *  `levenshtein(a, b) <= k` predicates over inner joins into LENGTH-BANDED
 *  equi-joins. Unlike the cosine rule this transform is EXACT — result-
 *  identical to the naive plan, bag semantics preserved — so it defaults ON
 *  (kill switch: spark.dies.lev.rewrite.enabled=false):
 *
 *  - lev(a, b) <= k implies |len(a) - len(b)| <= k, so with bucket width
 *    w = k + 1 the length buckets β = len div w of a true pair differ by at
 *    most 1. The LEFT side explodes to {β-1, β, β+1} (3 distinct values),
 *    the right side keeps its single β, and the join takes
 *    `__lev_bkt_l = __lev_bkt_r` — every true pair meets EXACTLY once
 *    (single-valued right key × distinct left values), so no Distinct is
 *    needed and duplicate input rows survive as in the naive plan.
 *  - The implied |len(a) - len(b)| <= k rides the join condition as an O(1)
 *    prefilter inside the bucket, and the re-rank conjunct is swapped for
 *    the BANDED kernel `levenshtein(a, b, k) >= 0` — O(len·k) instead of
 *    O(len²), same integers (the threshold form returns -1 above k).
 *  - Pairs in buckets ≥2 apart are dropped by the band join, but those have
 *    length gap > k and could never pass lev <= k: lossless.
 *
 *  This is the Catalyst form of dedup_fuzzy_levenshtein's hand-written
 *  discipline (length prefilter + banded Wagner-Fischer), applied to any
 *  user query that writes the naive predicate. */
object LevenshteinBandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  private val BKT_L = "__lev_bkt_l"
  private val BKT_R = "__lev_bkt_r"

  /** Normalize a conjunct to (a, b, k) with `lev(a,b) <= k` semantics.
   *  Only the 2-arg levenshtein rewrites (a 3-arg call is already banded —
   *  the user opted into the kernel; banding buckets twice is wasteful). */
  private def matchLev(e: Expression): Option[(Expression, Expression, Int)] = {
    def k(lit: Expression): Option[Int] = lit.eval() match {
      case n: Number => Some(n.intValue())
      case _ => None
    }
    val m = e match {
      case LessThanOrEqual(Levenshtein(a, b, None), rhs) if rhs.foldable =>
        k(rhs).map((a, b, _))
      case GreaterThanOrEqual(rhs, Levenshtein(a, b, None)) if rhs.foldable =>
        k(rhs).map((a, b, _))
      case LessThan(Levenshtein(a, b, None), rhs) if rhs.foldable =>
        k(rhs).map(v => (a, b, v - 1))
      case GreaterThan(rhs, Levenshtein(a, b, None)) if rhs.foldable =>
        k(rhs).map(v => (a, b, v - 1))
      case _ => None
    }
    m.filter(_._3 >= 0)
  }

  private def alreadyBucketed(j: Join): Boolean =
    j.left.output.exists(_.name == BKT_L) ||
      j.right.output.exists(_.name == BKT_R)

  private val LongT = org.apache.spark.sql.types.LongType

  /** len(x) div (k+1) as a Long — the length bucket. */
  private def bucket(x: Expression, k: Int): Expression =
    IntegralDivide(Cast(Length(x), LongT), Literal((k + 1).toLong))

  /** The banded exact re-rank: levenshtein(a, b, k) >= 0 — identical truth
   *  value to lev(a, b) <= k, O(len·k) kernel. */
  private def bandedPred(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  /** Replace the FIRST lev conjunct with its banded form; other conjuncts
   *  (including further lev predicates) pass through untouched. */
  private def swapConjunct(cond: Expression): Expression = {
    var done = false
    splitConjunctivePredicates(cond)
      .map { c =>
        if (done) c
        else matchLev(c) match {
          case Some((a, b, k)) => done = true; bandedPred(a, b, k)
          case None => c
        }
      }
      .reduce(And)
  }

  private def rewrite(
      out: Seq[Attribute], cond: Expression, l: LogicalPlan, r: LogicalPlan,
      jc: Option[Expression], hint: JoinHint
  ): Option[LogicalPlan] =
    splitConjunctivePredicates(cond).iterator.flatMap(matchLev).collectFirst {
      case x => x
    }.flatMap { case (ea, eb, k) =>
      val aL = ea.references.subsetOf(l.outputSet) &&
        eb.references.subsetOf(r.outputSet)
      val aR = ea.references.subsetOf(r.outputSet) &&
        eb.references.subsetOf(l.outputSet)
      if (!aL && !aR) None
      else {
        val (la, rb) = if (aL) (ea, eb) else (eb, ea)
        val attrL = AttributeReference(BKT_L, LongT, nullable = true)()
        val bl = bucket(la, k)
        val gl = Generate(
          Explode(CreateArray(Seq(
            Subtract(bl, Literal(1L)), bl, Add(bl, Literal(1L))))),
          unrequiredChildIndex = Nil,
          outer = false,
          qualifier = None,
          generatorOutput = Seq(attrL),
          child = l)
        val aliasR = Alias(bucket(rb, k), BKT_R)()
        val pr = Project(r.output :+ aliasR, r)
        val prefilter = And(
          EqualTo(attrL, aliasR.toAttribute),
          LessThanOrEqual(Abs(Subtract(Length(la), Length(rb))), Literal(k)))
        val newJoin = Join(
          gl, pr, Inner,
          Some(jc.map(And(_, prefilter)).getOrElse(prefilter)), hint)
        Some(Project(out, Filter(swapConjunct(cond), newJoin)))
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Default ON: this rewrite is result-identical (see object doc); the
    // conf is a kill switch, not an opt-in — the deliberate contrast with
    // the approximate cosine rule above.
    if (!conf.getConfString("spark.dies.lev.rewrite.enabled", "true").toBoolean) {
      return plan
    }
    plan.resolveOperatorsUp {
      case f @ Filter(cond, j @ Join(l, r, Inner, jc, hint))
          if f.resolved && !alreadyBucketed(j) =>
        rewrite(f.output, cond, l, r, jc, hint).getOrElse(f)
      case j @ Join(l, r, Inner, Some(cond), hint)
          if j.resolved && !alreadyBucketed(j) =>
        val residue = splitConjunctivePredicates(cond)
          .filter(c => matchLev(c).isEmpty)
        rewrite(j.output, cond, l, r, residue.reduceOption(And), hint)
          .getOrElse(j)
    }
  }
}

/** Third rule from the same jar: rewrite numeric band predicates
 *  `abs(a - b) <= k` over inner joins into BUCKETED equi-joins — the classic
 *  band join. Vanilla Spark plans a join whose only condition is a numeric
 *  proximity predicate as BroadcastNestedLoopJoin (or CartesianProduct at
 *  scale): O(n*m) pair evaluations. With bucket width w = k + 1 the buckets
 *  beta = x div w of a true pair differ by at most 1 (every bucket interval
 *  is at least w - 1 = k wide, so two values within k cannot skip a bucket;
 *  truncating division only WIDENS the bucket around zero, which preserves
 *  the adjacency bound). The LEFT side explodes to {beta-1, beta, beta+1}
 *  (3 distinct values), the right side keeps its single beta, and the join
 *  takes `__band_bkt_l = __band_bkt_r` — every true pair meets EXACTLY once,
 *  so no Distinct is needed and bag semantics are preserved. The original
 *  abs predicate stays as the O(1) exact re-rank on bucket-colliding
 *  candidates.
 *
 *  EXACT — result-identical to the naive plan — so it defaults ON
 *  (kill switch: spark.dies.band.rewrite.enabled=false). Known boundary:
 *  when `a - b` itself overflows the operand type (|a|,|b| near the type's
 *  extremes), the two plans diverge — under ANSI mode (Spark 4 default)
 *  the naive plan ERRORS on the overflowing pair while the rewrite never
 *  evaluates it (buckets are far apart), and under non-ANSI wrap the naive
 *  plan can return a wrapped-negative abs that satisfies `<= k` while the
 *  rewrite drops the pair. Proximity predicates on values spanning more
 *  than half the type's range are outside this rule's contract; Spark's
 *  own predicate reordering makes error surfacing order-unstable in the
 *  same way. Applies only when
 *  no existing equality conjunct already bridges the two sides: with an
 *  equi key present the join is already hash-partitioned and the 3x left
 *  explosion would cost more than it saves. Restricted to integral operand
 *  types (the events/orders epoch-micro convention) where bucket arithmetic
 *  is exact; this is the Catalyst form of join_theta_range /
 *  join_asof's hand-written band discipline, applied automatically to any
 *  user query that writes the naive proximity predicate. */
object NumericBandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  private val BKT_L = "__band_bkt_l"
  private val BKT_R = "__band_bkt_r"
  private val LongT = org.apache.spark.sql.types.LongType

  /** Normalize a conjunct to (a, b, k) with `abs(a - b) <= k` semantics;
   *  only integral operands rewrite (bucket arithmetic must be exact). */
  private def matchBand(e: Expression): Option[(Expression, Expression, Long)] = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    def k(lit: Expression): Option[Long] = lit.eval() match {
      case n: Number => Some(n.longValue())
      case _ => None
    }
    def ab(x: Expression): Option[(Expression, Expression)] = x match {
      case Abs(Subtract(a, b, _), _)
          if integral.contains(a.dataType) && integral.contains(b.dataType) =>
        Some((a, b))
      case _ => None
    }
    val m = e match {
      case LessThanOrEqual(x, rhs) if rhs.foldable =>
        ab(x).flatMap { case (a, b) => k(rhs).map((a, b, _)) }
      case GreaterThanOrEqual(rhs, x) if rhs.foldable =>
        ab(x).flatMap { case (a, b) => k(rhs).map((a, b, _)) }
      case LessThan(x, rhs) if rhs.foldable =>
        ab(x).flatMap { case (a, b) => k(rhs).map(v => (a, b, v - 1)) }
      case GreaterThan(rhs, x) if rhs.foldable =>
        ab(x).flatMap { case (a, b) => k(rhs).map(v => (a, b, v - 1)) }
      case _ => None
    }
    m.filter(_._3 >= 0L)
  }

  private def alreadyBucketed(j: Join): Boolean =
    j.left.output.exists(_.name == BKT_L) ||
      j.right.output.exists(_.name == BKT_R)

  /** An equality conjunct with one side's refs entirely from l and the
   *  other's entirely from r — the join already has a hash key. */
  private def hasEquiBridge(
      cond: Expression, l: LogicalPlan, r: LogicalPlan): Boolean = {
    def bridges(x: Expression, y: Expression): Boolean =
      (x.references.nonEmpty && y.references.nonEmpty &&
        x.references.subsetOf(l.outputSet) &&
        y.references.subsetOf(r.outputSet)) ||
        (x.references.nonEmpty && y.references.nonEmpty &&
          x.references.subsetOf(r.outputSet) &&
          y.references.subsetOf(l.outputSet))
    splitConjunctivePredicates(cond).exists {
      case EqualTo(x, y) => bridges(x, y)
      case EqualNullSafe(x, y) => bridges(x, y)
      case _ => false
    }
  }

  /** x div (k+1) as a Long — the band bucket. */
  private def bucket(x: Expression, k: Long): Expression =
    IntegralDivide(Cast(x, LongT), Literal(k + 1L))

  private def rewrite(
      out: Seq[Attribute], cond: Expression, l: LogicalPlan, r: LogicalPlan,
      jc: Option[Expression], hint: JoinHint
  ): Option[LogicalPlan] =
    splitConjunctivePredicates(cond).iterator.flatMap(matchBand).collectFirst {
      case x => x
    }.flatMap { case (ea, eb, k) =>
      val aL = ea.references.subsetOf(l.outputSet) &&
        eb.references.subsetOf(r.outputSet)
      val aR = ea.references.subsetOf(r.outputSet) &&
        eb.references.subsetOf(l.outputSet)
      if (!aL && !aR) None
      else {
        val (la, rb) = if (aL) (ea, eb) else (eb, ea)
        val attrL = AttributeReference(BKT_L, LongT, nullable = true)()
        val bl = bucket(la, k)
        // TRY-mode neighbors (ADVICE r11): when the bucket sits at a Long
        // extreme (k = 0 with an operand at the type boundary), bl +- 1
        // overflows -- under ANSI a plain Subtract/Add would make the
        // REWRITTEN plan error where the naive plan succeeds. try_add/
        // try_subtract yield NULL instead; a null band row can never
        // equal a real right-side bucket, and a partner for the
        // overflowed neighbor cannot exist anyway (it would need a value
        // beyond the type extreme), so dropping it is result-identical.
        // (The Levenshtein rule above keeps plain +- 1: its buckets
        // derive from string lengths, which never approach Long extremes.)
        val gl = Generate(
          Explode(CreateArray(Seq(
            Subtract(bl, Literal(1L), EvalMode.TRY), bl,
            Add(bl, Literal(1L), EvalMode.TRY)))),
          unrequiredChildIndex = Nil,
          outer = false,
          qualifier = None,
          generatorOutput = Seq(attrL),
          child = l)
        val aliasR = Alias(bucket(rb, k), BKT_R)()
        val pr = Project(r.output :+ aliasR, r)
        val prefilter = EqualTo(attrL, aliasR.toAttribute)
        val newJoin = Join(
          gl, pr, Inner,
          Some(jc.map(And(_, prefilter)).getOrElse(prefilter)), hint)
        // the original condition (band conjunct included — it is the O(1)
        // exact re-rank) applies unchanged above the bucketed join
        Some(Project(out, Filter(cond, newJoin)))
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Default ON: this rewrite is result-identical (see object doc); the
    // conf is a kill switch, not an opt-in.
    if (!conf.getConfString("spark.dies.band.rewrite.enabled", "true").toBoolean) {
      return plan
    }
    plan.resolveOperatorsUp {
      case f @ Filter(cond, j @ Join(l, r, Inner, jc, hint))
          if f.resolved && !alreadyBucketed(j) &&
            !hasEquiBridge(jc.map(And(cond, _)).getOrElse(cond), l, r) =>
        rewrite(f.output, cond, l, r, jc, hint).getOrElse(f)
      case j @ Join(l, r, Inner, Some(cond), hint)
          if j.resolved && !alreadyBucketed(j) &&
            !hasEquiBridge(cond, l, r) =>
        rewrite(j.output, cond, l, r, None, hint).getOrElse(j)
    }
  }
}

/** Entry point for spark.sql.extensions. */
class CosineLshExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[CosineSim].getName,
        null,
        "cosine_sim",
        "cosine_sim(a, b) - exact cosine similarity of two numeric arrays " +
          "(zip_with/aggregate, codegen-friendly). EXACT by default. If " +
          "spark.dies.lsh.rewrite.enabled=true (default false), " +
          "`cosine_sim(a,b) >= tau` predicates over inner joins rewrite to " +
          "banded-LSH equi-joins: APPROXIMATE (band misses drop true " +
          "pairs; recall ~0.75 at tau=0.35 under the default 8x4 geometry, " +
          "lower at lower tau) and SET-semantic (a Distinct collapses " +
          "duplicate matched rows). Tune via spark.dies.lsh.bands / " +
          "spark.dies.lsh.rowsPerBand; consult plan_lsh_band_geometry.",
        ""),
      (args: Seq[Expression]) => new CosineSim(args(0), args(1))))
    ext.injectResolutionRule(_ => CosineLshJoinRewrite)
    ext.injectResolutionRule(_ => LevenshteinBandJoinRewrite)
    ext.injectResolutionRule(_ => NumericBandJoinRewrite)
  }
}
