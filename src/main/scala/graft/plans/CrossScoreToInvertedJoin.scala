package graft.plans

import graft.functions.KeywordExpressions.KeywordDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType, StructType}

/** The SURVEY.md §4 flagship rewrite: turn the reference-shaped all-pairs
  * scoring plan
  *
  *   Project [lid, rid, keyword_dot(lk, rk) AS score]
  *     (Filter keyword_dot(lk, rk) > 0)?   — or fused into the join cond
  *       Join Cross / Inner(keyword_dot > 0)
  *
  * into the inverted-index decomposition
  *
  *   Filter score > 0
  *     Aggregate [lid, rid] [lid, rid, sum(_lv * _rv) AS score]
  *       Join Inner (_w_l = _w_r)
  *         Project [lid, _w_l, _lv]  <- Generate explode(lk)
  *         Project [rid, _w_r, _rv]  <- Generate explode(rk)
  *
  * — O(U·N·K²) pair evaluations become one hash join on `word` plus one
  * aggregation; pairs sharing no word (exactly the pairs the `> 0` guard
  * discards) are never materialized.
  *
  * Soundness conditions, all checked structurally:
  *  - the `score > 0` guard is present (either as a Filter above the cross
  *    or fused into the join condition by PushPredicateThroughJoin) —
  *    without it the cross also emits zero-score pairs and the rewrite
  *    would drop them;
  *  - the keyword columns are `array<struct<word:string, value:double>>`
  *    attributes, one from each side;
  *  - every other projected column is a plain attribute (grouping keys).
  *
  * Assumed data invariant (not checkable statically): input rows are
  * unique per id and keyword lists are duplicate-free — the invariant
  * every profile table in this engine satisfies. KeywordDot is last-wins
  * per duplicated word while the explode/join/sum form adds a term per
  * duplicate, so a violation would change scores silently. The rewrite
  * therefore injects a cheap runtime assert (array_distinct size check,
  * O(K) per exploded row) that fails the query loudly instead; disable
  * with `spark.graft.crossRewrite.assertDistinct=false` if the invariant
  * is guaranteed upstream and the check must be shaved. Summation order
  * differs from the UDF's map iteration (± ulps); rank on rounded scores,
  * as all pipelines here do.
  *
  * Install via `spark.experimental.extraOptimizations` or
  * `functions.GraftExtensions`.
  */
object CrossScoreToInvertedJoin extends Rule[LogicalPlan] {

  private val kwType = ArrayType(
    StructType.fromDDL("word STRING, value DOUBLE"), containsNull = true)

  private def isKwAttr(e: Expression): Option[Attribute] = e match {
    case a: AttributeReference
        if a.dataType.isInstanceOf[ArrayType] &&
          a.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType] &&
          a.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
            .fields.map(f => (f.name, f.dataType)).toSeq ==
            Seq(("word", StringType), ("value", DoubleType)) =>
      Some(a)
    case _ => None
  }

  /** cond is the `keyword_dot(lk, rk) > 0` guard for this dot. */
  private def isGuard(cond: Expression, dot: KeywordDot): Boolean = cond match {
    case GreaterThan(d: KeywordDot, Literal(v, _)) =>
      d.semanticEquals(dot) && java.lang.Double.parseDouble(v.toString) == 0.0
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // Shape A: Filter(dot > 0) directly below the scoring Project
    case Project(projList, Filter(cond, Join(l, r, Cross, None, _)))
        if extract(projList, l, r).exists { case (_, dot, _, _) => isGuard(cond, dot) } =>
      rewrite(projList, l, r)

    // Shape B: the guard fused into the join condition by predicate pushdown
    // (the join type may remain Cross or have become Inner)
    case Project(projList, Join(l, r, Cross | Inner, Some(cond), _))
        if extract(projList, l, r).exists { case (_, dot, _, _) => isGuard(cond, dot) } =>
      rewrite(projList, l, r)
  }

  /** Finds the single keyword_dot alias and its per-side keyword attrs;
    * requires every other projection to be a bare attribute.
    */
  private def extract(projList: Seq[NamedExpression], l: LogicalPlan, r: LogicalPlan)
      : Option[(Alias, KeywordDot, Attribute, Attribute)] = {
    val dots = projList.collect { case a @ Alias(d: KeywordDot, _) => (a, d) }
    val others = projList.filterNot(p => dots.exists(_._1 eq p))
    dots match {
      case Seq((a, d)) if others.forall(_.isInstanceOf[AttributeReference]) =>
        for {
          lk <- isKwAttr(d.left) if l.outputSet.contains(lk)
          rk <- isKwAttr(d.right) if r.outputSet.contains(rk)
          if others.forall(o => l.outputSet.contains(o.toAttribute) ||
            r.outputSet.contains(o.toAttribute))
        } yield (a, d, lk, rk)
      case _ => None
    }
  }

  private def explodeSide(child: LogicalPlan, kw: Attribute, keep: Seq[Attribute],
                          wName: String, vName: String): (LogicalPlan, Attribute, Attribute) = {
    val elemType = kw.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    val elem = AttributeReference("_kw", elemType, nullable = true)()
    val gen = Generate(Explode(assertDistinctWords(kw, elemType)),
      unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(elem), child = child)
    val word = Alias(GetStructField(elem, 0, Some("word")), wName)()
    val value = Alias(GetStructField(elem, 1, Some("value")), vName)()
    (Project(keep ++ Seq(word, value), gen), word.toAttribute, value.toAttribute)
  }

  /** Loud-failure guard for the rewrite's data invariant: a keyword list
    * with duplicate words raises instead of silently scoring differently
    * than the cross form. Null lists pass through (explode emits nothing).
    */
  private def assertDistinctWords(kw: Attribute, elemType: StructType): Expression = {
    if (!conf.getConfString("spark.graft.crossRewrite.assertDistinct", "true").toBoolean)
      return kw
    val words = GetArrayStructFields(kw, elemType.fields(0), 0,
      elemType.fields.length, containsNull = true)
    val ok = Or(IsNull(kw), EqualTo(Size(ArrayDistinct(words)), Size(kw)))
    If(ok, kw, Cast(new RaiseError(Literal(
      "graft inverted-join rewrite: keyword list contains duplicate words; " +
        "inverted-join rewrite requires duplicate-free lists (keyword_dot is " +
        "last-wins per word, the rewrite sums per occurrence). Set " +
        "spark.graft.crossRewrite.assertDistinct=false only if uniqueness is " +
        "guaranteed upstream.")), kw.dataType))
  }

  private def rewrite(projList: Seq[NamedExpression], l: LogicalPlan, r: LogicalPlan): LogicalPlan = {
    val Some((scoreAlias, _, lk, rk)) = extract(projList, l, r)
    val others = projList.filterNot(_ eq scoreAlias).map(_.toAttribute)
    val (lKeep, rKeep) = others.partition(l.outputSet.contains)

    val (projL, wL, vL) = explodeSide(l, lk, lKeep, "_w_l", "_lv")
    val (projR, wR, vR) = explodeSide(r, rk, rKeep, "_w_r", "_rv")
    val joined = Join(projL, projR, Inner, Some(EqualTo(wL, wR)), JoinHint.NONE)

    val sum = Alias(Sum(Multiply(vL, vR)).toAggregateExpression(), scoreAlias.name)(
      exprId = scoreAlias.exprId) // parent operators keep resolving `score`
    val aggList = projList.map(p => if (p eq scoreAlias) sum else p)
    val agg = Aggregate(others, aggList, joined)
    // re-assert the reference guard on the aggregated score (negative-weight
    // common-word pairs must still drop, as they did on the cross)
    Filter(GreaterThan(sum.toAttribute, Literal(0.0)), agg)
  }
}
