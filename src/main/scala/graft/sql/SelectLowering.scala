package graft.sql

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SELECT-shape lowering for [[EmdriveSession]]: set-op chains, recursive
  * CTEs, FROM/join trees (NATURAL/USING/ASOF/LATERAL), correlated scalar
  * subqueries, VALUES relations, and the big `lowerSelect` — split out of
  * EmdriveSession.scala (r16, pure move) so the statement/catalog file
  * stays readable. Mixed into the session class; state (catalog, views,
  * spark) stays on the class. */
private[sql] trait SelectLowering { self: EmdriveSession =>
  import EmdriveSql._

  /** Left-assoc set-op fold (ANSI bag semantics): positional column
    * matching; UNION dedupes the accumulated bag (the same
    * partial-combined aggregate as any DISTINCT), UNION ALL keeps it,
    * EXCEPT/INTERSECT lower to Dataset.except/intersect — Spark plans
    * both as null-safe left-anti/left-semi joins over distinct inputs,
    * exactly the ANSI DISTINCT set semantics, and AQE picks
    * broadcast vs shuffle. A tail-less chain is just its head SELECT. */
  /** Does this select (transitively through joins/derived tables)
    * reference relation `n` in a FROM position? The recursion detector
    * for WITH RECURSIVE — subquery positions are deliberately excluded
    * (ANSI forbids the recursive reference there). */
  private[sql] def selectReferences(sel: Select, n: String): Boolean =
    sel.table == n || sel.joins.exists(_.table == n) ||
      sel.derived.exists(u => chainReferences(u, n))

  private[sql] def chainReferences(u: UnionStmt, n: String): Boolean =
    selectReferences(u.first, n) ||
      u.rest.exists { case (_, s) => selectReferences(s, n) }

  /** WITH RECURSIVE fixpoint (r9): naive set-semantics iteration. The
    * first UNION arm (plus any other non-self-referencing arms) is the
    * base; every self-referencing arm is a step. Each round re-evaluates
    * the steps against the CURRENT accumulated relation and unions
    * distinct; convergence = no growth (monotone under set union, so the
    * count check is exact). Rounds localCheckpoint, so lineage stays one
    * round deep and each iteration's shuffle work is bounded by the
    * delta-free naive cost — the documented trade at this surface
    * (semi-naive evaluation and the RDD fixpoint live in
    * operators.Dedup.components for the 100 TB graph path; the SQL
    * surface favors ANSI fidelity with a loud iteration cap). */
  private[sql] def lowerRecursiveCte(name: String, chain: UnionStmt): DataFrame = {
    require(!selectReferences(chain.first, name),
      s"recursive CTE $name: the first UNION arm must be the non-recursive base")
    val (stepArms, baseArms) = chain.rest.partition {
      case (_, s) => selectReferences(s, name)
    }
    stepArms.foreach { case (op, _) =>
      require(op == "union",
        s"recursive CTE $name: the recursive arm must attach with UNION " +
          "(distinct set semantics — UNION ALL over a cycle never terminates)")
    }
    // LAZY localCheckpoint + count: the eager form runs one job to
    // materialize the checkpoint and the count() a second — with the lazy
    // mark, the count() action is what computes (and persists) the blocks,
    // so each fixpoint round runs ONE job instead of two (r17 verdict
    // next-round #7). Same blocks, same lineage truncation, same counts.
    var acc = lowerChain(UnionStmt(chain.first, baseArms))
      .dropDuplicates().localCheckpoint(eager = false)
    var n = acc.count()
    var iter = 0
    var grown = true
    val saved = catalog.get(name)
    try {
      while (grown && iter < 100) {
        catalog(name) = acc
        val stepped = stepArms.map { case (_, s) => lowerSelect(s) }
          .map(d => d.toDF(acc.columns.toIndexedSeq: _*))
          .reduce(_ union _)
        val next = acc.union(stepped).dropDuplicates()
          .localCheckpoint(eager = false)
        val n2 = next.count()
        grown = n2 > n
        acc = next
        n = n2
        iter += 1
      }
    } finally {
      saved match {
        case Some(prev) => catalog(name) = prev
        case None => catalog.remove(name)
      }
    }
    require(!grown,
      s"recursive CTE $name did not converge within 100 iterations " +
        "(unbounded recursion? add a depth guard to the step's WHERE)")
    acc
  }

  private[sql] def lowerChain(u: UnionStmt): DataFrame = {
    // ANSI precedence (r10, closes the r9 uniform-precedence
    // simplification): INTERSECT [ALL] binds tighter than UNION/EXCEPT,
    // so the flat parsed chain lowers in two levels — maximal
    // INTERSECT-connected runs fold first (left-assoc), then the runs
    // fold under UNION/EXCEPT (left-assoc). `A UNION B EXCEPT C
    // INTERSECT D` is (A ∪ B) − (C ∩ D), exactly the standard's grouping.
    val segs = mutable.ListBuffer[DataFrame](lowerSelect(u.first))
    val segOps = mutable.ListBuffer.empty[String]
    u.rest.foreach { case (op, sel) =>
      val rhs = lowerSelect(sel)
      op match {
        case "intersect" => segs(segs.length - 1) = segs.last.intersect(rhs)
        case "intersect_all" =>
          segs(segs.length - 1) = segs.last.intersectAll(rhs)
        case other => segOps += other; segs += rhs
      }
    }
    segOps.zip(segs.tail).foldLeft(segs.head) { case (acc, (op, rhs)) =>
      op match {
        case "union_all" => acc.union(rhs)
        case "union" => acc.union(rhs).dropDuplicates()
        case "except" => acc.except(rhs)
        // ALL variants (r9): ANSI bag semantics — multiplicities
        // subtract/min instead of collapsing (Catalyst's dedicated
        // ExceptAll/IntersectAll plans, identical in DuckDB)
        case "except_all" => acc.exceptAll(rhs)
      }
    }
  }

  /** True when `sub` is a correlated scalar subquery against `outer`:
    * single table, no grouping, and at least one WHERE equality conjunct
    * straddling the inner table and the outer relation. Uncorrelated
    * subqueries keep the execute-and-inline literal path. */
  private[sql] def isCorrScalar(sub: Select, outer: DataFrame): Boolean =
    sub.derived.isEmpty && sub.joins.isEmpty && sub.groupBy.isEmpty &&
      sub.having.isEmpty && {
      val innerCols = table(sub.table).columns.toSet
      val outerCols = outer.columns.toSet
      sub.where.flatMap(splitConjuncts).exists {
        case PCmp(Cmp(ORef(a), "=", ORef(b))) =>
          (innerCols(a) && !innerCols(b) && outerCols(b)) ||
            (innerCols(b) && !innerCols(a) && outerCols(a))
        case _ => false
      }
    }

  /** Correlated scalar subquery in the SELECT list:
    * `(SELECT agg(x) FROM t WHERE t.k = outer.k [AND local]) AS a` —
    * the Kim/Dayal rewrite: the inner relation keeps its local
    * predicates, aggregates GROUPED BY the correlation keys (one row per
    * key, so the scalar cardinality guarantee holds by construction
    * instead of by runtime check), and left-outer joins back on the
    * outer columns — declarative, so AQE broadcasts small key sides.
    * ANSI empty-set semantics: a scalar subquery over no rows is NULL,
    * except COUNT which is 0 — the grouped rewrite drops empty groups,
    * so COUNT gets an explicit zero-fill and every other aggregate keeps
    * the join's NULL. Helper columns live under reserved `__cs_` names
    * and are dropped before projection. */
  private[sql] def attachCorrScalar(df0: DataFrame, sub: Select, alias: String): DataFrame = {
    val (aggF, aggArg) = sub.items match {
      case Seq(AggItem(f, arg, _, None)) => (f, arg)
      case _ => throw new IllegalArgumentException(
        "a correlated scalar subquery must select exactly one aggregate")
    }
    val inner = table(sub.table)
    val innerCols = inner.columns.toSet
    val outerCols = df0.columns.toSet
    val (corr, local) = sub.where.flatMap(splitConjuncts).partitionMap {
      case PCmp(Cmp(ORef(a), "=", ORef(b)))
          if innerCols(a) && !innerCols(b) && outerCols(b) => Left((a, b))
      case PCmp(Cmp(ORef(a), "=", ORef(b)))
          if innerCols(b) && !innerCols(a) && outerCols(a) => Left((b, a))
      case other => Right(other)
    }
    val filtered = local.foldLeft(inner)((d0, pr) => d0.filter(predCol(inner, pr)))
    val pairs = corr.distinct
    val keyCols = pairs.map(_._1).distinct
    val keyName = keyCols.zipWithIndex
      .map { case (k, j) => k -> s"__cs_key_${alias}_$j" }.toMap
    val aggN = s"__cs_agg_$alias"
    val grouped = filtered.groupBy(keyCols.map(col): _*)
      .agg(aggColumn(aggF, aggArg).as(aggN))
      .select(keyCols.map(k => col(k).as(keyName(k))) :+ col(aggN): _*)
    val cond = pairs.map { case (ic, oc) =>
      df0(oc) === grouped(keyName(ic)) }.reduce(_ && _)
    val value =
      if (aggF == "COUNT" || aggF == "COUNT_DISTINCT") coalesce(col(aggN), lit(0L))
      else col(aggN)
    df0.join(grouped, cond, "left_outer")
      .withColumn(alias, value)
      .drop(keyName.values.toSeq :+ aggN: _*)
  }

  /** FROM + JOIN chain → a DataFrame: base relation (table, derived
    * table, or chained statement) aliased, then each JOIN folded on as a
    * declarative equi-join — Catalyst/AQE pick broadcast vs shuffle by
    * size, so the SQL surface inherits the engine's join machinery.
    * Unqualified ON keys resolve by which side owns the name (either
    * order); `t AS a` renames columns to `a.col` so qualified references
    * and self-joins resolve by plain (dotted) name. Shared by the
    * top-level SELECT path and the EXISTS subquery pre-pass (which needs
    * the inner RELATION but ignores the select list). */
  private[sql] def lowerFrom(sel: Select): DataFrame = {
    val joined = lowerFromJoins(sel)
    sel.lateral.fold(joined) { case (sub, alias) =>
      lowerLateral(joined, sub, alias)
    }
  }

  private[sql] def lowerFromJoins(sel: Select): DataFrame =
    sel.joins.foldLeft(
      aliasCols(sel.valuesRows.map(valuesFrame)
        .orElse(sel.derived.map(lowerChain)).getOrElse(table(sel.table)),
        sel.baseAlias)) { (rel, j) =>
      val right = aliasCols(table(j.table), j.alias)
      if (j.kind == "cross") rel.crossJoin(right)
      else if (j.natural) {
        // NATURAL (r15): equi-join on EVERY shared column name — the
        // multi-key USING lowering (one output column per shared name);
        // zero shared names is refused loudly (ANSI's silent cross
        // product is a footgun, not a feature). Shared names compare on
        // the UNDERLYING names (r16 ADVICE: aliasCols renames to
        // "alias.col", so an aliased side used to report "no shared
        // column names" even when the tables share columns) — the shared
        // columns un-prefix back to their bare names on each side, then
        // the USING-form join merges them as ANSI NATURAL requires.
        def bare(c: String) = c.substring(c.lastIndexOf('.') + 1)
        val rightBare = right.columns.map(bare).toSet
        val shared = rel.columns.map(bare).distinct.filter(rightBare)
        require(shared.nonEmpty,
          s"NATURAL JOIN with ${j.table}: no shared column names " +
            s"(left: ${rel.columns.mkString(",")}; " +
            s"right: ${right.columns.mkString(",")})")
        def unprefix(df: DataFrame): DataFrame = {
          val hits = df.columns.filter(c => shared.contains(bare(c)))
          require(hits.map(bare).distinct.length == hits.length,
            s"NATURAL JOIN with ${j.table}: shared name resolves to " +
              s"multiple columns (${hits.mkString(",")}) — qualify with " +
              "an explicit ON instead")
          hits.filter(c => c != bare(c))
            .foldLeft(df)((d, c) => d.withColumnRenamed(c, bare(c)))
        }
        unprefix(rel).join(unprefix(right), shared.toSeq, j.kind)
      }
      else if (j.usingCol) {
        // USING (k): Spark's native Seq-key join — one output k column
        require(rel.columns.contains(j.leftKey) &&
          right.columns.contains(j.leftKey),
          s"USING (${j.leftKey}) needs the bare column on BOTH sides " +
            s"(left: ${rel.columns.mkString(",")}; right: ${right.columns.mkString(",")})")
        rel.join(right, Seq(j.leftKey), j.kind)
      }
      else {
        val (lk, rk) =
          if (rel.columns.contains(j.leftKey) && right.columns.contains(j.rightKey))
            (j.leftKey, j.rightKey)
          else if (rel.columns.contains(j.rightKey) && right.columns.contains(j.leftKey))
            (j.rightKey, j.leftKey)
          else throw new IllegalArgumentException(
            s"join keys ${j.leftKey} = ${j.rightKey} do not match " +
              s"left(${rel.columns.mkString(",")}) vs ${j.table}")
        j.asof match {
          case Some((x, op, y)) => lowerAsofJoin(rel, right, lk, rk, x, op, y, j.kind)
          case None => rel.join(right, qcol(rel, lk) === qcol(right, rk), j.kind)
        }
      }
    }

  /** LATERAL lowering (r14): `outer, LATERAL (SELECT items FROM t WHERE
    * inner = outer AND local… [ORDER BY …] [LIMIT n]) l` — the ANSI
    * spelling of per-key top-n and per-row subquery expansion.
    *
    * Decorrelated, never per-row: the inner relation keeps its LOCAL
    * predicates, a LIMIT becomes a rank window PARTITIONED BY the
    * correlation key (`row_number ≤ n` — the classic top-n-per-key
    * rewrite: one shuffle on the key, sort bounded per key), and the
    * result equi-joins back to the outer relation, where AQE picks
    * broadcast vs shuffle. The window computes over every inner key
    * before the join — at 100 TB pre-filter the inner relation or put
    * the selective predicate inside the LATERAL body (Catalyst cannot
    * push outer predicates through the rank window). */
  private[sql] def lowerLateral(outer: DataFrame, sub: Select,
      alias: String): DataFrame = {
    require(sub.joins.isEmpty && sub.derived.isEmpty && sub.groupBy.isEmpty,
      "LATERAL supports a single-table projection body")
    val inner = aliasCols(table(sub.table), sub.baseAlias)
    val innerCols = inner.columns.toSet
    val outerCols = outer.columns.toSet
    val (corr, local) = sub.where.flatMap(splitConjuncts).partitionMap {
      case PCmp(Cmp(ORef(a), "=", ORef(b)))
          if innerCols(a) && !innerCols(b) && outerCols(b) => Left((a, b))
      case PCmp(Cmp(ORef(a), "=", ORef(b)))
          if innerCols(b) && !innerCols(a) && outerCols(a) => Left((b, a))
      case other => Right(other)
    }
    require(corr.size == 1,
      s"LATERAL requires exactly one equality correlation, found ${corr.size}")
    val (ik, ok) = corr.head
    val filtered = local.foldLeft(inner)((d, pr) => d.filter(predCol(inner, pr)))
    val ranked = sub.limit.fold(filtered) { n =>
      require(sub.orderBy.nonEmpty,
        "LATERAL LIMIT requires ORDER BY (unordered top-n is nondeterministic)")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(qcol(filtered, ik))
        .orderBy(sub.orderBy.map(k =>
          if (k.desc) qref(k.name).desc else qref(k.name).asc): _*)
      filtered.withColumn("__lrn", row_number().over(w))
        .filter(col("__lrn") <= n)
    }
    val itemCols: Seq[(Column, String)] = sub.items.map {
      case ColItem(c, a) => (qref(c), s"$alias.${a.getOrElse(c)}")
      case ExprItem(o, a) => (operandCol(ranked, o), s"$alias.$a")
      case other => throw new IllegalArgumentException(
        s"LATERAL body supports plain/computed columns, got $other")
    }
    val proj = ranked.select(
      (qref(ik).as("__lk") +:
        itemCols.map { case (c, n) => c.as(n) }): _*)
    outer.join(proj, qcol(outer, ok) === col("__lk"), "inner").drop("__lk")
  }

  /** ASOF JOIN lowering (r14): for each left row, the single right row
    * sharing the equi key whose time is nearest at-or-before (backward,
    * `l.t >= r.t`) or at-or-after (forward, `l.t <= r.t`) the left time.
    *
    * Spark-first shape — the B21 operator's union-window trick
    * (operators/AsOf.scala), not a per-row range join: tag both sides,
    * shuffle ONCE on the key, and take `last(right-struct, ignoreNulls)`
    * over a running window ordered by time (descending for forward asof)
    * with right rows sorting before left rows at equal times, so inclusive
    * ties match. One shuffle + one sort, linear output — survives 100 TB
    * where the O(n·m) range-join candidate blowup dies; skewed keys split
    * by AQE. All right columns travel as ONE struct so a matched row can
    * never be stitched from two right rows (the torn-row guarantee). */
  private[sql] def lowerAsofJoin(rel: DataFrame, right: DataFrame,
      lk: String, rk: String, x: String, op: String, y: String,
      kind: String): DataFrame = {
    require(kind == "inner" || kind == "left_outer",
      s"ASOF JOIN supports inner and LEFT forms, not $kind")
    // resolve the time conjunct by column ownership, like the equi keys;
    // normalize to (leftTime, rightTime, forward?)
    val (lt, rt, forward) =
      if (rel.columns.contains(x) && right.columns.contains(y))
        (x, y, op == "<=") // l.t <= r.t → nearest at-or-after
      else if (rel.columns.contains(y) && right.columns.contains(x))
        (y, x, op == ">=") // r.t >= l.t ≡ l.t <= r.t
      else throw new IllegalArgumentException(
        s"ASOF time columns $x $op $y do not match " +
          s"left(${rel.columns.mkString(",")}) vs right(${right.columns.mkString(",")})")
    val rCols = right.columns.toSeq
    val lCols = rel.columns.toSeq
    val carryType = StructType(rCols.map(c => right.schema(c).copy(name = c)))
    val lSide = rel.select(
      qcol(rel, lt).as("__t") +: lit(1).as("__side") +:
        qcol(rel, lk).as("__k") +:
        (lCols.filterNot(_ == lk).map(c => qcol(rel, c).as(c)) :+
          lit(null).cast(carryType).as("__r")): _*)
    val rSide = right.select(
      qcol(right, rt).as("__t") +: lit(0).as("__side") +:
        qcol(right, rk).as("__k") +:
        (lCols.filterNot(_ == lk).map(c =>
          lit(null).cast(rel.schema(c).dataType).as(c)) :+
          struct(rCols.map(c => qcol(right, c).as(c)): _*).as("__r")): _*)
    // NULL-time semantics (r14 ADVICE): an ASOF comparison against a NULL
    // time is unknown → no match, DuckDB-identical. Right rows with a
    // NULL time leave the union entirely (under the ascending window
    // order they sort first and last(ignoreNulls) would carry one as a
    // spurious "match" for every left row preceding all real right
    // times); left rows with a NULL time force __asof to NULL, so inner
    // drops them and LEFT emits NULL right fields.
    // Determinism (r14 ADVICE): when several right rows share a
    // (key, time) the window tiebreaks on the whole carried right struct
    // — a total order over orderable types, so last() picks the SAME
    // duplicate on any partitioning (the repo's determinism contract).
    // A right side with a non-orderable column (map) falls back to
    // (time, side) ordering — engine-dependent among exact duplicates
    // of (key, time) only.
    def orderable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case ArrayType(et, _) => orderable(et)
      case st: StructType => st.fields.forall(f => orderable(f.dataType))
      case _ => true
    }
    val tKey = if (forward) col("__t").desc else col("__t").asc
    val ordKeys =
      if (orderable(carryType)) Seq(tKey, col("__side"), col("__r").asc)
      else Seq(tKey, col("__side"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__k"))
      .orderBy(ordKeys: _*)
      .rowsBetween(Long.MinValue, 0)
    val joined = lSide.unionByName(rSide.filter(col("__t").isNotNull))
      .withColumn("__asof",
        when(col("__t").isNull, lit(null).cast(carryType))
          .otherwise(last(col("__r"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)
    val matched = if (kind == "inner") joined.filter(col("__asof").isNotNull)
      else joined
    matched.select(
      col("__k").as(lk) +:
        (lCols.filterNot(_ == lk).map(c => qref(c)) ++
          rCols.map(c => col("__asof").getField(c).as(c))): _*)
  }

  /** `(VALUES …) alias(cols)` relation: one literal-projection plan per
    * row, unioned — the INSERT VALUES machinery's FROM-side sibling.
    * Bounded dialect input (literal rows); types come from the literals
    * themselves (ints → BIGINT, decimals → DOUBLE, strings, booleans;
    * NULL needs at least one typed row for the column, ANSI-inferred by
    * the union). */
  private[sql] def valuesFrame(v: (Seq[String], Seq[Seq[Value]])): DataFrame = {
    val (cols, rows) = v
    val frames = rows.map { r =>
      spark.range(1).select(r.zip(cols).map { case (value, c) =>
        (value match {
          // integer literals type as INT when they fit (DuckDB's VALUES
          // inference), BIGINT beyond -- keeps inline-table schemas
          // engine-identical
          case VNum(n) =>
            if (isFloatNum(n)) lit(n.toDouble)
            else n.toLong match {
              case v if v >= Int.MinValue && v <= Int.MaxValue => lit(v.toInt)
              case v => lit(v)
            }
          case VStr(x) => lit(x)
          case VBool(b) => lit(b)
          case VNull => lit(null)
          case other => throw new IllegalArgumentException(
            s"VALUES expects literals, got $other")
        }).as(c)
      }.toIndexedSeq: _*)
    }
    frames.reduce(_ unionByName _)
  }

  private[sql] def lowerSelect(sel: Select): DataFrame = {
    val Select(items, name, where, rawGroupBy, having, rawOrderBy, limitN,
      joins, distinct, offsetN, derived, baseAlias, groupMode, groupExprs,
      qualify, groupSets, _, distinctOn, _) = sel
    // "#n" ordinal markers (GROUP BY 1 / ORDER BY 2) resolve to the n-th
    // select item's OUTPUT name — ANSI ordinal semantics; grouping by an
    // aggregate/window position is refused like any non-key grouping
    def itemName(it: SelectItem): String = it match {
      case ColItem(n, a) => a.getOrElse(n)
      case ExprItem(_, a) => a
      case AggExprItem(_, a) => a
      case w: WinItem => w.alias
      case DistItem(_, _, a) => a
      case c: CaseItem => c.alias
      case AggItem(f, arg, a, _) => aggAlias(f, arg, a)
      case Star | _: StarExclude | _: StarPattern =>
        throw new IllegalArgumentException("an ordinal cannot reference *")
    }
    def resolveOrd(k: String, grouping: Boolean): String =
      if (k.startsWith("#")) {
        val i = k.drop(1).toInt
        require(i >= 1 && i <= items.length,
          s"ordinal $i is out of range for ${items.length} select items")
        val it = items(i - 1)
        require(!grouping || !(it.isInstanceOf[AggItem]
          || it.isInstanceOf[AggExprItem] || it.isInstanceOf[WinItem]),
          s"GROUP BY ordinal $i references an aggregate/window item")
        itemName(it)
      } else k
    val groupBy = rawGroupBy.map(resolveOrd(_, grouping = true))
    val orderBy = rawOrderBy.map(k => k.copy(name = resolveOrd(k.name, grouping = false)))
    locally {
      // JOIN lowering (graft extension): unqualified ON keys resolved by
      // which side owns the name (either order). The equi-join lowers to a
      // declarative DataFrame join, so Catalyst/AQE pick broadcast vs
      // shuffle by size — the SQL surface inherits the engine's join
      // machinery rather than reimplementing any of it.
      // `t AS a` renames the relation's columns to `a.col` — qualified
      // references and self-joins then resolve by plain (dotted) name,
      // with backtick quoting at the Column boundary (aliasCols/qref)
      val base = lowerFrom(sel)
      // 1. attach aliased distance/computed columns, so WHERE can reference
      //    them (README story: WHERE distance < 4 filters the SELECT
      //    alias); window items attach AFTER the pre-window WHERE below
      var df = base
      items.foreach {
        case DistItem(c, probe, alias) => df = df.withColumn(alias, distCol(base, c, probe))
        case ColItem(c, Some(alias)) => df = df.withColumn(alias, qref(c))
        case it: CaseItem => df = df.withColumn(it.alias, caseCol(base, it))
        // correlated scalar subquery in the SELECT list — decorrelated
        // into a grouped-aggregate left join (attachCorrScalar); must
        // intercept BEFORE the generic operand path, which would execute
        // the subquery standalone and fail on the outer reference
        case ExprItem(OSub(sub), alias) if isCorrScalar(sub, df) =>
          df = attachCorrScalar(df, sub, alias)
        case ExprItem(o, alias) => df = df.withColumn(alias, operandCol(base, o))
        case _ => ()
      }
      // 2a. IN (SELECT …) pre-pass: each subquery becomes a left-outer
      //     join of the probe value against the DISTINCT single-column
      //     subquery result plus a broadcast 1-row (count, null-count)
      //     frame — declarative joins, so AQE picks broadcast vs shuffle
      //     on the distinct side. The predicate then reads the match
      //     marker with ANSI three-valued semantics, which makes it
      //     composable anywhere in the WHERE tree (AND/OR/NOT).
      var subPreds = Map.empty[Pred, Column]
      where.flatMap(collectInSubs).distinct.zipWithIndex.foreach {
        case (node, i) =>
          val sub = lowerSelect(node.sub)
          require(sub.columns.length == 1,
            s"IN subquery must project exactly one column, got " +
              s"(${sub.columns.mkString(", ")})")
          val (keyN, markN, cntN, nullN, probeN) =
            (s"__in_key_$i", s"__in_match_$i", s"__in_n_$i",
              s"__in_nulls_$i", s"__in_probe_$i")
          val keys = sub.toDF(keyN).distinct().withColumn(markN, lit(true))
          val stats = broadcast(sub.toDF("v").agg(
            count(lit(1)).as(cntN), count(when(col("v").isNull, 1)).as(nullN)))
          df = df.withColumn(probeN, operandCol(base, node.lhs))
            .join(keys, col(probeN) === col(keyN), "left_outer")
            .crossJoin(stats)
          val c = when(col(cntN) === 0, false)
            .when(col(markN).isNotNull, true)
            .when(col(probeN).isNull || col(nullN) > 0, lit(null).cast(BooleanType))
            .otherwise(false)
          subPreds += node -> (if (node.neg) !c else c)
      }
      // 2a'. quantified comparisons (r14): `x op ANY|ALL (SELECT …)`.
      //      The subquery reduces to ONE broadcast stats row — min/max
      //      over non-null values, row count, null count — because every
      //      ordering quantifier is decidable from the extremes: a
      //      falsifier for ALL (or a satisfier for ANY) exists iff the
      //      comparison fails (holds) against the relevant extreme.
      //      Three-valued: empty set → ALL TRUE / ANY FALSE; a NULL probe
      //      or NULLs in the set yield NULL unless an extreme already
      //      decides the answer (ANSI). `= ANY` / `!= ALL` never reach
      //      here (parse-time desugar to the null-aware IN machinery).
      where.flatMap(collectQuants).distinct.zipWithIndex.foreach {
        case (node, i) =>
          val sub = lowerSelect(node.sub)
          require(sub.columns.length == 1,
            s"ANY/ALL subquery must project exactly one column, got " +
              s"(${sub.columns.mkString(", ")})")
          val (minN, maxN, cntN, nullN, probeN) =
            (s"__q_min_$i", s"__q_max_$i", s"__q_n_$i",
              s"__q_nulls_$i", s"__q_probe_$i")
          val stats = broadcast(sub.toDF("v").agg(
            min(col("v")).as(minN), max(col("v")).as(maxN),
            count(lit(1)).as(cntN),
            count(when(col("v").isNull, 1)).as(nullN)))
          df = df.withColumn(probeN, operandCol(base, node.lhs))
            .crossJoin(stats)
          val p = col(probeN)
          // the extreme that decides: ALL looks for a falsifier, ANY for
          // a satisfier (NULL-probe comparisons are NULL → fall through)
          val decided = node.op match {
            case ">" => if (node.all) p <= col(maxN) else p > col(minN)
            case ">=" => if (node.all) p < col(maxN) else p >= col(minN)
            case "<" => if (node.all) p >= col(minN) else p < col(maxN)
            case "<=" => if (node.all) p > col(minN) else p <= col(maxN)
            case "=" | "!=" => (p =!= col(minN)) || (p =!= col(maxN))
            case other => throw new IllegalArgumentException(
              s"quantified comparison with $other")
          }
          val c =
            when(col(cntN) === 0, node.all)
              .when(decided, !node.all)
              .when(p.isNull || col(nullN) > 0, lit(null).cast(BooleanType))
              .otherwise(node.all)
          subPreds += (node: Pred) -> c
      }
      // 2b. [NOT]-composable EXISTS pre-pass: equality conjuncts that
      //     straddle the subquery and the outer relation DECORRELATE into
      //     a marker join — the inner relation keeps its local
      //     predicates, projects the DISTINCT correlation keys, and
      //     left-outer joins on the outer columns (AQE broadcasts the
      //     key side when small); EXISTS then reads the match marker.
      //     Two-valued, so it composes under AND/OR/NOT anywhere in the
      //     tree. An uncorrelated EXISTS folds to a broadcast
      //     existence bit off a LIMIT-1 probe.
      where.flatMap(collectExists).distinct.zipWithIndex.foreach { case (node, i) =>
        val sub = node.sub
        // the inner chain lowers through the same relation machinery as a
        // top-level SELECT (r9: the single-filtered-table restriction is
        // lifted — joined subqueries fold through lowerFrom, grouped ones
        // through the grouped-existence rewrite below); only the select
        // list is ignored, since EXISTS is about row existence (ANSI)
        val inner = lowerFrom(sub)
        val innerCols = inner.columns.toSet
        val outerCols = df.columns.toSet
        val (corr, local) = sub.where.flatMap(splitConjuncts).partitionMap {
          case PCmp(Cmp(ORef(a), "=", ORef(b)))
              if innerCols(a) && !innerCols(b) && outerCols(b) => Left((a, b))
          case PCmp(Cmp(ORef(a), "=", ORef(b)))
              if innerCols(b) && !innerCols(a) && outerCols(a) => Left((b, a))
          case other => Right(other)
        }
        val filtered = local.foldLeft(inner)((d0, pr) => d0.filter(predCol(inner, pr)))
        // grouped EXISTS (`… GROUP BY g HAVING h`): groups form per
        // (correlation key × GROUP BY key) — exactly the groups the
        // correlated subquery would form per outer row — HAVING filters
        // them, and existence means ANY surviving group. Without HAVING
        // a grouped EXISTS degenerates to plain row existence, and the
        // rewrite below reduces to it.
        val existsRel: DataFrame =
          if (sub.groupBy.isEmpty && sub.having.isEmpty) filtered
          else {
            require(sub.groupBy.forall(innerCols),
              s"EXISTS GROUP BY keys must be inner columns, " +
                s"got ${sub.groupBy.mkString(", ")}")
            val groupCols = (corr.map(_._1) ++ sub.groupBy).distinct
            val aggCols = sub.items.collect {
              case it: AggItem => aggItemCol(filtered, it)
            }
            val aggAll =
              if (aggCols.nonEmpty) aggCols
              else Seq(count(lit(1)).as(s"__ex_cnt_$i"))
            val g = filtered.groupBy(groupCols.map(qref): _*)
              .agg(aggAll.head, aggAll.tail: _*)
            sub.having.foldLeft(g)((d0, pr) =>
              d0.filter(predCol(d0, resolveHavingAggs(pr, sub.items))))
          }
        val c =
          if (corr.isEmpty) {
            val cntN = s"__ex_n_$i"
            df = df.crossJoin(broadcast(
              existsRel.limit(1).agg(count(lit(1)).as(cntN))))
            col(cntN) > 0
          } else {
            val markN = s"__ex_match_$i"
            val pairs = corr.distinct
            val keyCols = pairs.map(_._1).distinct
            val keyName = keyCols.zipWithIndex
              .map { case (k, j) => k -> s"__ex_key_${i}_$j" }.toMap
            val keys = existsRel
              .select(keyCols.map(qref): _*).distinct()
              .toDF(keyCols.map(keyName): _*)
              .withColumn(markN, lit(true))
            val cond = pairs.map { case (ic, oc) =>
              qcol(df, oc) === keys(keyName(ic)) }.reduce(_ && _)
            df = df.join(keys, cond, "left_outer")
            col(markN).isNotNull
          }
        subPreds += (node: Pred) -> c
      }
      // 2c. correlated scalar subqueries in WHERE comparisons
      //     (`WHERE x > (SELECT AVG(y) FROM t WHERE t.k = outer.k)`): the
      //     subquery attaches through the same Kim/Dayal grouped-aggregate
      //     decorrelation as the SELECT-list path (attachCorrScalar),
      //     under a reserved __cw_ name; the WHOLE comparison rewrites to
      //     a Column reading the attached value — ANSI NULL semantics fall
      //     out (empty non-COUNT group → NULL → comparison NULL → row
      //     dropped), and the node composes under AND/OR/NOT.
      //     Every distinct correlated atom in the node's operand trees is
      //     attached once (identical subqueries share one join), and the
      //     comparison lowers through operandCol with the atom→column map
      //     — so the subquery composes inside arithmetic, CAST, and
      //     scalar functions exactly like any other operand.
      locally {
        val nodes = where.flatMap(p => collectCorrCmps(p, df)).distinct
        val atoms = nodes.flatMap { case PCmp(Cmp(l, _, r)) =>
          corrSubsInOperand(l, df) ++ corrSubsInOperand(r, df)
        }.distinct
        val corr: Map[Select, Column] = atoms.zipWithIndex.map {
          case (subSel, i) =>
            val alias = s"__cw_$i"
            df = attachCorrScalar(df, subSel, alias)
            subSel -> col(alias)
        }.toMap
        nodes.foreach { case node @ PCmp(Cmp(l, op, r)) =>
          subPreds += (node: Pred) -> applyCmpOp(
            operandCol(base, l, corr), op, operandCol(base, r, corr))
        }
      }
      // 2. WHERE — ANSI split: conjuncts that do not read a window alias
      //    filter the window INPUT (plain column equality still lands in
      //    the scan's PushedFilters); conjuncts that do read one are the
      //    QUALIFY idiom and apply after window attachment (round-7
      //    ADVICE: the old all-post-window order silently diverged from
      //    ANSI when a plain filter met a window whose partition did not
      //    include the filtered column).
      val winAliases = items.collect { case w: WinItem => w.alias }.toSet
      val (postWin, preWin) = where.flatMap(splitConjuncts)
        .partition(c => refNames(c).exists(winAliases))
      preWin.foreach(c => df = df.filter(predCol(base, c, subPreds)))
      items.foreach {
        case WinItem(f, arg, parts, keys, alias, frame, fil) =>
          import org.apache.spark.sql.expressions.Window
          // a global window (no PARTITION BY) single-tasks the whole
          // relation — fine over a dimension/grid, a scale-killer over a
          // fact. The dialect can't see cardinality, so it WARNS (the
          // engine's own WindowExec warning fires too); unordered ranks
          // stay refused outright, as nondeterminism is a correctness
          // matter, not a performance one.
          if (parts.isEmpty)
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"window $f over $alias has no PARTITION BY: the whole " +
                "relation sorts in one task — acceptable for " +
                "dimension-sized inputs only")
          // frame-free aggregate window (r15): no ORDER BY → no sort at
          // all, and Spark's default frame is the WHOLE partition — the
          // share-of-total idiom (n / SUM(n) OVER ()). Deterministic by
          // construction; the parser restricts it to SUM/COUNT/AVG/MIN/
          // MAX. With an order the ANSI default RANGE frame applies.
          val partitioned = Window.partitionBy(parts.map(qref): _*)
          val ordered =
            if (keys.isEmpty) partitioned
            else partitioned.orderBy(keys.map(k =>
              if (k.desc) qref(k.name).desc else qref(k.name).asc): _*)
          // EXCLUDE CURRENT ROW (r14) rides the frame kind as a suffix:
          // strip it here, build the FULL-frame spec, and rewrite the
          // aggregate arithmetically below (full frame minus the row's
          // own contribution) — Spark has no native frame exclusion.
          val (frameBase, xcur) = frame match {
            case Some((k, lo, hi)) if k.endsWith("_xcur") =>
              (Some((k.dropRight(5), lo, hi)), true)
            case other => (other, false)
          }
          val spec = frameBase match {
            case None => ordered // ANSI default RANGE frame
            case Some(("range", lo, hi)) => ordered.rangeBetween(
              lo.fold(Window.unboundedPreceding)(n => -n),
              hi.fold(Window.unboundedFollowing)(n => n))
            // INTERVAL n DAY bounds (r14): re-key the RANGE frame onto
            // exact day numbers — datediff from the epoch is order- and
            // tie-equivalent to the DATE key itself, so `INTERVAL 7 DAY
            // PRECEDING` is precisely a 7-day value frame (DuckDB
            // semantics at day granularity). DATE keys only; a timestamp
            // would silently bucket to days, so it is refused.
            case Some(("range_days", lo, hi)) =>
              require(keys.length == 1 && !keys.head.desc,
                "an INTERVAL frame takes exactly one ascending ORDER BY key")
              val k = keys.head.name
              val kc = qref(k)
              val dayNum = datediff(to_date(kc), to_date(lit("1970-01-01")))
              val keyExpr = df.schema.find(_.name == k).map(_.dataType) match {
                case Some(DateType) => dayNum
                // timestamp keys are accepted ONLY when every value is
                // midnight-aligned (a date stored as a timestamp, the
                // common parquet shape) — checked per row at scan speed;
                // an intra-day time would make day-keyed RANGE silently
                // diverge from exact interval arithmetic, so it raises
                case Some(TimestampType) | Some(TimestampNTZType) =>
                  when(kc =!= to_date(kc).cast(
                      df.schema.find(_.name == k).get.dataType),
                    raise_error(concat(lit(s"INTERVAL frame key $k has a "),
                      lit("non-midnight timestamp; day-granularity RANGE "),
                      lit("requires date-valued keys"))))
                    .otherwise(dayNum)
                case other => throw new IllegalArgumentException(
                  s"INTERVAL frame ORDER BY key $k must be DATE-valued, got $other")
              }
              Window.partitionBy(parts.map(qref): _*)
                .orderBy(keyExpr)
                .rangeBetween(
                  lo.fold(Window.unboundedPreceding)(n => -n),
                  hi.fold(Window.unboundedFollowing)(n => n))
            case Some((_, lo, hi)) => ordered.rowsBetween(
              lo.fold(Window.unboundedPreceding)(n => -n),
              hi.fold(Window.unboundedFollowing)(n => n))
          }
          val fn = f match {
            case "ROW_NUMBER" => row_number()
            case "RANK" => rank()
            case "DENSE_RANK" => dense_rank()
            // (rank−1)/(rows−1): a ratio of exact integers, identically
            // defined in DuckDB — bitwise cross-engine
            case "PERCENT_RANK" => percent_rank()
            // rows-with-peers-or-before / rows: same exact-int ratio
            // class (ANSI CUME_DIST, identical in DuckDB)
            case "CUME_DIST" => cume_dist()
            case "NTILE" => ntile(arg.get.toInt)
            // out-of-partition rows yield NULL, identically in DuckDB
            case "NTH_VALUE" =>
              val Array(c, n) = arg.get.split(":")
              nth_value(qref(c), n.toInt)
            case "LAG" | "LEAD" =>
              // "!ignore" suffix = IGNORE NULLS (r17): the n-th previous
              // NON-NULL value — Spark's ignoreNulls flag, DuckDB-identical
              val (spec0, ign) = arg.get.split("!") match {
                case Array(a0, "ignore") => (a0, true)
                case _ => (arg.get, false)
              }
              val Array(c, off) = spec0.split(":")
              if (f == "LAG") lag(col(c), off.toInt, null, ign)
              else lead(col(c), off.toInt, null, ign)
            case "FIRST_VALUE" | "LAST_VALUE" =>
              // "!ignore" suffix = ANSI IGNORE NULLS (Spark's ignoreNulls
              // flag; DuckDB-identical: the nearest non-null in frame)
              val (c, ign) = arg.get.split("!") match {
                case Array(c0, "ignore") => (c0, true)
                case _ => (arg.get, false)
              }
              if (f == "FIRST_VALUE") first(qref(c), ignoreNulls = ign)
              else last(qref(c), ignoreNulls = ign)
            // windowed FILTER (r17): the aggregate folds only qualifying
            // frame rows — the same when(cond, x) fold as the grouped
            // form (NULL-skipping makes it exactly ANSI)
            case agg if fil.nonEmpty =>
              require(!xcur, "FILTER cannot combine with EXCLUDE CURRENT ROW")
              aggColumnFiltered(agg, arg, predCol(base, fil.get, subPreds))
            // ordered aggregate: ANSI default frame (RANGE unbounded
            // preceding → current row), same default in DuckDB
            case agg => aggColumn(agg, arg)
          }
          val result =
            if (!xcur) fn.over(spec)
            else f match {
              // leave-one-out rewrites. NULL edges follow the engines'
              // shared semantics: SUM/AVG over a reduced frame with no
              // non-null values is NULL (not 0); COUNT is 0.
              case "SUM" =>
                val x = qref(arg.get)
                val nX = count(x).over(spec) -
                  when(x.isNotNull, lit(1L)).otherwise(lit(0L))
                when(nX === 0, lit(null))
                  .otherwise(sum(x).over(spec) - coalesce(x, lit(0)))
              case "COUNT" if arg.isEmpty =>
                count(lit(1)).over(spec) - lit(1L)
              case "COUNT" =>
                val x = qref(arg.get)
                count(x).over(spec) -
                  when(x.isNotNull, lit(1L)).otherwise(lit(0L))
              case "AVG" =>
                val x = qref(arg.get)
                val nX = count(x).over(spec) -
                  when(x.isNotNull, lit(1L)).otherwise(lit(0L))
                val sX = sum(x).over(spec) - coalesce(x, lit(0))
                // exact-integer dividend/divisor → ONE IEEE division,
                // bitwise cross-engine for integral columns
                when(nX === 0, lit(null))
                  .otherwise(sX.cast("double") / nX)
              case other => throw new IllegalArgumentException(
                s"EXCLUDE CURRENT ROW supports SUM/COUNT/AVG, not $other")
            }
          df = df.withColumn(alias, result)
        case _ => ()
      }
      postWin.foreach(c => df = df.filter(predCol(base, c, subPreds)))
      // QUALIFY (r9): explicit window filter — same lowering as the
      // post-window WHERE conjuncts, just spelled the ANSI-extension way
      qualify.foreach(c => df = df.filter(predCol(base, c, subPreds)))
      val hasAgg = items.exists(i =>
        i.isInstanceOf[AggItem] || i.isInstanceOf[AggExprItem])
      // ORDER BY expression keys (r9): hidden __ob_i columns. On the
      // plain-projection path they attach BEFORE the projection, so the
      // expression may read underlying columns not in the select list
      // (ANSI); on the aggregated path they attach to the aggregated
      // output below (output names only — ANSI's restriction anyway).
      val obExprs = orderBy.zipWithIndex.collect {
        case (k, i) if k.expr.isDefined => (s"__ob_$i", k.expr.get)
      }
      if (obExprs.nonEmpty) {
        require(!distinct, "ORDER BY expressions cannot combine with " +
          "SELECT DISTINCT — order by a select-list alias instead")
        if (!hasAgg && groupBy.isEmpty)
          obExprs.foreach { case (hn, o) =>
            df = df.withColumn(hn, operandCol(base, o))
          }
      }
      // hidden GROUP BY expression columns (r9) attach pre-aggregation;
      // their names ride groupBy like any key and the item projection
      // below drops them
      groupExprs.foreach { case (hn, o) =>
        df = df.withColumn(hn, operandCol(base, o))
      }
      // 3. aggregation (graft extension) or plain SELECT-list projection
      var out: DataFrame =
        if (hasAgg || groupBy.nonEmpty) {
          items.foreach {
            // either spelling may be the group key: the raw (possibly
            // qualified) column or its output alias (ordinals resolve to
            // the alias, which step 1 attached as a real column)
            case ColItem(c, a) =>
              require(groupBy.contains(c) || a.exists(groupBy.contains),
                s"column $c must appear in GROUP BY")
            // a CASE or computed alias may be a group key (the bucketing
            // idiom: GROUP BY the computed bucket) — it was attached pre-agg
            case it: CaseItem => require(groupBy.contains(it.alias),
              s"CASE alias ${it.alias} must appear in GROUP BY")
            case it: ExprItem => require(groupBy.contains(it.alias),
              s"expression alias ${it.alias} must appear in GROUP BY")
            case Star | _: StarExclude | _: StarPattern =>
              throw new IllegalArgumentException(
                "SELECT * cannot be combined with aggregates/GROUP BY")
            case d: DistItem => throw new IllegalArgumentException(
              s"distance item ${d.alias} cannot be combined with aggregates/GROUP BY")
            case _: AggItem => ()
            case _: AggExprItem => ()
            case w: WinItem => throw new IllegalArgumentException(
              s"window item ${w.alias} cannot be combined with aggregates/GROUP BY")
          }
          val plain = items.collect { case it: AggItem =>
            aggItemCol(df, it) }
          // each distinct aggregate atom inside expressions computes ONCE
          // under a RESERVED internal name (never a user-visible alias:
          // deduplicating against plain items let `SELECT SUM(x) AS
          // sum_v, SUM(v) / 2 ...` silently read the SUM(x) column —
          // round-7 ADVICE). Catalyst collapses identical aggregate
          // expressions, so the occasional double registration is free.
          val exprAtoms = items
            .collect { case AggExprItem(o, _) => aggAtoms(o) }.flatten.distinct
          // positional internal names (r16 ADVICE): __aggx_<i> over the
          // DISTINCT atom list — a 32-bit structural hash could collide
          // between two different atoms in one query, silently aliasing
          // them; position over a deduped list cannot
          val aggxNames: Map[EmdriveSql.OAggX, String] = exprAtoms
            .collect { case a: EmdriveSql.OAggX => a }
            .zipWithIndex.map { case (a, i) => a -> s"__aggx_$i" }.toMap
          val exprAggs = exprAtoms
            .map {
              case OAgg(f, arg) =>
                aggColumn(f, arg).as("__agg_" + aggAlias(f, arg, None))
              // expression aggregates (r15): the argument lowers over the
              // PRE-aggregation rows (CASE/arithmetic per row, then the
              // partial-combined aggregate — one scan, map-side combine);
              // the same spelled atom computes once and reads consistently
              case a @ OAggX(f, o) =>
                aggColumnX(f, operandCol(df, o)).as(aggxNames(a))
              case other => throw new IllegalArgumentException(
                s"unexpected aggregate atom: $other")
            }
          val aggs = plain ++ exprAggs
          require(aggs.nonEmpty, "GROUP BY requires at least one aggregate")
          // ROLLUP/CUBE lower to Dataset.rollup/cube — ONE Expand pass
          // produces every grouping set (no re-aggregation per level)
          val agged =
            (groupMode match {
              case "rollup" => df.rollup(groupBy.map(qref): _*)
              case "cube" => df.cube(groupBy.map(qref): _*)
              // explicit GROUPING SETS: the same single-Expand plan as
              // rollup/cube, with exactly the listed sets
              case "sets" =>
                df.groupingSets(groupSets.map(_.map(qref)), groupBy.map(qref): _*)
              case _ => df.groupBy(groupBy.map(qref): _*)
            }).agg(aggs.head, aggs.tail: _*)
          // post-aggregation expression evaluation: aggregate atoms read
          // their computed columns, ORefs read group keys, literals stay
          def aggExprCol(o: Operand): Column = o match {
            case OAgg(f, arg) => col("__agg_" + aggAlias(f, arg, None))
            case a: OAggX => col(aggxNames(a))
            case ORef(n) => qref(n)
            case OVal(VNum(s)) => numLit(s)
            case s: OSub => operandCol(base, s) // scalar subquery: already a literal
            case OArith(l, op, r) =>
              val (lc, rc) = (aggExprCol(l), aggExprCol(r))
              op match {
                case "+" => lc + rc
                case "-" => lc - rc
                case "*" => lc * rc
                case "/" => lc / rc
                case "%" => lc % rc
              }
            case OFunc(f, fargs) => funcApply(f, fargs.map(aggExprCol), fargs)
            case OCast(x, t, tm) =>
              val c = aggExprCol(x)
              if (tm) call_function("graft_try_cast", c, lit(sqlTypeName(t)))
              else c.cast(sqlTypeName(t))
            case other => throw new IllegalArgumentException(
              s"unsupported term in aggregate expression: $other")
          }
          agged.select(items.map {
            case ColItem(c, alias) =>
              // the aggregated frame carries whichever spelling was the
              // group key — the raw column or the attached alias
              val n = if (groupBy.contains(c)) c else alias.getOrElse(c)
              qref(n).as(alias.getOrElse(c))
            case it: CaseItem => col(it.alias)
            case it: ExprItem => col(it.alias)
            case AggItem(f, arg, alias, _) => col(aggAlias(f, arg, alias))
            case AggExprItem(o, alias) => aggExprCol(o).as(alias)
            case other => throw new IllegalStateException(other.toString)
          }: _*)
        } else {
          df.select(items.flatMap {
            case Star => base.columns.toSeq.map(col)
            case StarPattern(re) =>
              val pat = java.util.regex.Pattern.compile(re)
              val hit = base.columns.toSeq.filter(c => pat.matcher(c).find())
              require(hit.nonEmpty, s"COLUMNS('$re') matches no column of " +
                s"(${base.columns.mkString(", ")})")
              hit.map(qref)
            case StarExclude(ex, repl) =>
              val have = base.columns.toSet
              ex.foreach(c => require(have.contains(c),
                s"EXCLUDE names unknown column: $c"))
              repl.foreach { case (c, _) => require(have.contains(c),
                s"REPLACE names unknown column: $c") }
              val rm = repl.toMap
              base.columns.toSeq.filterNot(ex.toSet).map { c =>
                rm.get(c).fold(col(c))(o => operandCol(base, o).as(c)) }
            case ColItem(c, alias) => Seq(col(alias.getOrElse(c)))
            case DistItem(_, _, alias) => Seq(col(alias))
            case CaseItem(_, _, alias) => Seq(col(alias))
            case ExprItem(_, alias) => Seq(col(alias))
            case WinItem(_, _, _, _, alias, _, _) => Seq(col(alias))
            case other => throw new IllegalStateException(other.toString)
          } ++ obExprs.map { case (hn, _) => col(hn) }: _*)
        }
      // 4. HAVING filters the aggregated output — by output names, and
      //    (r9) by aggregate EXPRESSIONS: `HAVING COUNT(*) >= 20` resolves
      //    each aggregate atom to its select-item twin's output column
      //    (ANSI spelling without requiring the alias). Catalyst evaluates
      //    post-aggregation, exactly ANSI HAVING semantics.
      if (having.nonEmpty) {
        require(hasAgg || groupBy.nonEmpty, "HAVING requires GROUP BY/aggregates")
        having.foreach(pred =>
          out = out.filter(predCol(out, resolveHavingAggs(pred, items))))
      }
      // 4b. SELECT DISTINCT dedupes the projected output (ANSI position:
      //     after HAVING, before ORDER BY/LIMIT) — lowered to the same
      //     partial-combined aggregate as any distinct, no driver state
      if (distinctOn.nonEmpty) {
        // DISTINCT ON (cols): first row per ON-group under the ORDER BY
        // tail. Determinism contract: ORDER BY must lead with the ON
        // columns and carry at least one further tiebreak key; the pick
        // runs as a partitioned row_number (no global sort), the final
        // ORDER BY below still applies to the kept rows.
        require(rawOrderBy.size > distinctOn.size &&
          distinctOn.zip(rawOrderBy).forall { case (c, k) =>
            k.name == c && k.expr.isEmpty },
          "DISTINCT ON requires ORDER BY to lead with the ON columns " +
            "followed by at least one tiebreak key")
        val ties = orderBy.drop(distinctOn.size).map { k =>
          require(k.expr.isEmpty, "DISTINCT ON tiebreak keys must be column names")
          if (k.desc) qref(k.name).desc else qref(k.name).asc
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(distinctOn.map(qref): _*).orderBy(ties: _*)
        out = out.withColumn("__don", row_number().over(w))
          .filter(col("__don") === 1).drop("__don")
      } else if (distinct) out = out.dropDuplicates()
      // 5. ORDER BY / LIMIT over output names. Catalyst turns
      //    orderBy+limit into TakeOrderedAndProject (top-k, no global sort)
      if (orderBy.nonEmpty) {
        // expression keys read their hidden __ob_i columns (attached
        // pre-projection on the plain path; computed from output names
        // here on the aggregated path), sort, then drop — the projection
        // folds into TakeOrderedAndProject under a LIMIT, so the hidden
        // column never materializes globally
        val sortCols = orderBy.zipWithIndex.map { case (k, i) =>
          val c = k.expr match {
            case Some(o) =>
              val hn = s"__ob_$i"
              if (!out.columns.contains(hn))
                out = out.withColumn(hn, operandCol(out, o))
              col(hn)
            case None => col(k.name)
          }
          (k.desc, k.nullsFirst) match {
            case (false, None) => c.asc
            case (true, None) => c.desc
            case (false, Some(true)) => c.asc_nulls_first
            case (false, Some(false)) => c.asc_nulls_last
            case (true, Some(true)) => c.desc_nulls_first
            case (true, Some(false)) => c.desc_nulls_last
          }
        }
        out = out.orderBy(sortCols: _*)
        if (obExprs.nonEmpty) out = out.drop(obExprs.map(_._1): _*)
      }
      // ANSI pagination: OFFSET skips before LIMIT counts (Dataset.offset
      // composes with the sort into a single GlobalLimit — no full
      // materialization of the skipped prefix)
      offsetN.foreach(m => out = out.offset(m.toInt))
      limitN.foreach(nRows => out = out.limit(nRows.toInt))
      out
    }
  }

  /** Column ref with backtick quoting for the dotted names that aliased
    * relations carry (`a.col` is ONE column, not a struct access). */
}
