package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BitwiseCount,
  BitwiseXor, Cast, Expression, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: a Hamming-threshold filter over a metric-indexed
  * layout prunes PARTITION DIRECTORIES transparently.
  *
  * `MetricIndex.writeIndexed` lays the corpus out partitioned by the
  * top-`bits` hash prefix under a bits-suffixed column name
  * (`h_prefix6`). A user who just does
  * `spark.read.parquet(layout).filter(hamming64(h, probe) <= k)` — no
  * MetricIndex API in sight — still deserves the layout's scan cut: the
  * prefix Hamming distance LOWER-BOUNDS the full distance, so restricting
  * the scan to the prefixes within distance k of the probe's prefix loses
  * nothing. This rule finds the threshold conjunct
  * (`bit_count(h ^ lit) <= k`, the shape `hamming64` lowers to), reads
  * `bits` from the prefix column's name (the layout's self-describing
  * metadata — partition columns carry no field metadata), and ANDs in the
  * enumerated `h_prefix IN (…)` conjunct; FileSourceStrategy then turns
  * that into PartitionFilters, i.e. directories never opened.
  *
  * The reference makes this trade inside its emtree
  * (src/storage/index.rs); here it is an optimizer rewrite over plain
  * parquet — the engine-native way to give EVERY front end (DataFrame,
  * SQL dialect, HTTP) index-backed search without an index API call.
  * Fires only when pruning pays (k < bits), never twice (the prefix
  * attribute in the filter marks it done), and only for literal probes
  * and thresholds. */
object MetricPrefixPruning extends Rule[LogicalPlan] {

  private val PrefixName = "^h_prefix__(.+)__(\\d+)$".r

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  /** `bit_count(hash ^ probeLiteral)` with the hash an attribute (either
    * xor order, casts stripped) → (hashAttr, probe). */
  private object HammingOf {
    def unapply(e: Expression): Option[(Attribute, Long)] = e match {
      case BitwiseCount(BitwiseXor(l, r)) =>
        (stripCast(l), stripCast(r)) match {
          case (a: Attribute, Literal(v: Long, LongType)) => Some((a, v))
          case (Literal(v: Long, LongType), a: Attribute) => Some((a, v))
          case _ => None
        }
      case _ => None
    }
  }

  private object IntThreshold {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val prefixAttr = child.output.collectFirst {
        case a if PrefixName.findFirstMatchIn(a.name).isDefined => a
      }
      prefixAttr match {
        // idempotence: once the filter references the prefix column —
        // from this rule or from an explicit MetricIndex query — leave it
        case Some(pa) if !cond.references.contains(pa) =>
          val m = PrefixName.findFirstMatchIn(pa.name).get
          val hashName = m.group(1)
          val bits = m.group(2).toInt
          val conjuncts = splitAnd(cond)
          // the threshold must be on THE column this prefix indexes —
          // the layout name carries the binding, AND the matched attribute
          // must be traceable UNMODIFIED to the same leaf relation that
          // produced the prefix column: name equality alone would let
          // `read.parquet(layout).withColumn("h", expr).filter(...)`
          // prune against the untouched partition column and silently
          // drop matching rows. A redefinition is an Alias — a fresh
          // exprId absent from the leaf's output — so the exprId check is
          // exactly "passed through bare".
          def sameLeaf(h: Attribute): Boolean = child.collectLeaves().exists(
            leaf => leaf.outputSet.contains(h) && leaf.outputSet.contains(pa))
          val hit = conjuncts.collectFirst {
            case LessThanOrEqual(HammingOf(h, probe), IntThreshold(k))
                if h.name == hashName && sameLeaf(h) =>
              (probe, k)
            case LessThan(HammingOf(h, probe), IntThreshold(k))
                if h.name == hashName && sameLeaf(h) =>
              (probe, k - 1)
          }
          hit match {
            case Some((probe, k)) if k >= 0 && k < bits =>
              val prefixes = graft.sources.MetricIndex
                .prefixesWithin(probe >>> (64 - bits), bits, k)
              val lits = pa.dataType match {
                case IntegerType => prefixes.map(v => Literal(v.toInt))
                case _ => prefixes.map(v => Literal(v))
              }
              Filter(And(cond, In(pa, lits)), child)
            case _ => f
          }
        case _ => f
      }
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }
}
