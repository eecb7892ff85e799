package graft.plans

import graft.functions.DistSq
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Session extensions: install with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or `withExtensions`). Registers [[EpsJoinRewrite]] and the kernel
  * expressions as SQL functions (`SELECT graft_cosine(a, b) ...`) —
  * the same codegen'd Catalyst expressions the Scala API uses, so SQL
  * and DataFrame callers share one hot path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => EpsJoinRewrite)
    GraftSqlFunctions.all.foreach(ext.injectFunction)
  }
}

/** SQL surface for the kernel expressions. Each builder maps argument
  * expressions straight onto the native Catalyst nodes — no UDF layer.
  */
object GraftSqlFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: java.lang.Number, _) => v.intValue()
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def nArgs(fn: String, args: Seq[Expression], n: Int*): Unit =
    if (!n.contains(args.length))
      throw new IllegalArgumentException(
        s"$fn expects ${n.mkString(" or ")} arguments, got ${args.length}")

  private def fd(name: String, usage: String)(
      builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      builder)

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    fd("graft_dot", "graft_dot(a, b) - sequential-fold dot product of two arrays") { args =>
      nArgs("graft_dot", args, 2)
      graft.functions.DotProduct(args(0), args(1))
    },
    fd("graft_cosine", "graft_cosine(a, b) - cosine similarity of two arrays") { args =>
      nArgs("graft_cosine", args, 2)
      Divide(graft.functions.DotProduct(args(0), args(1)),
        Multiply(Sqrt(graft.functions.DotProduct(args(0), args(0))),
          Sqrt(graft.functions.DotProduct(args(1), args(1)))))
    },
    fd("graft_array_dist_sq",
        "graft_array_dist_sq(a, b) - squared euclidean distance of two arrays") { args =>
      nArgs("graft_array_dist_sq", args, 2)
      graft.functions.ArrayDistSq(args(0), args(1))
    },
    fd("graft_dist_sq", "graft_dist_sq(x1, y1, x2, y2) - 2-D squared euclidean distance") { args =>
      nArgs("graft_dist_sq", args, 4)
      // accept any numeric literal/column (SQL `0.0` parses as decimal)
      val d = args.map(Cast(_, org.apache.spark.sql.types.DoubleType))
      graft.functions.DistSq(d(0), d(1), d(2), d(3))
    },
    fd("graft_rolling_hash", "graft_rolling_hash(s[, p]) - polynomial rolling " +
        "hash over code points, default p=1000000007") { args =>
      nArgs("graft_rolling_hash", args, 1, 2)
      val p = if (args.length == 2)
        litInt(args(1), "graft_rolling_hash", "p").toLong else 1000000007L
      graft.functions.RollingHash(args(0), p)
    },
    fd("graft_simhash32", "graft_simhash32(s) - 32-bit token-level simhash") { args =>
      nArgs("graft_simhash32", args, 1)
      graft.functions.Simhash32(args(0))
    },
    fd("graft_hyperplane_bucket", "graft_hyperplane_bucket(vec[, nPlanes]) - " +
        "random-hyperplane LSH bucket id, default 8 planes") { args =>
      nArgs("graft_hyperplane_bucket", args, 1, 2)
      val n = if (args.length == 2)
        litInt(args(1), "graft_hyperplane_bucket", "nPlanes") else 8
      graft.functions.HyperplaneBucketExpr(args(0), n)
    },
    fd("graft_minhash_sig", "graft_minhash_sig(text[, k[, n]]) - k-permutation " +
        "MinHash signature over word n-gram shingles, defaults k=16 n=3") { args =>
      nArgs("graft_minhash_sig", args, 1, 2, 3)
      val k = if (args.length >= 2) litInt(args(1), "graft_minhash_sig", "k") else 16
      val n = if (args.length >= 3) litInt(args(2), "graft_minhash_sig", "n") else 3
      graft.functions.MinhashSigExpr(args(0), k, n)
    })
}

/** Optimizer rule: plans an eps-distance theta join as a grid-bucketed
  * hash equi-join.
  *
  * A join whose only usable predicate is `DistSq(...) <= eps^2` has no
  * equi keys, so Spark can only pick BroadcastNestedLoopJoin or a
  * cartesian product — O(n*m) and unusable big-big (SURVEY.md §4). The
  * classic spatial rewrite: snap the right side to a grid of cell side
  * eps, replicate the left side to its 3x3 cell neighborhood (every
  * pair within eps must then share a cell key), hash-join on the cell
  * key, and re-apply the ORIGINAL predicate as the exact filter (so
  * strict/non-strict inequality and any residual conjuncts keep their
  * semantics bit-for-bit). Shuffle volume O(9n + m), never a cross
  * product — [[graft.operators.SpatialJoin]]'s trick, promoted from an
  * operator users must call to a plan rewrite they get by writing the
  * natural predicate.
  *
  * Fires only on Inner/Cross joins whose condition has a DistSq bound
  * and NO equality conjunct: if an equi key exists Spark already plans
  * a hash join + filter, and the rewritten join's own cell-equality
  * condition keeps the rule from matching its output (fixed-point
  * safe). Also skipped when the user attached an explicit join hint
  * (respect it) or when an input column collides with the rewrite's
  * `__graft_*` marker names (withColumn would silently replace it).
  */
object EpsJoinRewrite extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def litDouble(e: Expression): Option[Double] = e match {
    case l: Literal => l.value match {
      case d: java.lang.Number => Some(d.doubleValue())
      case _ => None
    }
    case _ => None
  }

  /** (distSq, eps^2) from `DistSq <= lit` / `DistSq < lit` (either
    * operand order).
    */
  private def epsBound(e: Expression): Option[(DistSq, Double)] = e match {
    case LessThanOrEqual(d: DistSq, l) => litDouble(l).map((d, _))
    case LessThan(d: DistSq, l) => litDouble(l).map((d, _))
    case GreaterThanOrEqual(l, d: DistSq) => litDouble(l).map((d, _))
    case GreaterThan(l, d: DistSq) => litDouble(l).map((d, _))
    case _ => None
  }

  private val markerNames = Seq("__graft_dx", "__graft_dy", "__graft_cx",
    "__graft_cy", "__graft_rcx", "__graft_rcy")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        if hint == org.apache.spark.sql.catalyst.plans.logical.JoinHint.NONE &&
          // withColumn would silently replace a same-named user column
          !(left.output ++ right.output).map(_.name).exists(markerNames.contains) &&
          conjuncts(cond).exists(epsBound(_).isDefined) &&
          !conjuncts(cond).exists(_.isInstanceOf[EqualTo]) &&
          conjuncts(cond).flatMap(c => epsBound(c)).headOption.exists {
            case (d, eps2) =>
              eps2 > 0 && {
                val lRefs = d.first.references ++ d.second.references
                val rRefs = d.third.references ++ d.fourth.references
                (lRefs.subsetOf(left.outputSet) && rRefs.subsetOf(right.outputSet)) ||
                  (lRefs.subsetOf(right.outputSet) && rRefs.subsetOf(left.outputSet))
              }
          } =>
      val (d, eps2) = conjuncts(cond).flatMap(c => epsBound(c)).head
      val lRefs = d.first.references ++ d.second.references
      val aligned = lRefs.subsetOf(left.outputSet)
      val (lx, ly, rx, ry) =
        if (aligned) (d.first, d.second, d.third, d.fourth)
        else (d.third, d.fourth, d.first, d.second)
      val eps = math.sqrt(eps2)
      val spark = SparkSession.active

      val lDF = Bridge.ofRows(spark, left)
        .withColumn("__graft_dx", explode(typedlit(Seq(-1L, 0L, 1L))))
        .withColumn("__graft_dy", explode(typedlit(Seq(-1L, 0L, 1L))))
        .withColumn("__graft_cx",
          floor(Bridge.column(lx) / eps).cast("long") + col("__graft_dx"))
        .withColumn("__graft_cy",
          floor(Bridge.column(ly) / eps).cast("long") + col("__graft_dy"))
      val rDF = Bridge.ofRows(spark, right)
        .withColumn("__graft_rcx", floor(Bridge.column(rx) / eps).cast("long"))
        .withColumn("__graft_rcy", floor(Bridge.column(ry) / eps).cast("long"))
      val rewritten = lDF.join(rDF,
          col("__graft_cx") === col("__graft_rcx") &&
            col("__graft_cy") === col("__graft_rcy"))
        .where(Bridge.column(cond)) // exact original predicate, all conjuncts
        .select(j.output.map(a => Bridge.column(a)): _*)
      Bridge.analyzed(rewritten)
  }
}
