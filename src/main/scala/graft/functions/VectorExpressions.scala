package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * The interpreted equivalents (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * walk an expression tree and allocate an intermediate array per row per
  * evaluation — profiled as the dominant cost of the cosine self-joins
  * (d07) at sf0.1. These compile to a tight primitive loop inside
  * whole-stage codegen. Arithmetic is the same sequential left-to-right
  * double fold, so results are bitwise identical to the interpreted form
  * and to the DuckDB oracle's ordered list_reduce.
  */
private object VectorExprUtil {
  def elemKind(dt: DataType): Option[String] = dt match {
    case ArrayType(FloatType, _) => Some("float")
    case ArrayType(DoubleType, _) => Some("double")
    case _ => None
  }

  def getAsDouble(arr: ArrayData, i: Int, kind: String): Double =
    if (kind == "float") arr.getFloat(i).toDouble else arr.getDouble(i)
}

/** Sequential-fold dot product of two float/double array columns:
  * sum over i of (a(i) * b(i)), accumulated left to right in doubles.
  * Degenerate inputs yield NULL — a null array, arrays of different
  * lengths, or a null element (the zip_with+aggregate chain this
  * replaces also nulls those out, via null-padding/poisoning).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (VectorExprUtil.elemKind(left.dataType), VectorExprUtil.elemKind(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double> inputs, got ${left.dataType}, ${right.dataType}")
    }

  private lazy val kindL = VectorExprUtil.elemKind(left.dataType).get
  private lazy val kindR = VectorExprUtil.elemKind(right.dataType).get

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n = arrA.numElements()
    if (n != arrB.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
      acc += VectorExprUtil.getAsDouble(arrA, i, kindL) *
        VectorExprUtil.getAsDouble(arrB, i, kindR)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, idx: String, kind: String) =
        if (kind == "float") s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(a, i, kindL)} * ${get(b, i, kindR)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Sequential-fold squared euclidean distance of two float/double array
  * columns: sum over i of (a(i) - b(i))^2, accumulated left to right in
  * doubles — bitwise identical to the oracle's ordered list_reduce over
  * (a[i]-b[i])*(a[i]-b[i]). Null/length semantics match [[DotProduct]].
  */
case class ArrayDistSq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (VectorExprUtil.elemKind(left.dataType), VectorExprUtil.elemKind(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"array_dist_sq needs array<float|double> inputs, got ${left.dataType}, ${right.dataType}")
    }

  private lazy val kindL = VectorExprUtil.elemKind(left.dataType).get
  private lazy val kindR = VectorExprUtil.elemKind(right.dataType).get

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n = arrA.numElements()
    if (n != arrB.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arrA.isNullAt(i) || arrB.isNullAt(i)) return null
      val d = VectorExprUtil.getAsDouble(arrA, i, kindL) -
        VectorExprUtil.getAsDouble(arrB, i, kindR)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      def get(arr: String, idx: String, kind: String) =
        if (kind == "float") s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ${get(a, i, kindL)} - ${get(b, i, kindR)};
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDistSq =
    copy(left = newLeft, right = newRight)
}

/** Intersection cardinality of two SORTED distinct long-array columns —
  * a two-pointer merge, O(|a| + |b|), no per-row hash set. The exact
  * verify step of the prefix-filtered Jaccard join. Inputs MUST be
  * sorted ascending and duplicate-free (both are by construction in
  * [[graft.operators.Dedup.jaccardPairs]]); null array -> NULL.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs array<bigint> inputs, " +
          s"got ${left.dataType}, ${right.dataType}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val (na, nb) = (arrA.numElements(), arrB.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = arrA.getLong(i); val y = arrB.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for expressions without an operator home. */
object Exprs {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.Bridge

  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}

/** Random-hyperplane LSH bucket id over a float/double array column:
  * bit j (0 <= j < nPlanes) is set iff the projection onto the
  * deterministic Knuth-mixed lattice plane
  * w(j,d) = (((j*131071 + d) * 2654435761) mod 2^31) mod 7 - 3
  * is strictly positive. Single pass over the vector, all planes
  * accumulated together; per-plane accumulation order is ascending d,
  * matching the interpreted zip_with/aggregate form and the oracle.
  */
case class HyperplaneBucketExpr(child: Expression, nPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null array or null element -> NULL

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.elemKind(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bucket needs an array<float|double> input, got ${child.dataType}")
    }

  private lazy val kind = VectorExprUtil.elemKind(child.dataType).get

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Double](nPlanes)
    var d = 0
    while (d < n) {
      if (arr.isNullAt(d)) return null
      val x = VectorExprUtil.getAsDouble(arr, d, kind)
      var j = 0
      while (j < nPlanes) {
        // Knuth-mixed lattice: (j*131071 + d) is unique per (plane, dim),
        // the multiply + mod 2^31 decorrelates before the mod-7 fold, so
        // every plane is DISTINCT. The previous affine-mod-7 family
        // ((j*97 + d*31) mod 7) collapsed to j mod 7 — only SEVEN
        // distinct hyperplanes, capping every band at 2^7 signatures
        // and making LSH self-joins quadratic in corpus size (caught by
        // the 10x scale ladder: s09 candidate pairs grew 102x).
        acc(j) += x * (((j * 131071L + d) * 2654435761L % 2147483648L % 7L) - 3L).toDouble
        j += 1
      }
      d += 1
    }
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      if (acc(j) > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val get = if (kind == "float") s"(double) $c.getFloat($d)" else s"$c.getDouble($d)"
      s"""
         |int $n = $c.numElements();
         |double[] $acc = new double[$nPlanes];
         |for (int $d = 0; $d < $n; $d++) {
         |  if ($c.isNullAt($d)) { ${ev.isNull} = true; break; }
         |  double $x = $get;
         |  for (int $j = 0; $j < $nPlanes; $j++) {
         |    $acc[$j] += $x *
         |      (double) ((($j * 131071L + $d) * 2654435761L % 2147483648L % 7L) - 3L);
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $nPlanes; $j++) {
         |    if ($acc[$j] > 0) $bucket |= (1L << $j);
         |  }
         |  ${ev.value} = $bucket;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
}

/** Sign-bit binary quantization of a float/double array column: bit d
  * (0 <= d < min(64, len)) is set iff element d is strictly positive —
  * the 1-bit-per-dimension embedding compression (32x narrower than
  * float32) whose Hamming distance approximates angular distance.
  * Dimensions beyond 64 are ignored (one packed long per vector; the
  * caller slices the array to pack more words). Null array or null
  * element -> NULL, matching the other vector kernels.
  */
case class SignPackExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.elemKind(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sign_pack needs an array<float|double> input, got ${child.dataType}")
    }

  private lazy val kind = VectorExprUtil.elemKind(child.dataType).get

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), 64)
    var sig = 0L
    var d = 0
    while (d < n) {
      if (arr.isNullAt(d)) return null
      if (VectorExprUtil.getAsDouble(arr, d, kind) > 0) sig |= (1L << d)
      d += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val sig = ctx.freshName("sig")
      val get = if (kind == "float") s"(double) $c.getFloat($d)" else s"$c.getDouble($d)"
      s"""
         |int $n = java.lang.Math.min($c.numElements(), 64);
         |long $sig = 0L;
         |for (int $d = 0; $d < $n; $d++) {
         |  if ($c.isNullAt($d)) { ${ev.isNull} = true; break; }
         |  if ($get > 0) $sig |= (1L << $d);
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPackExpr =
    copy(child = newChild)
}

/** Johnson–Lindenstrauss ±1 sign projection of a float/double array
  * column to `targetDims` long components — the codegen kernel under
  * [[graft.operators.Similarity.jlProject]]. Bit-identical to the
  * higher-order-function column formulation it replaced: quantization
  * multiplies by 2^20 (an exact exponent shift in float or double
  * before the floor), the Achlioptas sign matrix is regenerated from
  * indices by the same two-round xorshift-multiply mix, and the
  * integer fold runs the same i = 0..dims-1 order (commutative sums
  * anyway). JlProfile measured the HOF version at 6.6-7.3 s for the
  * sf0.1 corpus scan — higher-order lambdas evaluate interpreted per
  * element (dims × targetDims expression-tree walks per row) — vs one
  * primitive loop inside whole-stage codegen here.
  *
  * NULL contract: a null array, a wrong-length array, or any null
  * element yields NULL (the HOF version null-poisoned every component
  * in those cases; no registered corpus contains them).
  */
case class JlProject(child: Expression, dims: Int, targetDims: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "jl_project"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.elemKind(child.dataType) match {
      case Some(_) if dims >= 1 && targetDims >= 1 => TypeCheckResult.TypeCheckSuccess
      case Some(_) => TypeCheckResult.TypeCheckFailure(
        s"jl_project needs dims >= 1 and targetDims >= 1, got $dims, $targetDims")
      case None => TypeCheckResult.TypeCheckFailure(
        s"jl_project needs an array<float|double> input, got ${child.dataType}")
    }

  private lazy val kind = VectorExprUtil.elemKind(child.dataType).get

  // Achlioptas sign matrix regenerated from indices (Knuth multiply +
  // one xorshift-multiply avalanche round — the derivation note lives
  // on Similarity.jlProject); row-major s(i·targetDims + j)
  private lazy val signs: Array[Byte] = {
    val s = new Array[Byte](dims * targetDims)
    var i = 0
    while (i < dims) {
      var j = 0
      while (j < targetDims) {
        val m1 = ((i.toLong * targetDims + j + 1) * 2654435761L) % 2147483648L
        val m2 = ((m1 ^ (m1 >> 13)) * 1274126177L) % 2147483648L
        s(i * targetDims + j) = if ((m2 >> 7) % 2 == 0) 1 else -1
        j += 1
      }
      i += 1
    }
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dims) return null
    val qx = new Array[Long](dims)
    var i = 0
    while (i < dims) {
      if (arr.isNullAt(i)) return null
      qx(i) = math.floor(
        VectorExprUtil.getAsDouble(arr, i, kind) * 1048576.0).toLong
      i += 1
    }
    val out = new Array[Long](targetDims)
    var j = 0
    while (j < targetDims) {
      var acc = 0L
      var ii = 0
      while (ii < dims) { acc += qx(ii) * signs(ii * targetDims + j); ii += 1 }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sref = ctx.addReferenceObj("jlSigns", signs, "byte[]")
      val qx = ctx.freshName("qx")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ii = ctx.freshName("ii")
      val acc = ctx.freshName("acc")
      val get = if (kind == "float") s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |if ($a.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $qx = new long[$dims];
         |  for (int $i = 0; $i < $dims; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $qx[$i] = (long) java.lang.Math.floor($get * 1048576.0D);
         |  }
         |  if (!${ev.isNull}) {
         |    long[] $out = new long[$targetDims];
         |    for (int $j = 0; $j < $targetDims; $j++) {
         |      long $acc = 0L;
         |      for (int $ii = 0; $ii < $dims; $ii++) {
         |        $acc += $qx[$ii] * $sref[$ii * $targetDims + $j];
         |      }
         |      $out[$j] = $acc;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

/** Exact-integer ADC (asymmetric distance computation) for trained
  * residual PQ — the scoring kernel of the PQ-compressed k-NN-graph
  * build ([[graft.operators.Similarity.pqKnnGraphTrainedFp]]):
  *
  *   adc(qres, codes) = Σ_j Σ_i (qres[j·sub+i] − cb[j][codes[j]][i])²
  *
  * `left` is the query's ×2^12-quantized residual (array<long>,
  * length m·sub), `right` the neighbor's per-subspace codeword ids
  * (array<long>, length m); the trained codebook rides along as a
  * flat row-major long[] reference object (m·ncw·sub — KB-sized).
  * All-integer, so the result is exact under any evaluation order and
  * bit-replayable by the oracle's per-subspace LUT join. The
  * interpreted equivalent (per-j slice + zip_with fold) walks
  * m·sub expression nodes per PAIR of the block join — the s33
  * lesson, moved here before the hot path shipped. Degenerate inputs
  * (wrong lengths, null elements, out-of-range code) yield NULL.
  */
case class AdcFp(left: Expression, right: Expression,
    codebook: Array[Long], m: Int, ncw: Int, sub: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_fp"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _))
        if m >= 1 && ncw >= 1 && sub >= 1 &&
          codebook.length == m * ncw * sub =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"adc_fp needs two array<long> inputs and a m*ncw*sub codebook, " +
          s"got ${left.dataType}, ${right.dataType}, " +
          s"|cb|=${codebook.length} for m=$m ncw=$ncw sub=$sub")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val qres = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    if (qres.numElements() != m * sub || codes.numElements() != m) return null
    var acc = 0L
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val cw = codes.getLong(j)
      if (cw < 0L || cw >= ncw) return null
      val base = (j * ncw + cw.toInt) * sub
      var i = 0
      while (i < sub) {
        if (qres.isNullAt(j * sub + i)) return null
        val d = qres.getLong(j * sub + i) - codebook(base + i)
        acc += d * d
        i += 1
      }
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val cbRef = ctx.addReferenceObj("adcCb", codebook, "long[]")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val cw = ctx.freshName("cw")
      val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      s"""
         |if ($q.numElements() != ${m * sub} || $c.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    if ($c.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    long $cw = $c.getLong($j);
         |    if ($cw < 0L || $cw >= $ncw) { ${ev.isNull} = true; break; }
         |    int $base = ($j * $ncw + (int) $cw) * $sub;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      if ($q.isNullAt($j * $sub + $i)) { ${ev.isNull} = true; break; }
         |      long $d = $q.getLong($j * $sub + $i) - $cbRef[$base + $i];
         |      $acc += $d * $d;
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcFp =
    copy(left = newLeft, right = newRight)
}

/** Per-subspace PQ encoder for trained residual PQ — the encode half
  * of [[AdcFp]]'s contract: for each subspace j the codeword id
  * minimizing the exact integer L2 to the residual slice,
  *
  *   codes[j] = argmin_cw Σ_i (qres[j·sub+i] − cb[j][cw][i])²
  *
  * strict `<` keeps the LOWEST codeword on ties — the same rule the
  * oracle's `(d2 ASC, cw ASC)` row_number spells and the trainer's
  * assignment loop uses. Input is the ×2^12-quantized residual
  * (array<long>, m·sub); the codebook is the same flat long[]
  * reference [[AdcFp]] carries. One primitive m·ncw·sub loop per row
  * in whole-stage codegen, replacing the n·m·ncw-row explode + join +
  * argmin-aggregate encode (the s33 lesson applied to the encode
  * path: the relational spelling shuffles a data-sized intermediate
  * the kernel never materializes).
  */
case class PqEncodeFp(child: Expression,
    codebook: Array[Long], m: Int, ncw: Int, sub: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_fp"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _)
        if m >= 1 && ncw >= 1 && sub >= 1 &&
          codebook.length == m * ncw * sub =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_encode_fp needs an array<long> input and a m*ncw*sub " +
          s"codebook, got ${child.dataType}, |cb|=${codebook.length} " +
          s"for m=$m ncw=$ncw sub=$sub")
    }

  override def nullSafeEval(input: Any): Any = {
    val qres = input.asInstanceOf[ArrayData]
    if (qres.numElements() != m * sub) return null
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var best = 0L
      var bestD2 = Long.MaxValue
      var cw = 0
      while (cw < ncw) {
        var d2 = 0L
        var i = 0
        while (i < sub) {
          if (qres.isNullAt(j * sub + i)) return null
          val d = qres.getLong(j * sub + i) - codebook((j * ncw + cw) * sub + i)
          d2 += d * d
          i += 1
        }
        if (d2 < bestD2) { bestD2 = d2; best = cw }
        cw += 1
      }
      out(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val cbRef = ctx.addReferenceObj("pqCb", codebook, "long[]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val cw = ctx.freshName("cw")
      val d2 = ctx.freshName("d2")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD2 = ctx.freshName("bestD2")
      s"""
         |if ($q.numElements() != ${m * sub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$m];
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    long $best = 0L;
         |    long $bestD2 = Long.MAX_VALUE;
         |    for (int $cw = 0; $cw < $ncw && !${ev.isNull}; $cw++) {
         |      long $d2 = 0L;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        if ($q.isNullAt($j * $sub + $i)) { ${ev.isNull} = true; break; }
         |        long $d = $q.getLong($j * $sub + $i)
         |          - $cbRef[($j * $ncw + $cw) * $sub + $i];
         |        $d2 += $d * $d;
         |      }
         |      if (!${ev.isNull} && $d2 < $bestD2) { $bestD2 = $d2; $best = $cw; }
         |    }
         |    $out[$j] = $best;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeFp =
    copy(child = newChild)
}

/** Exact integer squared L2 between two equal-length array<long>
  * columns — the rerank scorer of the PQ k-NN graph (the s24 move:
  * within one probed list the centroid cancels in qres_q − qres_n, so
  * this IS ×2^24-scaled exact L2 of q−n). Sequential primitive loop in
  * whole-stage codegen; NULL on length mismatch or null elements.
  */
case class L2Fp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_fp"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"l2_fp needs two array<long> inputs, got " +
          s"${left.dataType}, ${right.dataType}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Fp =
    copy(left = newLeft, right = newRight)
}
