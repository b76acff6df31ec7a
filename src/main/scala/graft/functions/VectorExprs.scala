package graft.functions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector math for embedding similarity.
  *
  * Why native: `zip_with` + `aggregate` lambdas are evaluated by the
  * interpreter per element — on an all-pairs cosine job that is
  * |pairs|·dim interpreted closure calls and dominates the profile
  * (measured ~3× total-bench cost at sf0.1). [[DotProduct]] runs the
  * same sequential double-precision fold as one generated static call,
  * staying inside WholeStageCodegen.
  *
  * Arithmetic parity: identical left-to-right fold of
  * `x_i.toDouble * y_i.toDouble` — bit-identical to the higher-order-
  * function formulation (pinned by VectorExprsSpec), so the DuckDB
  * oracle comparisons are unaffected.
  */
object VectorExprs {

  /** Double-precision dot product of two float/double array columns. */
  def dotNative(a: Column, b: Column): Column =
    GraftExprBridge.column(
      DotProduct(GraftExprBridge.expression(a), GraftExprBridge.expression(b)))

  /** All `nTables` random-hyperplane sign buckets of a vector in one
    * call: returns array<long> of length nTables, element t = the
    * nPlanes sign bits of table t packed into a long. `planes` is the
    * flattened [table][plane][dim] hyperplane matrix (driver-computed,
    * shipped once with the plan). The composed alternative builds
    * nTables·nPlanes separate 64-element literal-array dot expressions
    * — minutes of janino compile at plan time and a huge codegen unit.
    */
  def hyperplaneBuckets(vec: Column, planes: Array[Double],
      nTables: Int, nPlanes: Int, dim: Int): Column =
    GraftExprBridge.column(
      HyperplaneBuckets(GraftExprBridge.expression(vec), planes, nTables, nPlanes, dim))

  /** Top-`nProbe` IVF list ids of a vector against a centroid matrix
    * held ONCE as a plan reference object (`centroids` is the flattened
    * [list][dim] matrix). Ordering: dot product descending, ties to the
    * LARGER list id — bit-identical to the composed
    * `reverse(array_sort(array(struct(dot, list)…)))` formulation
    * (pinned by IvfSpec), but with plan size and codegen cost O(1) in
    * the list count instead of one `typedLit` array literal + struct
    * expression PER centroid (which blows janino compile at the
    * k ≈ 10⁴–10⁵ lists corpus-scale IVF wants).
    */
  def centroidTopLists(vec: Column, centroids: Array[Double],
      dim: Int, nProbe: Int): Column =
    GraftExprBridge.column(
      CentroidTopLists(GraftExprBridge.expression(vec), centroids, dim, nProbe))
}

/** Sequential-fold dot product over two numeric arrays (float or
  * double elements; mixed allowed). Null if either side is null, if
  * any ELEMENT is null, or if lengths differ — exactly matching the
  * `zip_with`+`aggregate` formulation's null propagation.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  // ExpectsInputTypes is unusable outside org.apache.spark.sql
  // (AbstractDataType is private[sql]); enforce at analysis time here.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<float>/array<double> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.compute(
      l.asInstanceOf[ArrayData], isFloat(left),
      r.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.DotProduct.compute(
        $a, ${isFloat(left)}, $b, ${isFloat(right)});
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Static kernel (called from generated code — keep Java-callable).
    * Returns null (boxed) when any traversed element is null, mirroring
    * the higher-order-function formulation's null propagation.
    */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    // Length mismatch → null, exactly like zip_with (which null-pads the
    // shorter side, making the aggregate sum null).
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

/** Packed sign-bit LSH buckets for all tables in one pass — see
  * [[VectorExprs.hyperplaneBuckets]]. Bucket bit p of table t is set
  * iff dot(vec, plane[t][p]) > 0 (same test as the composed
  * expression form).
  */
case class HyperplaneBuckets(
    child: Expression,
    planes: Array[Double],
    nTables: Int,
    nPlanes: Int,
    dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires array<float>/array<double>, got ${t.sql}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(
      input.asInstanceOf[ArrayData], isFloat, planes, nTables, nPlanes, dim)

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
        graft.functions.HyperplaneBuckets.compute(
          $c, $isFloat, $planesRef, $nTables, $nPlanes, $dim);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r;
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

/** Top-`nProbe` centroid list ids by descending dot product — see
  * [[VectorExprs.centroidTopLists]]. `centroids` is the flattened
  * [list][dim] matrix, shipped once via `addReferenceObj` (plan size
  * O(1) in the list count). Tie-break: equal dots resolve to the larger
  * list id, matching struct-max / descending struct-sort semantics of
  * the composed per-centroid form.
  */
case class CentroidTopLists(
    child: Expression,
    centroids: Array[Double],
    dim: Int,
    nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(dim > 0 && centroids.length % dim == 0,
    s"centroid matrix length ${centroids.length} is not a multiple of dim=$dim")
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "centroid_top_lists"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"centroid_top_lists requires array<float>/array<double>, got ${t.sql}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    CentroidTopLists.compute(
      input.asInstanceOf[ArrayData], isFloat, centroids, dim, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centroidsRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
        graft.functions.CentroidTopLists.compute(
          $c, $isFloat, $centroidsRef, $dim, $nProbe);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r;
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidTopLists =
    copy(child = newChild)
}

object CentroidTopLists {

  /** Static kernel (called from generated code — keep Java-callable).
    * Null for malformed vectors (wrong dim / null elements), like
    * [[DotProduct]]. Dots use the same left-to-right fold as
    * [[DotProduct.compute]], so rankings are bit-identical to the
    * composed per-centroid expression form.
    */
  def compute(vec: ArrayData, vFloat: Boolean, centroids: Array[Double],
      dim: Int, nProbe: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (vec.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val k = centroids.length / dim
    val dots = new Array[Double](k)
    var l = 0
    while (l < k) {
      val off = l * dim
      var acc = 0d
      i = 0
      while (i < dim) {
        val x = if (vFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        acc += x * centroids(off + i)
        i += 1
      }
      dots(l) = acc
      l += 1
    }
    val n = math.min(nProbe, k)
    val out = new Array[Int](n)
    val chosen = new Array[Boolean](k)
    var p = 0
    while (p < n) {
      var best = -1
      l = 0
      while (l < k) {
        // Double.compare, not primitive >=: Spark's struct sort orders
        // doubles with NaN greatest and -0.0 < 0.0 — primitive
        // comparison disagrees on exactly those, and parity with the
        // composed form must hold on every input. `>= 0` (not `> 0`)
        // flips ties to the later-scanned (LARGER) list id, matching
        // descending struct comparison.
        if (!chosen(l) &&
          (best < 0 || java.lang.Double.compare(dots(l), dots(best)) >= 0))
          best = l
        l += 1
      }
      chosen(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }
}

object HyperplaneBuckets {

  /** Static kernel (called from generated code — keep Java-callable).
    * Returns null for malformed embeddings (wrong dimension or null
    * elements), mirroring [[DotProduct]]'s null semantics — silently
    * bucketing a truncated vector would be invisible recall loss.
    */
  def compute(vec: ArrayData, vFloat: Boolean, planes: Array[Double],
      nTables: Int, nPlanes: Int, dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (vec.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val off = (t * nPlanes + p) * dim
        var acc = 0d
        i = 0
        while (i < dim) {
          val x = if (vFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          acc += x * planes(off + i)
          i += 1
        }
        if (acc > 0d) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
