package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native centroid-assignment kernels for the IVF/PQ family.
  *
  * The Column-algebra forms built one literal subtree per centroid —
  * `assignBucket` at k centroids inlined k cosine trees of ~dim literal
  * nodes each, `pqTrain`'s per-round assignment a CaseWhen chain of
  * m×k×subdim literals. Correct, but the TREE is the cost: Catalyst's
  * per-task subexpression analysis on those nested conditional trees
  * measured 20+ minutes of driver+task CPU at (k=16, dim=64) where the
  * data path itself is milliseconds. These kernels carry the centroid
  * matrix as ONE boxed reference on the plan (`ctx.addReferenceObj`) and
  * run the same index-ordered arithmetic in a primitive loop —
  * bit-identical scores, argmin/argmax replicated under Spark's exact
  * total-order and SQL-equality semantics (NaN largest and self-equal,
  * -0.0 < 0.0 for ordering but == for equality) so every oracle gate
  * holds unchanged.
  */
object VectorKernels {

  def dot(a: ArrayData, b: Array[Double]): Double = {
    val n = math.min(a.numElements(), b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b(i); i += 1 }
    s
  }

  def selfDot(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    s
  }

  /** `Similarity.cosine`'s exact op order: d / (sqrt(a·a) * sqrt(c·c)),
    * 0.0 when the norm product is not > 0.
    */
  def cosine(v: ArrayData, c: Array[Double]): Double = {
    val d = dot(v, c)
    var cs = 0.0
    var i = 0
    while (i < c.length) { cs += c(i) * c(i); i += 1 }
    val n = math.sqrt(selfDot(v)) * math.sqrt(cs)
    if (n > 0) d / n else 0.0
  }

  /** Index-ordered fold of (x-y)² starting at 0.0 — `Similarity.l2Sq`'s
    * exact op order over the common prefix (zip_with zips to min length).
    */
  def l2Sq(a: ArrayData, offset: Int, b: Array[Double]): Double = {
    val n = math.min(a.numElements() - offset, b.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(offset + i) - b(i)
      s += d * d
      i += 1
    }
    s
  }

  /** First index holding the array's max under
    * `array_position(xs, array_max(xs))` semantics: max by Spark's
    * total order (java.lang.Double.compare: NaN largest, -0.0 < 0.0),
    * then the FIRST element SQL-equal to it (primitive ==, which makes
    * -0.0 == 0.0; NaN equals NaN under the ordering).
    */
  def argmaxFirstEq(xs: Array[Double]): Int = {
    var m = xs(0)
    var i = 1
    while (i < xs.length) {
      if (java.lang.Double.compare(xs(i), m) > 0) m = xs(i)
      i += 1
    }
    i = 0
    while (i < xs.length) {
      if (xs(i) == m || (java.lang.Double.isNaN(xs(i)) && java.lang.Double.isNaN(m)))
        return i
      i += 1
    }
    0
  }

  /** Argmin counterpart of [[argmaxFirstEq]]. */
  def argminFirstEq(xs: Array[Double]): Int = {
    var m = xs(0)
    var i = 1
    while (i < xs.length) {
      if (java.lang.Double.compare(xs(i), m) < 0) m = xs(i)
      i += 1
    }
    i = 0
    while (i < xs.length) {
      if (xs(i) == m || (java.lang.Double.isNaN(xs(i)) && java.lang.Double.isNaN(m)))
        return i
      i += 1
    }
    0
  }

  def cosineArgMax(v: ArrayData, centroids: Array[Array[Double]]): Int = {
    val sims = new Array[Double](centroids.length)
    var i = 0
    while (i < centroids.length) { sims(i) = cosine(v, centroids(i)); i += 1 }
    argmaxFirstEq(sims)
  }

  /** Top-n centroid indices by `reverse(array_sort(struct(sim, idx)))`
    * semantics: ascending (sim, idx) under Spark's total order, reversed
    * — i.e. sim DESC with ties by idx DESC.
    */
  def cosineTopIdx(v: ArrayData, centroids: Array[Array[Double]],
                   n: Int): ArrayData = {
    val sims = new Array[Double](centroids.length)
    var i = 0
    while (i < centroids.length) { sims(i) = cosine(v, centroids(i)); i += 1 }
    val idx = Array.range(0, centroids.length)
      .sortWith { (a, b) =>
        val c = java.lang.Double.compare(sims(a), sims(b))
        if (c != 0) c > 0 else a > b
      }
    new GenericArrayData(idx.take(math.min(math.max(n, 0), idx.length)))
  }

  def pqEncode(v: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val subdim = books(0)(0).length
    // malformed vector → null, not a fabricated code: the old Column
    // form's null-padding made every distance null on a short or
    // null-element vector (a partial-prefix argmin would silently file
    // it under code 0 as if valid); a LONGER vector scores its prefix,
    // exactly like the old per-subspace slice
    if (v.numElements() < m * subdim) return null
    var i = 0
    val n = m * subdim
    while (i < n) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      val dists = new Array[Double](book.length)
      var c = 0
      while (c < book.length) {
        dists(c) = l2Sq(v, j * subdim, book(c))
        c += 1
      }
      codes(j) = argminFirstEq(dists)
      j += 1
    }
    new GenericArrayData(codes)
  }

  def pqSubAssign(j: Int, sub: ArrayData,
                  books: Array[Array[Array[Double]]]): Int = {
    val book = books(j)
    val dists = new Array[Double](book.length)
    var c = 0
    while (c < book.length) { dists(c) = l2Sq(sub, 0, book(c)); c += 1 }
    argminFirstEq(dists)
  }

  /** Centered matrix-vector projection: out[r] = Σᵢ (v[i] − center[i])
    * · mat[r][i] — PCA projection/whitening as one primitive loop (the
    * matrix and center ride the plan as references, never literal
    * trees). Malformed in (null elements / shorter than the center) →
    * null out, the [[pqEncode]] contract.
    */
  def projectCentered(v: ArrayData, mat: Array[Array[Double]],
                      center: Array[Double]): ArrayData = {
    if (v.numElements() < center.length) return null
    var i = 0
    while (i < center.length) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Double](mat.length)
    var r = 0
    while (r < mat.length) {
      val row = mat(r)
      var s = 0.0
      i = 0
      while (i < row.length) { s += (v.getDouble(i) - center(i)) * row(i); i += 1 }
      out(r) = s
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** Nearest-centroid index by cosine — `Similarity.assignBucket`'s
  * semantics as one native loop.
  */
case class CosineArgMaxExpr(child: Expression,
                            centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    VectorKernels.cosineArgMax(v.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VectorKernels.cosineArgMax($v, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): CosineArgMaxExpr =
    copy(child = newChild)
}

/** Top-nprobe centroid indices by cosine (desc, ties idx desc) — the
  * query-side probe selection of `Similarity.ivfTopK`.
  */
case class CosineTopIdxExpr(child: Expression,
                            centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorKernels.cosineTopIdx(v.asInstanceOf[ArrayData], centroids, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VectorKernels.cosineTopIdx($v, $ref, $n)")
  }
  override protected def withNewChildInternal(newChild: Expression): CosineTopIdxExpr =
    copy(child = newChild)
}

/** All m PQ codes in one pass — `Similarity.pqEncode`'s semantics
  * (per-subspace argmin of the index-ordered squared L2). Null for a
  * vector whose length is not m×subdim (the Column form surfaced those
  * as null-element code arrays; the contract either way is "malformed
  * in, null out", never a fabricated code).
  */
case class PqEncodeExpr(child: Expression,
                        books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    VectorKernels.pqEncode(v.asInstanceOf[ArrayData], books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.VectorKernels.pqEncode($v, $ref);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Per-subspace assignment for pqTrain's exploded (j, sub) rows — the
  * former m-branch CaseWhen chain as one native dispatch.
  */
case class PqSubAssignExpr(left: Expression, right: Expression,
                           books: Array[Array[Array[Double]]])
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(j: Any, sub: Any): Any =
    VectorKernels.pqSubAssign(j.asInstanceOf[Int],
      sub.asInstanceOf[ArrayData], books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, (j, sub) =>
      s"${ev.value} = graft.functions.VectorKernels.pqSubAssign($j, $sub, $ref);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqSubAssignExpr =
    copy(left = newLeft, right = newRight)
}

/** Centered matrix-vector projection — PCA project/whiten as one native
  * loop ([[VectorKernels.projectCentered]]); components and mean ride
  * the plan as two references.
  */
case class ProjectCenteredExpr(child: Expression,
                               mat: Array[Array[Double]],
                               center: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    VectorKernels.projectCentered(v.asInstanceOf[ArrayData], mat, center)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
    val ctrRef = ctx.addReferenceObj("center", center, "double[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.VectorKernels.projectCentered($v, $matRef, $ctrRef);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): ProjectCenteredExpr =
    copy(child = newChild)
}
