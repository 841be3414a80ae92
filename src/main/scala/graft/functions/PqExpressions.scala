package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Product-quantization kernels as single-pass codegen expressions.
  *
  * The PQ/IVFPQ hot paths — encoding a vector to M codes and ADC-scoring
  * M codes against a probe's lookup table — are per-row arithmetic over a
  * broadcast-sized model (codebooks: M·K·dsub floats; LUT: M·K doubles).
  * Expressing them as DataFrame compositions (explode → broadcast join →
  * min_by/sum re-aggregation) costs two shuffles per pass and M rows of
  * shuffle volume per vector for work that is a register-resident loop.
  * These expressions make both passes map-only: the whole index build and
  * the whole ADC scan stay inside WholeStageCodegen, the scan reads codes
  * only, and top-k is TakeOrderedAndProject — the correct 100 TB shape
  * (scan M bytes/vector, LUT in L1, zero shuffles until the final top-k
  * heap merge).
  *
  * The model rides in as array<float> LITERALS (flattened), extracted at
  * expression-build time — same pattern as the house litInt: the fitted
  * model is a constant of the plan, not data. At IVF cell counts past
  * ~10⁴ the centers literal stops being plan-sized and the assignment
  * step should go back to a broadcast-join argmin; PQ codebooks (M·K·dsub
  * ≈ 4k floats) are always plan-sized.
  */
object PqKernels {

  /** PQ-encode a float vector already materialized as Array[Float]:
    * per subspace m, the code is argmin_c ‖c‖² − 2·x_m·c (the ‖x_m‖² term
    * is constant under the argmin); ties break toward the lower cid, so
    * encoding is deterministic. */
  def encodeF(vec: Array[Float], books: Array[Float], bookNorms: Array[Double],
      k: Int, dsub: Int): Array[Int] = {
    val m = bookNorms.length / k
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (mm * k + c) * dsub
        var dot = 0.0
        var t = 0
        while (t < dsub) { dot += vec(mm * dsub + t) * books(base + t); t += 1 }
        val d = bookNorms(mm * k + c) - 2.0 * dot
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(mm) = best
      mm += 1
    }
    codes
  }

  def encode(vec: ArrayData, books: Array[Float], bookNorms: Array[Double],
      k: Int, dsub: Int): ArrayData =
    new GenericArrayData(encodeF(vec.toFloatArray(), books, bookNorms, k, dsub))

  /** Coarse cell id: argmin_j ‖c_j‖² − 2·x·c_j over the flattened centers
    * (kc × dim); ties toward the lower cell id. */
  def assignF(vec: Array[Float], centers: Array[Float], centerNorms: Array[Double],
      dim: Int): Int = {
    val kc = centerNorms.length
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < kc) {
      val base = j * dim
      var dot = 0.0
      var t = 0
      while (t < dim) { dot += vec(t) * centers(base + t); t += 1 }
      val d = centerNorms(j) - 2.0 * dot
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  /** One-pass IVFPQ row: coarse-assign, subtract the cell center, PQ-encode
    * the residual. Returns (cluster_id, codes). */
  def ivfpqEncode(vec: ArrayData, centers: Array[Float], centerNorms: Array[Double],
      books: Array[Float], bookNorms: Array[Double], k: Int, dsub: Int): InternalRow = {
    val v = vec.toFloatArray()
    val dim = v.length
    val cell = assignF(v, centers, centerNorms, dim)
    val r = new Array[Float](dim)
    val base = cell * dim
    var t = 0
    while (t < dim) { r(t) = v(t) - centers(base + t); t += 1 }
    new GenericInternalRow(Array[Any](cell,
      new GenericArrayData(encodeF(r, books, bookNorms, k, dsub))))
  }

  /** ADC score: Σ_m lut[m·K + codes[m]] — the probe-side approximation of
    * dot(probe, x) from codes alone. */
  def adc(codes: ArrayData, lut: Array[Double], k: Int): Double = {
    var s = 0.0
    var mm = 0
    val m = codes.numElements()
    while (mm < m) { s += lut(mm * k + codes.getInt(mm)); mm += 1 }
    s
  }
}

/** pq_encode(vec, books_flat, k, dsub): the M codebook codes of a vector
  * (array<int>), map-only. `books_flat` is an array<float> literal of
  * M·K·dsub values. */
case class PqEncode(child: Expression, books: Array[Float], k: Int, dsub: Int)
    extends UnaryExpression {
  @transient private lazy val bookNorms: Array[Double] = {
    val n = books.length / dsub
    Array.tabulate(n) { i =>
      var s = 0.0
      var t = 0
      while (t < dsub) { val x = books(i * dsub + t).toDouble; s += x * x; t += 1 }
      s
    }
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<float> input")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  override def nullSafeEval(a: Any): Any =
    PqKernels.encode(a.asInstanceOf[ArrayData], books, bookNorms, k, dsub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("books", books, "float[]")
    val n = ctx.addReferenceObj("bookNorms", bookNorms, "double[]")
    defineCodeGen(ctx, ev, a => s"graft.functions.PqKernels.encode($a, $b, $n, $k, $dsub)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** ivfpq_encode(vec, centers_flat, books_flat, k, dsub): one-pass IVFPQ
  * index row — struct(cluster_id, codes) where codes encode the RESIDUAL
  * against the assigned cell center (Jégou 2011 §IV). */
case class IvfPqEncode(child: Expression, centers: Array[Float], dim: Int,
    books: Array[Float], k: Int, dsub: Int) extends UnaryExpression {
  @transient private lazy val centerNorms: Array[Double] = {
    val kc = centers.length / dim
    Array.tabulate(kc) { j =>
      var s = 0.0
      var t = 0
      while (t < dim) { val x = centers(j * dim + t).toDouble; s += x * x; t += 1 }
      s
    }
  }
  @transient private lazy val bookNorms: Array[Double] = {
    val n = books.length / dsub
    Array.tabulate(n) { i =>
      var s = 0.0
      var t = 0
      while (t < dsub) { val x = books(i * dsub + t).toDouble; s += x * x; t += 1 }
      s
    }
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<float> input")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("cluster_id", IntegerType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ivfpq_encode"
  override def nullSafeEval(a: Any): Any =
    PqKernels.ivfpqEncode(a.asInstanceOf[ArrayData], centers, centerNorms,
      books, bookNorms, k, dsub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("centers", centers, "float[]")
    val cn = ctx.addReferenceObj("centerNorms", centerNorms, "double[]")
    val b = ctx.addReferenceObj("books", books, "float[]")
    val bn = ctx.addReferenceObj("bookNorms", bookNorms, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.PqKernels.ivfpqEncode($a, $c, $cn, $b, $bn, $k, $dsub)")
  }
  override protected def withNewChildInternal(newChild: Expression): IvfPqEncode =
    copy(child = newChild)
}

/** pq_adc(codes, lut_flat, k): ADC score of an M-code row against the
  * probe's M·K lookup table literal. */
case class PqAdc(child: Expression, lut: Array[Double], k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<int> input")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"
  override def nullSafeEval(a: Any): Any =
    PqKernels.adc(a.asInstanceOf[ArrayData], lut, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("lut", lut, "double[]")
    defineCodeGen(ctx, ev, a => s"graft.functions.PqKernels.adc($a, $l, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}
