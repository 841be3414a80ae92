package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector-distance kernels for `array<float>` embedding columns.
  *
  * These are full Catalyst expressions with `doGenCode`, so brute-force
  * similarity scans stay inside whole-stage codegen — no UDF boxing, no
  * higher-order-function lambda interpretation. On a 100 TB corpus the
  * brute-force k-NN path is a single codegen'd scan + TakeOrdered, with the
  * probe broadcast; this kernel is the per-row cost, so it must be tight.
  *
  * Mirrors the metric-distance role of the reference's `@` operator and
  * EM-tree metric (reference: README.md "Metrics", src/storage/index.rs) —
  * re-expressed as codegen'd columnar kernels instead of a tree index.
  */
object VectorKernels {
  @inline def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  @inline def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  /** Axis-sign LSH buckets: band b = sign bits of dims [b·bits, (b+1)·bits). */
  def signBands(v: ArrayData, bands: Int, bits: Int):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = v.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var i = 0
      while (i < bits) {
        val d = b * bits + i
        acc = (acc << 1) | (if (d < n && v.getFloat(d) > 0f) 1L else 0L)
        i += 1
      }
      out(b) = acc
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Cached ±1 hyperplane matrices for srp_bands, keyed by (nproj, dim).
    * Entries are a pure function of their key (splitmix-style bit mix), so
    * concurrent recomputation is benign. Footprint is 4·nproj·dim bytes —
    * the near-dup config (2304 projections × 64 dims) is ~590 KB per JVM. */
  private val srpCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Float]]()

  private def srpSigns(nproj: Int, dim: Int): Array[Float] =
    srpCache.computeIfAbsent((nproj, dim), { key: (Int, Int) =>
      val (np, dm) = key
      val out = new Array[Float](np * dm)
      var j = 0
      while (j < np) {
        var d = 0
        while (d < dm) {
          var h = j.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xC2B2AE3D27D4EB4FL
          h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
          out(j * dm + d) = if ((h & 1L) == 0L) 1f else -1f
          d += 1
        }
        j += 1
      }
      out
    })

  /** Signed-random-projection LSH buckets: band b's bucket is the `bits`-bit
    * sign pattern of projections [b·bits, (b+1)·bits) onto deterministic
    * hash-derived ±1 hyperplanes. Unlike axis-sign banding, the number of
    * projections is decoupled from the vector dimension, so bands·bits can
    * exceed dim — the knob that lets bucket count grow (2^bits per band)
    * while stacking enough bands to hold recall at moderate cosine. */
  def srpBands(v: ArrayData, bands: Int, bits: Int):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val dim = v.numElements()
    val signs = srpSigns(bands * bits, dim)
    val x = new Array[Double](dim)
    var d = 0
    while (d < dim) { x(d) = v.getFloat(d).toDouble; d += 1 }
    val out = new Array[Long](bands)
    var j = 0
    var b = 0
    while (b < bands) {
      var acc = 0L
      var i = 0
      while (i < bits) {
        val base = j * dim
        var proj = 0.0
        var k = 0
        while (k < dim) { proj += signs(base + k) * x(k); k += 1 }
        acc = (acc << 1) | (if (proj > 0.0) 1L else 0L)
        j += 1; i += 1
      }
      out(b) = acc
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Hamming distance between two equal-length byte strings (the 128-bit
    * metric-key path: UINT128 perceptual hashes travel as binary(16)).
    * Byte-wise popcount loop — 16 iterations for the 128-bit case, fully
    * inside whole-stage codegen. */
  def hammingBytes(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length,
      s"hamming distance requires equal-length binary values (${a.length} vs ${b.length})")
    var acc = 0
    var i = 0
    while (i < a.length) { acc += Integer.bitCount((a(i) ^ b(i)) & 0xff); i += 1 }
    acc
  }

  /** Symmetric int8 quantization scale: max|x| / 127. Zero vector → 0. */
  def q8Scale(a: ArrayData): Double = {
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) { val v = math.abs(a.getFloat(i).toDouble); if (v > m) m = v; i += 1 }
    m / 127.0
  }

  /** int8 quantization of a float vector (4× smaller ANN corpus; recall
    * loss is the documented trade). Rounding is floor(x/scale + 0.5) —
    * deterministic and engine-portable, unlike round-half-even/up variants
    * that differ between platforms. |q| ≤ 127 by construction. */
  def int8Quantize(a: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val scale = q8Scale(a)
    val n = a.numElements()
    val out = new Array[Byte](n)
    if (scale != 0.0) {
      var i = 0
      while (i < n) {
        out(i) = math.floor(a.getFloat(i).toDouble / scale + 0.5).toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Sum of the int8 codes (one-pass quantize + reduce): the cheap
    * cross-engine checksum of the quantization arithmetic. */
  def q8Sum(a: ArrayData): Long = {
    val scale = q8Scale(a)
    if (scale == 0.0) return 0L
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += math.floor(a.getFloat(i).toDouble / scale + 0.5).toLong; i += 1 }
    s
  }

  /** Integer dot product of two int8 code vectors — exact (≤ 127²·dims,
    * far under 2^53/2^63): the quantized-scan inner loop. */
  def q8Dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getByte(i).toLong * b.getByte(i).toLong; i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }
}

/** sign_bands(vec, bands, bits): axis-sign LSH band buckets of a float
  * vector — band b's bucket is the `bits`-bit pattern of sign bits of
  * dims [b·bits, (b+1)·bits). One codegen pass; posexplode the result to
  * get (band, bucket) blocking keys for near-dup candidate generation.
  * Sign-random-projection LSH: collision probability 1 − θ/π per bit, so
  * bucket-blocking bounds candidate pairs while keeping high-cosine pairs
  * together — the no-all-pairs path at 100 TB. */
case class SignBands(child: Expression, bands: Int, bits: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if bands > 0 && bits > 0 && bits <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (array<float>, bands>0, 0<bits<64)")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_bands"

  override def nullSafeEval(a: Any): Any =
    VectorKernels.signBands(a.asInstanceOf[ArrayData], bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.signBands($a, $bands, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}

/** srp_bands(vec, bands, bits): signed-random-projection LSH band buckets
  * of a float vector — band b's bucket is the `bits`-bit sign pattern of
  * pseudo-random ±1 hyperplane projections (hyperplanes derived from a
  * deterministic bit mix of (projection, dim); no RNG state, identical on
  * every executor). The scale path for embedding near-dup blocking: 2^bits
  * buckets per band (vs. axis-sign banding's hard bands·bits ≤ dim limit),
  * and bands stack independently of dim to buy back recall. Collision
  * probability per bit is 1 − θ/π (Goemans–Williamson), so a (bits, bands)
  * choice trades candidate volume against recall at a target cosine. */
case class SrpBands(child: Expression, bands: Int, bits: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if bands > 0 && bits > 0 && bits <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (array<float>, bands>0, 0<bits<64)")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "srp_bands"

  override def nullSafeEval(a: Any): Any =
    VectorKernels.srpBands(a.asInstanceOf[ArrayData], bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.srpBands($a, $bands, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SrpBands =
    copy(child = newChild)
}

/** cosine_sim(a, b): cosine similarity of two float vectors, in double. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires two array<float> inputs")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** dot_product(a, b): dot product of two float vectors, in double. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires two array<float> inputs")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** q8_scale(v): symmetric int8 quantization scale (max|x|/127). */
case class Q8Scale(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<float> input")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "q8_scale"
  override def nullSafeEval(a: Any): Any =
    VectorKernels.q8Scale(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.q8Scale($a)")
  override protected def withNewChildInternal(newChild: Expression): Q8Scale =
    copy(child = newChild)
}

/** int8_quantize(v): the int8 code vector (array<byte>) — the 4×-smaller
  * ANN corpus representation; dequantize as code·q8_scale(v). */
case class Int8Quantize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<float> input")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_quantize"
  override def nullSafeEval(a: Any): Any =
    VectorKernels.int8Quantize(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.int8Quantize($a)")
  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** q8_sum(v): one-pass quantize-and-sum checksum of the int8 codes. */
case class Q8Sum(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<float> input")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "q8_sum"
  override def nullSafeEval(a: Any): Any =
    VectorKernels.q8Sum(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.q8Sum($a)")
  override protected def withNewChildInternal(newChild: Expression): Q8Sum =
    copy(child = newChild)
}

/** q8_dot(a, b): exact integer dot product of two int8 code vectors. */
case class Q8Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.ByteType, _),
            ArrayType(org.apache.spark.sql.types.ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires two array<byte> inputs")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "q8_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.q8Dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.q8Dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Q8Dot =
    copy(left = newLeft, right = newRight)
}

/** hamming128(a, b): Hamming distance between two equal-length binary
  * values — completes the reference's UINT128 metric-key story
  * (reference: src/storage/index.rs `data: Vec<u128>`, components.rs
  * UINT128; SchemaMapper maps UINT128 → binary(16)). `hamming64` covers
  * BIGINT hashes via built-in xor+bit_count; this is its binary(16)
  * sibling, usable on any equal-length binary fingerprint. */
case class Hamming128(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType,
            org.apache.spark.sql.types.BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires two binary inputs")
    }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming128"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.hammingBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.hammingBytes($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming128 =
    copy(left = newLeft, right = newRight)
}

/** l2_norm(a): Euclidean norm of a float vector, in double. */
case class L2Norm(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires an array<float> input")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_norm"

  override def nullSafeEval(a: Any): Any =
    VectorKernels.norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.norm($a)")

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}
