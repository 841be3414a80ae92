package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (Gear/rsync-style CDC) at token granularity:
  * a token whose content hash satisfies `h % divisor == 0` CLOSES the
  * current chunk. Because the boundary decision depends only on the token
  * itself, inserting or deleting text re-synchronizes at the next boundary
  * token — all later chunks keep their identity (hash), which is the
  * property fixed-size chunking lacks and the reason CDC underlies
  * dedup across near-identical documents (rsync, LBFS, dataset pipelines).
  *
  * The boundary hash is FNV-1a 64 over the token's UTF-8 bytes —
  * self-contained, allocation-free, stable across engines and releases
  * (the chunk-identity hash downstream is ordinary xxhash64 over the
  * chunk text; only the BOUNDARY rule needs to live in the kernel).
  * Expected chunk length is `divisor` tokens. One pass, zero regex. */
object CdcKernels {

  private def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Whether `token` closes a chunk under `divisor`. Exposed for specs. */
  def isBoundary(token: String, divisor: Int): Boolean = {
    val h = fnv1a64(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // floorMod: the sign of h must not change the boundary density
    java.lang.Math.floorMod(h, divisor.toLong) == 0L
  }

  /** Chunk texts, in document order, tiling the input exactly (concat with
    * single spaces reproduces the input). Empty text → one empty chunk. */
  def cdcChunks(text: UTF8String, divisor: Int): Array[UTF8String] = {
    val toks = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[UTF8String]()
    val sb = new java.lang.StringBuilder()
    var inChunk = false
    var i = 0
    while (i < toks.length) {
      if (inChunk) sb.append(' ')
      sb.append(toks(i))
      inChunk = true
      if (isBoundary(toks(i), divisor)) {
        out.add(UTF8String.fromString(sb.toString))
        sb.setLength(0)
        inChunk = false
      }
      i += 1
    }
    if (inChunk || out.isEmpty) out.add(UTF8String.fromString(sb.toString))
    out.toArray(new Array[UTF8String](out.size))
  }
}

/** cdc_chunks(text, divisor): content-defined chunk texts of the
  * whitespace tokenization (see [[CdcKernels]]); divisor is a literal,
  * resolved at registration like the other parameterized kernels. */
case class CdcChunks(child: Expression, divisor: Int)
    extends UnaryExpression {
  require(divisor > 0, s"cdc_chunks divisor must be positive, got $divisor")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(t: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      CdcKernels.cdcChunks(t.asInstanceOf[UTF8String], divisor)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.functions.CdcKernels.cdcChunks($t, $divisor))")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}
