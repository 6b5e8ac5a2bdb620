package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Vector primitives over `array<float>` embedding columns.
 *
 * Design: every similarity reduces to **quantized integer arithmetic** —
 * per-element `floor(x*y*1e6)` summed exactly as longs — so results are
 * bit-identical regardless of aggregation order, partitioning, or engine
 * (the DuckDB oracle reproduces the same integers). The only floating
 * step left is a final `dot_q / sqrt(norm_a*norm_b)` on identical longs,
 * which is a single deterministic IEEE op. This is what lets
 * similarity-ranked top-k be exactly reproducible at any cluster size.
 *
 * Implemented as custom Catalyst expressions with `doGenCode` (not UDFs,
 * not higher-order functions): the loop participates in whole-stage
 * codegen, there is no lambda-invocation overhead per element, and no
 * boxing — this is the hot path of brute-force ANN over 10^12 rows.
 */
object VectorOps {

  /** Quantization scale: floor(x*y*QUANT) per element. */
  val QUANT: Double = 1e6

  def dot_q(a: Column, b: Column): Column =
    Bridge.column(QuantizedDot(Bridge.expression(a), Bridge.expression(b)))

  def norm_q(a: Column): Column = dot_q(a, a)

  /** Deterministic cosine-like score from quantized parts (double). */
  def cosineScore(dotQ: Column, normA: Column, normB: Column): Column =
    dotQ.cast(DoubleType) / sqrt(normA.cast(DoubleType) * normB.cast(DoubleType))

  /** LSH bucket id from `nPlanes` deterministic hyperplanes (long bits). */
  def lsh_bucket(a: Column, nPlanes: Int): Column =
    Bridge.column(LshBucket(Bridge.expression(a), nPlanes))

  /** The udaf form of [[VecSumQ]]: `vec_sum_q(vecCol)` → `array<bigint>`. */
  def vecSumQUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(VecSumQ,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())

}

/**
 * Exact quantized vector sum as ONE typed Aggregator: per element
 * `floor(v*1e6)` accumulated into a fixed-width long-array buffer.
 *
 * This is the k-means-train shuffle fix: the previous cell-mean recipe
 * posexploded the corpus into |corpus|·dim `(label, pos, v)` skinny rows,
 * aggregated per (label, pos), then re-assembled vectors with
 * `collect_list`+`array_sort` in a SECOND shuffle. Here nothing is
 * exploded — Spark's ObjectHashAggregate reduces each partition to one
 * array buffer per label map-side, the exchange carries one array-backed
 * row per (partition, label) instead of `dim` struct rows, and the
 * reassembly shuffle disappears. Long addition is associative and
 * commutative, so the sums are bit-identical to the skinny-row recipe at
 * any partitioning (spec-asserted) — the determinism contract is
 * unchanged.
 *
 * Width locks to the first vector seen; ragged inputs fail loudly (a
 * silent zip would mis-train every centroid downstream).
 */
object VecSumQ extends org.apache.spark.sql.expressions.Aggregator[Array[Float], Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Array[Float]): Array[Long] = {
    if (a == null) return b // mirror posexplode(null): contributes nothing
    val buf = if (b.length == 0) new Array[Long](a.length) else b
    require(a.length == buf.length,
      s"vec_sum_q: ragged vector (length ${a.length}, expected ${buf.length})")
    var i = 0
    while (i < buf.length) {
      buf(i) += math.floor(a(i).toDouble * VectorOps.QUANT).toLong
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (x.length == 0) return y
    if (y.length == 0) return x
    require(x.length == y.length,
      s"vec_sum_q: ragged buffers (${x.length} vs ${y.length})")
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Deterministic hyperplane weights in [-1000, 1000]:
  * `(md5("plane:dim") top-48-bits % 2001) - 1000` ([[Md5Hash.weight48]]).
  * md5-derived (not a mix hash) so the DuckDB oracle can rebuild the
  * exact plane matrix and verify LSH bucket assignment end-to-end
  * (q25/q26). Rows are JVM-cached — md5 runs once per (plane, dim),
  * not once per vector element. */
object PlaneWeights {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  /** Weight row for `plane`, at least `minLen` long. */
  def row(plane: Int, minLen: Int): Array[Long] = {
    val cur = cache.get(plane)
    if (cur != null && cur.length >= minLen) cur
    else cache.compute(plane, (_, old) => {
      if (old != null && old.length >= minLen) old
      else {
        val n = math.max(minLen, if (old == null) 64 else old.length * 2)
        Array.tabulate(n)(d => Md5Hash.weight48(s"$plane:$d"))
      }
    })
  }
}

/**
 * sum_i floor(a(i)*b(i)*1e6) over two float arrays → long.
 * Exact, order-independent, codegen'd.
 */
case class QuantizedDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_q"

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    // both children must be float arrays: getFloat on a double-backed
    // ArrayData would silently read wrong bytes, not fail
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_q requires (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(x.getFloat(i).toDouble * y.getFloat(i).toDouble * VectorOps.QUANT).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) java.lang.Math.floor(
         |    ((double) $a.getFloat($i)) * ((double) $b.getFloat($i)) * ${VectorOps.QUANT}d);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedDot =
    copy(left = l, right = r)
}

/**
 * Sign-random-projection LSH bucket: bit j = (Σ_d w(j,d)·floor(e_d·1e6) ≥ 0)
 * with deterministic integer hyperplane weights — pure integer arithmetic,
 * so bucket assignment is identical on every executor and engine.
 */
case class LshBucket(child: Expression, nPlanes: Int) extends UnaryExpression {

  require(nPlanes > 0 && nPlanes <= 63, "nPlanes in [1,63]")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"lsh_bucket requires array<float>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    LshBucket.compute(v, nPlanes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.LshBucket.compute($c, $nPlanes)")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  /** Static so generated code and interpreted eval share one body. */
  def compute(v: org.apache.spark.sql.catalyst.util.ArrayData, nPlanes: Int): Long = {
    val n = v.numElements()
    // quantize once
    val q = new Array[Long](n)
    var d = 0
    while (d < n) {
      q(d) = math.floor(v.getFloat(d).toDouble * VectorOps.QUANT).toLong
      d += 1
    }
    var bits = 0L
    var j = 0
    while (j < nPlanes) {
      val w = PlaneWeights.row(j, n)
      var s = 0L
      d = 0
      while (d < n) {
        s += w(d) * q(d)
        d += 1
      }
      if (s >= 0) bits |= (1L << j)
      j += 1
    }
    bits
  }
}
