package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All LSH band buckets of a quantized embedding in ONE native pass:
  * `graft_lsh_buckets(q, bands, bitsPerBand)` returns
  * `array<bigint>` of length `bands`, where element `b` is
  * `sum_k (long_dot(q, plane_{b*bits+k}) >= 0 ? 1<<k : 0)` — exactly
  * the bit/shiftleft formula VectorOps.bucketKeysPlan used to spell
  * out as `bands*bitsPerBand` separate `long_dot(q, <literal array>)`
  * expressions.
  *
  * Why native: at the production geometry (bands=8, bits=16) the
  * spelled-out form evaluates 128 independent dot expressions per
  * row, each re-walking the vector's ArrayData and the literal
  * plane's ArrayData element-by-element through the codegen accessor.
  * This expression unpacks the vector ONCE into a primitive long[],
  * keeps the whole deterministic plane matrix as a flat process-wide
  * long[] (md5-derived, see [[LshBuckets.planeComponent]] — the same
  * recipe the DuckDB oracle CTE renders, VectorOps.planeDuck), and
  * runs the bands*bits*dim multiply-adds as one tight primitive loop.
  * The hashing constant of the bucketed ANN/dedup operators drops
  * ~3× at the production geometry while the gate geometry stays
  * hash-identical (LshBucketsSpec pins equivalence to the
  * spelled-out formula bit-for-bit).
  *
  * Null vector → null row (UnaryExpression default); vectors longer
  * than [[LshBuckets.Dim]] dot the first Dim components (the plane
  * recipe is defined over the embedding dimensionality, matching
  * long_dot's common-prefix rule for the old literal planes).
  */
case class LshBuckets(child: Expression, bands: Int, bitsPerBand: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    LshBuckets.buckets(input.asInstanceOf[ArrayData], bands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.LshBuckets.buckets($s, $bands, $bitsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)

  override def prettyName: String = "graft_lsh_buckets"
}

object LshBuckets {
  /** Embedding dimensionality the hyperplane recipe is defined over
    * (the `embeddings` table contract; VectorOps.Dim).
    */
  val Dim = 64

  /** Hyperplane component (j, i): md5("{j}_{i}") first-15-hex-digits
    * value mapped to [-1000, 1000]. Identical to the DuckDB oracle's
    * rendering (VectorOps.planeDuck) and to the literal arrays the
    * pre-native plan folded in — Hash60.hash IS the 15-hex-digit
    * parse, computed from the digest buffer.
    */
  def planeComponent(j: Int, i: Int): Long =
    Hash60.hash(UTF8String.fromString(s"${j}_$i")) % 2001L - 1000L

  /** Flat plane matrix for nPlanes hyperplanes (row-major,
    * plane j at [j*Dim, (j+1)*Dim)). Deterministic, so cached
    * process-wide per geometry — plane j is the same array whatever
    * the band split, only the total count varies.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private[functions] def planes(nPlanes: Int): Array[Long] =
    planeCache.computeIfAbsent(nPlanes, _ => {
      val flat = new Array[Long](nPlanes * Dim)
      var j = 0
      while (j < nPlanes) {
        var i = 0
        while (i < Dim) {
          flat(j * Dim + i) = planeComponent(j, i); i += 1
        }
        j += 1
      }
      flat
    })

  /** The single-pass evaluation: one vector unpack, one flat-matrix
    * sweep. Called from both interpreted eval and generated code.
    */
  def buckets(arr: ArrayData, bands: Int, bitsPerBand: Int): ArrayData = {
    val p = planes(bands * bitsPerBand)
    val n = math.min(arr.numElements(), Dim)
    val vec = new Array[Long](n)
    var i = 0
    while (i < n) { vec(i) = arr.getLong(i); i += 1 }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var k = 0
      while (k < bitsPerBand) {
        val base = (b * bitsPerBand + k) * Dim
        var acc = 0L
        var x = 0
        while (x < n) { acc += vec(x) * p(base + x); x += 1 }
        if (acc >= 0L) bucket |= (1L << k)
        k += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }
}
