package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The portable 60-bit hash (SURVEY.md §6) as a native expression:
  * numerically IDENTICAL to
  * `CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)` — the
  * first 15 hex digits of the md5 are exactly the top 60 bits of the
  * digest's first 8 bytes — but computed straight from the digest
  * buffer, skipping the 32-char hex string materialization and the
  * radix re-parse. This is the inner loop of every text signature
  * (shingle hashes, token hashes, band keys); the DuckDB oracle keeps
  * the md5-hex formulation and matches bit-for-bit.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hash60 requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Hash60.hash($s)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)

  override def prettyName: String = "graft_hash60"
}

object Hash60 {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(s), == parse of the first 15 hex chars. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
