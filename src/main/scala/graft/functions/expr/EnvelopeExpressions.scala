package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codec kernels for the reference's message-envelope JSON extensions.
  *
  * Motorway serializes payloads with `DateTimeAwareJsonEncoder`
  * (reference `motorway/utils.py:37-45`): `datetime.timedelta` →
  * ISO-8601 duration string, `datetime.datetime` → ISO-8601 timestamp,
  * `decimal.Decimal` → float (lossy). Spark parses ISO timestamps
  * natively and we map decimals to `DecimalType` (fixing the lossy
  * coercion — SURVEY.md §1.2), but it has NO codec for ISO-8601
  * duration strings — these expressions supply it, so envelope payloads
  * containing durations round-trip through typed columns
  * (`graft_iso_duration_us` → `LongType` micros, ready for
  * `make_dt_interval`/arithmetic; `graft_iso_duration` for the reverse
  * edge when writing back to a JSON sink).
  */
object EnvelopeKernels {
  /** "P1DT2H3M4.5S" → microseconds. Malformed input raises (the same
    * contract as the reference, where `json.dumps` round-trips or
    * throws). */
  def isoDurationMicros(s: UTF8String): Long = {
    val d = java.time.Duration.parse(s.toString.trim)
    d.getSeconds * 1000000L + d.getNano / 1000L
  }

  /** Microseconds → ISO-8601 duration string ("PT26H3M4.5S" — hours
    * dominate, matching `java.time.Duration.toString`; semantically
    * equal to the day-carrying form the reference's isodate emits). */
  def isoDurationFormat(us: Long): UTF8String = {
    val d = java.time.Duration.ofSeconds(us / 1000000L, (us % 1000000L) * 1000L)
    UTF8String.fromString(d.toString)
  }
}

case class IsoDurationMicrosExpr(child: Expression) extends UnaryKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_iso_duration_us"
  override protected def nullSafeEval(a: Any): Any =
    EnvelopeKernels.isoDurationMicros(a.asInstanceOf[UTF8String])
  protected def genCall(c: String): String =
    s"graft.functions.expr.EnvelopeKernels.isoDurationMicros($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class IsoDurationFormatExpr(child: Expression) extends UnaryKernelExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_iso_duration"
  override protected def nullSafeEval(a: Any): Any =
    EnvelopeKernels.isoDurationFormat(a.asInstanceOf[Long])
  protected def genCall(c: String): String =
    s"graft.functions.expr.EnvelopeKernels.isoDurationFormat($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object EnvelopeExpressions {
  def isoDurationMicros(s: Column): Column =
    ColumnBridge.column(IsoDurationMicrosExpr(ColumnBridge.expression(s)))
  def isoDurationFormat(us: Column): Column =
    ColumnBridge.column(IsoDurationFormatExpr(ColumnBridge.expression(us)))
}
