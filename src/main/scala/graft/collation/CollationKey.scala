package graft.collation

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Native Catalyst expression: `collation_key(anyCol) -> binary`.
  *
  * Emits the order-preserving CouchDB-collation encoding of any supported
  * input type (see [[CollationCodec]]). Never null: SQL NULL encodes to the
  * `null` collation value, which sorts first — exactly the reference's view
  * row order for documents that emit a null key.
  *
  * Participates in whole-stage codegen (a single static call, no SerDe),
  * unlike a Scala UDF which would break the codegen pipeline and pay
  * serialization per row.
  */
case class CollationKey(child: Expression, locale: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String =
    if (locale) "collation_key_locale" else "collation_key"

  override def eval(input: InternalRow): Any =
    CollationCodec.encodeInternal(child.eval(input), child.dataType, locale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dtRef = ctx.addReferenceObj("ckType", child.dataType, classOf[DataType].getName)
    val c = child.genCode(ctx)
    val in = ctx.freshName("ckIn")
    val resultCode =
      code"""
         |${c.code}
         |Object $in = ${c.isNull} ? null : (Object) ${c.value};
         |byte[] ${ev.value} = graft.collation.CollationCodec.encodeInternal($in, $dtRef, $locale);
       """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CollationKey =
    copy(child = newChild)
}
