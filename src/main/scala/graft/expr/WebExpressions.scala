package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Catalyst expressions over the web-page surface (input_hint table
 * `(url, warc_ts, html:binary, text, lang)`): HTML → text extraction
 * and the deterministic page-synthesis fixture. Both are native
 * expressions with whole-stage codegen (static-call `defineCodeGen`,
 * same shape as [[CellUnary]]) — the extraction sits in the hot path
 * of every page-table scan, so it must not break the codegen span.
 */

/** html_extract_text(html: binary) -> string — whitespace-normal text
  * content (see [[WebEval.extractText]] for the exact contract). */
case class HtmlExtractText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(h: Any): Any =
    WebEval.extractUtf8(h.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WebEval.extractUtf8($c)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** html_wrap(doc_id: long, text: string) -> binary — deterministic
  * synthetic page whose extraction round-trips byte-identically for
  * whitespace-normal text ([[WebEval.wrapHtmlStr]]). */
case class HtmlWrap(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(id: Any, text: Any): Any =
    WebEval.wrapHtml(id.asInstanceOf[Long], text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.expr.WebEval.wrapHtml($l, $r)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(l, r)
}

object WebFunctions {
  def html_extract_text(html: Column): Column =
    Bridge.column(HtmlExtractText(Bridge.expression(html)))
  def html_wrap(docId: Column, text: Column): Column =
    Bridge.column(HtmlWrap(Bridge.expression(docId),
      Bridge.expression(text)))
}
