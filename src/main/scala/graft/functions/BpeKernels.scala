package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for BPE merge application (the tokenizer-training
  * encode pass, Sennrich et al. 2016 "Neural Machine Translation of
  * Rare Words with Subword Units", alg. 1).
  *
  * The portable spelling ([[graft.operators.Bpe.encodeSymsHof]]) is a
  * chain of `aggregate` string folds — one interpreted HOF pass with a
  * regexp per symbol step PER MERGE, so a production-sized merge list
  * (32k merges) over the distinct-word table would be the pipeline
  * bottleneck. This kernel applies the whole merge list in rank order
  * inside one codegen'd call: per merge one greedy left-to-right array
  * pass with reference-equality-free string compares, with an early
  * exit once the word is a single piece. Spec-asserted identical to
  * the HOF chain ([[graft.BpeSpec]] property over adversarial
  * overlapping merges like (a,a)).
  */
object BpeKernels {
  /** Split `word` into code-point symbols, apply `(ls(i), rs(i))`
    * merges in order — each a greedy left-to-right adjacent-pair merge
    * (a merged symbol immediately participates in the next comparison,
    * so "a a a" under (a,a) becomes "aa a", never "a aa") — and return
    * the pieces space-joined. Identical semantics to folding
    * [[graft.operators.Bpe.mergeFold]] once per merge.
    */
  def applyMerges(
      word: UTF8String,
      ls: Array[UTF8String],
      rs: Array[UTF8String]): UTF8String = {
    val w = word.toString
    var syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      syms.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    var m = 0
    while (m < ls.length && syms.size > 1) {
      val l = ls(m).toString
      val r = rs(m).toString
      val lr = l + r
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        val x = syms.get(j)
        if (!out.isEmpty && x == r && out.get(out.size - 1) == l)
          out.set(out.size - 1, lr)
        else out.add(x)
        j += 1
      }
      syms = out
      m += 1
    }
    UTF8String.fromString(String.join(" ", syms))
  }
}

/** `bpe_apply(word)` with a fixed merge list: `string → string` of
  * space-joined BPE pieces. The merges are model config (a trained
  * tokenizer is tiny), carried as expression parameters and handed to
  * generated code as reference objects — one kernel call per row, no
  * join against the merge table.
  */
case class BpeApply(child: Expression, mergesL: Seq[String], mergesR: Seq[String])
    extends UnaryExpression {
  require(mergesL.length == mergesR.length, "merge sides must align")
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_apply"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  @transient private lazy val lArr: Array[UTF8String] =
    mergesL.map(UTF8String.fromString).toArray
  @transient private lazy val rArr: Array[UTF8String] =
    mergesR.map(UTF8String.fromString).toArray
  override def nullSafeEval(s: Any): Any =
    BpeKernels.applyMerges(s.asInstanceOf[UTF8String], lArr, rArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = BpeKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val arrCls = "org.apache.spark.unsafe.types.UTF8String[]"
    val lRef = ctx.addReferenceObj("bpeMergesL", lArr, arrCls)
    val rRef = ctx.addReferenceObj("bpeMergesR", rArr, arrCls)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = $ref.applyMerges($in, $lRef, $rRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeApply {
  def apply(word: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeApply(
      Bridge.expression(word), merges.map(_._1), merges.map(_._2)))
}
