package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFunctions.Stopwords

/** Fused language id (L8 hot path): one pass over the text, tokens
  * ASCII-lowercased and hashed in place, each probed against a single
  * precomputed hash→language-bitmask table covering every profile.
  * Same scoring and tie rule as TextFunctions.langIdFromTokens
  * (highest stopword-hit count; ties to the lexicographically
  * greatest code; zero hits → "und") — asserted equal in the spec.
  * Divergence note: lowercasing is ASCII-only here (the profiles are
  * ASCII + CJK, where Unicode lowercase is the identity).
  */
object LangIdKernel {
  private val langs: Array[String] = Stopwords.all.map(_._1).toArray

  /** token hash → bitmask of languages claiming it as a stopword. */
  private val mask: java.util.HashMap[java.lang.Long, Integer] = {
    val m = new java.util.HashMap[java.lang.Long, Integer]()
    Stopwords.all.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val h = GraftHash.fnv64(w.getBytes("UTF-8"))
        m.merge(h, Integer.valueOf(1 << i), (a, b) => Integer.valueOf(a | b))
      }
    }
    m
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  def langId(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val counts = new Array[Int](langs.length)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        var h = GraftHash.FnvOffset
        while (i < n && !isWs(bytes(i))) {
          var b = bytes(i)
          if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
          h ^= (b & 0xffL)
          h *= GraftHash.FnvPrime
          i += 1
        }
        val m = mask.get(h)
        if (m != null) {
          var l = 0
          val mv = m.intValue()
          while (l < langs.length) {
            if ((mv & (1 << l)) != 0) counts(l) += 1
            l += 1
          }
        }
      }
    }
    var best = -1
    var bestScore = 0
    var l = 0
    while (l < langs.length) {
      // ties to the lexicographically greatest code, matching the
      // combinator's array_max over (score, lang) structs
      if (counts(l) > bestScore ||
          (counts(l) == bestScore && best >= 0 && counts(l) > 0 &&
            langs(l).compareTo(langs(best)) > 0)) {
        best = l
        bestScore = counts(l)
      }
      l += 1
    }
    if (best < 0 || bestScore == 0) UTF8String.fromString("und")
    else UTF8String.fromString(langs(best))
  }
}

/** `string -> string` language code; see LangIdKernel. */
case class LangIdText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.string(child, prettyName)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_langid"

  override protected def nullSafeEval(input: Any): Any =
    LangIdKernel.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.LangIdKernel.langId($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
