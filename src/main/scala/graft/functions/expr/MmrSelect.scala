package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance selection (Carbonell & Goldstein,
  * SIGIR'98): greedily re-rank a candidate pool so each pick maximizes
  * `λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s)` — relevance traded
  * against redundancy with what is already selected (max over the
  * empty set is 0, so the first pick is the pure-relevance argmax).
  *
  * `graft_mmr(cands, k, lambda)` where `cands` is
  * `array<struct<id: long, rel: double, vec: array<double>>>` (one
  * query's candidate pool, typically the top-m of an ANN stage) →
  * `array<struct<id, score>>` in selection order. The greedy is
  * O(m·k·dim) per row with O(m) state — a per-row kernel like every
  * other graft expression, so diversification adds ZERO shuffles on
  * top of the ANN stage that feeds it. Ties break to the lowest id;
  * the result is independent of the input array's order, so the
  * upstream collect_list needs no sort. Cosine is the shared
  * SignatureKernels arithmetic (dot / (√na·√nb)), matching
  * list_cosine_similarity for the oracle.
  */
case class MmrSelect(child: Expression, k: Int, lambda: Double)
    extends UnaryExpression {
  require(k > 0 && k <= 1000, "k in (0, 1000]")
  require(lambda >= 0.0 && lambda <= 1.0, "lambda in [0, 1]")

  private val structType = StructType(Seq(
    StructField("id", LongType),
    StructField("rel", DoubleType),
    StructField("vec", ArrayType(DoubleType))))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 3 && fields(0).dataType == LongType &&
          fields(1).dataType == DoubleType &&
          fields(2).dataType.isInstanceOf[ArrayType] &&
          fields(2).dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<long, double, array<double>>>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)
  override def prettyName: String = "graft_mmr"

  override protected def nullSafeEval(input: Any): Any =
    MmrSelect.select(input.asInstanceOf[ArrayData], k, lambda)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.MmrSelect.select($c, $k, $lambda);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MmrSelect {
  /** Static kernel shared by eval and codegen. */
  def select(cands: ArrayData, k: Int, lambda: Double): GenericArrayData = {
    val m = cands.numElements()
    val ids = new Array[Long](m)
    val rels = new Array[Double](m)
    val vecs = new Array[Array[Double]](m)
    var i = 0
    while (i < m) {
      val row = cands.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rels(i) = row.getDouble(1)
      vecs(i) = row.getArray(2).toDoubleArray()
      i += 1
    }
    val oneMinus = 1.0 - lambda
    val taken = new Array[Boolean](m)
    // running max similarity of each candidate to the selected set —
    // updated incrementally after every pick. NegativeInfinity marks
    // "selected set empty" (contribution 0); a real max may be
    // NEGATIVE and must then BOOST the score (anti-similar candidates
    // are maximally diverse) — clamping at 0 would silently change
    // the MMR objective.
    val maxSim = Array.fill(m)(Double.NegativeInfinity)
    val out = new Array[Any](math.min(k, m))
    var picked = 0
    while (picked < out.length) {
      var best = -1
      var bestScore = 0.0
      i = 0
      while (i < m) {
        if (!taken(i)) {
          val ms = if (maxSim(i) == Double.NegativeInfinity) 0.0 else maxSim(i)
          val score = lambda * rels(i) - oneMinus * ms
          if (best < 0 || score > bestScore ||
              (score == bestScore && ids(i) < ids(best))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      taken(best) = true
      out(picked) = InternalRow(ids(best), bestScore)
      i = 0
      while (i < m) {
        if (!taken(i)) {
          val s = cosineD(vecs(i), vecs(best))
          if (s > maxSim(i)) maxSim(i) = s
        }
        i += 1
      }
      picked += 1
    }
    new GenericArrayData(out)
  }

  /** Same arithmetic as SignatureKernels.cosine on double arrays. */
  private def cosineD(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
