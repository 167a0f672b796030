package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for dense-vector arithmetic over
  * `array<double>` columns.
  *
  * These replace interpreted `aggregate`/`zip_with` higher-order
  * functions in the ANN hot path: a HOF re-enters the interpreter per
  * element (boxing each lambda application), while these generate a
  * tight primitive Java loop inside whole-stage codegen — the
  * brute-force scorer's inner loop runs |corpus| x |queries| times, so
  * at scale this is the difference between a compute-bound scan and an
  * allocation-bound one.
  *
  * Summation is sequential ascending-index (deterministic, matching
  * the documented engine-parity rule: identical IEEE op order on
  * identical inputs is bit-reproducible).
  */
abstract class VectorBinaryExpression extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
}

/** dot(a, b) over the common prefix of the two arrays. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_cosine_many(mat, vec)`: cosine of EVERY row of a
  * `array<array<double>>` matrix against one vector, as an
  * `array<double>` in row order — the one-native-call replacement for
  * `transform(sequence(0, k-1), i -> graft_cosine(mat[i], vec))`.
  *
  * The interpreted HOF form re-enters the expression interpreter per
  * element (lambda binding, boxed index, an ArrayData view per `mat[i]`
  * extraction); profiled at ~50 us/row for a 16-row matrix in the IVF
  * cell-assign and ~110 us/row for the PQ encode's nested form —
  * dominating both kernels. Element i is computed by the SAME scalar
  * loop as [[CosineSimilarity]] (ascending-index sums, common-prefix
  * length), so every value is bit-identical to the HOF formulation the
  * oracle replays.
  */
case class CosineSimilarityMany(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "graft_cosine_many"
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ArrayType(DoubleType)), ArrayType(DoubleType))
  // containsNull mirrors the transform formulation's element type (a
  // null matrix row yields a null cosine there via null-intolerance)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(m: Any, v: Any): Any =
    CosineSimilarityMany.cosines(m.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CosineSimilarityMany.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (m, v) => s"${ev.value} = $cls.cosines($m, $v);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityMany {
  def cosines(mat: ArrayData, vec: ArrayData): ArrayData = {
    val k = mat.numElements()
    val nv = vec.numElements()
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      if (!mat.isNullAt(c)) {
        val row = mat.getArray(c)
        val n = math.min(row.numElements(), nv)
        var dot = 0.0
        var nx = 0.0
        var ny = 0.0
        var i = 0
        while (i < n) {
          val xi = row.getDouble(i)
          val yi = vec.getDouble(i)
          dot += xi * yi; nx += xi * xi; ny += yi * yi
          i += 1
        }
        out(c) = dot / (math.sqrt(nx) * math.sqrt(ny))
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** cosine(a, b) = dot/(|a|*|b|) in one pass over the common prefix
  * (vectors are expected to share dimensionality).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
