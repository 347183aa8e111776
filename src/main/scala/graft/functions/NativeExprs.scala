package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine-defined text functions.
  *
  * A Scala UDF forces a codegen boundary (ScalaUDF eval + catalyst<->Scala
  * converters per row); these stay INSIDE whole-stage codegen — doGenCode
  * emits a direct static call into TextFns (Scala objects expose static
  * forwarders), so the generated stage reads the UTF8String, converts once,
  * and writes the primitive result with no reflective dispatch. They also
  * become real SQL functions via [[graft.GraftExtensions]] (the
  * SparkSessionExtensions route: spark.sql.extensions=graft.GraftExtensions).
  */
abstract class TextFnExpression extends UnaryExpression with ExpectsInputTypes {
  // no annotation: AbstractDataType is private[sql]; the inferred
  // Seq[StringType.type] conforms
  override def inputTypes = Seq(StringType)
  override def nullIntolerant: Boolean = true
}

/** 64-bit Charikar SimHash of a string column (TextFns.simHash). */
case class SimHash64(child: Expression) extends TextFnExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextFns.simHash(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFns.simHash($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** xxhash-style 64-bit content hash (TextFns.hash64, seed 0). */
case class Hash64(child: Expression) extends TextFnExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash64"
  override protected def nullSafeEval(input: Any): Any =
    TextFns.hash64(input.asInstanceOf[UTF8String].toString, 0L)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFns.hash64($c.toString(), 0L)")
  override protected def withNewChildInternal(newChild: Expression): Hash64 =
    copy(child = newChild)
}

/** BPE-ish subword token count (TextFns.bpeTokenCount) as a long. */
case class BpeTokenCount64(child: Expression) extends TextFnExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_token_count"
  override protected def nullSafeEval(input: Any): Any =
    TextFns.bpeTokenCount(input.asInstanceOf[UTF8String].toString).toLong
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"(long) graft.functions.TextFns.bpeTokenCount($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount64 =
    copy(child = newChild)
}

/** Stopword-profile language ID (TextFns.detectLanguage). */
case class LangId(child: Expression) extends TextFnExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TextFns.detectLanguage(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextFns.detectLanguage($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

/** Row-local helpers callable from generated code (static forwarders). */
object NativeExprHelpers {
  /** Float-array dot product accumulated in DOUBLE, index order — the
    * bit-identical native twin of
    * `aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS
    * DOUBLE)), 0D, (acc, v) -> acc + v)`: same widening cast per element,
    * same left-fold accumulation sequence, same null semantics (length
    * mismatch or any null element -> null, exactly what zip_with padding /
    * null propagation produced). Returns a boxed Double so the caller can
    * represent the null. */
  def dotFloat(a: org.apache.spark.sql.catalyst.util.ArrayData,
               b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** MinHash signature -> "band:hash" LSH keys as a Catalyst array. */
  def lshBandArray(text: String, k: Int, perms: Int, bands: Int)
  : org.apache.spark.sql.catalyst.util.ArrayData = {
    val keys = TextFns.lshBandKeys(TextFns.minHashSignature(text, k, perms), bands)
    val out = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) {
      out(i) = UTF8String.fromString(i.toString + ":" + keys(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** MinHash+LSH band keys of a string column: array of "band:minhash"
  * bucket keys (TextFns.minHashSignature + lshBandKeys fused row-local). */
case class LshBandKeys(child: Expression, k: Int, perms: Int, bands: Int)
    extends TextFnExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_lsh_band_keys"
  override protected def nullSafeEval(input: Any): Any =
    NativeExprHelpers.lshBandArray(input.asInstanceOf[UTF8String].toString, k, perms, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeExprHelpers.lshBandArray($c.toString(), $k, $perms, $bands)")
  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}

/** Exact k-shingle Jaccard similarity scaled to x1000 (TextFns
  * .jaccardShingles) as a native binary expression. */
case class JaccardShingles1000(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_jaccard_shingles"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextFns.jaccardShingles(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextFns.jaccardShingles($a.toString(), $b.toString(), $k)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
  : JaccardShingles1000 = copy(left = newLeft, right = newRight)
}

/** Double dot product of two float-array columns (embeddings) — whole-stage
  * codegen, no per-row lambda interpretation, no zip_with intermediate
  * array. The HigherOrderFunction formulation it replaces evaluates its
  * lambdas interpreted (ArrayAggregate/ZipWith do not participate in
  * codegen) and allocates a temp array per invocation — the hot path of
  * every cosine-scoring query (ANN candidates, SemDeDup pair search). */
case class DotProductF(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  private val arrF = org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)
  override def inputTypes = Seq(arrF, arrF)
  override def nullIntolerant: Boolean = true
  // null even for non-null inputs: length mismatch / null element
  override def nullable: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_dot_f"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeExprHelpers.dotFloat(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""
       |java.lang.Double $r = graft.functions.NativeExprHelpers.dotFloat($a, $b);
       |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
  : DotProductF = copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the native expressions. */
object NativeFns {
  private def wrap(e: Expression): Column = ColumnBridge.column(e)
  private def ex(c: Column): Expression = ColumnBridge.expression(c)

  def simhash64(c: Column): Column = wrap(SimHash64(ex(c)))
  def hash64(c: Column): Column = wrap(Hash64(ex(c)))
  def bpeTokenCount(c: Column): Column = wrap(BpeTokenCount64(ex(c)))
  def langId(c: Column): Column = wrap(LangId(ex(c)))
  def lshBandKeys(c: Column, k: Int = 3, perms: Int = 64, bands: Int = 16): Column =
    wrap(LshBandKeys(ex(c), k, perms, bands))
  def jaccardShingles1000(a: Column, b: Column, k: Int = 3): Column =
    wrap(JaccardShingles1000(ex(a), ex(b), k))
  def dotF(a: Column, b: Column): Column = wrap(DotProductF(ex(a), ex(b)))
}
