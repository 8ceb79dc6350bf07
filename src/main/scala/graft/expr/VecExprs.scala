package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen Catalyst expressions for the text/vector hot kernels —
  * round-4 promotion of the measured-hot `udf`s (minhash, SRP-LSH
  * buckets, cosine verify) to native expressions: the generated Java
  * calls a static [[Kernels]] method on the unsafe ArrayData /
  * UTF8String directly, so the per-row Row↔Seq encoder round-trip the
  * udfs paid is gone while the arithmetic (and therefore every bit of
  * every result) is the same code path. Registered in
  * [[GraftFunctions]] as graft_cosine / graft_minhash /
  * graft_lsh_buckets; bit-identity vs the udf twins is asserted in
  * LshSpec.
  */

/** cosine(a, b) over array<float>: null (not a throw) on null input,
  * length mismatch, or any NULL ELEMENT — the zip_with expression's
  * semantics (a null slot nulls the whole fold). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_cosine(array<float>, array<float>), got ($l, $r)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosineBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("graftCos")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double $r = graft.expr.Kernels.cosineBoxed($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

/** minhash signature array (n salted md5 minima) of a text column. */
case class MinhashSig(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0 && n <= 64, s"minhash n=$n out of range")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash(string), got $t")
  }

  override protected def nullSafeEval(text: Any): Any =
    Kernels.minhashSig(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Kernels.minhashSig($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** PQ encode of an array<float> embedding: the m sub-codes (array<int>)
  * under a flat quantized codebook (shipped as a codegen reference
  * object — it is data-derived, so the registered builder extracts it
  * from a literal array<bigint> argument). Exact integer distances; see
  * [[Kernels.pqCodes]]. */
case class PqCodes(child: Expression, cb: Array[Long], m: Int, ks: Int)
    extends UnaryExpression {
  require(m > 0 && ks > 0 && cb.length % (m * ks) == 0 && cb.length > 0,
    s"graft_pq_codes: codebook length ${cb.length} not a multiple of m*ks=${m * ks}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_codes(array<float>, ...), got $t")
  }

  override protected def nullSafeEval(e: Any): Any =
    Kernels.pqCodes(e.asInstanceOf[ArrayData], cb, m, ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqCb", cb, "long[]")
    val r = ctx.freshName("graftPqCodes")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expr.Kernels.pqCodes($c, $ref, $m, $ks);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ADC distance table (flat array<bigint>, m*ks entries) of a query
  * embedding under a flat quantized codebook — computed once per
  * query row; see [[Kernels.pqDtab]]. */
case class PqDtab(child: Expression, cb: Array[Long], m: Int, ks: Int)
    extends UnaryExpression {
  require(m > 0 && ks > 0 && cb.length % (m * ks) == 0 && cb.length > 0,
    s"graft_pq_dtab: codebook length ${cb.length} not a multiple of m*ks=${m * ks}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_dtab(array<float>, ...), got $t")
  }

  override protected def nullSafeEval(e: Any): Any =
    Kernels.pqDtab(e.asInstanceOf[ArrayData], cb, m, ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqCb", cb, "long[]")
    val r = ctx.freshName("graftPqDtab")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expr.Kernels.pqDtab($c, $ref, $m, $ks);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ADC score Σ_sub dtab[sub*ks + codes[sub]] — the per-candidate PQ
  * scoring kernel (m lookups + adds inside whole-stage codegen). */
case class PqAdc(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {
  require(ks > 0, s"graft_pq_adc ks=$ks must be positive")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc(array<bigint>, array<int>), got ($l, $r)")
  }

  override protected def nullSafeEval(dtab: Any, codes: Any): Any =
    Kernels.pqAdc(dtab.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("graftPqAdc")
    nullSafeCodeGen(ctx, ev, (d, c) =>
      s"""
         |java.lang.Long $r = graft.expr.Kernels.pqAdc($d, $c, $ks);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.longValue();
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

/** IVF cell assignment of an array<float> embedding: positional index
  * of the max-cosine centroid over a flat float centroid set (shipped
  * as a codegen reference object, extracted from a literal
  * array<float> argument — it is data-derived like the PQ codebook).
  * Bit-identical to the crossJoin+window argmax it replaces; see
  * [[Kernels.ivfAssign]]. */
case class IvfAssign(child: Expression, flat: Array[Float], kc: Int)
    extends UnaryExpression {
  require(kc > 0 && flat.length % kc == 0 && flat.length > 0,
    s"graft_ivf_assign: centroid array length ${flat.length} not a multiple of kc=$kc")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_assign(array<float>, ...), got $t")
  }

  override protected def nullSafeEval(e: Any): Any =
    Kernels.ivfAssign(e.asInstanceOf[ArrayData], flat, kc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftIvfCents", flat, "float[]")
    val r = ctx.freshName("graftIvfAssign")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Integer $r = graft.expr.Kernels.ivfAssign($c, $ref, $kc);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.intValue();
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** SRP-LSH bucket ids (one long per table) of an array<float>
  * embedding; the integer plane weights are derived once per instance
  * from (tables, nb, dim) and shipped as a codegen reference object. */
case class LshBuckets(child: Expression, tables: Int, nb: Int, dim: Int)
    extends UnaryExpression {
  require(tables > 0 && nb > 0 && dim > 0,
    s"graft_lsh_buckets(tables=$tables, nb=$nb, dim=$dim) must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null even on non-null input: short array / null element → null row
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets(array<float>), got $t")
  }

  @transient private lazy val planes: Array[Array[Array[Double]]] =
    Array.tabulate(tables, nb, dim)((t, j, i) =>
      graft.vec.VectorOps.planeW(t, j, i).toDouble)

  override protected def nullSafeEval(e: Any): Any =
    Kernels.lshBuckets(e.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftLshPlanes", planes, "double[][][]")
    val r = ctx.freshName("graftLsh")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expr.Kernels.lshBuckets($c, $ref);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
