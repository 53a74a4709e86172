package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}
import org.apache.spark.unsafe.Platform

/**
 * 128-bit byte-gram SimHash of a binary payload as a native codegen'd
 * Catalyst expression — the signature step of perceptual-hash near-dup
 * (q89) computed in ONE pass over each row's bytes.
 *
 * The previous formulation exploded every sliding 4-byte gram into its
 * own row (~payload-size rows per document), hashed each, and folded 128
 * signed-bit SUM aggregate columns back per doc — a corpus-bytes-sized
 * explode plus a 128-buffer aggregation, all before the candidate join
 * even starts. But the signature is a pure PER-ROW function of the
 * payload: this expression runs the identical gram/hash/counter loop as
 * compiled JVM code inside the projection, so signature computation
 * needs no extra rows, no shuffle, and no aggregate state, and scales as
 * a map-only pass (the first shuffle of q89 is now the candidate join
 * itself, which is where it belongs).
 *
 * Bit-compatibility is pinned: gram hash = XXH64(bytes, seed 42) — the
 * engine function behind SQL `xxhash64(binary)` — and the second word's
 * family is XXH64.hashLong of the first (SQL `xxhash64(bigint)`), so the
 * emitted signature equals the old explode/aggregate formulation
 * word-for-word (MultimodalSpec re-derives ground truth from these
 * signatures and the near-dup/separation bands it pins).
 */
case class PHash128(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${PHashFunctions.Name} expects binary input, got ${child.dataType.simpleString}")

  /** Two 64-bit words, word 1 = bits [0, 64). */
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PHashFunctions.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // The loop lives in a static helper: codegen stays one call, the hot
    // path is JIT-compiled once, and eval/codegen share one definition.
    defineCodeGen(ctx, ev, p => s"graft.functions.PHashFunctions.compute($p)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PHashFunctions {

  val Name = "graft_phash128"

  private final val Seed = 42L // Spark's xxhash64 default seed

  /** One pass: for each sliding 4-byte gram, h0 = XXH64(gram), h1 =
    * XXH64.hashLong(h0); accumulate 128 signed bit counters; pack
    * counter>0 into two words. Payloads shorter than one gram yield the
    * all-zero signature (callers filter them out to match the
    * no-gram-no-signature contract). */
  def compute(p: Array[Byte]): ArrayData = {
    val cnt = new Array[Int](128)
    val last = p.length - 4
    var i = 0
    while (i <= last) {
      val h0 = XXH64.hashUnsafeBytes(p, Platform.BYTE_ARRAY_OFFSET + i, 4, Seed)
      val h1 = XXH64.hashLong(h0, Seed)
      var b = 0
      while (b < 64) {
        cnt(b) += (if (((h0 >>> b) & 1L) == 1L) 1 else -1)
        cnt(64 + b) += (if (((h1 >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var w0 = 0L
    var w1 = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) > 0) w0 |= (1L << b)
      if (cnt(64 + b) > 0) w1 |= (1L << b)
      b += 1
    }
    new GenericArrayData(Array(w0, w1))
  }

  /** Idempotent per-session registration (same mechanism as
    * [[VectorFunctions.register]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"$Name(payload) takes exactly 1 argument, got ${exprs.length}")
        PHash128(exprs(0))
      }, "built-in")

  /** Column-API face (requires `register`). */
  def phash128(payload: Column): Column = call_function(Name, payload)
}
