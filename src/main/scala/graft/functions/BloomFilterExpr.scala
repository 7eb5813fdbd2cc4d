package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Immutable blocked-free Bloom filter over strings: a packed long-array
  * bit set probed at k positions derived from two independent 64-bit
  * string hashes (Kirsch–Mitzenmacher double hashing — k indices
  * `h1 + i·h2` give the classic (1-e^{-kn/m})^k false-positive rate
  * without k independent hash functions).
  *
  * Built once (driver or `treeAggregate` merge), shipped to executors
  * inside the probing expression like any broadcast literal —
  * `bitCount/8` bytes, e.g. ~12 MB for 10M probe n-grams at 1% fpp;
  * compare the multi-GB broadcast of the probe STRINGS themselves that a
  * direct join would ship. NO false negatives ever, so an exact verify
  * join on the survivors reproduces the exact-join answer bit-for-bit.
  */
final class StringBloom(val bits: Array[Long], val k: Int) extends Serializable {

  def put(s: String): Unit = {
    val h1 = StringBloom.hash1(s); val h2 = StringBloom.hash2(s)
    val m = bits.length.toLong * 64L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      bits((pos >>> 6).toInt) |= (1L << (pos & 63L))
      i += 1
    }
  }

  def mightContain(s: String): Boolean = {
    val h1 = StringBloom.hash1(s); val h2 = StringBloom.hash2(s)
    val m = bits.length.toLong * 64L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise-or merge (same geometry) — the `treeAggregate` combiner. */
  def merge(other: StringBloom): StringBloom = {
    require(other.bits.length == bits.length && other.k == k,
      "cannot merge Bloom filters of different geometry")
    var i = 0
    while (i < bits.length) { bits(i) |= other.bits(i); i += 1 }
    this
  }
}

object StringBloom {

  /** Size for `expected` insertions at false-positive rate `fpp`:
    * m = -n·ln(p)/ln(2)², k = (m/n)·ln(2) — the standard optima. */
  def create(expected: Long, fpp: Double = 0.01): StringBloom = {
    require(expected > 0 && fpp > 0 && fpp < 1)
    val m = math.max(64L,
      math.ceil(-expected * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val words = ((m + 63L) / 64L).toInt
    val k = math.max(1, math.round(m.toDouble / expected * math.log(2)).toInt)
    new StringBloom(new Array[Long](words), k)
  }

  /** FNV-1a 64 over UTF-16 code units. */
  def hash1(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Base-1099511628211 polynomial — independent of [[hash1]]'s mixing;
    * forced odd so the double-hash stride never collapses to 0 mod 2^64
    * cycles shorter than the table. */
  def hash2(s: String): Long = {
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < s.length) {
      h = h * 1099511628211L + s.charAt(i).toLong
      i += 1
    }
    h | 1L
  }
}

/** `bloom_might_contain(s)` — codegen'd membership probe against a fixed
  * [[StringBloom]]. The filter rides along as a reference object; the
  * call stays inside whole-stage codegen (case (b) of the build brief's
  * preference order), so Bloom-prefiltering a corpus is a narrow
  * zero-shuffle pass. */
case class BloomMightContainExpr(child: Expression, bloom: StringBloom)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContain(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[StringBloom].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContain($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomMightContainExpr {
  /** Column API entry point. */
  def mightContain(c: Column, bloom: StringBloom): Column =
    GraftBridge.column(BloomMightContainExpr(GraftBridge.expression(c), bloom))
}
