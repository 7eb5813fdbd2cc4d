package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975): a trie
  * over the pattern set with BFS failure links, so matching a text
  * against EVERY pattern simultaneously is one O(|text| + matches) walk
  * — the right shape for blocklist filtering where a regex alternation
  * `(p1|p2|…|pN)` degrades with N and a per-pattern scan is O(N·|text|).
  *
  * Built once from the pattern list (driver-side; a 100k-entry blocklist
  * is a few MB of int arrays) and shipped to executors inside the
  * probing expression. Match semantics: every occurrence at every end
  * position counts (overlapping included) — mirrored exactly by the
  * gate's position-scan SQL oracle.
  */
final class AcAutomaton private (
    val next: Array[Array[Int]], // dense char-indexed transitions
    val alphabet: Array[Int],    // char -> column, -1 if absent
    val cnt: Array[Int],         // #patterns ending at state (incl. fail chain)
    val outLink: Array[Int],     // nearest output state via fail links
    val patId: Array[Int],       // pattern id ending exactly at state (-1)
    val fail: Array[Int],
    val nPatterns: Int) extends Serializable {

  /** [total match occurrences, distinct patterns present]. */
  def scan(text: String): (Long, Long) = {
    var s = 0
    var total = 0L
    var seen: java.util.BitSet = null
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val col = if (c < alphabet.length) alphabet(c) else -1
      s = if (col < 0) 0 else next(s)(col)
      if (cnt(s) > 0) {
        total += cnt(s)
        // follow output links to mark distinct patterns
        if (seen == null) seen = new java.util.BitSet(nPatterns)
        var o = if (patId(s) >= 0) s else outLink(s)
        while (o > 0) {
          if (patId(o) >= 0) seen.set(patId(o))
          o = outLink(o)
        }
      }
      i += 1
    }
    (total, if (seen == null) 0L else seen.cardinality().toLong)
  }
}

object AcAutomaton {

  def apply(patterns: Seq[String]): AcAutomaton = {
    val pats = patterns.toArray
    require(pats.nonEmpty && pats.forall(_.nonEmpty), "patterns must be non-empty")
    // alphabet = chars actually used by any pattern
    val chars = pats.flatMap(_.toCharArray).distinct.sorted
    val maxChar = chars.last.toInt + 1
    val alphabet = Array.fill(maxChar)(-1)
    chars.zipWithIndex.foreach { case (c, i) => alphabet(c) = i }
    val k = chars.length

    // trie build
    val maxStates = pats.map(_.length).sum + 1
    val goto = Array.fill(maxStates, k)(-1)
    val patIdAt = Array.fill(maxStates)(-1)
    var nStates = 1
    pats.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        val col = alphabet(c)
        if (goto(s)(col) < 0) { goto(s)(col) = nStates; nStates += 1 }
        s = goto(s)(col)
      }
      patIdAt(s) = pi // duplicate patterns collapse; dedupe upstream
    }

    // BFS failure links + dense next-function
    val fail = new Array[Int](nStates)
    val cnt = new Array[Int](nStates)
    val outLink = new Array[Int](nStates)
    val next = Array.ofDim[Int](nStates, k)
    val queue = new java.util.ArrayDeque[Int]()
    var col = 0
    while (col < k) {
      val t = goto(0)(col)
      if (t < 0) next(0)(col) = 0
      else { next(0)(col) = t; fail(t) = 0; queue.add(t) }
      col += 1
    }
    (0 until nStates).foreach(s => cnt(s) = if (patIdAt(s) >= 0) 1 else 0)
    while (!queue.isEmpty) {
      val s = queue.poll()
      cnt(s) += cnt(fail(s))
      outLink(s) =
        if (patIdAt(fail(s)) >= 0) fail(s) else outLink(fail(s))
      var c2 = 0
      while (c2 < k) {
        val t = goto(s)(c2)
        if (t < 0) next(s)(c2) = next(fail(s))(c2)
        else { fail(t) = next(fail(s))(c2); next(s)(c2) = t; queue.add(t) }
        c2 += 1
      }
    }
    new AcAutomaton(
      next, alphabet, cnt, outLink, patIdAt.take(nStates), fail,
      pats.length)
  }
}

/** `ac_scan(text)` — `array<bigint> [n_matches, n_patterns]` for a fixed
  * automaton; codegen'd (the walk runs as a static kernel call inside
  * whole-stage codegen — case (b) of the build brief's preference
  * order). */
case class AhoCorasickExpr(child: Expression, ac: AcAutomaton)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ac_scan"

  override def nullSafeEval(input: Any): Any =
    AhoCorasickExpr.scanToArray(ac, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", ac, classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AhoCorasickExpr.scanToArray($ref, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): AhoCorasickExpr =
    copy(child = newChild)
}

object AhoCorasickExpr {

  def scanToArray(ac: AcAutomaton, text: UTF8String): GenericArrayData = {
    val (total, distinct) = ac.scan(text.toString)
    new GenericArrayData(Array[Any](total, distinct))
  }

  /** Column API entry point. */
  def acScan(c: Column, ac: AcAutomaton): Column =
    GraftBridge.column(AhoCorasickExpr(GraftBridge.expression(c), ac))
}
