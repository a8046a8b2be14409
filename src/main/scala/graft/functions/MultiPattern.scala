package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton over UTF-8 bytes: which of N fixed patterns
  * occur (as substrings) in a text, found in ONE pass.
  *
  * The engine's blocklist / phrase-tagging scans (q193, q257) pay one
  * `contains` pass per pattern — fine for a handful, wrong at a
  * thousand-entry blocklist over 100 TB of text, where the scan cost
  * must be O(bytes), not O(bytes × patterns). Aho–Corasick (CACM 1975)
  * is the standard fix: the pattern set compiles once into a
  * goto/fail automaton (here the full byte-level DFA, so the hot loop
  * is a single array lookup per input byte), and matching every
  * pattern — including nested and overlapping ones ("he" inside
  * "she", via the output-closure union over fail links) — costs one
  * walk of the text.
  *
  * Byte-level is sound for UTF-8: a code unit sequence never appears
  * inside another character's sequence, so byte-substring equality is
  * exactly string-substring equality.
  *
  * The automaton is a per-JVM object shipped to executors via
  * `addReferenceObj` — the "broadcast the dimension table into the
  * operator" posture; the expression stays inside whole-stage codegen
  * (the generated code is one virtual call into the compiled scan
  * loop, the LcsLength discipline).
  */
final class AhoCorasick(patterns: Array[Array[Byte]]) extends Serializable {

  val nPatterns: Int = patterns.length

  // Trie build: goto over 256 byte values, BFS fail links, output
  // sets propagated through fail links (out(s) |= out(fail(s))) so
  // scan-time needs no link chasing.
  @transient private lazy val compiled: (Array[Array[Int]], Array[Array[Int]]) = {
    var nStates = 1
    val maxStates = patterns.map(_.length).sum + 1
    val goto = Array.fill(maxStates, 256)(-1)
    val out = Array.fill(maxStates)(List.empty[Int])
    var p = 0
    while (p < nPatterns) {
      var s = 0
      val pat = patterns(p)
      var i = 0
      while (i < pat.length) {
        val b = pat(i) & 0xff
        if (goto(s)(b) == -1) { goto(s)(b) = nStates; nStates += 1 }
        s = goto(s)(b)
        i += 1
      }
      out(s) = p :: out(s)
      p += 1
    }
    val fail = new Array[Int](nStates)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var b = 0
    while (b < 256) {
      if (goto(0)(b) == -1) goto(0)(b) = 0
      else { fail(goto(0)(b)) = 0; queue.enqueue(goto(0)(b)) }
      b += 1
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = out(s) ::: out(fail(s))
      var b = 0
      while (b < 256) {
        if (goto(s)(b) == -1) goto(s)(b) = goto(fail(s))(b)
        else { fail(goto(s)(b)) = goto(fail(s))(b); queue.enqueue(goto(s)(b)) }
        b += 1
      }
    }
    (goto.take(nStates), out.take(nStates).map(_.toArray))
  }

  /** Sorted distinct 1-based ids of the patterns present in `bytes`. */
  def findPresent(bytes: Array[Byte]): GenericArrayData = {
    val d = compiled._1
    val o = compiled._2
    val hit = new Array[Boolean](nPatterns)
    var nHit = 0
    var s = 0
    var i = 0
    while (i < bytes.length && nHit < nPatterns) {
      s = d(s)(bytes(i) & 0xff)
      val os = o(s)
      var j = 0
      while (j < os.length) {
        if (!hit(os(j))) { hit(os(j)) = true; nHit += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Long](nHit)
    var k = 0
    var p = 0
    while (p < nPatterns) {
      if (hit(p)) { res(k) = p + 1L; k += 1 }
      p += 1
    }
    new GenericArrayData(res)
  }
}

/** `graft_multi_contains(text, array('pat', …))` → sorted array of the
  * 1-based indices of the patterns occurring in `text`. The pattern
  * array must be foldable (it compiles into the automaton at plan
  * time, exactly as `graft_rolling_hash` folds its width argument).
  */
case class MultiPatternMatches(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac: AhoCorasick =
    new AhoCorasick(patterns.map(_.getBytes("UTF-8")).toArray)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_multi_contains"

  override def nullSafeEval(t: Any): Any =
    ac.findPresent(t.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $acRef.findPresent($t.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternMatches =
    copy(child = newChild)
}
