package graft

import graft.functions.{WinnowFps64, WinnowFps64Expr}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The codegen'd winnow expression against an independent in-memory
  * reference of the same semantics (k-gram polynomial hashes, sliding
  * min with partial prefix windows, distinct), plus the winnow
  * detection guarantee the downstream operators rely on.
  */
class WinnowFpsExprSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 0x100000001b3L

  private def fnv(tok: String): Long = {
    var h = 0xcbf29ce484222325L
    tok.foreach { c => h ^= c; h *= B }
    h
  }

  /** Plain-Scala reference: no rolling, no deque. */
  private def reference(tokens: Seq[String], k: Int, w: Int): Set[Long] = {
    if (tokens.isEmpty) return Set.empty
    val th = tokens.map(fnv)
    val grams =
      if (tokens.size < k) Seq(th.foldLeft(0L)((a, t) => a * B + t))
      else th.sliding(k).filter(_.size == k)
        .map(_.foldLeft(0L)((a, t) => a * B + t)).toSeq
    grams.indices.map(j => grams.slice(math.max(0, j - w + 1), j + 1).min).toSet
  }

  private def viaExpr(s: String, k: Int, w: Int): Set[Long] = {
    val r = Seq(Tuple1(s)).toDF("t")
      .select(WinnowFps64Expr.winnowFps64(col("t"), k, w).as("h"))
      .head
    if (r.isNullAt(0)) null else r.getSeq[Long](0).toSet
  }

  test("matches the reference on random documents (property)") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 60) {
      val k = 1 + rnd.nextInt(6)
      val w = 1 + rnd.nextInt(5)
      val toks = Seq.fill(rnd.nextInt(30))(
        Seq.fill(1 + rnd.nextInt(3))(('a' + rnd.nextInt(8)).toChar).mkString)
      assert(viaExpr(toks.mkString(" "), k, w) == reference(toks, k, w),
        s"k=$k w=$w toks=$toks")
    }
  }

  test("winnow guarantee: a shared run of w+k-1 tokens shares a fingerprint") {
    val rnd = new scala.util.Random(17)
    val k = 5
    val w = 4
    for (round <- 1 to 20) {
      val run = Seq.tabulate(w + k - 1)(i => s"shared${round}x$i")
      def noise(p: String, n: Int) = Seq.tabulate(n)(i => s"$p$round-$i")
      val a = noise("a", rnd.nextInt(15)) ++ run ++ noise("b", rnd.nextInt(15))
      val b = noise("c", rnd.nextInt(15)) ++ run ++ noise("d", rnd.nextInt(15))
      val shared = viaExpr(a.mkString(" "), k, w)
        .intersect(viaExpr(b.mkString(" "), k, w))
      assert(shared.nonEmpty, s"round $round: no shared fp")
    }
  }

  test("non-ASCII whitespace stays IN-token (parity with split-on-space)") {
    // normText's \s+ collapse is ASCII-only, so U+3000 survives inside
    // a token; the expression tokenizer must agree with
    // split(normText, " ") — not with Character.isWhitespace
    val ideographic = s"a　b"
    val expr = viaExpr(s"x $ideographic y", 1, 1)
    val ref = reference(Seq("x", ideographic, "y"), 1, 1)
    assert(expr == ref, "U+3000 must not split a token")
    assert(expr.size == 3, s"3 tokens expected, fps=$expr")
  }

  test("edge semantics: short, empty, null") {
    assert(viaExpr("a b", 5, 4).size == 1, "sub-k doc emits ONE truncated gram fp")
    assert(viaExpr("", 5, 4) == Set.empty, "token-less doc emits none")
    assert(viaExpr("     ", 5, 4) == Set.empty, "all-space doc emits none")
    // space-ONLY tokenization: a lone tab IS a token (normText would
    // have collapsed it before this expression ever sees it)
    assert(viaExpr("\t", 5, 4).size == 1)
    val nullRow = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(WinnowFps64Expr.winnowFps64(col("t"), 5, 4).as("h")).head
    assert(nullRow.isNullAt(0))
  }

  test("codegen and interpreted evaluation agree") {
    val s = "one two three four five six seven eight nine ten eleven"
    val fromDf = viaExpr(s, 3, 2)
    val directEval = WinnowFps64.fps(UTF8String.fromString(s), 3, 2)
    assert(fromDf == directEval.toLongArray().toSet)
  }
}
