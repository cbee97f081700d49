package graft

import graft.functions.{RollingSpanHash64, RollingSpanHash64Expr}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The codegen'd Rabin-Karp rolling span hash: the rolled value at
  * every window must equal the direct (non-rolling) polynomial of that
  * window's token hashes, equal token windows must collide exactly,
  * and the codegen path must agree with direct evaluation.
  */
class RollingSpanHashSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 0x100000001b3L

  private def fnv(tok: String): Long = {
    var h = 0xcbf29ce484222325L
    tok.foreach { c => h ^= c; h *= B }
    h
  }

  /** Direct O(n·L) recompute of what the rolling pass must produce. */
  private def direct(tokens: Seq[String], span: Int): Seq[Long] =
    tokens.sliding(span).filter(_.size == span)
      .map(_.map(fnv).foldLeft(0L)((acc, t) => acc * B + t)).toSeq

  private def viaExpr(s: String, span: Int): Seq[Long] = {
    val out = Seq(Tuple1(s)).toDF("t")
      .select(RollingSpanHash64Expr.spanHashes64(col("t"), span).as("h"))
      .head.getSeq[Long](0)
    out
  }

  test("rolled hashes equal the direct polynomial at every window (property)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val span = 1 + rnd.nextInt(6)
      val toks = Seq.fill(rnd.nextInt(20))(
        Seq.fill(1 + rnd.nextInt(4))(('a' + rnd.nextInt(26)).toChar).mkString)
      val got = viaExpr(toks.mkString(" "), span)
      assert(got == direct(toks, span), s"span=$span toks=$toks")
    }
  }

  test("equal windows collide, regardless of position or document") {
    val a = viaExpr("x y p q r z", 3)
    val b = viaExpr("m p q r n o", 3)
    assert(a(2) == b(1), "the shared 'p q r' window must hash equal")
    assert(a.distinct.size == a.size, "distinct windows must not collide here")
  }

  test("space runs, short input, empty, and null semantics") {
    assert(viaExpr("  a   b c  ", 2) == direct(Seq("a", "b", "c"), 2))
    // space-ONLY tokenization (normText-output contract): a tab stays
    // inside its token, exactly like split(normText, " ")
    assert(viaExpr("a b\tc", 2) == direct(Seq("a", "b\tc"), 2))
    assert(viaExpr("a b", 3).isEmpty, "fewer tokens than span -> empty")
    assert(viaExpr("", 2).isEmpty)
    val nullRow = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(RollingSpanHash64Expr.spanHashes64(col("t"), 2).as("h")).head
    assert(nullRow.isNullAt(0), "null input -> null")
  }

  test("codegen and interpreted evaluation agree") {
    val s = "the quick brown fox jumps over the lazy dog"
    val fromDf = viaExpr(s, 4)
    val directEval = RollingSpanHash64.hashes(UTF8String.fromString(s), 4)
    assert(fromDf == directEval.toLongArray().toSeq)
  }
}
