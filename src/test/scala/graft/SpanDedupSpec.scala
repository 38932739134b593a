package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpanDedup

/** Semantics of positional duplicate-span detection and the
  * cross-source overlap matrix (SpanDedup) on handcrafted fixtures
  * where every span boundary is known by construction. */
class SpanDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("duplicateSpans merges overlapping windows into one maximal span") {
    val s = spark
    import s.implicits._
    // docs 1 and 2 share a 12-token run; with k=4 that is positions
    // 3..11 in doc 1 (9 windows) and 1..9 in doc 2, merging to the
    // full shared run [3, 14] / [1, 12]
    val shared = words("s", 12)
    val docs = Seq(
      (1L, s"u1 u2 $shared t1 t2 t3"),
      (2L, s"$shared v1 v2 v3 v4 v5"),
      (3L, words("z", 18))
    ).toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(docs, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(spans === Set(
      (1L, 3L, 14L, 9L),  // 12-token run starting after 2 unique tokens
      (2L, 1L, 12L, 9L))) // same run at the head of doc 2
  }

  test("duplicateSpans separates runs with a gap and ignores same-doc repeats") {
    val s = spark
    import s.implicits._
    val runA = words("a", 5)
    val runB = words("b", 5)
    // doc 1 carries runs A and B separated by 6 unique tokens (> k=4
    // past the last A-window start: two islands); doc 4 repeats run C
    // twice WITHIN itself — one doc, so never flagged
    val docs = Seq(
      (1L, s"$runA g1 g2 g3 g4 g5 g6 $runB"),
      (2L, s"x1 x2 $runA x3 x4"),
      (3L, s"y1 y2 y3 $runB y4"),
      (4L, s"${words("c", 5)} h1 h2 ${words("c", 5)}")
    ).toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(docs, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(spans === Set(
      (1L, 1L, 5L, 2L),   // run A: windows at 1,2
      (1L, 12L, 16L, 2L), // run B: windows at 12,13 (gap 12-2=10 > 4)
      (2L, 3L, 7L, 2L),
      (3L, 4L, 8L, 2L)))
    assert(!spans.exists(_._1 == 4L), "same-doc repetition must not flag")
  }

  test("duplicateSpans: docs shorter than k emit nothing") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    assert(SpanDedup.duplicateSpans(docs, "doc_id", "text", k = 4).isEmpty)
  }

  test("removeDuplicateSpans keeps first occurrence, cuts later ones, drops empties") {
    val s = spark
    import s.implicits._
    val shared = words("s", 6)
    val docs = Seq(
      (1L, s"$shared x1 x2"),          // owner: survives whole
      (2L, s"y1 y2 $shared y3"),       // later: loses the 6-token run
      (3L, shared),                    // later, nothing else: dropped
      (4L, words("q", 5))              // untouched (no dup windows)
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateSpans(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((s"$shared x1 x2".toLowerCase, 8L, 0L)))
    assert(out(2L) === (("y1 y2 y3", 3L, 6L)))
    assert(!out.contains(3L), "pure duplicate must be dropped")
    assert(out(4L) === ((words("q", 5), 5L, 0L)))
  }

  test("removeDuplicateSpans cuts only the duplicated window range") {
    val s = spark
    import s.implicits._
    // doc 2 shares only the middle 4 tokens (exactly one k=4 window)
    val run = words("m", 4)
    val docs = Seq(
      (1L, s"a1 a2 $run a3 a4"),
      (2L, s"b1 b2 $run b3 b4")
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeDuplicateSpans(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._3 === 0L)
    assert(out(2L) === (("b1 b2 b3 b4", 4L, 4L)))
  }

  test("overlapMatrix computes shared counts and jaccard over distinct windows") {
    val s = spark
    import s.implicits._
    val shared = words("s", 4) // one k=4 window
    // srcA: 2 docs, windows {shared, a1..a4} -> 2 distinct
    // srcB: 1 doc,  windows {shared}         -> 1 distinct
    // srcC: disjoint
    val docs = Seq(
      (1L, "A", shared),
      (2L, "A", s"${words("a", 4)}"),
      (3L, "B", shared),
      (4L, "C", words("z", 4))
    ).toDF("doc_id", "source", "text")
    val m = SpanDedup.overlapMatrix(docs, "doc_id", "text", "source", k = 4)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(m.keySet === Set(("A", "B"))) // only pairs with shared > 0
    val (sh, na, nb, jac, cont) = m(("A", "B"))
    assert((sh, na, nb) === (1L, 2L, 1L))
    assert(jac === 0.5)  // 1 / (2 + 1 - 1)
    assert(cont === 1.0) // B's window set is contained in A's
  }
}
