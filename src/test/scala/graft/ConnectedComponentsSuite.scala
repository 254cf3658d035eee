package graft

import graft.ops.ConnectedComponents
import org.apache.spark.sql.functions._

class ConnectedComponentsSuite extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] =
    ConnectedComponents.components(
      edges.toDF("a", "b"), nodes.toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to one min-rooted component; isolates self-label") {
    // worst case for label propagation: a pure chain
    val got = run(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), (1L to 7L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 7L))
  }

  test("duplicate/reversed/self edges are tolerated") {
    val got = run(Seq(2L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 4L, 4L -> 3L),
      (1L to 4L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("matches union-find on a pseudo-random graph") {
    // deterministic LCG so the case is reproducible
    var x = 42L
    def nxt(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); math.abs(x) }
    val n = 200L
    val edges = (1 to 150).map(_ => (nxt() % n) -> (nxt() % n))
    // reference union-find
    val parent = Array.tabulate(n.toInt)(identity)
    def find(i: Int): Int = if (parent(i) == i) i else { parent(i) = find(parent(i)); parent(i) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (0L until n).map(i => i -> find(i.toInt).toLong).toMap
    // canonicalize union-find roots to component minimum
    val minOf = want.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
    val wantMin = want.map { case (k, r) => k -> minOf(r) }
    assert(run(edges, 0L until n) == wantMin)
  }
}
