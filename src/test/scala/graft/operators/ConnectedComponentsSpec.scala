package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class ConnectedComponentsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def labelsOf(nodes: Seq[Long], edges: Seq[(Long, Long)],
      maxIter: Int = 50): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(
      nodes.toDF("id"), edges.toDF("src", "dst"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 200-node chain converges (pointer jumping beats O(diameter))") {
    // plain propagation needs ~200 rounds here; pointer jumping ~8
    val nodes = (0L until 200L)
    val edges = (0L until 199L).map(i => (i, i + 1))
    val labels = labelsOf(nodes, edges, maxIter = 15)
    labels.values.toSet shouldBe Set(0L)
  }

  test("separate components keep separate min labels; isolates are own") {
    val labels = labelsOf(
      nodes = Seq(1L, 2L, 3L, 10L, 11L, 50L),
      edges = Seq((2L, 3L), (10L, 11L), (3L, 1L)))
    labels(1L) shouldBe 1L
    labels(2L) shouldBe 1L
    labels(3L) shouldBe 1L
    labels(10L) shouldBe 10L
    labels(11L) shouldBe 10L
    labels(50L) shouldBe 50L // isolated node labels itself
  }

  test("non-convergence raises instead of returning wrong labels") {
    val nodes = (0L until 64L)
    val edges = (0L until 63L).map(i => (i, i + 1))
    an[IllegalStateException] should be thrownBy
      labelsOf(nodes, edges, maxIter = 2)
  }

  test("singletons never enter the iteration (edge-restricted loop)") {
    // one tiny component + many isolated nodes: rounds operate on the
    // 3 edge nodes only — the contract that makes CC corpus-scale-free
    import spark.implicits._
    val nodes = (0L until 5000L).toDF("id")
    val edges = Seq((4997L, 4998L), (4998L, 4999L)).toDF("src", "dst")
    val out = ConnectedComponents.run(nodes, edges)
    out.count() shouldBe 5000
    out.filter(org.apache.spark.sql.functions.col("id") >= 4997L)
      .collect().map(_.getLong(1)).toSet shouldBe Set(4997L)
    // spot-check singleton self-labels
    out.filter(org.apache.spark.sql.functions.col("id") === 123L)
      .collect()(0).getLong(1) shouldBe 123L
  }

  test("superseded rounds release their storage (bounded block count)") {
    // a ~10-round chain: without per-round release, every round's label
    // table would stay persisted until the query ends — at 100 TB that
    // is rounds × |labels| of executor storage held for nothing
    import spark.implicits._
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val nodes = (0L until 400L).toDF("id")
    val edges = (0L until 399L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = ConnectedComponents.run(nodes, edges)
    out.collect().length shouldBe 400
    // left alive: the symmetric edge list + the final round's labels
    // (still feeding `out`) — NOT one table per round
    spark.sparkContext.getPersistentRDDs.size should be <= 3
  }

  test("random graphs match a union-find reference") {
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { trial =>
      val n = 150
      val nodes = (0L until n.toLong)
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = nodes.map(i => i -> {
        // component representative = min node id in the component
        nodes.filter(j => find(j.toInt) == find(i.toInt)).min
      }).toMap
      withClue(s"trial $trial: ") {
        labelsOf(nodes, edges) shouldBe expected
      }
    }
  }

  test("reliable checkpoint mode yields identical labels and writes rounds") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cc-ckpt").toString
    try {
      val nodes = (0L until 500L).toDF("id")
      val edges = (0L until 499L).map(i => (i, i + 1)).toDF("src", "dst")
      val out = ConnectedComponents.run(nodes, edges,
        checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      out.values.toSet shouldBe Set(0L)
      out.size shouldBe 500
      // rounds really went through the reliable store, not executor RAM
      def rddFiles(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(rddFiles).sum
        else if (f.getName.startsWith("part-")) 1 else 0
      rddFiles(new java.io.File(dir)) should be > 0
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("a 20k-node chain converges within the O(log diameter) budget") {
    // diameter 20000: plain min-propagation needs ~20000 rounds;
    // pointer jumping must land well under 2·log2(20000) ≈ 29
    val nodes = (0L until 20000L)
    val edges = (0L until 19999L).map(i => (i, i + 1))
    val labels = labelsOf(nodes, edges, maxIter = 29)
    labels.values.toSet shouldBe Set(0L)
    labels.size shouldBe 20000
  }
}
