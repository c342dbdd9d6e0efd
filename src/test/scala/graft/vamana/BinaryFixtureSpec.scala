package graft.vamana

import org.scalatest.funsuite.AnyFunSuite

/** Byte-compat proof against a REAL reference-written `index.bin`.
  *
  * `src/test/resources/reference_index.bin` was produced by compiling the
  * reference header itself (g++ -fopenmp against /root/reference/index/
  * vamana.h) and running its own BuildIndex + SaveIndex (vamana.h:390-424)
  * over 100 deterministic 8-dim points — NOT by our exporter — so this spec
  * closes the interop claim: a reference user's existing index file loads,
  * serves, and re-exports byte-for-byte.
  *
  * Fixture recipe (regenerable): n=100, dim=8, R=8, L=32, alpha=1.2,
  * efSearch=64; point i component j = ((i*31 + j*17) % 97) / 8.0f (exactly
  * representable in float32); external id i = 1000 + 3i (non-contiguous, to
  * exercise the internal→external remap). The generating run reported
  * medoid=45 and, for query q: component j = ((q*13 + j*5) % 41) / 4.0f,
  * k=5 results:
  *   q0: (1000,125.375) (1291,125.375) (1216,125.5625) (1141,126.0) (1066,126.6875)
  *   q1: (1207,17.75) (1132,17.8125) (1057,18.125) (1066,18.375) (1273,18.6875)
  *   q2: (1042,24.546875) (1258,26.953125) (1183,29.609375) (1108,32.515625) (1033,35.671875)
  * Note q1: the reference's OWN ef=64 beam missed id 1282 at dist 17.9375
  * (true rank 3). That is not a beam-width artifact: BFS over the fixture's
  * adjacency shows the reference's build left 10 of 100 nodes UNREACHABLE
  * from the medoid (internal nodes 12,17,18,37,49,74,90,92,93,94 — its
  * random-init + prune pipeline gives no connectivity guarantee; our own
  * build carries `vamana_connectivity_gate` for exactly this reason). So
  * the exactness assertion below compares full-beam search against brute
  * force restricted to the REACHABLE component — the strongest true claim
  * on this graph — and pins the defect so a fixture regeneration that
  * changes connectivity is caught loudly.
  */
class BinaryFixtureSpec extends AnyFunSuite {

  private val fixturePath =
    getClass.getResource("/reference_index.bin").getPath

  private val N = 100
  private val Dim = 8

  private def point(i: Int): Array[Float] =
    Array.tabulate(Dim)(j => ((i * 31 + j * 17) % 97).toFloat / 8.0f)

  private def query(q: Int): Array[Float] =
    Array.tabulate(Dim)(j => ((q * 13 + j * 5) % 41).toFloat / 4.0f)

  private def exactTopK(qv: Array[Float], k: Int): Array[(Long, Float)] =
    Array.tabulate(N)(i => (1000L + 3 * i, VamanaKernel.l2sq(point(i), qv)))
      .sortBy { case (id, d) => (d, id) }.take(k)

  test("reference-written index.bin: header, ids, and points decode exactly") {
    val idx = VamanaBinaryIO.importIndex(fixturePath)
    assert(idx.size == N)
    assert(idx.params.dim == Dim)
    assert(idx.params.maxDegree == 8)
    assert(idx.params.beamWidth == 32)
    assert(idx.params.alpha == 1.2f)
    assert(idx.medoid == 45, "medoid recorded by the generating run")
    for (i <- 0 until N) {
      assert(idx.ids(i) == 1000L + 3 * i, s"external id remap at $i")
      assert(java.util.Arrays.equals(idx.points(i), point(i)),
        s"point $i must decode bit-identically to the generating formula")
      assert(idx.graph(i).nonEmpty && idx.graph(i).length <= idx.params.maxDegree,
        s"degree bound violated at node $i: ${idx.graph(i).length}")
      assert(idx.graph(i).forall(nb => nb >= 0 && nb < N && nb != i),
        s"neighbor ids at $i must be internal positions")
    }
  }

  test("exportIndex reproduces the reference-written file byte-for-byte") {
    val idx = VamanaBinaryIO.importIndex(fixturePath)
    val out = java.nio.file.Files.createTempFile("graft_binfix_", ".bin")
    try {
      VamanaBinaryIO.exportIndex(idx, out.toString)
      val expect = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fixturePath))
      val got = java.nio.file.Files.readAllBytes(out)
      assert(java.util.Arrays.equals(got, expect),
        s"byte drift: exported ${got.length} bytes vs reference ${expect.length}")
    } finally java.nio.file.Files.deleteIfExists(out)
  }

  test("full-beam search over the imported reference graph equals exact kNN — strands included") {
    // efSearch = n short-circuits to the exhaustive scan, so exactness holds
    // over ALL stored points — including the 10 nodes the reference's own
    // build disconnected (asserted below as the fixture's structural ground
    // truth): graph-traversal full beam would LOSE those, the kernel's
    // exhaustive full-beam regime serves them.
    val idx = VamanaBinaryIO.importIndex(fixturePath, efSearch = N)
    val reachable = {
      val seen = scala.collection.mutable.BitSet(idx.medoid)
      val stack = scala.collection.mutable.Stack(idx.medoid)
      while (stack.nonEmpty) {
        for (nb <- idx.graph(stack.pop()) if !seen(nb)) { seen += nb; stack.push(nb) }
      }
      seen
    }
    assert((0 until N).filterNot(reachable).map(i => 1000L + 3 * i) ==
      Seq(1036L, 1051, 1054, 1111, 1147, 1222, 1270, 1276, 1279, 1282),
      "the fixture's known connectivity defect changed — regenerate the ground truth")
    for (q <- 0 until 3) {
      val got = VamanaKernel.search(idx, query(q), 5)
      val exact = exactTopK(query(q), N).take(5)
      assert(got.map(_._2).toSeq == exact.map(_._2).toSeq,
        s"q$q distance profile: ${got.toSeq} vs ${exact.toSeq}")
      assert(got.map(_._1).toSet == exact.map(_._1).toSet,
        s"q$q id set: ${got.toSeq} vs ${exact.toSeq}")
    }
  }

  test("export -> import -> export roundtrips byte-identically on 20 random indexes") {
    // fuzz the LAYOUT, not just the one committed fixture: random n/dim/R,
    // ragged degrees (including empty adjacency rows), extreme float
    // payloads (negatives, subnormals via tiny values, exact powers of two)
    val rng = new scala.util.Random(0xb17e5L)
    for (trial <- 0 until 20) {
      val n = 1 + rng.nextInt(50)
      val dim = 1 + rng.nextInt(16)
      val r = 1 + rng.nextInt(8)
      val ids = Array.tabulate(n)(i => (rng.nextInt(Int.MaxValue).toLong * 2) % 0xFFFFFFFFL)
      val points = Array.fill(n)(Array.fill(dim)(
        (rng.nextFloat() - 0.5f) * math.pow(2.0, rng.nextInt(20) - 10).toFloat))
      val graph = Array.fill(n)(Array.fill(rng.nextInt(r + 1))(rng.nextInt(n)))
      val params = VamanaParams(dim = dim, maxDegree = r,
        beamWidth = 1 + rng.nextInt(64), alpha = 1.0f + rng.nextFloat(),
        efSearch = 8, seed = trial)
      val idx = new LocalIndex(ids, points, graph, rng.nextInt(n), params)
      val f1 = java.nio.file.Files.createTempFile(s"graft_binfuzz_${trial}_a", ".bin")
      val f2 = java.nio.file.Files.createTempFile(s"graft_binfuzz_${trial}_b", ".bin")
      try {
        VamanaBinaryIO.exportIndex(idx, f1.toString)
        val back = VamanaBinaryIO.importIndex(f1.toString,
          efSearch = params.efSearch, seed = params.seed)
        assert(back.size == n && back.medoid == idx.medoid, s"trial $trial header")
        for (i <- 0 until n) {
          assert(back.ids(i) == ids(i), s"trial $trial id $i")
          // float compare as raw bits: NaN payloads and -0.0 must survive
          assert(back.points(i).map(java.lang.Float.floatToRawIntBits).toSeq ==
            points(i).map(java.lang.Float.floatToRawIntBits).toSeq, s"trial $trial vec $i")
          assert(back.graph(i).toSeq == graph(i).toSeq, s"trial $trial adj $i")
        }
        VamanaBinaryIO.exportIndex(back, f2.toString)
        assert(java.util.Arrays.equals(
          java.nio.file.Files.readAllBytes(f1), java.nio.file.Files.readAllBytes(f2)),
          s"trial $trial byte drift on re-export")
      } finally {
        java.nio.file.Files.deleteIfExists(f1)
        java.nio.file.Files.deleteIfExists(f2)
      }
    }
  }

  test("default-beam search on the imported graph meets the reference's own recall gate") {
    // main.go:131-148 gates recall >= 0.8 at ef=64-class settings; our beam
    // over the REFERENCE-built graph must clear the same bar.
    val idx = VamanaBinaryIO.importIndex(fixturePath, efSearch = 64)
    val recalls = (0 until 3).map { q =>
      val got = VamanaKernel.search(idx, query(q), 5).map(_._1).toSet
      val exact = exactTopK(query(q), 5).map(_._1).toSet
      got.intersect(exact).size.toDouble / 5
    }
    assert(recalls.forall(_ >= 0.8), s"per-query recall@5 $recalls below 0.8")
  }
}
