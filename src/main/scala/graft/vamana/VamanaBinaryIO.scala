package graft.vamana

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Byte-compatible import/export of the reference's single binary index file
  * (SaveIndex / load-constructor, vamana.h:390-424 / 55-96; SURVEY.md
  * Appendix B):
  *
  * {{{
  * header : u32 n | u32 dim | u32 R | u32 L | f32 alpha | u32 medoid
  * points : n × ( f32[dim] vec | u32 external_id )
  * graph  : n × ( u32 degree | u32[degree] neighbor_internal_ids )
  * }}}
  *
  * Little-endian, no magic/version/checksum. This is the migration path for
  * a reference user holding an existing `index.bin`: import once, then serve
  * (or re-save as parquet / fanout shards). The file is inherently a
  * single-node artifact — the reference builds it in one process — so a
  * driver-local read is the honest scale posture; beyond-broadcast models
  * never come FROM this format.
  *
  * Two deliberate divergences from the reference, both documented bugs:
  *  - `efSearch` is not in the file (vamana.h:397-405 never writes it; the
  *    load constructor leaves it uninitialized, SURVEY.md A.1) — the caller
  *    supplies it here instead of inheriting uninitialized memory.
  *  - export refuses an empty index instead of crashing on `points_[0]`
  *    (vamana.h:399, SURVEY.md A.6).
  */
object VamanaBinaryIO {

  def importIndex(path: String, efSearch: Int = 128, seed: Long = 42L): LocalIndex = {
    val buf = ByteBuffer.wrap(Files.readAllBytes(Paths.get(path))).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt
    val dim = buf.getInt
    val r = buf.getInt
    val l = buf.getInt
    val alpha = buf.getFloat
    val medoid = buf.getInt
    require(n > 0 && dim > 0, s"corrupt header: n=$n dim=$dim")
    val points = new Array[Array[Float]](n)
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = new Array[Float](dim)
      var j = 0
      while (j < dim) { v(j) = buf.getFloat; j += 1 }
      points(i) = v
      ids(i) = buf.getInt.toLong & 0xFFFFFFFFL // u32 external id
      i += 1
    }
    val graph = new Array[Array[Int]](n)
    i = 0
    while (i < n) {
      val deg = buf.getInt
      val nbrs = new Array[Int](deg)
      var j = 0
      while (j < deg) { nbrs(j) = buf.getInt; j += 1 }
      graph(i) = nbrs
      i += 1
    }
    require(!buf.hasRemaining,
      s"trailing bytes after graph section (${buf.remaining()} left) — layout drift")
    val params = VamanaParams(dim = dim, maxDegree = r, beamWidth = l, alpha = alpha,
      efSearch = efSearch, seed = seed, metric = "l2")
    new LocalIndex(ids, points, graph, medoid, params)
  }

  def exportIndex(index: LocalIndex, path: String): Unit = {
    require(index.size > 0, "refusing to export an empty index (reference crashes here)")
    // the file format stores external ids as u32 — silently truncating a
    // Long id (60-bit md5 surrogates are in active use upstream) would
    // write aliased ids that a small-id roundtrip test can never catch
    require(index.ids.forall(id => id >= 0 && id <= 0xFFFFFFFFL),
      "external ids must fit u32 for the reference binary format")
    val p = index.params
    val nBytes = 24 +
      index.size * (p.dim * 4 + 4) +
      index.graph.map(g => 4 + g.length * 4).sum
    val buf = ByteBuffer.allocate(nBytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(index.size).putInt(p.dim).putInt(p.maxDegree).putInt(p.beamWidth)
    buf.putFloat(p.alpha).putInt(index.medoid)
    var i = 0
    while (i < index.size) {
      val v = index.points(i)
      var j = 0
      while (j < v.length) { buf.putFloat(v(j)); j += 1 }
      buf.putInt(index.ids(i).toInt) // u32 external id
      i += 1
    }
    i = 0
    while (i < index.size) {
      val g = index.graph(i)
      buf.putInt(g.length)
      var j = 0
      while (j < g.length) { buf.putInt(g(j)); j += 1 }
      i += 1
    }
    Files.write(Paths.get(path), buf.array())
  }
}
