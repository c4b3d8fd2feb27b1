package graft.stats

import java.util.Base64

import scala.util.hashing.MurmurHash3

/** Fixed-size categorical bloom filter for manifest-level string pruning
  * (vecgo `internal/manifest/bloom.go:33-230`): min/max bounds prune
  * out-of-range lookups, but a MID-range miss (value between min and max,
  * absent from the segment) needs membership bits.
  *
  * Shape: 32768 bits (4 KB, ~5.5 KB base64 in the manifest JSON), 7
  * probes by double hashing two murmur3 seeds — ≤ 4096 distinct values
  * gives fpr ≈ 2%. Built only for columns whose approx NDV is under
  * [[MaxNdv]]; high-cardinality columns carry no bloom (a saturated bloom
  * prunes nothing and wastes manifest bytes).
  */
object CatBloom {
  val NumBits = 1 << 15
  val NumHash = 7
  val MaxNdv = 4096L
  private val Words = NumBits / 64

  private def probes(v: String): Iterator[Int] = {
    val h1 = MurmurHash3.stringHash(v, 0x9747b28c)
    val h2 = MurmurHash3.stringHash(v, 0x5bd1e995) | 1 // odd → full cycle
    (0 until NumHash).iterator.map { i =>
      math.floorMod(h1 + i * h2, NumBits)
    }
  }

  /** Build the base64 bloom from a distinct-value set. */
  def build(values: Iterable[String]): String = {
    val bits = new Array[Long](Words)
    values.foreach { v =>
      probes(v).foreach(b => bits(b >> 6) |= 1L << (b & 63))
    }
    val bb = java.nio.ByteBuffer.allocate(Words * 8)
    bits.foreach(bb.putLong)
    Base64.getEncoder.encodeToString(bb.array())
  }

  /** Membership probe: false ⇒ definitely absent (prunable). */
  def mightContain(b64: String, v: String): Boolean = {
    val bytes = Base64.getDecoder.decode(b64)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val bits = new Array[Long](Words)
    var i = 0
    while (i < Words) { bits(i) = bb.getLong; i += 1 }
    probes(v).forall(b => (bits(b >> 6) & (1L << (b & 63))) != 0)
  }
}
