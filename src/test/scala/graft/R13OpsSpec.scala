package graft

import graft.functions.HashImpls
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 kernel laws: the TokenWindowHashes Rabin-Karp kernel that
  * replaces per-window md5 in the stride-1 ExactSubstr ops. */
class R13OpsSpec extends AnyFunSuite {
  private def arr(toks: String*): ArrayData =
    ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray)

  /** O(w)-per-position reference: direct polynomial, no rolling. */
  private def direct(toks: Seq[String], w: Int): Seq[Long] = {
    val B = 1099511628211L
    val th = toks.map(t => HashImpls.md5Hash64(UTF8String.fromString(t)))
    (0 to toks.length - w).map { i =>
      th.slice(i, i + w).foldLeft(0L)((h, x) => h * B + x)
    }
  }

  test("rolling window hashes equal the direct polynomial at every position") {
    val toks = (1 to 100).map(i => s"tok${i % 17}_${i % 7}")
    for (w <- Seq(2, 5, 20)) {
      val got = HashImpls.windowHashes(arr(toks: _*), w).toLongArray().toSeq
      assert(got === direct(toks, w), s"w=$w")
    }
  }

  test("equal token sequences hash equal; a one-token change at any offset differs") {
    val base = (1 to 30).map(i => s"w$i")
    val w = 20
    val h1 = HashImpls.windowHashes(arr(base: _*), w).toLongArray()
    val h2 = HashImpls.windowHashes(arr(base: _*), w).toLongArray()
    assert(h1.toSeq === h2.toSeq)
    for (k <- base.indices) {
      val mutated = base.updated(k, "CHANGED")
      val hm = HashImpls.windowHashes(arr(mutated: _*), w).toLongArray()
      for (i <- hm.indices) {
        val covers = k >= i && k < i + w
        assert((hm(i) != h1(i)) === covers, s"mutation at $k, window $i")
      }
    }
  }

  test("31-fold-colliding tokens (Aa/BB) do NOT collide through md5Hash64") {
    // rollingHash("Aa") == rollingHash("BB") — the java-hashCode-style
    // collision class that forced the per-token hash to be md5
    assert(HashImpls.rollingHash(UTF8String.fromString("Aa"))
      === HashImpls.rollingHash(UTF8String.fromString("BB")))
    assert(HashImpls.md5Hash64(UTF8String.fromString("Aa"))
      !== HashImpls.md5Hash64(UTF8String.fromString("BB")))
    // and the window kernel therefore separates the two sequences
    val a = HashImpls.windowHashes(arr("x", "Aa", "y"), 3).toLongArray()
    val b = HashImpls.windowHashes(arr("x", "BB", "y"), 3).toLongArray()
    assert(a(0) !== b(0))
  }

  test("short input yields an empty hash array (no windows)") {
    assert(HashImpls.windowHashes(arr("a", "b"), 20).numElements() === 0)
    assert(HashImpls.windowHashes(arr(), 20).numElements() === 0)
    // exactly one window at n == w
    assert(HashImpls.windowHashes(arr((1 to 20).map(_.toString): _*), 20)
      .numElements() === 1)
  }
}
