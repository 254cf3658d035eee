package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, XXH64}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CharGramHashes, OrderedPairs, WinnowFingerprints, WordShingleHashes}

/** ScalaCheck property tests over the PURE native-expression kernels —
  * no SparkSession, so hundreds of random cases run in milliseconds.
  * Example-based twins (bit-parity vs composed built-ins, oracle parity)
  * live in FunctionsSuite; these pin the algebraic contracts the dedup
  * block builds on for ARBITRARY inputs.
  */
class KernelPropertySuite extends AnyFunSuite {

  /** Run a scalacheck property with a fixed seed budget and fail the
    * ScalaTest case with the counterexample on any falsification. */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val ref = BoundReference(0, org.apache.spark.sql.types.StringType, true)

  private def wordShingles(text: String, n: Int): Seq[Long] =
    WordShingleHashes(ref, n).kernel(UTF8String.fromString(text))
      .toLongArray().toSeq

  private def charGrams(text: String, n: Int): Seq[Long] =
    CharGramHashes(ref, n).kernel(UTF8String.fromString(text))
      .toLongArray().toSeq

  private def winnow(text: String, k: Int, w: Int): Set[Long] =
    WinnowFingerprints(ref, k, w).kernel(UTF8String.fromString(text))
      .toLongArray().toSet

  private val token: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val doc: Gen[String] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))

  test("word_shingle_hashes: count, determinism, and content addressing") {
    check(Prop.forAll(doc, Gen.choose(1, 5)) { (text, n) =>
      val tokens = text.split(" ", -1).toSeq // split keeps empties — same contract
      val hs = wordShingles(text, n)
      val expectCount = math.max(0, tokens.length - n + 1)
      assert(hs.length == (if (text.isEmpty) math.max(0, 1 - n + 1) else expectCount))
      // content addressing: hash i equals xxhash64 of the joined shingle
      hs.zipWithIndex.foreach { case (h, i) =>
        val shingle = tokens.slice(i, i + n).mkString(" ")
        val u = UTF8String.fromString(shingle)
        assert(h == XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L),
          s"shingle $i of '$text' (n=$n)")
      }
      true
    })
  }

  test("char_gram_hashes: a shared n-char substring hashes identically anywhere") {
    check(Prop.forAll(doc, doc, token, Gen.choose(1, 4)) { (a, b, mid, n) =>
      (mid.length >= n) ==> {
        // plant the same substring into two different contexts
        val left = a + mid + b
        val right = b + mid + a
        val shared = charGrams(mid, n).toSet
        assert(shared.subsetOf(charGrams(left, n).toSet),
          s"grams of '$mid' missing from '$left'")
        assert(shared.subsetOf(charGrams(right, n).toSet))
        true
      }
    })
  }

  test("winnowing guarantee: docs sharing a substring of length >= k+w-1 share a print") {
    val k = 8; val w = 4
    check(Prop.forAll(doc, doc, Gen.stringOfN(k + w - 1, Gen.alphaLowerChar)) { (a, b, common) =>
      val da = a + common + b
      val db = b.reverse + common + a.reverse
      val (fa, fb) = (winnow(da, k, w), winnow(db, k, w))
      assert(fa.intersect(fb).nonEmpty,
        s"no shared print despite common '$common' in '$da' / '$db'")
      true
    })
  }

  test("ordered_pairs kernel: count, ordering, and completeness") {
    val op = OrderedPairs(BoundReference(0,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType), true))
    check(Prop.forAll(Gen.listOf(Gen.choose(-1000L, 1000L)).map(_.distinct.sorted)) { ids =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(ids.toArray)
      val out = op.kernel(arr)
      val m = ids.length
      assert(out.numElements() == m * (m - 1) / 2)
      val pairs = (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
      // completeness + orderedness for SORTED input
      assert(pairs.toSet == (for {
        i <- ids.indices; j <- (i + 1) until m
      } yield (ids(i), ids(j))).toSet)
      pairs.foreach { case (x, y) => assert(x < y) }
      true
    })
  }
}
