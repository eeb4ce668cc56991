package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DnaOps, TextKernelOps}
import org.apache.spark.unsafe.types.UTF8String

/** Property-based checks of the scalar kernels (pure JVM, no Spark). */
class KernelPropertySpec extends AnyFunSuite {

  private def holds(p: Prop): Boolean =
    SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p).passed

  private val dnaGen: Gen[String] =
    Gen.listOf(Gen.oneOf('A', 'C', 'G', 'T', 'a', 'c', 'g', 't', 'N'))
      .map(_.mkString)

  test("reverse complement is an involution (modulo case)") {
    assert(holds(Prop.forAll(dnaGen) { s =>
      val rc = DnaOps.reverseComplement(UTF8String.fromString(s)).toString
      DnaOps.reverseComplement(UTF8String.fromString(rc)).toString ==
        s.toUpperCase
    }))
  }

  test("translate emits exactly len/3 residues and X only for N codons") {
    assert(holds(Prop.forAll(dnaGen) { s =>
      val aa = DnaOps.translate(UTF8String.fromString(s)).toString
      aa.length == s.length / 3 &&
        aa.zipWithIndex.forall { case (c, i) =>
          val codon = s.substring(3 * i, 3 * i + 3).toUpperCase
          (c == 'X') == codon.exists(ch => !"ACGT".contains(ch))
        }
    }))
  }

  private val textGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.alphaLowerChar, 2 -> Gen.const(' '), 1 -> Gen.const('\t'),
      1 -> Gen.oneOf('.', ',', '!', 'Z'))).map(_.mkString)

  test("normText is idempotent and matches the regex formulation") {
    assert(holds(Prop.forAll(textGen) { s =>
      val k = TextKernelOps.normText(UTF8String.fromString(s)).toString
      val ref = s.trim.toLowerCase.replaceAll("\\s+", " ")
      k == ref &&
        TextKernelOps.normText(UTF8String.fromString(k)).toString == k
    }))
  }

  test("countWord matches the regex length-difference formula") {
    val wordGen = Gen.oneOf("the", "and", "der", "a")
    assert(holds(Prop.forAll(textGen, wordGen) { (s, w) =>
      val k = TextKernelOps.countWord(UTF8String.fromString(s), w)
      val removed = s.replaceAll(s"\\b$w\\b", "")
      k == (s.length - removed.length) / w.length
    }))
  }

  test("shingles are distinct, length-n substrings") {
    assert(holds(Prop.forAll(textGen, Gen.choose(2, 5)) { (s, n) =>
      val arr = graft.functions.ShingleOps
        .shingles(UTF8String.fromString(s), n)
      val out = (0 until arr.numElements())
        .map(i => arr.getUTF8String(i).toString)
      out.forall(_.length == n) &&
        out.distinct == out &&
        out.toSet == (if (s.length < n) Set.empty
          else s.sliding(n).toSet)
    }))
  }
}
