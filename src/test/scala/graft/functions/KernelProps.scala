package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the round-11 scalar kernels (pure local —
  * no SparkSession; thousands of adversarial cases run cheaply).
  */
object KernelProps extends Properties("Kernels") {

  // ── DotSegmentFold: kernel == the declarative regex chain ──────────
  // The kernel's whole claim is bit-equality with DotSegmentFold.Folds
  // applied Depth times via java replaceAll — the exact semantics the
  // DuckDB oracle chain replays. Generate URL-shaped strings dense in
  // the fast-path and fold triggers ("/.", "/..", "...", query/frag
  // boundaries) and check equality against a direct re-implementation
  // of the chain (no fast paths, no early exit).
  private val seg: Gen[String] = Gen.frequency(
    4 -> Gen.oneOf("a", "bb", "page7", "x-y_z"),
    2 -> Gen.oneOf(".", "..", "...", ".a", "..b", "a.b"),
    1 -> Gen.oneOf("", "%2e", "~"))
  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http://h.io", "https://ex.org:8080", "ftp://f", "")
    n <- Gen.choose(0, 8)
    segs <- Gen.listOfN(n, seg)
    tail <- Gen.oneOf("", "/", "?q=/a/../b", "#f/./g", "?x=1")
  } yield scheme + segs.map("/" + _).mkString + tail

  private val compiled =
    DotSegmentFold.Folds.map { case (p, r) => (p.r.pattern, r) }

  private def chain(s: String): String =
    (1 to DotSegmentFold.Depth).foldLeft(s) { (u, _) =>
      compiled.foldLeft(u) { case (c, (p, r)) =>
        p.matcher(c).replaceAll(r)
      }
    }

  property("DotSegmentFold.fold == the depth-8 declarative chain on URL-shaped input") =
    forAll(genUrl) { u =>
      DotSegmentFold.fold(UTF8String.fromString(u)).toString == chain(u)
    }

  property("DotSegmentFold is idempotent up to Depth-8 residue") =
    forAll(genUrl) { u =>
      // fold's fixpoint contract: folding a folded url changes nothing
      // UNLESS the input stacked more than Depth nesting levels (the
      // documented visible residue) — on ≤8-segment inputs, never
      val once = DotSegmentFold.fold(UTF8String.fromString(u)).toString
      DotSegmentFold.fold(UTF8String.fromString(once)).toString == once ||
        u.sliding(3).count(_ == "/..") > DotSegmentFold.Depth
    }

  // ── SimpleLower: the Unicode simple map, idempotent ────────────────
  // pieces are whole STRINGS (never lone chars) so supplementary-plane
  // codepoints keep their surrogate pairs intact
  private val genText: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf("İ", "Σ", "ς", "σ", "Ş", "É", "é", "Д", "д", "ß"),
    1 -> Gen.oneOf(" ", "!", "@"),
    // supplementary plane: Deseret capital/small (simple-mapped pair)
    1 -> Gen.oneOf("𐐀", "𐐨"))
  ).map(_.mkString)

  property("SimpleLower == per-codepoint Character.toLowerCase") =
    forAll(genText) { s =>
      val got = SimpleLower.lower(UTF8String.fromString(s)).toString
      val want = {
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          sb.appendCodePoint(Character.toLowerCase(cp))
          i += Character.charCount(cp)
        }
        sb.toString
      }
      got == want
    }

  property("SimpleLower is idempotent") =
    forAll(genText) { s =>
      val once = SimpleLower.lower(UTF8String.fromString(s))
      SimpleLower.lower(once).toString == once.toString
    }

  // ── IdnHostAscii: ASCII identity ───────────────────────────────────
  // the kernel's fast path contract: any all-ASCII input (host ASCII
  // or no scheme at all) passes through as the SAME UTF8String —
  // whatever shape the rest of the URL is in
  private val genAsciiUrl: Gen[String] = for {
    scheme <- Gen.oneOf("https://", "http://", "", "notaurl ")
    host <- Gen.oneOf("h.io", "xn--bcher-kva.de", "a:8080", "u@h.io", "")
    rest <- Gen.oneOf("", "/p?q=@x", "/bücher", "#f@g")
  } yield scheme + host + rest

  property("IdnHostAscii is identity when the HOST is ASCII (unicode path/query untouched)") =
    forAll(genAsciiUrl) { u =>
      IdnHostAscii.fold(UTF8String.fromString(u)).toString == u
    }

  property("SimpleLower preserves codepoint count (simple map is 1:1, never an expansion)") =
    forAll(genText) { s =>
      val lowered = SimpleLower.lower(UTF8String.fromString(s)).toString
      lowered.codePointCount(0, lowered.length) ==
        s.codePointCount(0, s.length)
    }
}
