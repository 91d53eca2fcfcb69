package graft

import graft.functions.QuantizedDot
import graft.tgraph.Vote
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based checks for the pure kernels (scalacheck's native sbt
  * runner; no Spark session needed).
  */
object GraftProperties extends Properties("graft") {

  private val votes = Gen.oneOf(Vote.Abort, Vote.Replay, Vote.Commit)

  property("vote merge is a commutative, associative, idempotent lattice") =
    Prop.forAll(votes, votes, votes) { (a, b, c) =>
      Vote.merge(a, b) == Vote.merge(b, a) &&
      Vote.merge(Vote.merge(a, b), c) == Vote.merge(a, Vote.merge(b, c)) &&
      Vote.merge(a, a) == a &&
      Vote.merge(a, Vote.Replay) == Vote.Replay && // REPLAY absorbs (reference matrix)
      Vote.merge(a, Vote.Commit) == a // COMMIT is identity
    }

  property("quantization matches BigDecimal HALF_UP (functions.round semantics)") =
    Prop.forAll(Gen.chooseNum(-1e6f, 1e6f)) { v =>
      val expected = new java.math.BigDecimal(v.toDouble * 1000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      QuantizedDot.q(v) == expected
    }

  property("quantized dot is symmetric and scales exactly") =
    Prop.forAll(Gen.chooseNum(-100f, 100f), Gen.chooseNum(-100f, 100f)) { (a, b) =>
      QuantizedDot.q(a) * QuantizedDot.q(b) == QuantizedDot.q(b) * QuantizedDot.q(a)
    }

  // independent reimplementation of the shingle-hash contract (JDK md5
  // + hex parse), checked against the kernel on arbitrary unicode
  // token lists — guards the UTF-8 byte path and the distinct/order
  // semantics beyond what the fixture-doc parity spec sees
  private def refShingleHashes(tokens: List[String], k: Int): Seq[Long] =
    if (tokens.length < k) Seq.empty
    else tokens.sliding(k).map(_.mkString(" ")).map { s =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 14), 16)
    }.toSeq.distinct

  private val token = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty),
    Gen.oneOf("日本語", "größe", "émile", "x", "", "ZERO WIDTH"))

  property("native normalize == JDK-regex trim/collapse/lower on arbitrary text") =
    Prop.forAll(Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', '\u000b', '\f', '\r'),
      Gen.oneOf('Ü', 'ß', '日', 'É')))) { chars =>
      import org.apache.spark.unsafe.types.UTF8String
      val s = chars.mkString
      // the declarative path: Spark trim (UTF8String.trim) then Java
      // regex \s+ -> " " then UTF8String.toLowerCase
      val trimmed = UTF8String.fromString(s).trim().toString
      val expected = UTF8String
        .fromString(trimmed.replaceAll("\\s+", " ")).toLowerCase.toString
      graft.functions.SignatureKernels
        .normalize(UTF8String.fromString(s)).toString == expected
    }

  property("native shingle hashes == independent JDK md5 reimplementation") =
    Prop.forAll(Gen.listOfN(8, token), Gen.chooseNum(1, 4)) { (tokens, k) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.unsafe.types.UTF8String
      val arr = new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])
      val got = graft.functions.SignatureKernels.shingleHashes56(arr, k)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray.toSeq
      got == refShingleHashes(tokens, k)
    }

  // the AVI container writer/parser pair: arbitrary frame payloads
  // (any bytes — the container is codec-agnostic), dims, frame counts
  // round-trip exactly, including odd-sized chunks (RIFF even padding)
  property("parseAvi inverts syntheticAvi for arbitrary frame payloads") =
    Prop.forAll(
      Gen.chooseNum(1, 2000), Gen.chooseNum(1, 2000),
      Gen.listOfN(5, Gen.chooseNum(0, 33).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))))) {
      (w: Int, h: Int, framesRaw: List[List[Byte]]) =>
        val frames = framesRaw.map(_.toArray).filter(_.nonEmpty)
        val avi = graft.operators.Multimodal.syntheticAvi(frames, w, h)
        val (pw, ph, parsed) = graft.operators.Multimodal.parseAvi(avi)
        pw == w && ph == h && parsed.length == frames.length &&
        parsed.zip(frames).forall { case (a, b) => a.sameElements(b) }
    }
}
