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

  // Hilbert walk: a bijection onto [0, 4^bits) whose consecutive
  // positions are 4-adjacent — checked against an independent
  // per-point reimplementation AND structurally on random cells
  private def refHilbert(x0: Long, y0: Long, bits: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  property("hilbert kernel == independent walk; masks out-of-range input") =
    Prop.forAll(
      Gen.chooseNum(2, 16), Gen.chooseNum(0L, (1L << 16) - 1),
      Gen.chooseNum(0L, (1L << 16) - 1)) { (bits, x, y) =>
      val mask = (1L << bits) - 1
      QuantizedDot.hilbert2dEval(x, y, bits) ==
        refHilbert(x & mask, y & mask, bits) &&
      QuantizedDot.hilbert2dEval(x & mask, y & mask, bits) ==
        QuantizedDot.hilbert2dEval(x | (1L << bits), y, bits)
    }

  property("sq8 decode error stays within one quantization step") =
    Prop.forAll(Gen.listOfN(16, Gen.chooseNum(-1f, 1f))) { vs =>
      val m = vs.map(QuantizedDot.q)
      val maxabs = math.max(1L, m.map(math.abs).max)
      m.forall { v =>
        val c = math.floor((v + maxabs) * 255.0 / (maxabs * 2)).toLong
        val dec = c * 2 * maxabs / 255 - maxabs
        math.abs(dec - v) <= 2 * maxabs / 255 + 1 && c >= 0 && c <= 255
      }
    }

  property("pq cells kernel == per-component sign walk") =
    Prop.forAll(Gen.listOfN(16, Gen.chooseNum(-1f, 1f))) { vs =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val arr = new GenericArrayData(vs.toArray[Any])
      val got = QuantizedDot.pqCellsEval(arr, 2, 8)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray.toSeq
      val want = (0 until 2).map { j =>
        (0 until 8).foldLeft(0L) { (acc, p) =>
          if (QuantizedDot.q(vs(j * 8 + p)) >= 0) acc | (1L << p) else acc
        }
      }
      got == want
    }

  property("filterOutSpans == brute-force positional reference") =
    Prop.forAll(
      Gen.listOfN(12, Gen.alphaStr.map(_.take(3))),
      Gen.listOf(Gen.chooseNum(1L, 12L)), Gen.chooseNum(2, 5)) { (toks, starts, k) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.unsafe.types.UTF8String
      val sorted = starts.distinct.sorted
      val got = graft.functions.SignatureKernels.filterOutSpans(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any]),
        new GenericArrayData(sorted.toArray[Any].map(_.asInstanceOf[Any])), k).toString
      val covered = sorted.flatMap(s => s until s + k).toSet
      val want = toks.zipWithIndex.collect {
        case (t, i) if !covered(i + 1L) => t
      }.mkString(" ")
      got == want
    }

  property("centered ssd is offset-invariant, symmetric, zero on same shape") =
    Prop.forAll(
      Gen.listOfN(6, Gen.chooseNum(-1000L, 1000L)),
      Gen.listOfN(6, Gen.chooseNum(-1000L, 1000L)),
      Gen.chooseNum(-5000L, 5000L)) { (a, b, c) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      def arr(xs: List[Long]) = new GenericArrayData(xs.toArray)
      val qd = QuantizedDot
      qd.centeredSsdEval(arr(a), arr(b), 6) ==
        qd.centeredSsdEval(arr(a.map(_ + c)), arr(b), 6) &&
      qd.centeredSsdEval(arr(a), arr(b), 6) ==
        qd.centeredSsdEval(arr(b), arr(a), 6) &&
      qd.centeredSsdEval(arr(a), arr(a.map(_ + c)), 6) == 0L
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
