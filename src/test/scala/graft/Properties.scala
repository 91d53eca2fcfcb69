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
}
