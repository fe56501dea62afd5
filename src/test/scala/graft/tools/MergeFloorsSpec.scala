package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The floors-merge policy on doctored artifacts: min floors,
  * material-swing cross-window widening, sub-second noise ignored,
  * never-clean queries preserved as ungated. */
class MergeFloorsSpec extends AnyFunSuite {

  test("merge: min floors; cross-window ratio only on material swings; in-run bands kept; never-clean stays -1") {
    val w1 = (Map("q_heavy" -> 4.0, "q_tiny" -> 0.2, "q_mid" -> 2.0,
      "q_err" -> -1.0), Map("q_heavy" -> 1.3))
    val w2 = (Map("q_heavy" -> 8.6, "q_tiny" -> 0.6, "q_mid" -> 2.4,
      "q_err" -> -1.0), Map("q_mid" -> 1.4))
    val m = MergeFloors.merge(Seq(w1, w2))

    // floors are the cross-window min
    assert(m.floors("q_heavy") == 4.0 && m.floors("q_tiny") == 0.2 &&
      m.floors("q_mid") == 2.0)
    // heavy: 4.0 -> 8.6 is material (floor >= 1s, delta >= 0.75s):
    // spread becomes the 2.15 cross-window envelope, beating the 1.3
    // in-run band
    assert(math.abs(m.spread("q_heavy") - 8.6 / 4.0) < 1e-9)
    // tiny: a 3x swing on a 0.2s floor is scheduler noise, NOT a
    // band — the gate's global factor + absolute grace own it
    assert(m.spread("q_tiny") == 1.0)
    // mid: delta 0.4s < 0.75s -> immaterial; the recorded in-run
    // band survives
    assert(m.spread("q_mid") == 1.4)
    // a query that never ran clean stays ungated (-1 floor)
    assert(m.floors("q_err") == -1.0 && m.spread("q_err") == 1.0)

    // merging is cumulative: folding the merged result in as a
    // prior window never loses the envelope
    val again = MergeFloors.merge(Seq((m.floors, m.spread),
      (Map("q_heavy" -> 5.0), Map.empty[String, Double])))
    assert(again.floors("q_heavy") == 4.0)
    assert(math.abs(again.spread("q_heavy") - 8.6 / 4.0) < 1e-9)
  }
}
