package graft

import org.scalatest.funsuite.AnyFunSuite

/** The control-arm drift machinery (r17) is what adjudicates every
  * future degraded-window flag — pure functions, pinned like the
  * fold guard in BenchFoldSpec. */
class BenchDriftSpec extends AnyFunSuite {

  test("stationDrift: median control ratio vs baseline, missing entries skip") {
    val base = Map("c1" -> 1.0, "c2" -> 2.0, "c3" -> 0.5)
    // ratios: 2.0, 1.5, 4.0 -> median 2.0
    val d = Bench.stationDrift(
      Seq("c1" -> 2.0, "c2" -> 3.0, "c3" -> 2.0), base)
    assert(d === 2.0)
    // a control without a baseline entry contributes nothing
    val d2 = Bench.stationDrift(
      Seq("c1" -> 1.5, "unknown" -> 99.0), base)
    assert(d2 === 1.5)
    // no computable control -> -1 (no gate baseline, no drift)
    assert(Bench.stationDrift(Seq("unknown" -> 1.0), base) === -1.0)
    assert(Bench.stationDrift(Seq.empty, base) === -1.0)
  }

  test("stationDrift: tiny baselines clamp at 0.05 like the gate") {
    // baseline 0.001 would make a 0.1 s pass read as 100x; the gate
    // clamps the denominator at 0.05 and so does the drift
    val d = Bench.stationDrift(Seq("c" -> 0.1), Map("c" -> 0.001))
    assert(d === 2.0)
  }

  test("driftAt: nearest computable station wins, none -> -1") {
    val st = Seq((0.0, 1.2), (50.0, -1.0), (100.0, 3.0))
    assert(Bench.driftAt(st, 10.0) === 1.2)
    // station @50 could not compute -> falls through to the nearest
    // COMPUTABLE one (100 is 10 closer than 0 from t0=60)
    assert(Bench.driftAt(st, 60.0) === 3.0)
    assert(Bench.driftAt(st, 99.0) === 3.0)
    assert(Bench.driftAt(Seq((0.0, -1.0)), 5.0) === -1.0)
    assert(Bench.driftAt(Seq.empty, 5.0) === -1.0)
  }

  test("driftNormalized: degraded window divides, fast window never amplifies") {
    assert(Bench.driftNormalized(3.0, 2.0) === 1.5)
    // drift below 1 (window FASTER than baseline) must not inflate
    // the flag: 3.0 / 0.5 = 6.0 would manufacture regressions
    assert(Bench.driftNormalized(3.0, 0.5) === 3.0)
    // missing drift normalizes nothing
    assert(Bench.driftNormalized(3.0, -1.0) === 3.0)
    assert(Bench.driftNormalized(3.0, 1.0) === 3.0)
  }

  test("familyDrift: window-normalized geometric mean per family") {
    // controls moved 1.5x record-to-record (the window shift);
    // family A moved 1.5x too -> normalized 1.0 (no drift);
    // family B moved 3.0x -> normalized 2.0 (real creep)
    val prev = Map("c1" -> 1.0, "c2" -> 1.0,
      "a1" -> 2.0, "a2" -> 4.0, "b1" -> 1.0)
    val cur = Map("c1" -> 1.5, "c2" -> 1.5,
      "a1" -> 3.0, "a2" -> 6.0, "b1" -> 3.0)
    val (norm, fams) = Bench.familyDrift(prev, cur,
      Map("A" -> Seq("a1", "a2"), "B" -> Seq("b1")),
      controls = Seq("c1", "c2"))
    assert(norm === 1.5)
    val m = fams.map(f => f._1 -> f).toMap
    assert(math.abs(m("A")._2 - 1.0) < 1e-9 && m("A")._3 === 2)
    assert(math.abs(m("B")._2 - 2.0) < 1e-9 && m("B")._3 === 1)
  }

  test("familyDrift: queries absent from either record drop out; empty family drops") {
    val (norm, fams) = Bench.familyDrift(
      Map("a1" -> 1.0), Map("a1" -> 2.0, "a2" -> 9.0),
      Map("A" -> Seq("a1", "a2"), "GONE" -> Seq("x")),
      controls = Seq("nope"))
    // no control present in both -> normalizer 1.0 (raw ratios)
    assert(norm === 1.0)
    assert(fams.map(_._1) === Seq("A"))
    assert(fams.head._2 === 2.0 && fams.head._3 === 1)
  }

  test("rebaseBaseline: named queries take the run's median UP, rest still fold") {
    val bMed = Map("q176" -> 2.29, "q10" -> 0.50)
    val bAlloc = Map("q176" -> 1000.0, "q10" -> 100.0)
    val runMed = Map("q176" -> 3.20, "q10" -> 0.45)
    val runAlloc = Map("q176" -> 1100.0, "q10" -> 90.0)
    val (m, a) = Bench.rebaseBaseline(bMed, bAlloc, runMed, runAlloc,
      names = Set("q176"))
    // q176 rebases UP to the reproducible number, alloc follows
    assert(m("q176") === 3.20 && a("q176") === 1100.0)
    // everything else keeps the fold's min semantics
    assert(m("q10") === 0.45 && a("q10") === 90.0)
    // a named query absent from the run keeps its record (no wipe)
    val (m2, _) = Bench.rebaseBaseline(bMed, bAlloc,
      Map("q10" -> 0.45), Map("q10" -> 90.0), names = Set("q176"))
    assert(m2("q176") === 2.29)
  }
}
