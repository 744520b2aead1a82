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

  test("familyDrift: members normalize by their NEAREST STATION's drift (r17 #1)") {
    // this round's own artifact as the fixture: run-global control
    // median 1.0 (controls ran in healthy stretches) while the graph
    // family's queries landed inside a 3x degraded stretch. The old
    // normalizer divided by 1.0 and flagged the family at 3.0x; the
    // per-station normalizer corrects each member by the stretch it
    // actually ran in and the family reads 1.0.
    val prev = Map("c1" -> 1.0, "c2" -> 1.0, "g1" -> 2.0, "g2" -> 2.0)
    val cur = Map("c1" -> 1.0, "c2" -> 1.0, "g1" -> 6.0, "g2" -> 6.0)
    val driftOf: String => Double =
      Map("g1" -> 3.0, "g2" -> 3.0).withDefaultValue(-1.0)
    val (norm, fams) = Bench.familyDrift(prev, cur,
      Map("graph" -> Seq("g1", "g2")), controls = Seq("c1", "c2"), driftOf)
    assert(norm === 1.0)
    assert(math.abs(fams.head._2 - 1.0) < 1e-9,
      s"per-station normalization should clear the stretch: $fams")
    // without the per-station drift the same numbers flag at 3x —
    // the exact false positive this fixes
    val (_, old) = Bench.familyDrift(prev, cur,
      Map("graph" -> Seq("g1", "g2")), controls = Seq("c1", "c2"))
    assert(math.abs(old.head._2 - 3.0) < 1e-9)
    // a member with no computable station drift falls back to the
    // run-global normalizer; a FAST window (drift < 1) never deflates
    val (_, mixed) = Bench.familyDrift(
      Map("c1" -> 1.0, "m1" -> 1.0, "m2" -> 1.0),
      Map("c1" -> 2.0, "m1" -> 4.0, "m2" -> 4.0),
      Map("F" -> Seq("m1", "m2")), controls = Seq("c1"),
      Map("m1" -> 0.5).withDefaultValue(-1.0))
    // m1: drift 0.5 <= 1 -> raw 4.0; m2: no drift -> 4.0 / norm 2.0
    assert(math.abs(mixed.head._2 - math.sqrt(4.0 * 2.0)) < 1e-9)
  }

  test("adjudicateFlag: rerun outcome survives the label; rerun-window drift consulted") {
    // rerun back inside the gate: cleared, whatever the drift said
    assert(Bench.adjudicateFlag("env-suspect", 3.0, 1.0,
      rr = 1.5, qd = 4.0, rerunDrift = 1.0) === "env-suspect-cleared")
    // rerun within +0.5 s absolute clears too (the gate's own floor)
    assert(Bench.adjudicateFlag("regressed", 3.0, 0.2,
      rr = 0.6, qd = -1.0, rerunDrift = -1.0) === "regressed-cleared")
    // repeating rerun + both windows degraded enough to explain it:
    // drift may clear, but the label keeps the repeat visible
    assert(Bench.adjudicateFlag("env-suspect", 3.0, 1.0,
      rr = 2.8, qd = 2.0, rerunDrift = 2.0) ===
      "env-suspect-rerun-repeated-window-drift-cleared")
    // repeating rerun in a HEALTHY rerun window: confirmed, even
    // though the original ratio alone would have drift-cleared (the
    // r17 ADVICE's exact hole: qd cleared before the rerun was heard)
    assert(Bench.adjudicateFlag("regressed", 3.0, 1.0,
      rr = 2.8, qd = 2.0, rerunDrift = 1.0) === "regressed-confirmed")
    assert(Bench.adjudicateFlag("regressed", 3.0, 1.0,
      rr = 2.8, qd = 2.0, rerunDrift = -1.0) === "regressed-confirmed")
    // no rerun evidence (errored): drift may clear alone
    assert(Bench.adjudicateFlag("env-suspect", 3.0, 1.0,
      rr = -1.0, qd = 2.0, rerunDrift = -1.0) ===
      "env-suspect-window-drift-cleared")
    // nothing clears: base verdict stands for an errored rerun,
    // -confirmed for a repeating one
    assert(Bench.adjudicateFlag("regressed", 3.0, 1.0,
      rr = -1.0, qd = 1.1, rerunDrift = -1.0) === "regressed")
    assert(Bench.adjudicateFlag("regressed", 3.0, 1.0,
      rr = 2.8, qd = 1.1, rerunDrift = 1.1) === "regressed-confirmed")
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
