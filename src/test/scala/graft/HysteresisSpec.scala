package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.{ControlEvent, ControlState, Hysteresis}

/** Properties of the pure hysteresis + transition-dedup state machine
  * (SURVEY.md §5.2-2): semantics shared by all four reference engines.
  */
class HysteresisSpec extends AnyFunSuite {

  /** Raw-scalacheck property loop (the scalatestplus bridge is not in
    * the offline cache): 200 seeded samples per property.
    */
  private def forAllSamples[A](g: Gen[A])(check: A => Unit): Unit =
    (0 until 200).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private def control(seq: Long, desired: Double, up: Double = 1.0,
      down: Double = 1.0): ControlEvent =
    ControlEvent(1L, seq, "control", 0.0, desired, up, down)

  private def reading(seq: Long, temp: Double): ControlEvent =
    ControlEvent(1L, seq, "data", temp, 0.0, 0.0, 0.0)

  test("no output before the first control") {
    val out = Hysteresis.replay(Iterator(reading(1, 100.0), reading(2, -100.0)))
    assert(out.isEmpty)
  }

  test("too hot emits Off(1), too cold emits On(0), deadband emits nothing") {
    val evs = Iterator(control(0, 45.0), reading(1, 47.0), reading(2, 45.5),
      reading(3, 43.0))
    assert(Hysteresis.replay(evs).toList == List((1L, 1), (3L, 0)))
  }

  test("transition dedup: consecutive equal actions suppressed") {
    val evs = Iterator(control(0, 45.0), reading(1, 50.0), reading(2, 51.0),
      reading(3, 40.0), reading(4, 39.0), reading(5, 50.0))
    assert(Hysteresis.replay(evs).toList == List((1L, 1), (3L, 0), (5L, 1)))
  }

  test("control updates apply to subsequent readings") {
    val evs = Iterator(control(0, 45.0), reading(1, 50.0), // Off
      control(2, 60.0), reading(3, 50.0)) // now too cold -> On
    assert(Hysteresis.replay(evs).toList == List((1L, 1), (3L, 0)))
  }

  private val evGen: Gen[ControlEvent] = for {
    isCtl <- Gen.prob(0.2)
    v <- Gen.choose(0.0, 100.0)
  } yield if (isCtl) control(0, v) else reading(0, v)

  test("property: no two consecutive emitted actions are equal per key") {
    forAllSamples(Gen.listOf(evGen)) { evs =>
      val seq = evs.zipWithIndex.map { case (e, i) => e.copy(seq = i.toLong) }
      val out = Hysteresis.replay(seq.iterator).toList
      out.map(_._2).sliding(2).foreach {
        case List(a, b) => assert(a != b)
        case _ =>
      }
      assert(out.forall(o => o._2 == 0 || o._2 == 1))
    }
  }

  test("property: fold equals step-by-step accumulation") {
    forAllSamples(Gen.listOf(evGen)) { evs =>
      val seq = evs.zipWithIndex.map { case (e, i) => e.copy(seq = i.toLong) }
      var st = ControlState.empty
      val manual = seq.flatMap { e =>
        val (s2, out) = Hysteresis.step(st, e)
        st = s2
        out.map(a => (e.seq, a))
      }
      assert(Hysteresis.replay(seq.iterator).toList == manual)
    }
  }
}
