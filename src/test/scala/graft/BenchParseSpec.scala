package graft

import graft.util.StrictJson
import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's child-JSON reader (r17): order-blind strict
  * parsing in place of the retired fixed-key-order regex — the same
  * first-match-reader failure class `util/IndexMarker` eliminated for
  * persisted indexes in r15. Malformed or reordered-but-broken child
  * output must refuse loudly (parent falls back to a retry /
  * in-process measure), never parse into a silently-wrong number. */
class BenchParseSpec extends AnyFunSuite {

  private val wellFormed =
    """{"metric":"total","value":3.5,"unit":"sec",
      |"queries":{"q01_agg":1.25,"q02_filter":2.25},
      |"sf":"/root/testdata/sf0.1","runs":3,"wall":9.1,
      |"partial":false,"degraded":[],"remeasure_skipped":false,
      |"io_family":["q38_jdbc_roundtrip"],
      |"langid_family":{"q123_langid_serve":"md5"},
      |"drain_family":["q124_crawl_drain"],
      |"spread":{"q01_agg":{"med":1.25,"min":1.2,"max":1.3,"warm":2},
      |"q02_filter":{"med":2.25,"min":2.2,"max":2.4,"warm":1}},
      |"remeasured":{}}""".stripMargin.replace("\n", "")

  test("well-formed child JSON yields the spread stats") {
    val m = Bench.statsOfChildJson(wellFormed)
    assert(m.keySet === Set("q01_agg", "q02_filter"))
    assert(m("q01_agg") === Bench.QStat(1.25, 1.2, 1.3, 2))
    assert(m("q02_filter").median === 2.25)
  }

  test("key order is irrelevant — reordered stat fields and a spread before queries both parse") {
    val reordered =
      """{"spread":{"q09_x":{"warm":3,"max":2.0,"med":1.5,"min":1.0}},
        |"queries":{"q09_x":1.5},"wall":4.0}""".stripMargin.replace("\n", "")
    val m = Bench.statsOfChildJson(reordered)
    assert(m("q09_x") === Bench.QStat(1.5, 1.0, 2.0, 3))
  }

  test("older-binary fallback: flat queries medians when spread is absent") {
    val legacy = """{"metric":"total","queries":{"q05_d":0.75},"wall":2.0}"""
    val m = Bench.statsOfChildJson(legacy)
    assert(m("q05_d") === Bench.QStat(0.75, 0.75, 0.75, -1))
  }

  test("malformed child JSON refuses loudly") {
    // truncated mid-object (the r16 failure shape: killed child)
    intercept[IllegalArgumentException] {
      Bench.statsOfChildJson(wellFormed.dropRight(20))
    }
    // a spread entry missing a stat field
    intercept[IllegalArgumentException] {
      Bench.statsOfChildJson("""{"spread":{"q01":{"med":1.0,"min":0.9,"max":1.1}}}""")
    }
    // a spread entry that is not an object
    intercept[IllegalArgumentException] {
      Bench.statsOfChildJson("""{"spread":{"q01":1.0}}""")
    }
    // duplicate keys are corruption, not data
    intercept[IllegalArgumentException] {
      Bench.statsOfChildJson("""{"spread":{"q01":{"med":1,"min":1,"max":1,"warm":0}},"spread":{}}""")
    }
    // neither spread nor queries
    intercept[IllegalArgumentException] {
      Bench.statsOfChildJson("""{"metric":"total","value":1.0}""")
    }
    // trailing garbage after the root value
    intercept[IllegalArgumentException] {
      Bench.statsOfChildJson("""{"queries":{"q01":1.0}} extra""")
    }
  }

  test("StrictJson value grammar: nesting, arrays, escapes, literals") {
    val v = StrictJson.parse(
      """{"a":[1,-2.5e1,"s\"x\n",true,false,null],"b":{"c":{}}}""")
    val o = v.asInstanceOf[StrictJson.JObj]
    val arr = o.arr("a").get.items
    assert(arr(0) === StrictJson.JNum(1.0))
    assert(arr(1) === StrictJson.JNum(-25.0))
    assert(arr(2) === StrictJson.JStr("s\"x\n"))
    assert(arr(3) === StrictJson.JBool(true))
    assert(arr(5) === StrictJson.JNull)
    assert(o.obj("b").get.obj("c").get.fields.isEmpty)
    intercept[IllegalArgumentException](StrictJson.parse("""{"a":}"""))
    intercept[IllegalArgumentException](StrictJson.parse("""[1,2"""))
    intercept[IllegalArgumentException](StrictJson.parse("""{"a":01x}"""))
  }

  test("budget governor order (r18): adjudication drops before measurement degrades; both latch") {
    def step(elapsed: Double, main: Double, rem: Double, budget: Double,
        s: Boolean = false, d: Boolean = false) =
      Bench.governorStep(elapsed, main, rem, budget, s, d)
    // comfortably under budget: nothing triggers
    assert(step(600, 600, 300, 3600) === ((false, false)))
    // the re-measure phase tips the projection: skip it, keep runs=3
    assert(step(1500, 1500, 700, 3600) === ((true, false)))
    // the main pass alone overruns: both (degrade implies skip)
    assert(step(2000, 1700, 0, 3600) === ((true, true)))
    // never a degrade without the skip, for ANY inputs
    for (e <- Seq(0.0, 1000.0, 4000.0); m <- Seq(0.0, 2000.0); r <- Seq(0.0, 500.0)) {
      val (skip, deg) = step(e, m, r, 3600)
      assert(!deg || skip, s"degrade without skip at ($e, $m, $r)")
    }
    // both states latch: once true, they stay true under calm inputs
    assert(step(10, 10, 10, 3600, s = true) === ((true, false)))
    assert(step(10, 10, 10, 3600, s = true, d = true) === ((true, true)))
    assert(step(10, 10, 10, 3600, d = true) === ((true, true)))
  }

  test("\\u escapes require 4 literal hex digits — signed forms refuse (r18)") {
    assert(StrictJson.parse("\"\\u0041\"") === StrictJson.JStr("A"))
    // Integer.parseInt would accept these silently
    intercept[IllegalArgumentException](StrictJson.parse("\"\\u+12f\""))
    intercept[IllegalArgumentException](StrictJson.parse("\"\\u-001\""))
    intercept[IllegalArgumentException](StrictJson.parse("\"\\u00g1\""))
  }
}
