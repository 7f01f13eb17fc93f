package graft

import graft.config.GraftConfig
import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.duration._

class ConfigSpec extends AnyFunSuite {
  val sample = GraftConfig.parse("""
    # comment
    graft {
      source {
        s1 { type = directory, path = "/in/dir", interceptors = [i1, i2],
             batch-size = 1024, timeout = 5s, max-line = 512k,
             enabled = true, ratio = 0.5 }
      }
      source { s2 { type = devzero } }  // merges with the first source block
      interceptor { i1 { fqcn = "graft.interceptor.Transparent", priority = 90 } }
    }""")

  test("dotted keys nest; duplicate sections deep-merge; inline // strips; Int range checked") {
    val c = GraftConfig.parse("""
      graft.sink.s1.url = "http://x"
      graft { source { a { type = devzero } } }
      graft { source { b { type = devzero } } }
      timeout = 5s // tight budget
      url2 = http://unquoted/ok
      big = 4294967296
    """)
    // a flat dotted key must land in the same nested space the getters read
    assert(c.getString("graft.sink.s1.url") == "http://x")
    // the second graft.source block must MERGE with (not replace) the first
    assert(c.getSection("graft.source").get.sectionKeys.toSet == Set("a", "b"))
    // inline // comment is not part of the value; unquoted URLs survive
    assert(c.getDuration("timeout", 0.millis) == 5.seconds)
    assert(c.getString("url2") == "http://unquoted/ok")
    // out-of-Int-range values fail loudly instead of truncating to 0
    assert(c.getLong("big", 0L) == 4294967296L)
    intercept[IllegalArgumentException](c.getInt("big"))
  }

  test("nested sections and typed getters") {
    val s1 = sample.getSection("graft.source").get.getSection("s1").get
    assert(s1.getString("type") == "directory")
    assert(s1.getString("path") == "/in/dir")
    assert(s1.getStringList("interceptors") == Seq("i1", "i2"))
    assert(s1.getInt("batch-size") == 1024)
    assert(s1.getDuration("timeout", 0.millis) == 5.seconds)
    assert(s1.getBytes("max-line", 0) == 512L * 1024)
    assert(s1.getBoolean("enabled", default = false))
    assert(s1.getDouble("ratio", 0.0) == 0.5)
  }

  test("duplicate sections merge (HOCON object merge)") {
    val sources = sample.getSection("graft.source").get
    assert(sources.sectionKeys.toSet == Set("s1", "s2"))
  }

  test("defaults and missing keys") {
    val s1 = sample.getSection("graft.source").get.getSection("s1").get
    assert(s1.getString("absent", "dflt") == "dflt")
    assert(!s1.has("absent"))
    intercept[IllegalArgumentException](s1.getString("absent"))
  }

  test("duration and byte literal forms") {
    assert(GraftConfig.parseDuration("100ms").contains(100.millis))
    assert(GraftConfig.parseDuration("2 seconds").contains(2.seconds))
    assert(GraftConfig.parseDuration("1h").contains(1.hour))
    assert(GraftConfig.parseBytes("10m").contains(10L * 1024 * 1024))
    assert(GraftConfig.parseBytes("123").contains(123L))
  }

  test("unterminated block fails loudly") {
    intercept[IllegalArgumentException](GraftConfig.parse("a { b = 1"))
  }
}
