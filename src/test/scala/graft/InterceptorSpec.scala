package graft

import graft.config.GraftConfig
import graft.event.Event
import graft.interceptor._
import org.apache.spark.sql.Encoders

class InterceptorSpec extends SparkSpec {

  test("priority order: higher priority runs first (reference sortBy(-p))") {
    var order = Vector.empty[String]
    case class Probe(name: String, override val priority: Int) extends Interceptor {
      def intercept(e: Event): Option[Event] = { order :+= name; Some(e) }
    }
    InterceptorChain(Seq(Probe("low", 10), Probe("high", 90), Probe("mid", 50)))
      .interceptOne(Event("x"))
    assert(order == Vector("high", "mid", "low"))
  }

  test("discard short-circuits the rest of the chain") {
    var ran = false
    case class After(name: String) extends Interceptor {
      override val priority = 10
      def intercept(e: Event): Option[Event] = { ran = true; Some(e) }
    }
    val out = InterceptorChain(Seq(DevNull("drop", 90), After("after")))
      .interceptOne(Event("x"))
    assert(out.isEmpty && !ran)
  }

  test("fail-open: a throwing interceptor passes the original event through") {
    case class Boom(name: String) extends Interceptor {
      override val priority = 90
      def intercept(e: Event): Option[Event] = throw new RuntimeException("boom")
    }
    val out = InterceptorChain(Seq(Boom("bad"), Transparent("ok", 10)))
      .interceptOne(Event("body", Map("k" -> "v")))
    assert(out.contains(Event("body", Map("k" -> "v"))))
  }

  test("FQCN loading with positional constructor injection") {
    val root = GraftConfig.parse("""
      graft { interceptor {
        keep { fqcn = "graft.interceptor.Transparent", priority = 70 }
        drop { fqcn = "graft.interceptor.DevNull", priority = 30 }
      } }""")
    val chain = InterceptorChain.fromConfig(root, Seq("keep", "drop"))
    assert(chain.ordered.map(_.name) == Seq("keep", "drop"))
    assert(chain.interceptOne(Event("x")).isEmpty) // drop runs last, discards
    intercept[IllegalArgumentException](InterceptorChain.fromConfig(root, Seq("nope")))
  }

  test("columnar chain ≡ typed chain on a real Dataset") {
    implicit val enc = Encoders.product[Event]
    import org.apache.spark.sql.functions._
    val ds = spark.createDataset(Seq(
      Event("keep me"), Event("ERROR drop me"), Event("also keep", Map("a" -> "1"))))
    val chain = InterceptorChain(Seq(
      RegexFilter("noerr", "^(?!ERROR)", priority = 90),
      HeaderEnrich("tag", Map("src" -> "t"), priority = 10)))
    // chain(ds) takes the all-columnar path; the typed fold is the spec
    val columnar = chain(ds).collect().toSet
    val typed = ds.collect().flatMap(chain.interceptOne).toSet
    assert(columnar == typed)
    assert(columnar.forall(_.headers.get("src").contains("t")))
    assert(columnar.size == 2)
  }
}
