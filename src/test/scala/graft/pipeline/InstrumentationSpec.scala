package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** The APM seam must wrap every process call with the vendor span named
  * `<operator>.process` (the reference's task-name convention,
  * `motorway/intersection.py:149`), default to passthrough, and never
  * swallow the dead-letter path. */
class InstrumentationSpec extends AnyFunSuite {

  test("process calls run inside the installed span; default is passthrough") {
    val names = ArrayBuffer[String]()
    val rec = new Instrumentation {
      def around[T](taskName: String)(body: => T): T = { names += taskName; body }
    }
    Instrumentation.install(rec)
    try {
      val op = Intersection[String, String]("Splitter")(m =>
        Iterator.single(m.spinOff(m.content.toUpperCase, None)))
      val r = Intersection.safeProcess(op, Message("1", "hello"))
      assert(r == Right(Seq(Message("1", "HELLO"))))
      assert(names.toSeq == Seq("Splitter.process"))
      // a throwing process still dead-letters, with the span recorded
      val boom = Intersection[String, String]("Boom")(_ => throw new RuntimeException("x"))
      assert(Intersection.safeProcess(boom, Message("2", "y")).isLeft)
      assert(names.toSeq == Seq("Splitter.process", "Boom.process"))
    } finally Instrumentation.uninstall()
    // uninstalled: passthrough, nothing recorded
    val plain = Intersection[String, String]("Plain")(m => Iterator.single(m))
    assert(Intersection.safeProcess(plain, Message("3", "z")).isRight)
    assert(names.size == 2)
  }
}
