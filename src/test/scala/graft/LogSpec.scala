package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.Log

/** Env-gated logger spec (reference: core/logger.py — active only when the
  * switch is set; `ts | LEVEL [file:line:fn] msg` format; rotating file). */
class LogSpec extends AnyFunSuite {

  private def withGate[A](on: Boolean, path: String)(body: => A): A = {
    System.setProperty("graft.logging.enabled", on.toString)
    System.setProperty("graft.log.path", path)
    try body
    finally {
      System.clearProperty("graft.logging.enabled")
      System.clearProperty("graft.log.path")
    }
  }

  test("disabled by default: no file, no output") {
    val dir = java.nio.file.Files.createTempDirectory("graft_log_off")
    val p = dir.resolve("app.log")
    assert(!Log.enabled, "tests must run with logging off, like the reference under pytest")
    Log.info("should vanish")
    assert(!java.nio.file.Files.exists(p))
  }

  test("enabled: reference line format with caller location, appended to file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_log_on")
    val p = dir.resolve("app.log")
    withGate(on = true, p.toString) {
      Log.info("stage start")
      Log.warn("bucket dropped")
      val lines = java.nio.file.Files.readAllLines(p)
      assert(lines.size == 2)
      // "2026-08-12 13:00:00,123 | INFO    [LogSpec.scala:NN:...] stage start"
      val re = """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3} \| \w+\s+\[LogSpec\.scala:\d+:.*\] .*""".r
      lines.forEach(l => assert(re.pattern.matcher(l).matches, s"bad format: $l"))
      assert(lines.get(0).contains("INFO") && lines.get(0).endsWith("stage start"))
      assert(lines.get(1).contains("WARNING") && lines.get(1).endsWith("bucket dropped"))
    }
  }

  test("rotation: file over the cap moves to .1 and restarts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_log_rot")
    val p = dir.resolve("app.log")
    withGate(on = true, p.toString) {
      // pre-seed a file over the 2 MB cap; next emit must rotate it away
      java.nio.file.Files.writeString(p, "x" * 2_000_001)
      Log.info("fresh line")
      assert(java.nio.file.Files.exists(p.resolveSibling("app.log.1")))
      val fresh = java.nio.file.Files.readAllLines(p)
      assert(fresh.size == 1 && fresh.get(0).endsWith("fresh line"))
    }
  }
}
