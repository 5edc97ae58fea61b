package graft.util

/** Env-gated diagnostic logger (reference: src/polars_pipe/core/logger.py —
  * a module logger activated only when `LOGGING_ENABLED=true`, emitting
  * `timestamp | LEVEL [file:line:fn] message` to stderr and a capped log
  * file; silent otherwise and under tests).
  *
  * Spark already routes engine logs through log4j2; this logger is for the
  * ENGINE-USER layer the reference logs at (stage entry/exit, config
  * compilation, dropped-bucket diagnostics) without coupling callers to
  * log4j configuration. Driver-side only by design — executors should not
  * carry it into closures (nothing here is Serializable, so that fails
  * fast at plan time rather than silently on the cluster).
  */
object Log {

  /** Gate: `GRAFT_LOGGING_ENABLED=true` env (the reference's
    * `LOGGING_ENABLED` dotenv switch) or the `graft.logging.enabled` system
    * property (JVM-settable, what the spec toggles — env can't be mutated
    * in-process). Default off, so tests run silent exactly like the
    * reference's pytest guard. */
  def enabled: Boolean =
    sys.props.get("graft.logging.enabled")
      .orElse(sys.env.get("GRAFT_LOGGING_ENABLED"))
      .exists(_.equalsIgnoreCase("true"))

  private val maxBytes = 2_000_000L // reference: RotatingFileHandler maxBytes
  private def logPath: java.nio.file.Path = {
    val p = java.nio.file.Paths.get(
      sys.props.get("graft.log.path")
        .orElse(sys.env.get("GRAFT_LOG_PATH"))
        .getOrElse("logs/app.log"))
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    p
  }

  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss,SSS")
    .withZone(java.time.ZoneId.systemDefault())

  private def emit(level: String, msg: => String): Unit = if (enabled) {
    val caller = Thread.currentThread.getStackTrace
      .drop(1) // getStackTrace frame
      .find(f => !f.getClassName.startsWith("graft.util.Log") &&
        !f.getClassName.startsWith("java.lang.Thread"))
    val loc = caller
      .map(f => s"[${f.getFileName}:${f.getLineNumber}:${f.getMethodName}]")
      .getOrElse("[?]")
    val line = s"${fmt.format(java.time.Instant.now())} | ${level.padTo(8, ' ')}$loc $msg"
    System.err.println(line)
    this.synchronized {
      // single-backup rotation, like the reference's backupCount=1
      if (java.nio.file.Files.exists(logPath) &&
        java.nio.file.Files.size(logPath) > maxBytes) {
        val bak = logPath.resolveSibling(logPath.getFileName.toString + ".1")
        java.nio.file.Files.move(logPath, bak,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      java.nio.file.Files.writeString(logPath, line + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }

  def info(msg: => String): Unit = emit("INFO", msg)
  def debug(msg: => String): Unit = emit("DEBUG", msg)
  def warn(msg: => String): Unit = emit("WARNING", msg)
  def error(msg: => String): Unit = emit("ERROR", msg)
}
