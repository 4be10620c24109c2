package graft.operators

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

/** External-process `TextEncoder` binding — the production pattern the
  * `Embedder` module doc promises, concrete: the model runs in a
  * separate process (an ONNX runner, a Python sentence-transformers
  * loop, a llama.cpp embedder — anything that speaks the line
  * protocol below), and the Spark side ships only the COMMAND in the
  * task closure, never the weights.
  *
  * Lifecycle: the closure serializes the (tiny) case class; on an
  * executor the first `encode` call looks the command up in a
  * JVM-wide session pool, so one model process serves every task and
  * partition that executor ever runs (the `@transient lazy` handle +
  * shared-session pattern). The process dies with the JVM via a
  * shutdown hook. Calls are synchronized per session: one in-flight
  * batch per model process, which is what a single-GPU runner wants
  * anyway — run more executors (not more in-JVM callers) to scale.
  *
  * Wire protocol (newline-framed, UTF-8):
  *   request:  one line per text — backslash, newline, CR escaped
  *             (`\\`, `\n`, `\r`) so arbitrary text stays one frame;
  *   response: for each input line, `dim` space-separated floats on
  *             one line, flushed after every line.
  * A runner in any language is ~5 lines; `awk '{printf ...}'` is
  * enough for a smoke model (see ProcessEncoderSpec).
  *
  * No model runtime ships in this environment, so CI exercises the
  * binding with a POSIX process; swap `command` for the real runner
  * in production — the Spark-side plumbing is identical.
  */
final case class ProcessTextEncoder(command: Seq[String], dim: Int) extends TextEncoder {
  require(command.nonEmpty, "command must be non-empty")

  override def encode(batch: Seq[String]): Seq[Array[Float]] =
    ProcessTextEncoder.session(command).roundTrip(batch, dim)
}

object ProcessTextEncoder {

  /** One live session per distinct command per JVM. */
  private val pool = new ConcurrentHashMap[Seq[String], Session]()

  private def session(command: Seq[String]): Session = {
    // A dead child must not pin its pool slot: evict-on-dead here (and in
    // roundTrip's null-read path) so the next encode respawns the runner.
    val s = pool.computeIfAbsent(command, c => new Session(c))
    if (s.alive) s
    else {
      pool.remove(command, s)
      pool.computeIfAbsent(command, c => new Session(c))
    }
  }

  private[graft] def evict(s: Session): Unit = pool.remove(s.command, s)

  /** Visible for tests: number of live sessions in this JVM. */
  private[graft] def liveSessions: Int = pool.size()

  private[graft] final class Session(val command: Seq[String]) {
    private val proc = {
      val pb = new ProcessBuilder(command: _*)
      // stderr must not be left attached to an undrained pipe: a chatty
      // runner fills the ~64KB pipe buffer and blocks mid-batch.
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val p = pb.start()
      sys.addShutdownHook { p.destroy() }
      p
    }
    private val toProc = new BufferedWriter(
      new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8))
    private val fromProc = new BufferedReader(
      new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))

    private def escape(s: String): String = {
      val b = new java.lang.StringBuilder(s.length + 8)
      var i = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\\' => b.append("\\\\")
          case '\n' => b.append("\\n")
          case '\r' => b.append("\\r")
          case c => b.append(c)
        }
        i += 1
      }
      b.toString
    }

    /** Write and read CONCURRENTLY: a batch whose request bytes exceed
      * the OS pipe capacity (~64KB each way) would deadlock a
      * write-all-then-read-all loop — the child blocks writing replies
      * we aren't reading while we block writing requests it isn't
      * reading. A writer thread keeps the request side moving while
      * this thread consumes replies as they arrive, so in-flight bytes
      * are bounded by the pipes, not the batch.
      */
    def roundTrip(batch: Seq[String], dim: Int): Seq[Array[Float]] = synchronized {
      @volatile var writeError: Throwable = null
      val writer = new Thread(() => {
        try {
          batch.foreach { t => toProc.write(escape(t)); toProc.newLine() }
          toProc.flush()
        } catch { case t: Throwable => writeError = t }
      }, s"graft-encoder-writer-${command.head}")
      writer.setDaemon(true)
      writer.start()
      try {
        batch.map { t =>
          val line = fromProc.readLine()
          if (line == null) {
            // Evict so the NEXT call respawns instead of hitting a corpse forever.
            ProcessTextEncoder.evict(this)
            throw new IllegalStateException(
              s"encoder process ${command.head} died mid-batch (text: ${t.take(40)}…)" +
                (if (writeError != null) s"; write side failed: ${writeError.getMessage}" else ""))
          }
          val vec = line.trim.split("\\s+").map(_.toFloat)
          require(vec.length == dim,
            s"encoder process returned ${vec.length} values, expected $dim: '$line'")
          vec
        }
      } finally writer.join()
    }

    private[graft] def alive: Boolean = proc.isAlive

    private[graft] def destroy(): Unit = proc.destroy()
  }
}
