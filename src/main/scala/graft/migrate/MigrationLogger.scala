package graft.migrate

/** Mirrors the reference's logger policy (Core.pm:236-250
  * `_build_logger`): `quiet` → swallow everything; otherwise screen
  * output at `info`, or `debug` when `verbose`. The sink is pluggable so
  * specs can capture output.
  */
final class MigrationLogger(
    quiet: Boolean,
    verbose: Boolean,
    sink: String => Unit = s => Console.err.println(s)) {

  def info(msg: String): Unit = if (!quiet) sink(s"[info] $msg")

  def debug(msg: String): Unit = if (!quiet && verbose) sink(s"[debug] $msg")
}
