package graft.ss

import java.nio.file.{Files, Paths, StandardOpenOption}

/** The reference's `stdin-to-file` dev demo (sea-streamer-file/src/bin/
  * stdin-to-file.rs): read lines typed on stdin and write them RAW into a
  * file (default `output.log`), overwriting any existing content
  * (`AsyncFile::new_ow`). The original reads AT MOST 10 lines — a literal
  * demo bound (`for _ in 0..10`, stdin-to-file.rs:27) — and stops early on
  * EOF; both laws are kept verbatim. The original's channel + async
  * runtime is plumbing its file API needs, not semantics, so this is a
  * plain loop.
  */
object SsStdinToFile {

  private[ss] val MaxLines = 10

  /** Testable seam: returns lines written. */
  private[ss] def run(path: String, stdin: java.io.InputStream): Int = {
    val out = Files.newOutputStream(Paths.get(path),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    val rdr = new java.io.BufferedReader(
      new java.io.InputStreamReader(stdin, "UTF-8"))
    try {
      var n = 0
      var line = rdr.readLine()
      while (line != null) {
        out.write(line.getBytes("UTF-8")); out.write('\n'); out.flush()
        n += 1
        line = if (n < MaxLines) rdr.readLine() else null
      }
      n
    } finally out.close()
  }

  def main(args: Array[String]): Unit = {
    var file = "output.log"
    var i = 0
    def usage(): Nothing = {
      System.err.println("usage: stdin-to-file [--file <path>]")
      sys.exit(2)
    }
    while (i < args.length) {
      args(i) match {
        case "--file" if i + 1 < args.length => file = args(i + 1); i += 2
        case _ => usage()
      }
    }
    System.err.println(
      "Please type something into the console and press enter:")
    run(file, System.in)
  }
}
