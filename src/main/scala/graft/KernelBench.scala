package graft

/** Extraction-kernel microbench: single-threaded per-row cost by payload kind
  * (no Spark). Usage: runMain graft.KernelBench [rowsPerKind]
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    // d % 10 selects the payload kind; pick fixed representatives per kind
    for (kind <- 0 until 10) {
      val ds = (0 until n).map(i => i.toLong * 10 + kind)
      val payloads = ds.map(d => (table.PayloadSpec.payload(d).getBytes("UTF-8"), table.PayloadSpec.text(d)))
      // warm
      payloads.take(2000).foreach { case (p, t) => parse.Extract.extract(p, t, "en") }
      val t0 = System.nanoTime()
      payloads.foreach { case (p, t) => parse.Extract.extract(p, t, "en") }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"[kernel] kind=$kind ${us}%8.2f us/row")
    }
  }
}
