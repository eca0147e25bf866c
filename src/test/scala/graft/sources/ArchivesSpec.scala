package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Round-trips of the pure-JVM archive codecs (zip / POSIX tar / tar.gz) and
  * the distributed expand() over a binary column — S9 semantics.
  */
class ArchivesSpec extends AnyFunSuite {

  private val members = Seq(
    ("a.txt", "hello world".getBytes("UTF-8")),
    // exactly one tar block: exercises the zero-padding edge
    ("block.bin", Array.fill[Byte](512)(7)),
    ("empty.txt", Array.empty[Byte]),
    ("p123.html", ("<div data-bbox='1 2 3 4'>" * 10).getBytes("UTF-8")))

  test("zip round-trip preserves names, order and bytes") {
    val out = Archives.unzip(Archives.zipBuild(members))
    assert(out.map(_._1) === members.map(_._1))
    assert(out.zip(members).forall { case ((_, a), (_, b)) => a.sameElements(b) })
  }

  test("tar round-trip preserves names, order and bytes") {
    val out = Archives.untar(Archives.tarBuild(members))
    assert(out.map(_._1) === members.map(_._1))
    assert(out.zip(members).forall { case ((_, a), (_, b)) => a.sameElements(b) })
  }

  test("tgz round-trip (gzip of tar)") {
    val out = Archives.untar(Archives.gunzip(Archives.gzip(Archives.tarBuild(members))))
    assert(out.map(_._1) === members.map(_._1))
    assert(out.zip(members).forall { case ((_, a), (_, b)) => a.sameElements(b) })
  }

  test("property: random member sets round-trip through all three codecs") {
    val rnd = new java.util.Random(42)
    for (trial <- 0 until 25) {
      val n = 1 + rnd.nextInt(6)
      val ms = (0 until n).map { i =>
        // sizes straddling the 512-byte tar block boundary on purpose
        val size = Seq(0, 1, 511, 512, 513, 1024, rnd.nextInt(4000)).apply(rnd.nextInt(7))
        val data = new Array[Byte](size)
        rnd.nextBytes(data)
        (s"m${trial}_$i.bin", data)
      }
      for ((label, bytes) <- Seq(
        "zip" -> Archives.zipBuild(ms),
        "tar" -> Archives.tarBuild(ms),
        "tgz" -> Archives.gzip(Archives.tarBuild(ms)))) {
        val out = label match {
          case "zip" => Archives.unzip(bytes)
          case "tar" => Archives.untar(bytes)
          case _ => Archives.untar(Archives.gunzip(bytes))
        }
        assert(out.map(_._1) === ms.map(_._1), s"$label trial $trial names")
        assert(out.zip(ms).forall { case ((_, a), (_, b)) => a.sameElements(b) }, s"$label trial $trial bytes")
      }
    }
  }

  test("untar fails loudly on a truncated archive instead of zero-padding the member") {
    val whole = Archives.tarBuild(Seq(("big.bin", Array.fill[Byte](1000)(3))))
    val truncated = java.util.Arrays.copyOfRange(whole, 0, 512 + 700) // header + partial payload
    val e = intercept[IllegalArgumentException](Archives.untar(truncated))
    assert(e.getMessage.contains("truncated tar"))
  }

  test("expand() explodes each archive format into member rows in one narrow pass") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      (0L, "zip", Archives.zipBuild(members)),
      (1L, "tar", Archives.tarBuild(members)),
      (2L, "tgz", Archives.gzip(Archives.tarBuild(members))))
      .toDF("archive_id", "fmt", "bytes")
    val out = Archives.expand(rows).collect()
    assert(out.length === 3 * members.length)
    val byId = out.groupBy(_.archive_id)
    for (id <- Seq(0L, 1L, 2L)) {
      val ms = byId(id).map(m => m.member_name -> m.member_bytes).toMap
      assert(ms.keySet === members.map(_._1).toSet)
      assert(members.forall { case (n, b) => ms(n).sameElements(b) })
    }
    // narrow: expansion plan has no shuffle exchange
    val plan = Archives.expand(rows).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
