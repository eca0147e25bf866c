package graft.providers

import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Locks Dispatch.validateOffline to the reference's own offline behavior:
  * tools/provider_goldens.json is produced by running the reference's
  * `find_provider` ladder in this sandbox (tools/capture_provider_goldens.py,
  * network absent), so every (identifier → provider + ids) row below is the
  * reference deciding, not this repo.
  */
class ProvidersSpec extends AnyFunSuite {

  private val goldenPath = java.nio.file.Paths.get("tools/provider_goldens.json")

  private lazy val goldens: Map[String, Option[Map[String, String]]] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(goldenPath))
    root.properties().asScala.map { e =>
      val k = e.getKey
      val v = e.getValue
      if (v.isNull) k -> None
      else k -> Some(v.properties().asScala.map(f => f.getKey -> f.getValue.asText()).toMap)
    }.toMap
  }

  test("offline dispatch matches the reference's own offline find_provider on all goldens") {
    assume(java.nio.file.Files.exists(goldenPath), "goldens absent")
    assert(goldens.size > 100, s"suspiciously few goldens: ${goldens.size}")
    assert(!goldens.values.exists(_.exists(_.contains("error"))), "reference capture had errors")
    var checked = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((ref, expected) <- goldens.toSeq.sortBy(_._1)) {
      val got = Dispatch.validateOffline(ref)
      expected match {
        case None =>
          if (got.isDefined) failures += s"'$ref': expected None, got $got"
        case Some(exp) =>
          val expProvider = exp("provider")
          got match {
            case None => failures += s"'$ref': expected $expProvider, got None"
            case Some(m) =>
              if (m.provider != expProvider)
                failures += s"'$ref': expected $expProvider, got ${m.provider}"
              else {
                // every id this impl extracts must agree with the reference's
                val expIds = exp - "provider" - "instance"
                for ((k, v) <- m.ids if k != "instance") {
                  if (expIds.get(k).exists(_ != v))
                    failures += s"'$ref': id $k='$v' but reference extracted '${expIds(k)}'"
                }
                // and when the reference extracted ids, so must this impl
                if (expIds.nonEmpty && (m.ids - "instance").isEmpty)
                  failures += s"'$ref': reference extracted $expIds, impl extracted none"
                // InvenioRDM instance attribution must agree when captured
                for (inst <- exp.get("instance"); mine <- m.ids.get("instance"); if inst != mine)
                  failures += s"'$ref': instance '$mine' vs reference '$inst'"
              }
          }
      }
      checked += 1
    }
    assert(failures.isEmpty, s"${failures.size}/$checked mismatches:\n${failures.mkString("\n")}")
  }

  test("prefix dispatch: DOI prefixes route to their ladder owner") {
    assert(Dispatch.prefixOwner("10.5281/zenodo.123") === Some("Zenodo"))
    assert(Dispatch.prefixOwner("10.5061/dryad.abc123") === Some("Dryad"))
    assert(Dispatch.prefixOwner("10.1594/PANGAEA.999") === Some("Pangaea"))
    assert(Dispatch.prefixOwner("10.6084/m9.figshare.1") === Some("Figshare"))
    assert(Dispatch.prefixOwner("10.17605/OSF.IO/ABCDE") === Some("OSF"))
    assert(Dispatch.prefixOwner("10.15468/xyz") === Some("GBIF"))
    assert(Dispatch.prefixOwner("10.17882/42") === Some("SEANOE"))
    assert(Dispatch.prefixOwner("10.9999/unknown") === None)
  }
}
