package graft

import org.scalatest.funsuite.AnyFunSuite

/** The six-fixture sweep GATE: every registered query must carry a
  * recorded adversarial sweep (sf0.001/sf0.01/sf0.1 + NULL-injected +
  * extreme-value + Unicode fixtures — `tools/sweep_gate.py`) matching
  * its CURRENT oracle. Round 9's sweeps found 32 real cross-engine
  * divergences but were manually run, so a fresh query could land
  * unswept; this spec turns that into a build failure.
  *
  * The manifest records sha256("name|oracle_sql")[:16] per query, so
  * this catches (a) a new query with no recorded sweep, and (b) an
  * oracle edit after the last sweep. A Scala-side-only edit that keeps
  * the oracle byte-identical is not caught here — the ordinary
  * scale-factor sweeps cover it.
  */
class SweepManifestSpec extends AnyFunSuite {

  private def fingerprint(name: String, oracle: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s"$name|$oracle".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  test("every registered query has a recorded six-fixture sweep at HEAD") {
    val path = java.nio.file.Paths.get("sweeps/SWEEP_MANIFEST.json")
    assert(
      java.nio.file.Files.exists(path),
      "sweeps/SWEEP_MANIFEST.json missing — run `python3 tools/sweep_gate.py`")
    val txt = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    // minimal JSON pull: "name": "hex16" pairs inside the "queries" map
    val entry = """"([A-Za-z0-9_]+)":\s*"([0-9a-f]{16})"""".r
    val recorded = entry.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2)).toMap
    val missing = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val fp = fingerprint(name, SparkEntry.oracleSql.getOrElse(name, ""))
      recorded.get(name) match {
        case None =>
          Some(s"$name: NO recorded sweep — run tools/sweep_gate.py")
        case Some(rec) if rec != fp =>
          Some(s"$name: oracle drifted since last sweep ($rec -> $fp) — re-run tools/sweep_gate.py")
        case _ => None
      }
    }
    assert(missing.isEmpty, s"\n${missing.mkString("\n")}")
  }
}
