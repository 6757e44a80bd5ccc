package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the registered gate set to [[GateManifest.expected]] in BOTH
  * directions — see the manifest's doc for why a one-direction check (the
  * Verify-side missing-gate guard) is not enough on its own: it can't know
  * about a gate that was added but never listed, and an unlisted gate is
  * one refactor away from vanishing unprotected.
  */
class ManifestSpec extends AnyFunSuite {

  test("SparkEntry.queries matches the pinned gate manifest exactly") {
    val registered = SparkEntry.allQueries.map(_.name).toSet
    val missing = GateManifest.expected -- registered
    val unlisted = registered -- GateManifest.expected
    assert(missing.isEmpty,
      s"gates in the manifest but NOT registered (silent-collapse!): ${missing.toSeq.sorted.mkString(", ")}")
    assert(unlisted.isEmpty,
      s"registered gates missing from GateManifest (add them): ${unlisted.toSeq.sorted.mkString(", ")}")
  }

  test("gate names are unique across the four query groups") {
    val names = SparkEntry.allQueries.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate gate names (map-collapse hides one): ${dups.mkString(", ")}")
  }

  // NOTE: as long as SparkEntry derives oracleSql FROM allQueries this can
  // never fire (an orphan key is impossible by construction — ADVICE r8);
  // it stays as a guard for any future refactor that decouples the two maps.
  test("every oracle key has a registered query (refactor guard)") {
    val registered = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- registered
    assert(orphans.isEmpty, s"oracle SQL without a query: ${orphans.mkString(", ")}")
  }

}
