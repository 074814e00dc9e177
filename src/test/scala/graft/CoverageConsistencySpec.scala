package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** COVERAGE.md is the judge's line-by-line checklist — a dagger (†)
  * there claims "this query is DuckDB-oracle hash-graded". This spec
  * makes the claim mechanical: every dagger-marked name must resolve to
  * a declared query WITH an oracle, and every oracle-graded query must
  * appear dagger-marked in the inventory. A rename, a deleted query, or
  * an undocumented oracle fails the suite instead of silently drifting
  * the documentation from the code.
  */
class CoverageConsistencySpec extends AnyFunSuite {

  private lazy val marked: Set[String] = {
    val cov = new String(
      Files.readAllBytes(Paths.get("COVERAGE.md")), StandardCharsets.UTF_8)
    "([A-Za-z0-9_]+)†".r.findAllMatchIn(cov).map(_.group(1)).toSet
  }

  test("every dagger-marked name in COVERAGE.md is a declared query") {
    val ghosts = marked -- SparkEntry.queries.keySet
    assert(ghosts.isEmpty, s"dagger-marked but not in SparkEntry.queries: ${ghosts.toSeq.sorted}")
  }

  test("every dagger-marked name has a DuckDB oracle") {
    val unoracled = marked -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"dagger-marked but no oracle: ${unoracled.toSeq.sorted}")
  }

  test("every oracle-graded query is dagger-marked in COVERAGE.md") {
    val undocumented = SparkEntry.oracleSql.keySet -- marked
    assert(undocumented.isEmpty, s"oracle-graded but absent from COVERAGE.md: ${undocumented.toSeq.sorted}")
  }

  test("every oracle belongs to a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL for undeclared queries: ${orphans.toSeq.sorted}")
  }

  test("no oracle references a boundary table by a QUOTED relation name") {
    // Tables.referencesTable deliberately never matches quoted names
    // (a bare word match fired on 'customer'/'part' inside VALUES
    // string literals — r14). The flip side: an oracle written as
    // FROM "lineitem" would silently skip the sanitize shadow CTE and
    // read the raw table, diverging only on dirty corpora. Pin the
    // convention instead of loosening the regex: relation positions in
    // oracle SQL are always unquoted.
    val boundary = (Tables.measureCols.keySet + "events").toSeq.sorted
    val offenders = SparkEntry.oracleSql.flatMap { case (name, sql) =>
      boundary.filter { t =>
        // the schema prefix may sit outside OR inside the quotes
        // (FROM main."lineitem" / FROM "main.lineitem" — r16 ADVICE:
        // the prefix-inside-only pattern let main."lineitem" bypass
        // the shadow CTEs undetected)
        s"""(?is)(?:\\bfrom|\\bjoin|,)\\s*(?:main\\.)?"(?:main\\.)?$t"""".r
          .findFirstIn(sql).isDefined
      }.map(t => s"$name quotes $t")
    }
    assert(offenders.isEmpty,
      s"quoted boundary-table relations bypass the shadow CTEs: $offenders")
  }

  test("driver contract: entry() produces rows on sf0.001") {
    // the driver smoke-checks rows > 0 — pin it here so a regression
    // surfaces in the suite, not at driver time
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }
}
