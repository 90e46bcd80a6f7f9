package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanized doc-count gate (verdict r9 task 4).
  *
  * Rounds 7, 8 and 9 each shipped the same defect: a commit fixed the
  * "N ScalaTest cases" lines in README/SCALE/COVERAGE and added a new
  * test in the SAME commit, re-staling the lines instantly. Manual
  * discipline failed three times, so the gate is now part of
  * `sbt test`: every count declaration in the three docs is parsed
  * and asserted against the LIVE values — the suite inventory
  * (reflective `Suite.testNames` over every spec class, so
  * loop-registered tests like DeterminismSpec's count correctly) and
  * `SparkEntry.queries.size`. A stale doc is a red build.
  *
  * Gated patterns (every occurrence in README.md, SCALE.md,
  * COVERAGE.md must match the live value):
  *   - `N ScalaTest` and `N/N ScalaTest`  → live test-case count
  *   - `N registered queries`             → SparkEntry.queries.size
  *   - `N/N oracle`                       → SparkEntry.queries.size
  *   - `across N suites`                  → live suite count
  * Historical narrative must simply avoid these exact phrasings
  * (SCALE.md's round-4 header was reworded once, in round 10).
  */
class CountsSpec extends AnyFunSuite {

  private val testDir = new java.io.File("src/test/scala/graft")
  private val docs = Seq("README.md", "SCALE.md", "COVERAGE.md")

  private def readFile(f: java.io.File): String =
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")

  /** Suite classes discovered from source, not hand-listed — a new
    * spec file is picked up automatically. */
  private lazy val suiteNames: Seq[String] = {
    val re = """class\s+(\w+)\s+extends\s+(SparkSpec|AnyFunSuite)""".r
    testDir.listFiles().filter(_.getName.endsWith(".scala")).toSeq
      .flatMap(f => re.findAllMatchIn(readFile(f)).map(_.group(1)))
      .sorted
  }

  /** Live test-case count: instantiate each suite and ask ScalaTest
    * itself — the only count that agrees with what `sbt test` runs,
    * including dynamically registered (looped) tests. */
  private lazy val liveTests: Int = suiteNames.map { c =>
    Class.forName("graft." + c).getDeclaredConstructor()
      .newInstance().asInstanceOf[org.scalatest.Suite].testNames.size
  }.sum

  private lazy val liveQueries: Int = SparkEntry.queries.size

  /** Pure checker so the regression test below can demonstrate the
    * round-9 slip would have been caught. Returns violations as
    * "file:line: declared N, actual M (pattern)". */
  private[graft] def docViolations(file: String, text: String,
      tests: Int, queries: Int, suites: Int): Seq[String] = {
    // patterns allow any whitespace (incl. a line wrap) between the
    // number and its noun — "341/341\noracle" must not evade the gate
    val rules: Seq[(scala.util.matching.Regex, Int, String)] = Seq(
      ("""(\d+)/(\d+)\s+ScalaTest""".r, tests, "N/N ScalaTest"),
      ("""(?<!/)\b(\d+)\s+ScalaTest""".r, tests, "N ScalaTest"),
      ("""(\d+)\s+registered\s+queries""".r, queries,
        "N registered queries"),
      ("""(\d+)/(\d+)\s+oracle""".r, queries, "N/N oracle"),
      ("""across\s+(\d+)\s+suites""".r, suites, "across N suites"))
    rules.flatMap { case (re, want, label) =>
      re.findAllMatchIn(text).flatMap { m =>
        val line = text.substring(0, m.start).count(_ == '\n') + 1
        (1 to m.groupCount).map(g => m.group(g).toInt)
          .filter(_ != want)
          .map(got => s"$file:$line: declared $got, " +
            s"actual $want ($label)")
      }
    }
  }

  test("doc counts match live suite/query inventory") {
    val viols = docs.flatMap { d =>
      docViolations(d, readFile(new java.io.File(d)),
        liveTests, liveQueries, suiteNames.size)
    }
    assert(viols.isEmpty,
      "stale doc counts (fix the docs in the SAME commit that " +
        "changed the tests/queries):\n" + viols.mkString("\n"))
  }

  /** Pure checker for the driver-gate citation (testable below).
    * Given the set of TRACKED gate filenames and the green count of
    * the latest one, returns violations against the README text. */
  private[graft] def gateCiteViolations(trackedGates: Seq[String],
      greenOfLatest: Int, readme: String): Seq[String] = {
    if (trackedGates.isEmpty) return Seq("no committed driver-gate " +
      "files found (git ls-files CORRECTNESS_r*.json is empty)")
    val rN = trackedGates
      .map(n => "\\d+".r.findFirstIn(n).get.toInt).max
    val cite =
      """Latest driver gate CORRECTNESS_r0*(\d+):\s*\**(\d+)/(\d+)""".r
        .findFirstMatchIn(readme)
    if (cite.isEmpty) return Seq(
      "README must cite 'Latest driver gate CORRECTNESS_rN: X/X'")
    val m = cite.get
    val v1 = if (m.group(1).toInt != rN) Seq(
      s"README cites r${m.group(1)}; latest committed gate is r$rN")
    else Nil
    val v2 = if (m.group(2).toInt != greenOfLatest ||
        m.group(3).toInt != greenOfLatest) Seq(
      s"README cites ${m.group(2)}/${m.group(3)}; " +
        s"CORRECTNESS_r$rN has $greenOfLatest green rows")
    else Nil
    v1 ++ v2
  }

  test("README cites the LATEST committed driver gate, with its count") {
    // round-12 verdict stretch 9, repaired in round 13: "Latest
    // driver gate CORRECTNESS_rN: X/X" must cite the newest gate file
    // the builder could have known about. Discovery is restricted to
    // GIT-TRACKED files: the driver drops CORRECTNESS_r{N+1}.json
    // into the worktree (sometimes untracked) AFTER the builder's
    // final commit, and a working-directory glob would retroactively
    // red the build at every round boundary (the round-12 judge hit
    // exactly that). `git ls-files` sees only what a commit could
    // have cited.
    val tracked = {
      val p = new ProcessBuilder("git", "ls-files",
        "CORRECTNESS_r*.json").redirectErrorStream(true).start()
      val out = scala.io.Source.fromInputStream(p.getInputStream)
        .getLines().toList
      p.waitFor()
      out.filter(_.matches("CORRECTNESS_r\\d+\\.json"))
    }
    assert(tracked.nonEmpty, "git ls-files found no gate files")
    val latest = tracked.maxBy(n =>
      "\\d+".r.findFirstIn(n).get.toInt)
    val green = "\"hash_match\": true".r
      .findAllMatchIn(readFile(new java.io.File(latest))).size
    val viols = gateCiteViolations(tracked, green,
      readFile(new java.io.File("README.md")))
    assert(viols.isEmpty, viols.mkString("\n"))
  }

  test("gate survives an untracked newer driver file (round boundary)") {
    // Simulates the round-12 judge failure: the driver wrote an
    // untracked CORRECTNESS_r13.json after the builder's last commit.
    // The checker only sees TRACKED names, so a README citing r12 is
    // green even though r13 exists on disk...
    val readme = "Latest driver gate CORRECTNESS_r12: **347/347**"
    val tracked = Seq("CORRECTNESS_r11.json", "CORRECTNESS_r12.json")
    assert(gateCiteViolations(tracked, 347, readme).isEmpty,
      "untracked newer gate file must not stale the citation")
    // ...but a stale citation of a TRACKED newer gate is still caught,
    val trackedNewer = tracked :+ "CORRECTNESS_r13.json"
    val v = gateCiteViolations(trackedNewer, 350, readme)
    assert(v.exists(_.contains("latest committed gate is r13")), s"$v")
    // ...as is a wrong green count for the right round.
    val v2 = gateCiteViolations(tracked, 345, readme)
    assert(v2.exists(_.contains("345 green rows")), s"$v2")
  }

  test("gate would have caught the round-9 slip (324 vs 325)") {
    // Round 9 shipped docs saying 324 while the live count was 325.
    val stale = "sbt test  # 324 ScalaTest cases\n" +
      "gates: 324/324 ScalaTest, 341/341 oracle hash-match\n" +
      "341 registered queries across 25 suites\n"
    val v = docViolations("README.md", stale,
      tests = 325, queries = 341, suites = 25)
    assert(v.exists(_.contains("declared 324, actual 325")),
      s"checker missed the N-ScalaTest slip: $v")
    assert(v.count(_.contains("324")) == 3, s"expected the bare form " +
      s"and both numbers of the N/N form flagged: $v")
    // and a query-count slip in the N/N oracle form
    val v2 = docViolations("SCALE.md", "gates: 341/341 oracle",
      tests = 325, queries = 343, suites = 25)
    assert(v2.exists(_.contains("declared 341, actual 343")))
  }

  test("suite discovery sees every spec source file") {
    // Every *Spec.scala in the test tree must contribute at least one
    // discovered class — a spec written with an unrecognized parent
    // would silently drop out of the count.
    val specFiles = testDir.listFiles().map(_.getName)
      .filter(n => n.endsWith("Spec.scala") && n != "SparkSpec.scala")
    val missing = specFiles.filterNot(f =>
      suiteNames.contains(f.stripSuffix(".scala")))
    assert(missing.isEmpty, s"spec files not discovered as suites " +
      s"(unrecognized extends clause?): ${missing.mkString(", ")}")
  }
}
