package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Source lint locking in the round-11 self-review lesson: under AQE a
  * bare TreeNode `collect` over an executed plan is VACUOUS — exchanges
  * and scans hide inside LeafExecNode query stages (and reused-exchange
  * wrappers), so a guard built on it can never fire. Every executed-plan
  * structural assertion must go through [[PlanGuards]] (stage-aware
  * flatten / identity-deduped shuffleCount); this spec fails the build if
  * a future in-gate guard or test regresses to the bare pattern.
  * Explain-TEXT matching stays allowed — `explain("formatted")` output is
  * already stage-expanded. */
class PlanLintSpec extends AnyFunSuite {

  test("no bare TreeNode collect over an executed plan outside PlanGuards") {
    val root = java.nio.file.Paths.get("src")
    // built by concatenation so this file does not lint itself
    val banned = "executedPlan" + ".collect"
    var bad = List.empty[String]
    val walk = java.nio.file.Files.walk(root)
    try walk.iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      .forEachRemaining { p =>
        val s = p.toString
        if (s.endsWith(".scala") && !s.endsWith("PlanGuards.scala") &&
            !s.endsWith("PlanLintSpec.scala")) {
          val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          // whitespace-normalized so a line-wrapped `executedPlan\n.collect`
          // cannot evade the lint
          if (text.replaceAll("\\s+", "").contains(banned))
            bad ::= s
        }
      }
    finally walk.close()
    assert(bad.isEmpty,
      s"bare executed-plan collect* (AQE-vacuous; the normalized match " +
        s"also catches collectFirst/collectLeaves and comment mentions — " +
        s"all equally banned or misleading) in: ${bad.mkString(", ")} " +
        "- use PlanGuards.flatten/shuffleCount instead")
  }
}
