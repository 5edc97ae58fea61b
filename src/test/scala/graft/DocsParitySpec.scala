package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Docs-can't-drift parity: the README's "Pipeline stages" list must match
  * the actual `.transform(...)` chain in `service/Pipeline.scala`, in
  * order. The reference enforces the same invariant by REGENERATING its
  * README from the pipeline source (reference:
  * dev_tools/update_readme.py:11-42 — regex-extract the `.pipe(...)` stage
  * names, splice their docstrings into README). A test is the sbt-native
  * enforcement: adding/removing/reordering a stage without touching the
  * docs fails the build instead of silently shipping stale docs. */
class DocsParitySpec extends AnyFunSuite {

  private def read(p: String): String = new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  /** Stage fn names from the pipeline source, chain order — the Scala twin
    * of update_readme.py's `(?<=pipe\()\s*([^,)\s]+)` extraction. */
  private def pipelineStages: Seq[String] = {
    val src = read("src/main/scala/graft/service/Pipeline.scala")
    "\\.transform\\((?:[A-Za-z]+\\.)?([A-Za-z0-9_]+)".r
      .findAllMatchIn(src).map(_.group(1)).toSeq
  }

  /** Backticked stage names from the README's numbered stage list. */
  private def readmeStages: Seq[String] = {
    val md = read("README.md")
    val section = md.split("## Pipeline stages", 2) match {
      case Array(_, rest) => rest.split("\n## ", 2).head
      case _ => fail("README.md has no '## Pipeline stages' section")
    }
    "(?m)^\\d+\\. `([A-Za-z0-9_]+)`".r.findAllMatchIn(section).map(_.group(1)).toSeq
  }

  test("README stage list matches the Pipeline.scala transform chain, in order") {
    val (code, docs) = (pipelineStages, readmeStages)
    assert(code.nonEmpty, "no .transform stages extracted — regex or source moved")
    assert(docs == code,
      s"""README '## Pipeline stages' drifted from service/Pipeline.scala.
         |  code : ${code.mkString(", ")}
         |  docs : ${docs.mkString(", ")}
         |Update the README list to match the chain (order matters).""".stripMargin)
  }

  /** README section text between `## <title>` and the next `## `. */
  private def section(title: String): String =
    read("README.md").split(s"## $title", 2) match {
      case Array(_, rest) => rest.split("\n## ", 2).head
      case _ => fail(s"README.md has no '## $title' section")
    }

  test("README built-in transformation list matches BuiltinTransformations.registry exactly") {
    val documented = "(?m)^- `([a-z0-9_]+)`".r
      .findAllMatchIn(section("YAML-only curation pipeline"))
      .map(_.group(1)).toSet
    val registered = graft.service.BuiltinTransformations.registry.keySet
    assert(documented == registered,
      s"""README '### Built-in transformations' drifted from the registry.
         |  documented only : ${(documented -- registered).toSeq.sorted.mkString(", ")}
         |  registered only : ${(registered -- documented).toSeq.sorted.mkString(", ")}
         |Add/remove the bullet(s) to match BuiltinTransformations.registry.""".stripMargin)
  }

  test("Polars Expr inventory exactly partitions into implemented / builtin-spelled / excluded") {
    import graft.expr.ExprRegistry
    val inventory = ExprRegistry.polarsExprMethods
    val implemented = ExprRegistry.fns.keySet
    val builtin = ExprRegistry.polarsBuiltinSpelled
    val excluded = ExprRegistry.polarsExcluded.keySet
    // the three classifications live inside the inventory
    assert((builtin -- inventory).isEmpty,
      s"builtin-spelled names not in the inventory: ${(builtin -- inventory).toSeq.sorted}")
    assert((excluded -- inventory).isEmpty,
      s"excluded names not in the inventory: ${(excluded -- inventory).toSeq.sorted}")
    // no stale classifications: an excluded or builtin-spelled name that
    // IS now a registry fn means the doc drifted from the code
    assert((excluded intersect implemented).isEmpty,
      s"stale exclusions (now implemented): ${(excluded intersect implemented).toSeq.sorted}")
    assert((builtin intersect implemented).isEmpty,
      s"builtin-spelled names shadowed by registry fns: ${(builtin intersect implemented).toSeq.sorted}")
    assert((excluded intersect builtin).isEmpty,
      s"double-classified: ${(excluded intersect builtin).toSeq.sorted}")
    // EXACT COMPLEMENT: every inventory name is implemented, builtin, or excluded
    val uncovered = inventory -- implemented -- builtin -- excluded
    assert(uncovered.isEmpty,
      s"pl.Expr methods with no implementation, builtin spelling, or documented " +
        s"exclusion: ${uncovered.toSeq.sorted.mkString(", ")}")
    // builtin spellings must resolve in the ACTUAL builtin registry, and
    // the resolver must route them there with an actionable error
    val missingBuiltins = builtin.filterNot(
      graft.service.BuiltinTransformations.registry.contains)
    assert(missingBuiltins.isEmpty,
      s"builtin-spelled names absent from BuiltinTransformations.registry: " +
        s"${missingBuiltins.toSeq.sorted.mkString(", ")}")
    for (name <- builtin) {
      val e = intercept[IllegalArgumentException] { ExprRegistry.resolve(name) }
      assert(e.getMessage.contains("custom_transformations"), s"$name: ${e.getMessage}")
    }
  }

  test("README curation YAML parses and every custom transformation resolves to a builtin") {
    val block = "(?s)```yaml\\n(.*?)```".r
      .findFirstMatchIn(section("YAML-only curation pipeline"))
      .getOrElse(fail("no ```yaml block in the curation section")).group(1)
    val cfg = graft.config.ConfigLoader.fromYaml(block)
    val used = cfg.customTransformations.map(_._1)
    assert(used.nonEmpty, "the documented pipeline must exercise custom transformations")
    val unknown = used.filterNot(graft.service.BuiltinTransformations.registry.contains)
    assert(unknown.isEmpty,
      s"README YAML names non-builtin transformations: ${unknown.mkString(", ")}")
  }
}
