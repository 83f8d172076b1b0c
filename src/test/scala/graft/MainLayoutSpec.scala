package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI e2e over BOTH store layouts (`--layout document|bucketed`):
  * the full `ingest -> list -> search` path must produce identical
  * user-visible output through either [[graft.store.ChunkStore]]
  * implementation — the layout is physical, never semantic. This is
  * ChunkStoreSwapSpec's invariant extended through `Main`'s own
  * argument parsing and store construction (the path a real user
  * runs), not just the library seam.
  */
class MainLayoutSpec extends SparkSpec {

  private def capture(in: String)(body: => Int): (Int, String) = {
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Console.withIn(new java.io.StringReader(in)) { body }
    }
    (code, out.toString("UTF-8"))
  }

  private def driveLayout(layout: String): (String, String, String) = {
    val root = java.nio.file.Files
      .createTempDirectory(s"main-$layout").toString
    val md = resourcePath("content/markdown")
    val (c1, ingestOut) = capture("") {
      Main.run(Array("ingest", "--reader", "markdown", "--source", md,
        "--store", root, "--layout", layout), spark)
    }
    assert(c1 == 0, s"ingest exit $c1 on layout $layout")
    val (c2, listOut) = capture("") {
      Main.run(Array("list", "--store", root, "--layout", layout), spark)
    }
    assert(c2 == 0)
    val (c3, searchOut) = capture("how do plants convert sunlight\n\n") {
      Main.run(Array("search", "--store", root, "--layout", layout,
        "--k", "3"), spark)
    }
    assert(c3 == 0, s"search exit $c3 on layout $layout")
    (ingestOut.linesIterator.toSeq.sorted.mkString("\n"), listOut,
      searchOut)
  }

  test("ingest/list/search produce identical output on both layouts") {
    val (ingD, listD, schD) = driveLayout("document")
    val (ingB, listB, schB) = driveLayout("bucketed")
    assert(ingD.contains("[SUCCESS]"), s"no successful ingest:\n$ingD")
    assert(ingB == ingD, "ingest reports differ between layouts")
    assert(listD.trim == "documents" && listB == listD)
    assert(schD.contains("score="), s"no search hits:\n$schD")
    assert(schB == schD, "search output differs between layouts")
  }

  test("unknown --layout fails with a usage message, not a stack trace") {
    val err = new java.io.ByteArrayOutputStream()
    val code = Console.withErr(new java.io.PrintStream(err, true, "UTF-8")) {
      Main.run(Array("list", "--layout", "exotic"), spark)
    }
    assert(code == 2)
  }
}
