package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI e2e over ALL THREE store layouts
  * (`--layout document|bucketed|snapshot`): the full
  * `ingest -> list -> search` path must produce identical
  * user-visible output through every [[graft.store.ChunkStore]]
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

  test("ingest/list/search produce identical output on all layouts") {
    val (ingD, listD, schD) = driveLayout("document")
    val (ingB, listB, schB) = driveLayout("bucketed")
    val (ingS, listS, schS) = driveLayout("snapshot")
    assert(ingD.contains("[SUCCESS]"), s"no successful ingest:\n$ingD")
    assert(ingB == ingD, "ingest reports differ between layouts")
    assert(ingS == ingD, "snapshot ingest report differs")
    assert(listD.trim == "documents" && listB == listD && listS == listD)
    assert(schD.contains("score="), s"no search hits:\n$schD")
    assert(schB == schD, "search output differs between layouts")
    assert(schS == schD, "snapshot search output differs")
  }

  test("delete + index build/refresh/status drive the maintenance " +
      "surface end-to-end on all three layouts") {
    for (layout <- Seq("document", "bucketed", "snapshot")) {
      val root = java.nio.file.Files
        .createTempDirectory(s"main-maint-$layout").toString
      val md = resourcePath("content/markdown")
      val common = Array("--store", root, "--layout", layout)
      assert(capture("") { Main.run(Array("ingest", "--reader",
        "markdown", "--source", md) ++ common, spark) }._1 == 0)
      // Build both sidecars; status must report fresh.
      assert(capture("") { Main.run(Array("index", "build", "--mode",
        "ivfsq") ++ common, spark) }._1 == 0)
      assert(capture("") { Main.run(Array("index", "build", "--mode",
        "lsh") ++ common, spark) }._1 == 0)
      val (cs1, st1) = capture("") {
        Main.run(Array("index", "status") ++ common, spark) }
      assert(cs1 == 0 && st1.contains("lsh: fresh") &&
        st1.contains("ivfsq: fresh"), s"[$layout] status after build:\n$st1")
      // Delete one ingested document -> sidecars go stale.
      val victim = {
        val store: graft.store.ChunkStore = layout match {
          case "document" => new graft.store.VectorStore(spark, root)
          case "bucketed" => new graft.store.BucketedVectorStore(spark, root, 16)
          case _ => new graft.store.SnapshotStore(spark, root, 16)
        }
        store.read("documents").select("documentid")
          .orderBy("documentid").head().getString(0)
      }
      val (cd, delOut) = capture("") {
        Main.run(Array("delete", "--ids", victim) ++ common, spark) }
      assert(cd == 0 && delOut.contains("deleted 1 document"),
        s"[$layout] delete output:\n$delOut")
      val (_, st2) = capture("") {
        Main.run(Array("index", "status") ++ common, spark) }
      assert(st2.contains("lsh: stale-or-absent"),
        s"[$layout] sidecar still fresh after delete:\n$st2")
      // Refresh with exactly the delta -> fresh again; search serves.
      for (m <- Seq("lsh", "ivfsq"))
        assert(capture("") { Main.run(Array("index", "refresh", "--mode",
          m, "--ids", victim) ++ common, spark) }._1 == 0)
      val (_, st3) = capture("") {
        Main.run(Array("index", "status") ++ common, spark) }
      assert(st3.contains("lsh: fresh") && st3.contains("ivfsq: fresh"),
        s"[$layout] status after refresh:\n$st3")
      val (cq, schOut) = capture("how do plants convert sunlight\n\n") {
        Main.run(Array("search", "--k", "2", "--mode", "ivfsq") ++
          common, spark) }
      assert(cq == 0 && schOut.contains("score="),
        s"[$layout] sidecar-served search:\n$schOut")
      assert(!schOut.contains(victim),
        s"[$layout] deleted document resurfaced in search:\n$schOut")
      // Guardrails: missing --ids and unknown action fail cleanly.
      assert(Main.run(Array("delete") ++ common, spark) == 2)
      assert(Main.run(Array("index", "frobnicate") ++ common, spark) == 2)
    }
  }

  test("versions + vacuum: the snapshot layout's history surface via " +
      "the CLI; the rename layouts refuse them cleanly") {
    val root = java.nio.file.Files
      .createTempDirectory("main-snap-hist").toString
    val md = resourcePath("content/markdown")
    val common = Array("--store", root, "--layout", "snapshot")
    assert(capture("") { Main.run(Array("ingest", "--reader", "markdown",
      "--source", md) ++ common, spark) }._1 == 0)
    assert(capture("") { Main.run(Array("delete", "--ids",
      "black_holes.md") ++ common, spark) }._1 == 0)
    // Compact (v3): copy-on-write — v1's ingest dir and v2's tombstone
    // become unreferenced-by-latest, but stay readable at v1/v2.
    val (cc, cmpOut) = capture("") {
      Main.run(Array("compact") ++ common, spark) }
    assert(cc == 0 && cmpOut.contains("compacted documents:"),
      s"compact output:\n$cmpOut")
    val (cv, verOut) = capture("") {
      Main.run(Array("versions") ++ common, spark) }
    assert(cv == 0 && verOut.contains("v1:") && verOut.contains("v3:"),
      s"expected three committed versions:\n$verOut")
    // Vacuum with the default 1h grace: nothing seconds-old is swept.
    val (cg, graceOut) = capture("") {
      Main.run(Array("vacuum", "--retain", "1") ++ common, spark) }
    assert(cg == 0 && graceOut.contains("0 data dir(s) deleted"),
      s"grace window breached:\n$graceOut")
    // Forcing min-age 0 sweeps the pre-compact history's data.
    val (cf, vacOut) = capture("") {
      Main.run(Array("vacuum", "--retain", "1", "--min-age-ms", "0")
        ++ common, spark) }
    assert(cf == 0 && !vacOut.contains("0 data dir(s) deleted"),
      s"expected a sweep:\n$vacOut")
    val (cv2, verOut2) = capture("") {
      Main.run(Array("versions") ++ common, spark) }
    assert(cv2 == 0 && !verOut2.contains("v1:") &&
      verOut2.contains("v3:"), s"v1 must be aged out:\n$verOut2")
    // The rename-commit layouts have no history surface.
    for (l <- Seq("document", "bucketed")) {
      assert(Main.run(Array("versions", "--store", root,
        "--layout", l), spark) == 2)
      assert(Main.run(Array("vacuum", "--store", root,
        "--layout", l), spark) == 2)
    }
  }

  test("diff: the snapshot layout's version-diff surface via the CLI; " +
      "rename layouts and bad windows refuse cleanly") {
    val root = java.nio.file.Files
      .createTempDirectory("main-snap-diff").toString
    val md = resourcePath("content/markdown")
    val common = Array("--store", root, "--layout", "snapshot")
    assert(capture("") { Main.run(Array("ingest", "--reader", "markdown",
      "--source", md) ++ common, spark) }._1 == 0)
    assert(capture("") { Main.run(Array("delete", "--ids",
      "black_holes.md") ++ common, spark) }._1 == 0)
    val (c, out) = capture("") {
      Main.run(Array("diff", "--from", "1") ++ common, spark) }
    assert(c == 0, s"diff exit $c:\n$out")
    assert(out.contains("removed: black_holes.md") &&
      out.contains("1 document(s) differ between v1 and v2"),
      s"diff output:\n$out")
    // Bad window (from >= to) and rename layouts refuse with usage.
    assert(Main.run(Array("diff", "--from", "2", "--to", "1")
      ++ common, spark) == 2)
    assert(Main.run(Array("diff", "--from", "1", "--store", root,
      "--layout", "document"), spark) == 2)
  }

  test("migrate moves a collection between all layout pairs with " +
      "byte-identical contents and identical search results") {
    val md = resourcePath("content/markdown")
    val srcRoot = java.nio.file.Files
      .createTempDirectory("main-mig-src").toString
    assert(capture("") { Main.run(Array("ingest", "--reader", "markdown",
      "--source", md, "--store", srcRoot, "--layout", "document"),
      spark) }._1 == 0)
    def contents(root: String, layout: String): Seq[(String, String)] = {
      val st: graft.store.ChunkStore = layout match {
        case "document" => new graft.store.VectorStore(spark, root)
        case "bucketed" => new graft.store.BucketedVectorStore(spark, root, 8)
        case _ => new graft.store.SnapshotStore(spark, root, 8)
      }
      st.read("documents")
        .select("key", "documentid").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    }
    val src = contents(srcRoot, "document")
    assert(src.nonEmpty)
    for (toLayout <- Seq("bucketed", "snapshot")) {
      val dst = java.nio.file.Files
        .createTempDirectory(s"main-mig-$toLayout").toString
      val (c, out) = capture("") {
        Main.run(Array("migrate", "--store", srcRoot, "--layout",
          "document", "--to-store", dst, "--to-layout", toLayout,
          "--to-buckets", "8"), spark) }
      assert(c == 0 && out.contains(s"${src.size} chunk(s)"),
        s"migrate to $toLayout:\n$out")
      assert(contents(dst, toLayout) == src,
        s"$toLayout migration changed contents")
      // Re-running the migration is idempotent (deterministic keys +
      // replace-by-document).
      assert(capture("") { Main.run(Array("migrate", "--store", srcRoot,
        "--layout", "document", "--to-store", dst, "--to-layout",
        toLayout, "--to-buckets", "8"), spark) }._1 == 0)
      assert(contents(dst, toLayout) == src, "re-migration not idempotent")
      // And the migrated store serves the same search hits.
      val (cs, hits) = capture("how do plants convert sunlight\n\n") {
        Main.run(Array("search", "--store", dst, "--layout", toLayout,
          "--k", "2"), spark) }
      assert(cs == 0 && hits.contains("score="))
    }
    // Guardrails: missing target args fail cleanly.
    assert(Main.run(Array("migrate", "--store", srcRoot), spark) == 2)
    assert(Main.run(Array("migrate", "--store", srcRoot, "--to-store",
      "/tmp/x", "--to-layout", "exotic"), spark) == 2)
    // Close the matrix: a chained bucketed -> snapshot -> document
    // round trip ends byte-identical to the original.
    val b = java.nio.file.Files.createTempDirectory("mig-b").toString
    val sn = java.nio.file.Files.createTempDirectory("mig-s").toString
    val d2 = java.nio.file.Files.createTempDirectory("mig-d").toString
    assert(capture("") { Main.run(Array("migrate", "--store", srcRoot,
      "--layout", "document", "--to-store", b, "--to-layout",
      "bucketed", "--to-buckets", "8"), spark) }._1 == 0)
    assert(capture("") { Main.run(Array("migrate", "--store", b,
      "--layout", "bucketed", "--buckets", "8", "--to-store", sn,
      "--to-layout", "snapshot", "--to-buckets", "8"), spark) }._1 == 0)
    assert(capture("") { Main.run(Array("migrate", "--store", sn,
      "--layout", "snapshot", "--buckets", "8", "--to-store", d2,
      "--to-layout", "document"), spark) }._1 == 0)
    assert(contents(d2, "document") == src,
      "the three-layout migration round trip changed contents")
  }

  test("--embedder swaps the provider end-to-end: randproj ingest + " +
      "randproj search retrieve on-topic; the flag gates both commands") {
    val root = java.nio.file.Files
      .createTempDirectory("main-embedder").toString
    val md = resourcePath("content/markdown")
    val (c1, _) = capture("") {
      Main.run(Array("ingest", "--reader", "markdown", "--source", md,
        "--store", root, "--embedder", "randproj"), spark)
    }
    assert(c1 == 0)
    // The query ProvidersSpec already certifies as on-topic top-1 in
    // the random-projection space (token overlap is the signal there).
    val (c2, out) = capture(
        "gravity so strong that light cannot escape the event horizon\n\n") {
      Main.run(Array("search", "--store", root, "--k", "1",
        "--embedder", "randproj"), spark)
    }
    assert(c2 == 0)
    assert(out.contains("black_holes"),
      s"randproj space must retrieve the on-topic doc, got: $out")
    // An unknown embedder is a usage error on both commands.
    val (c3, _) = capture("") {
      Main.run(Array("search", "--store", root, "--embedder", "minilm"),
        spark)
    }
    assert(c3 == 2)
  }

  test("unknown --layout fails with a usage message, not a stack trace") {
    val err = new java.io.ByteArrayOutputStream()
    val code = Console.withErr(new java.io.PrintStream(err, true, "UTF-8")) {
      Main.run(Array("list", "--layout", "exotic"), spark)
    }
    assert(code == 2)
  }
}
