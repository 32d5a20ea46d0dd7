package graft.cli

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CliSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import Main.parseArgs

  test("flag grammar: short and long forms, reference surface") {
    val got = parseArgs(List(
      "-i", "/p", "--init-database-name", "db1", "-d", "/q",
      "--collection", "vecs", "-e", "SEARCH", "-a", "id = 1",
      "--generate-embeddings", "5"))
    assert(got == Main.Args(Some("/p"), Some("db1"), Some("/q"), Some("vecs"),
      Some("SEARCH"), Some("id = 1"), Some(5)))
  }

  test("unknown flag and dangling value are rejected") {
    intercept[IllegalArgumentException] { parseArgs(List("--frobnicate", "x")) }
    intercept[IllegalArgumentException] { parseArgs(List("-i")) } // no value
  }

  test("missing -n with -i is the reference's dedicated error") {
    val e = intercept[RuntimeException] {
      Main.run(spark, Main.Args(initDatabase = Some(Files.createTempDirectory("cli").toString)))
    }
    assert(e.getMessage.contains("--init-database-name"))
  }

  test("no actionable flags → usage error; full init+execute flow works in-process") {
    intercept[RuntimeException] { Main.run(spark, Main.Args()) }
    val parent = Files.createTempDirectory("cli_run").toString
    Main.run(spark, Main.Args(initDatabase = Some(parent), initName = Some("clidb")))
    Main.run(spark, Main.Args(database = Some(s"$parent/clidb"),
      execute = Some("create"), commandArg = Some("vecs")))
    Main.run(spark, Main.Args(database = Some(s"$parent/clidb"), collection = Some("vecs"),
      execute = Some("insert"), commandArg = Some("9;0.5,0.5;thing")))
    val db = graft.core.GraftDatabase.open(spark, s"$parent/clidb")
    assert(db.read("vecs").count() == 1)
    // unrecognized command surfaces the parser error
    val e = intercept[RuntimeException] {
      Main.run(spark, Main.Args(database = Some(s"$parent/clidb"), execute = Some("zap")))
    }
    assert(e.getMessage.contains("unrecognized command"))
  }
}
