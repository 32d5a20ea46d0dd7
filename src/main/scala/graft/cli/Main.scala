package graft.cli

import org.apache.spark.sql.SparkSession

import graft.commands.{CommandExecutor, CommandParser}
import graft.core.GraftDatabase
import graft.pipeline.EmbeddingPipeline

/** CLI with the reference's exact flag surface
  * (`/root/reference/src/main.rs:10-34`):
  *
  *   -i / --init-database PATH        create a database at PATH
  *   -n / --init-database-name NAME   name for -i (required with -i,
  *                                    dedicated error otherwise —
  *                                    `src/main.rs:36-40,56-58`)
  *   -d / --database DIR              open an existing database
  *   -c / --collection NAME           target collection for data commands
  *   -e / --execute COMMAND           command keyword (case-insensitive)
  *   -a / --command-arg ARG           command argument
  *   -g / --generate-embeddings N     run the embedding pipeline on the text
  *                                    file given via -a ("development only"
  *                                    in the reference, `src/main.rs:31-32`);
  *                                    short-circuits everything else
  *                                    (`src/main.rs:46-49`)
  */
object Main {

  private[cli] case class Args(
      initDatabase: Option[String] = None,
      initName: Option[String] = None,
      database: Option[String] = None,
      collection: Option[String] = None,
      execute: Option[String] = None,
      commandArg: Option[String] = None,
      generateEmbeddings: Option[Int] = None)

  private[cli] def parseArgs(argv: List[String], acc: Args = Args()): Args = argv match {
    case Nil => acc
    case ("-i" | "--init-database") :: v :: rest => parseArgs(rest, acc.copy(initDatabase = Some(v)))
    case ("-n" | "--init-database-name") :: v :: rest => parseArgs(rest, acc.copy(initName = Some(v)))
    case ("-d" | "--database") :: v :: rest => parseArgs(rest, acc.copy(database = Some(v)))
    case ("-c" | "--collection") :: v :: rest => parseArgs(rest, acc.copy(collection = Some(v)))
    case ("-e" | "--execute") :: v :: rest => parseArgs(rest, acc.copy(execute = Some(v)))
    case ("-a" | "--command-arg") :: v :: rest => parseArgs(rest, acc.copy(commandArg = Some(v)))
    case ("-g" | "--generate-embeddings") :: v :: rest =>
      val n = v.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"--generate-embeddings expects a number, got: $v"))
      parseArgs(rest, acc.copy(generateEmbeddings = Some(n)))
    case (flag @ ("-i" | "--init-database" | "-n" | "--init-database-name"
        | "-d" | "--database" | "-c" | "--collection" | "-e" | "--execute"
        | "-a" | "--command-arg" | "-g" | "--generate-embeddings")) :: Nil =>
      throw new IllegalArgumentException(s"flag $flag is missing its value")
    case other :: _ => throw new IllegalArgumentException(s"unknown flag: $other")
  }

  def main(argv: Array[String]): Unit = {
    val args = parseArgs(argv.toList)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args)
    finally spark.stop()
  }

  private[cli] def run(spark: SparkSession, args: Args): Unit = {
    // -g short-circuits (main.rs:46-49)
    args.generateEmbeddings match {
      case Some(n) =>
        val input = args.commandArg.getOrElse(
          sys.error("--generate-embeddings needs an input text file via --command-arg"))
        val out = args.database.getOrElse(".")
        EmbeddingPipeline.processEmbeddings(spark, input, n, out)
        return
      case None =>
    }

    // -i PATH -n NAME (main.rs:51-62); missing -n is its own error (:36-40)
    args.initDatabase match {
      case Some(path) =>
        val name = args.initName.getOrElse(
          sys.error("--init-database requires --init-database-name"))
        GraftDatabase.create(spark, path, name)
        println(s"[graft] created database $name at $path")
        return
      case None =>
    }

    (args.database, args.execute) match {
      case (Some(dbPath), Some(command)) =>
        val db = GraftDatabase.open(spark, dbPath)
        CommandParser.parse(args.collection, command, args.commandArg) match {
          case Right(cmd) => CommandExecutor.execute(db, cmd).show(100, truncate = false)
          case Left(err) => sys.error(err.message)
        }
      case _ =>
        sys.error("nothing to do: pass -i/-n, -g, or -d with -e " +
          "(see /root/reference/src/main.rs:10-34 for the flag surface)")
    }
  }
}
