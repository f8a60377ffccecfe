package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites. `caseSensitive=true` mirrors the
  * reference's load-bearing setting (mixed-case NCUA columns, SURVEY.md
  * §1.3). One session per JVM (Test/fork := true gives each run its own). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.caseSensitive", "true")
    .config("spark.ui.enabled", "false")
    // bound plan-string rendering: iterative algorithms (CC loops) can carry
    // wide plans between checkpoints, and the listener's explainString of an
    // unbounded tree is an OOM vector in a 4-core test JVM
    .config("spark.sql.maxPlanStringLength", "100000")
    .config("spark.local.dir", SparkSupport.scratchDir)
    .getOrCreate()

  override def afterAll(): Unit = {
    // keep the session for sibling suites in the same forked JVM
    super.afterAll()
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
