package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for Spark suites: one lazy session per JVM. */
trait SparkSpecBase extends AnyFunSuite {
  lazy implicit val spark: SparkSession = SparkSpecBase.session

  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  /** Run `f` with a fresh temp directory, recursively deleted after. */
  def withTempDir[T](prefix: String)(f: java.io.File => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    try f(dir) finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(dir)
    }
  }
}

object SparkSpecBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.VulFunctions.register(s)
    s
  }
}
