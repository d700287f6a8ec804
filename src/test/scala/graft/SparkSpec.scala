package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for operator specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.local(4, getClass.getSimpleName)
  val sf: String = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // keep the JVM-wide session for sibling suites (sbt forks one JVM)
    super.afterAll()
  }
}
