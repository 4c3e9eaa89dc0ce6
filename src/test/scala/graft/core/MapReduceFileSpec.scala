package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** Ports of the reference's file-input tests (mapreduce_unittest.py:58-70)
  * with regenerated fixtures: a file with "header" + 0..999 and one with
  * just 0..999, plus the multi-file index path (mapreduce.py:176-187).
  */
class MapReduceFileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val golden: Seq[(Long, Long)] = Seq(
    0L -> 998001L, 1L -> 982081L, 2L -> 984064L, 3L -> 986049L,
    4L -> 988036L, 5L -> 990025L, 6L -> 992016L, 7L -> 994009L,
    8L -> 996004L)

  def tmpDir(): Path = Files.createTempDirectory("graft-fixtures")

  // Standalone function value: a suite method would capture the
  // non-serializable ScalaTest engine in the Spark closure.
  val mapLine: String => Iterator[(Long, Long)] =
    MapReduceFileSpec.mapLine

  test("single file without header (test_single_file)") {
    import spark.implicits._
    val f = tmpDir().resolve("file_without_header")
    Files.writeString(f, (0 until 1000).mkString("", "\n", "\n"))
    val out = MapReduce.runOnTextFile[Long, Long, (Long, Long)](
      spark, f.toString, mapLine, (k, vs) => (k, vs.max))
      .collect().toSeq.sortBy(_._1)
    assert(out === golden)
  }

  test("single file with header + ignoreFirstLine (test_single_file_hdr)") {
    import spark.implicits._
    val f = tmpDir().resolve("file_with_header")
    Files.writeString(f, "header\n" + (0 until 1000).mkString("", "\n", "\n"))
    val out = MapReduce.runOnTextFile[Long, Long, (Long, Long)](
      spark, f.toString, mapLine, (k, vs) => (k, vs.max),
      ignoreFirstLine = true)
      .collect().toSeq.sortBy(_._1)
    assert(out === golden)
  }

  test("multi-file index path (MapReduceWithMultipleFiles)") {
    import spark.implicits._
    val dir = tmpDir()
    val chunks = (0 until 1000).grouped(334).zipWithIndex.toSeq
    val files = chunks.map { case (xs, i) =>
      val f = dir.resolve(s"data_$i.txt")
      Files.writeString(f, xs.mkString("", "\n", "\n"))
      f.toString
    }
    val index = dir.resolve("index.txt")
    Files.writeString(index, files.mkString("", "\n", "\n"))
    val out = MapReduce.runOnFileIndex[Long, Long, (Long, Long)](
      spark, index.toString, mapLine, (k, vs) => (k, vs.max))
      .collect().toSeq.sortBy(_._1)
    assert(out === golden)
  }
}

object MapReduceFileSpec {
  val mapLine: String => Iterator[(Long, Long)] = { line =>
    val x = line.trim.toLong
    Iterator((x % 9L, x * x))
  }
}
