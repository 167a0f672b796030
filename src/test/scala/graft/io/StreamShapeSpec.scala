package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Hive-dir shape classification for streaming eligibility: only
  * DIRECTORY segments below the data root carry partition values — a
  * parquet file whose BASENAME contains '=' is a legal plain file and
  * must not flag the table as batch-only.
  */
class StreamShapeSpec extends AnyFunSuite {
  private def root(p: String) =
    java.nio.file.Paths.get(p).toAbsolutePath.normalize

  test("hiveDirFile flags k=v DIRECTORY segments below the data root only") {
    val r = root("/wh/t/data")
    assert(StreamShape.hiveDirFile(r, "/wh/t/data/k=v/part-0.parquet"))
    assert(StreamShape.hiveDirFile(r, "/wh/t/data/a/k=v/part-0.parquet"))
    // the final segment is the FILE NAME — '=' in a basename is legal
    assert(!StreamShape.hiveDirFile(r, "/wh/t/data/part-x=y.parquet"))
    // hidden-layout gp_* dirs derive from footer-carried columns
    assert(!StreamShape.hiveDirFile(r, "/wh/t/data/gp_b=3/part-0.parquet"))
    // segments at or above the data root never count
    assert(!StreamShape.hiveDirFile(r, "/elsewhere/run=5/part-0.parquet"))
    assert(!StreamShape.hiveDirFile(root("/a/run=5/t/data"),
      "/a/run=5/t/data/part-0.parquet"))
  }
}
