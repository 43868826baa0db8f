package graft.corpus

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.hadoop.fs.Path

/** The compute-if-absent publish protocol's concurrency story
  * (ArtifactPublish): exactly-one-landing via temp + rename, and the
  * round-14 lock file that closes the delete+rename TOCTOU window. */
class ArtifactPublishSpec extends SparkTestBase {

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def publishOne(dir: String, payload: String): Unit =
    ArtifactPublish.ensure(dir, Seq("t")) { tmp =>
      import spark.implicits._
      Seq(payload).toDF("v").coalesce(1)
        .write.parquet(new Path(tmp, "t").toString)
    }

  test("publish lands the artifact and leaves no lock or temp behind") {
    spark // force session init before any FS work
    val dir = Files.createTempDirectory("graft-pub").toString + "/art"
    publishOne(dir, "a")
    val fs = fsOf(dir)
    assert(fs.exists(new Path(dir, "t/_SUCCESS")), "artifact published")
    assert(!fs.exists(new Path(dir + "._publish_lock")), "lock released")
    val siblings = fs.listStatus(new Path(dir).getParent).map(_.getPath.getName)
    assert(!siblings.exists(_.contains("._tmp_")), s"no temp left: ${siblings.toSeq}")
    // second call is a no-op read of the published artifact
    publishOne(dir, "b")
    import spark.implicits._
    val v = spark.read.parquet(s"$dir/t").as[String].collect().toSeq
    assert(v == Seq("a"), "compute-if-absent: the first landing wins")
  }

  test("a held lock makes a builder WAIT for the holder, then discard its temp untouched") {
    spark
    val dir = Files.createTempDirectory("graft-pub2").toString + "/art"
    publishOne(dir, "live")
    val fs = fsOf(dir)
    // simulate a concurrent publisher mid-landing: hold the lock, and
    // delete the marker so the contender believes it must (re)publish
    fs.create(new Path(dir + "._publish_lock"), false).close()
    fs.delete(new Path(dir, "t/_SUCCESS"), false)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val contender = Future { publishOne(dir, "contender") }
    // while the (fresh) lock is held and nothing is published, ensure()
    // must NOT return — returning would send its caller into a read of
    // a possibly-missing artifact
    Thread.sleep(1500)
    assert(!contender.isCompleted, "contender must wait while the lock is held")
    // the holder lands: marker restored, lock released
    fs.create(new Path(dir, "t/_SUCCESS"), true).close()
    fs.delete(new Path(dir + "._publish_lock"), false)
    Await.result(contender, 60.seconds)
    // the contender must NOT have deleted or renamed over the live data
    import spark.implicits._
    val v = spark.read.parquet(s"$dir/t").as[String].collect().toSeq
    assert(v == Seq("live"), "lock loser must leave the target untouched")
    val siblings = fs.listStatus(new Path(dir).getParent).map(_.getPath.getName)
    assert(!siblings.exists(_.contains("._tmp_")), "loser discarded its temp")
  }

  test("a stale lock from a crashed publisher is broken and publish proceeds") {
    spark
    val dir = Files.createTempDirectory("graft-pub3").toString + "/art"
    val fs = fsOf(dir)
    fs.mkdirs(new Path(dir).getParent)
    val lock = new Path(dir + "._publish_lock")
    fs.create(lock, false).close()
    // age the lock past the 15-minute staleness horizon
    fs.setTimes(lock, System.currentTimeMillis() - 16L * 60 * 1000, -1)
    publishOne(dir, "after-crash")
    assert(fs.exists(new Path(dir, "t/_SUCCESS")),
      "stale lock must not block publishing forever")
    assert(!fs.exists(lock), "stale lock broken and fresh lock released")
  }
}
