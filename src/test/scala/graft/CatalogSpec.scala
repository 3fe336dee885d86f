package graft

import graft.core._
import graft.core.catalog.{TopicCatalog, Warehouse}

class CatalogSpec extends SparkSpec {

  test("topic names must be path-safe and must not collide with staging suffixes") {
    val wh = Warehouse(tmpDir("graft-names"))
    // legal: alnum start, then alnum . _ -
    TopicCatalog.createTopic(spark, wh, "ok-topic.v1_2", 1)
    intercept[InvalidTopicException] {
      TopicCatalog.createTopic(spark, wh, "x_rewrite", 1) // index staging suffix
    }
    intercept[InvalidTopicException] {
      TopicCatalog.createTopic(spark, wh, "x_old", 1) // swap aside-dir suffix
    }
    intercept[InvalidTopicException] {
      TopicCatalog.createTopic(spark, wh, "a/b", 1) // path separator
    }
    intercept[InvalidTopicException] {
      TopicCatalog.createTopic(spark, wh, "../escape", 1)
    }
    intercept[InvalidTopicException] {
      TopicCatalog.createTopic(spark, wh, "_hidden", 1) // Spark ignores _ paths
    }
    intercept[InvalidTopicException] {
      TopicCatalog.createTopic(spark, wh, ".dot", 1)
    }
    intercept[InvalidTopicException] {
      TopicCatalog.createTopic(spark, wh, "sp ace", 1)
    }
  }

  test("catalog heal: a crash between swap renames cannot orphan the registry") {
    val wh = Warehouse(tmpDir("graft-cat-heal"))
    TopicCatalog.createTopic(spark, wh, "a", 1)
    TopicCatalog.createTopic(spark, wh, "b", 1)
    // simulate deleteTopic crashing mid-swap: live registry renamed aside,
    // rewrite fully written (reuse the live content), aside dir present
    val conf = new org.apache.hadoop.conf.Configuration()
    val live = new org.apache.hadoop.fs.Path(wh.catalogDir)
    val fs = live.getFileSystem(conf)
    assert(fs.rename(live, new org.apache.hadoop.fs.Path(s"${wh.catalogDir}_rewrite")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"${wh.catalogDir}_old"))
    // the next catalog read heals: every topic still registered
    assert(TopicCatalog.topics(spark, wh).count() === 2)
    assert(TopicCatalog.exists(spark, wh, "a") && TopicCatalog.exists(spark, wh, "b"))
    assert(fs.exists(live), "registry restored as live")
  }
}
