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
}
